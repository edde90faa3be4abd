"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship: full maintenance pipeline (compact → Z-order →
              expire + parity/SNR gates) on a clip table derived
              deterministically from sf0.001 documents.
``queries`` — one entry per implemented operator from SURVEY.md §2 plus the
              training-data ops (dedup, similarity search, text analysis,
              multimodal audio), from the package query registry.
``oracle_sql`` — the DuckDB oracle for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_finance_lakehouse_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end maintenance + audit summary on sf0.001."""
    from open_finance_lakehouse_spark.queries.multimodal import (
        audio_maintenance_pipeline,
    )

    return audio_maintenance_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle_sql
        for name, spec in REGISTRY.items()
        if spec.oracle_sql is not None
    }
