"""SQL front door: register frost tables as temp views and query with
``spark.sql`` — how analysts actually reach the engine.

The reference's gold runner registers every upstream table as a temp view
and executes model SQL against the session catalog
(/root/reference/ofl/transform/gold/runner.py:150-162); missing upstreams
are logged and skipped rather than failing the whole run
(the missing-table tolerance the bronze/silver lanes apply,
/root/reference/ofl/transform/spark/silver.py:41-47). Same contract here:
``register_tables`` warns and skips locations with no table (returning the
skip list so callers can gate on it), and ``run_sql`` is a thin
``spark.sql`` wrapper kept for API parity.

Views are plain logical plans over ``LakeTable.scan`` — manifest-level
pruning still applies through the scan's explicit file list, and Catalyst
sees ordinary parquet relations, so predicate pushdown and column pruning
work unchanged through the SQL surface.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, SparkSession

from open_finance_lakehouse_spark.format.table import LakeTable


def register_view(table: LakeTable, name: str,
                  snapshot_id: int | None = None) -> None:
    """One table (optionally time-travelled) as a temp view."""
    table.scan(snapshot_id=snapshot_id).createOrReplaceTempView(name)


def register_tables(
    spark: SparkSession,
    tables: dict[str, "str | LakeTable"],
    on_missing: str = "warn",
) -> dict[str, list[str]]:
    """Register ``{view_name: location-or-LakeTable}``; returns
    ``{"registered": [...], "skipped": [...]}``.

    ``on_missing``: "warn" (default) logs and skips absent locations —
    downstream SQL referencing a skipped view fails by name, everything
    else runs; "raise" fails fast."""
    if on_missing not in ("warn", "raise"):
        raise ValueError(
            f"on_missing={on_missing!r} — expected 'warn' or 'raise'")
    registered: list[str] = []
    skipped: list[str] = []
    for name, t in tables.items():
        if isinstance(t, LakeTable):
            register_view(t, name)
            registered.append(name)
            continue
        try:
            # load() is the authoritative existence check — an isdir probe
            # would accept a half-created metadata dir (crashed create)
            # and then crash the whole run despite warn mode
            table = LakeTable.load(spark, t)
        except FileNotFoundError:
            if on_missing == "raise":
                raise FileNotFoundError(f"no table at {t} for view {name}")
            warnings.warn(f"skipping view {name}: no table at {t}",
                          stacklevel=2)
            skipped.append(name)
            continue
        register_view(table, name)
        registered.append(name)
    return {"registered": registered, "skipped": skipped}


def run_sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
