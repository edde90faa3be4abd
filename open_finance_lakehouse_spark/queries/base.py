"""Shared helpers for the query library."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def h32(col):
    """Shared 32-bit string hash computable identically in DuckDB:
    Spark  conv(substring(md5(x),1,8),16,10)::bigint
    DuckDB ('0x' || substr(md5(x),1,8))::BIGINT
    Used wherever a hash must agree across the engine and the oracle
    (minhash, simhash, fingerprints)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


H32_SQL = "(('0x' || substr(md5({x}),1,8))::BIGINT)"


def r2(col):
    return F.round(col, 2)


def r6(col):
    return F.round(col, 6)
