"""Shared helpers for the query library."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_fanout(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load + repartition to cluster width. For CPU-heavy per-row
    derivations (shingling, k× min-hash folds) over a table that arrives
    as FEW input splits, the derivation inherits the scan's parallelism —
    a single-file parquet runs the whole computation in ONE task (measured
    10 s single-task vs ~1 s fanned out). One narrow shuffle of the raw
    rows is far cheaper than serializing the derivation; at corpus scale
    the source has thousands of splits and this exchange coalesces away
    under AQE."""
    return load(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism)


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
