"""The full maintenance pipeline: compact → cluster → expire (+ audit).

This is the product surface the north_rule names — "maintenance implemented
and callable" (the reference's stance, /root/reference/README.md:314-317) —
with throughput measured the reference's way: clips/sec divides the live row
count by summed *engine-measured* stage time, never wall clock
(/root/reference/ofl/streaming/metrics.py:17-20,53-62 divides by trigger
execution time so JVM startup is excluded); run metrics and table-state
metrics are reported separately (metrics.py:1-26).
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.operators import audit as audit_ops
from open_finance_lakehouse_spark.operators.cluster import (
    cluster,
    cluster_global,
)
from open_finance_lakehouse_spark.operators.compact import compact
from open_finance_lakehouse_spark.operators.expire import expire
from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger


def run_maintenance(
    table: LakeTable,
    ledger: CheckpointLedger,
    job_id: str | None = None,
    target_bytes: int = 8 * 1024 * 1024,
    curve: str | None = "zorder",
    retain_last: int = 1,
    with_audit: bool = True,
    spark_for_audit: SparkSession | None = None,
    subsume_compaction: bool = True,
    concurrency: int = 8,
    cluster_mode: str = "global",
) -> dict:
    """compact → cluster → expire; returns run metrics + (optionally) an
    independently-read table audit.

    ``subsume_compaction`` (default): when clustering runs, the separate
    compaction pass is skipped — the clustering rewrite already re-packs
    every partition into target-size files, so a prior compaction would
    move every byte twice. This mirrors the reference, whose single
    ``OPTIMIZE ... ZORDER BY`` call IS compaction+clustering in one rewrite
    (/root/reference/ofl/transform/spark/silver.py:368-371). Set
    ``curve=None`` for compaction-only maintenance."""
    job_id = job_id or f"maint-{uuid.uuid4().hex[:12]}"
    clip_count = sum(f.record_count for f in table.live_files())

    stages = {}
    if curve is None or not subsume_compaction:
        stages["compact"] = compact(
            table, ledger, f"{job_id}/compact", target_bytes=target_bytes,
            concurrency=concurrency)
    if curve is not None:
        if cluster_mode == "global":
            # one table-wide job: lowest overhead, core-bound scaling;
            # per-partition mode trades throughput for file-granularity
            # resume (pick it for very large tables / flaky clusters)
            stages["cluster"] = cluster_global(
                table, ledger, f"{job_id}/cluster", curve=curve,
                target_bytes=target_bytes)
        else:
            stages["cluster"] = cluster(
                table, ledger, f"{job_id}/cluster", curve=curve,
                target_bytes=target_bytes, concurrency=concurrency)
    stages["expire"] = expire(
        table, ledger, f"{job_id}/expire", retain_last=retain_last)

    engine_ms = sum(s["engine_ms"] for s in stages.values())
    metrics = {
        "job_id": job_id,
        "clips": clip_count,
        "engine_ms": engine_ms,
        "clips_per_sec": (clip_count / (engine_ms / 1000.0)) if engine_ms else 0.0,
        "stages": stages,
    }
    if with_audit:
        # table state witnessed by a fresh metadata read, not writer state
        metrics["table_audit"] = audit_ops.independent_audit(
            table.location, spark_for_audit or table.spark)
    return metrics
