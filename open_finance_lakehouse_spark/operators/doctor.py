"""Table-health advisor: one read-only report + recommended actions.

The reference's operators learn table health from Grafana panels fed by
its metrics lane (/root/reference/ofl/streaming/metrics.py:97-126 reads
row counts and freshness per table); this engine folds the same signals
— plus the format-level ones only the table format can see — into one
callable report so "what maintenance does this table need?" is one
command, not a dashboard safari.

Everything is metadata-only (manifest parquet + snapshot log): no data
bytes are read, so the doctor is safe to run on a 10^12-row table.  The
file-level aggregates run DISTRIBUTEDLY over ``files_df`` (one Spark
aggregate over the manifest relation — never a driver-side file loop);
the snapshot log and ledger reads are O(snapshots)/O(records),
driver-side by design.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.operators import binpack

# advisory thresholds (doc'd in the report; conservative defaults)
SMALL_FILE_RATIO_WARN = 0.5   # >50% of files under the small threshold
SNAPSHOT_DEBT_WARN = 50       # unexpired snapshots
OVERLAP_WARN = 0.5            # mean pairwise stat-overlap fraction


def doctor(
    table: LakeTable,
    target_bytes: int = binpack.DEFAULT_TARGET_FILE_BYTES,
    cluster_column: str | None = None,
) -> dict:
    """Return ``{"signals": {...}, "advice": [...]}`` — read-only."""
    t0 = time.monotonic()
    table.refresh()
    meta = table.meta
    small_threshold = int(target_bytes * binpack.DEFAULT_SMALL_FILE_RATIO)

    # one distributed aggregate over the manifest relation
    inv = table.files_df()
    agg = inv.agg(
        F.count("*").alias("files"),
        F.sum("file_size_bytes").alias("bytes"),
        F.sum("record_count").alias("rows"),
        F.sum((F.col("file_size_bytes") < small_threshold).cast("long"))
         .alias("small_files"),
        F.countDistinct("partition").alias("partitions"),
        F.avg("file_size_bytes").alias("avg_file_bytes"),
    ).first()
    files = int(agg["files"] or 0)

    snaps = table.snapshots()
    cur = meta.current_snapshot_id
    by_id = {s.snapshot_id: s for s in snaps}
    chain = set()
    c = cur
    while c is not None and c in by_id:
        chain.add(c)
        c = by_id[c].parent_id
    staged_pending = [s.snapshot_id for s in snaps
                      if s.summary.get("staged") == "true"]
    off_ancestry = [s.snapshot_id for s in snaps
                    if s.snapshot_id not in chain
                    and s.summary.get("staged") != "true"]

    # per-partition payload sizes: the sf10 record (BENCH/sf10.md) measured
    # clustering 1.68x slower when the largest partition crossed the
    # local-sort cap and auto routed to the range exchange — a mis-sized
    # bucket count is a table defect the doctor must call out before the
    # user pays the shuffle tax on every maintenance run
    pmax = (inv.groupBy("partition")
               .agg(F.sum("file_size_bytes").alias("b"))
               .agg(F.max("b").alias("m")).first()["m"]) if files else 0

    signals = {
        "table": meta.name,
        "files": files,
        "rows": int(agg["rows"] or 0),
        "bytes": int(agg["bytes"] or 0),
        "partitions": int(agg["partitions"] or 0),
        "avg_file_mb": round((agg["avg_file_bytes"] or 0) / 1048576, 2),
        "small_files": int(agg["small_files"] or 0),
        "small_file_fraction": round(
            (agg["small_files"] or 0) / files, 3) if files else 0.0,
        "snapshots": len(snaps),
        "snapshots_off_ancestry": len(off_ancestry),
        "staged_pending": staged_pending,
        "partition_spec": meta.partition_spec,
        "max_partition_mb": round((pmax or 0) / 1048576, 2),
        "engine_ms": None,  # filled at the end
    }
    if cluster_column:
        from open_finance_lakehouse_spark.operators.cluster import (
            clustering_quality,
        )

        signals["stat_overlap"] = round(
            clustering_quality(table, cluster_column), 3)

    advice: list[str] = []
    if files and signals["small_file_fraction"] > SMALL_FILE_RATIO_WARN:
        advice.append(
            f"compact: {signals['small_files']}/{files} files are under "
            f"{small_threshold // 1048576} MiB — run `compact` "
            f"(target {target_bytes // 1048576} MiB)")
    if cluster_column and signals.get("stat_overlap", 0) > OVERLAP_WARN:
        advice.append(
            f"cluster: mean min/max overlap on {cluster_column!r} is "
            f"{signals['stat_overlap']} — Z-order/Hilbert clustering "
            "would tighten file skipping")
    if len(snaps) > SNAPSHOT_DEBT_WARN or off_ancestry:
        advice.append(
            f"expire: {len(snaps)} snapshots in the log "
            f"({len(off_ancestry)} off-ancestry, immediately expirable) — "
            "run `expire` + orphan GC")
    if staged_pending:
        advice.append(
            f"audit: {len(staged_pending)} staged snapshot(s) pending "
            f"publish/drop: {staged_pending} — they pin files until "
            "decided")
    if meta.partition_spec is not None:
        # read the cap at call time so deployments (and tests) that tune
        # cluster.LOCAL_SORT_MAX_PARTITION_BYTES see consistent advice
        # (importlib: the package re-exports a `cluster` FUNCTION, which
        # shadows the module under `from ... import cluster`)
        import importlib

        _cl = importlib.import_module(
            "open_finance_lakehouse_spark.operators.cluster")

        cap = _cl.LOCAL_SORT_MAX_PARTITION_BYTES
        if pmax and pmax > cap:
            import math

            total = int(agg["bytes"] or 0)
            # size buckets at ~half the cap so clustering stays on the
            # exchange-free local-sort path with headroom for growth
            want = max(1, math.ceil(total / (cap // 2)))
            suggested = 1 << (want - 1).bit_length()  # next power of two
            cur_n = int(meta.partition_spec.get("num_buckets", 0))
            if suggested <= cur_n:
                suggested = cur_n * 2
            advice.append(
                f"re-bucket: largest partition is "
                f"{signals['max_partition_mb']} MB, over the local-sort "
                f"cap ({cap >> 20} MB) — clustering auto-routes to the "
                "range exchange (every byte transits shuffle storage; "
                "measured 1.68x slower at sf10) — run "
                f"`rewrite-partitioning` to ~{suggested} buckets "
                f"(~{cap >> 21} MB/partition)")
    if meta.partition_spec is None and files > 64:
        advice.append(
            "partitioning: table is unpartitioned — bucket-partitioning "
            "the natural key enables point-lookup pruning and co-located "
            "MERGE (`rewrite-partitioning`)")
    if not advice:
        advice.append("healthy: no maintenance indicated")

    signals["engine_ms"] = int((time.monotonic() - t0) * 1000)
    return {"operation": "doctor", "signals": signals, "advice": advice}
