"""Z-order / Hilbert clustering rewrite.

Replaces the reference's proprietary ``OPTIMIZE ... ZORDER BY (series_id,
date)`` (/root/reference/ofl/transform/spark/silver.py:368-371) with an
explicit Spark plan:

  scan partition files
    → curve key via vectorized Arrow UDF (``functions.curves`` — the only
      Python in the plan, batch-vectorized; north_rule's sanctioned escape)
    → ``repartitionByRange(n_out, zval)`` (ONE shuffle, range-partitioned so
      output files tile the curve)
    → ``sortWithinPartitions(zval, clip_id)`` (deterministic tie-break —
      SURVEY.md §7.3 determinism-under-shuffle)
    → write one ~target-size file per range partition; footer min/max stats
      on the clustered dimensions become tight, which is what makes
      manifest-level file skipping selective (measured by
      ``tests/test_maintenance.py`` before/after files-read counts).

The curve key is a derived column dropped before write — the table schema
never changes; clustering is purely a physical-layout operation.

Scale: bytes move exactly once through one range exchange. Range boundaries
come from Spark's range-partition sampling, so skewed curve-key densities
still yield balanced output files; AQE handles residual skew.
"""

from __future__ import annotations

import math
import os
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.functions.curves import (
    CLIP_DIM_BOUNDS,
    curve_key_col,
)
from open_finance_lakehouse_spark.operators import binpack
from open_finance_lakehouse_spark.plans.ledger import (
    STATUS_COMMITTED,
    STATUS_REWRITING,
    CheckpointLedger,
    CheckpointRecord,
    file_set_hash,
)


def observed_bounds(files, columns=("dur_ms", "sr_hz")) -> dict:
    """Normalization bounds for the curve axes from manifest min/max stats —
    no data scan. Normalizing to the OBSERVED range gives every dimension
    full bit-resolution in the interleave (a fixed global range would leave
    narrow-domain dimensions with constant high bits and no sort influence)."""
    out = {}
    for c in columns:
        los = [f.bounds(c)[0] for f in files if f.bounds(c) is not None]
        his = [f.bounds(c)[1] for f in files if f.bounds(c) is not None]
        if los:
            lo, hi = float(min(los)), float(max(his))
            out[c] = (lo, hi if hi > lo else lo + 1.0)
    return out


def cluster_global(
    table: LakeTable,
    ledger: CheckpointLedger,
    job_id: str,
    curve: str = "zorder",
    target_bytes: int = binpack.DEFAULT_TARGET_FILE_BYTES,
) -> dict:
    """Whole-table clustering as ONE Spark job: scan all live files → curve
    key → one range exchange on (partition, zval) → sorted write → one
    atomic commit.

    This is the throughput path: fixed per-job costs (range-sampling pass,
    stage scheduling, JIT warm-up) are paid once for the table instead of
    once per partition, so wall time tracks bytes/cores — the property the
    N→4N scaling target measures. Resume granularity is the whole job
    (coarser than ``cluster``'s per-partition checkpoints); per-partition
    stats still land in the ledger for metrics parity. Equivalent to the
    reference's single ``OPTIMIZE ... ZORDER BY`` table-wide call
    (/root/reference/ofl/transform/spark/silver.py:368-371)."""
    files = table.live_files()
    totals = {
        "job_id": job_id, "operation": f"cluster_global[{curve}]",
        "partitions_planned": len({f.partition for f in files}),
        "partitions_rewritten": 0, "partitions_skipped": 0,
        "files_in": len(files), "files_out": 0,
        "bytes_in": sum(f.file_size_bytes for f in files),
        "bytes_out": 0, "rows": 0, "engine_ms": 0,
    }
    if not files:
        return totals
    paths_rel = [f.file_path for f in files]
    fingerprint = file_set_hash([f"{curve}:{p}" for p in paths_rel])
    if ledger.is_committed(job_id, "__table__", fingerprint):
        totals["partitions_skipped"] = totals["partitions_planned"]
        return totals

    t0 = time.monotonic()
    bounds = {**CLIP_DIM_BOUNDS, **observed_bounds(files)}
    bytes_in = totals["bytes_in"]
    records_in = sum(f.record_count for f in files)
    ledger.upsert(CheckpointRecord(
        job_id=job_id, table=table.meta.name, partition_id="__table__",
        file_set_hash=fingerprint, status=STATUS_REWRITING,
        files_in=len(files), bytes_in=bytes_in,
    ))
    paths = [os.path.join(table.location, p) for p in paths_rel]
    df = table.spark.read.schema(table._empty_df().schema).parquet(*paths)
    n_out = max(1, math.ceil(bytes_in / target_bytes))
    rpf = binpack.records_per_file(bytes_in, records_in, target_bytes)
    clustered = (
        df.withColumn("__part", table.partition_value_col())
        .withColumn("__zval", curve_key_col(curve, bounds))
        .repartitionByRange(n_out, "__part", "__zval")
        .sortWithinPartitions("__part", "__zval", "clip_id")
        .drop("__zval")
        .drop("__part")
    )
    added = table.stage_dataframe(
        clustered, max_records_per_file=rpf, repartition_by_partition=False)
    snap = table.commit_rewrite(
        set(paths_rel), added, operation="cluster",
        summary={"job_id": job_id, "curve": curve, "mode": "global"})
    engine_ms = int((time.monotonic() - t0) * 1000)

    # per-partition ledger records (metrics grain preserved) + job record
    by_out: dict[str, list] = {}
    for a in added:
        by_out.setdefault(a.partition, []).append(a)
    for part, outs in sorted(by_out.items()):
        ledger.append_lineage(job_id, f"part={part}", paths_rel,
                              [a.file_path for a in outs], "cluster")
    ledger.upsert(CheckpointRecord(
        job_id=job_id, table=table.meta.name, partition_id="__table__",
        file_set_hash=fingerprint, status=STATUS_COMMITTED,
        rows=sum(a.record_count for a in added),
        bytes_in=bytes_in, bytes_out=sum(a.file_size_bytes for a in added),
        files_in=len(files), files_out=len(added),
        engine_ms=engine_ms, committed_snapshot_id=snap.snapshot_id,
        output_file_set_hash=file_set_hash(
            [f"{curve}:{a.file_path}" for a in added]),
    ))
    totals.update(
        partitions_rewritten=totals["partitions_planned"],
        files_out=len(added),
        bytes_out=sum(a.file_size_bytes for a in added),
        rows=sum(a.record_count for a in added),
        engine_ms=engine_ms,
    )
    return totals


def cluster(
    table: LakeTable,
    ledger: CheckpointLedger,
    job_id: str,
    curve: str = "zorder",
    target_bytes: int = binpack.DEFAULT_TARGET_FILE_BYTES,
    concurrency: int = 8,
) -> dict:
    """Rewrite every partition sorted by the space-filling-curve key."""
    by_part: dict[str, list] = {}
    all_files = table.live_files()
    for f in all_files:
        by_part.setdefault(f.partition, []).append(f)
    bounds = {**CLIP_DIM_BOUNDS, **observed_bounds(all_files)}

    totals = {
        "job_id": job_id,
        "operation": f"cluster[{curve}]",
        "partitions_planned": len(by_part),
        "partitions_rewritten": 0,
        "partitions_skipped": 0,
        "files_in": 0,
        "files_out": 0,
        "bytes_in": 0,
        "bytes_out": 0,
        "rows": 0,
        "engine_ms": 0,
    }
    if not by_part:
        return totals

    def work(part):
        files = by_part[part]
        paths_rel = [f.file_path for f in files]
        fingerprint = file_set_hash([f"{curve}:{p}" for p in paths_rel])
        part_id = f"part={part}"
        if ledger.is_committed(job_id, part_id, fingerprint):
            return None

        t0 = time.monotonic()
        bytes_in = sum(f.file_size_bytes for f in files)
        records_in = sum(f.record_count for f in files)
        ledger.upsert(CheckpointRecord(
            job_id=job_id, table=table.meta.name, partition_id=part_id,
            file_set_hash=fingerprint, status=STATUS_REWRITING,
            files_in=len(files), bytes_in=bytes_in,
        ))

        paths = [os.path.join(table.location, p) for p in paths_rel]
        df = table.spark.read.schema(table._empty_df().schema).parquet(*paths)
        n_out = max(1, math.ceil(bytes_in / target_bytes))
        rpf = binpack.records_per_file(bytes_in, records_in, target_bytes)
        clustered = (
            df.withColumn("__zval", curve_key_col(curve, bounds))
            .repartitionByRange(n_out, "__zval")
            .sortWithinPartitions("__zval", "clip_id")
            .drop("__zval")
        )
        added = table.stage_dataframe(
            clustered,
            max_records_per_file=rpf,
            repartition_by_partition=False,
        )
        snap = table.commit_rewrite(
            set(paths_rel), added, operation="cluster",
            summary={"job_id": job_id, "curve": curve, "partition": part},
        )
        engine_ms = int((time.monotonic() - t0) * 1000)

        ledger.append_lineage(job_id, part_id, paths_rel,
                              [a.file_path for a in added], "cluster")
        ledger.upsert(CheckpointRecord(
            job_id=job_id, table=table.meta.name, partition_id=part_id,
            file_set_hash=fingerprint, status=STATUS_COMMITTED,
            rows=sum(a.record_count for a in added),
            bytes_in=bytes_in,
            bytes_out=sum(a.file_size_bytes for a in added),
            files_in=len(files), files_out=len(added),
            engine_ms=engine_ms, committed_snapshot_id=snap.snapshot_id,
            # output fingerprint: a re-run whose input IS this output is a
            # no-op (the partition is already clustered on this curve)
            output_file_set_hash=file_set_hash(
                [f"{curve}:{a.file_path}" for a in added]),
        ))
        return {
            "files_in": len(files), "files_out": len(added),
            "bytes_in": bytes_in,
            "bytes_out": sum(a.file_size_bytes for a in added),
            "rows": sum(a.record_count for a in added),
        }

    # concurrent partition rewrites: parallel staging, serialized commits
    # (same rationale as operators.compact — keep the cluster busy when
    # individual partitions are small); engine_ms = execute-phase wall time
    t0 = time.monotonic()
    with ThreadPoolExecutor(
            max_workers=min(concurrency, len(by_part))) as ex:
        results = list(ex.map(work, sorted(by_part)))
    totals["engine_ms"] = int((time.monotonic() - t0) * 1000)
    for res in results:
        if res is None:
            totals["partitions_skipped"] += 1
            continue
        totals["partitions_rewritten"] += 1
        for k, v in res.items():
            totals[k] += v
    return totals


def clustering_quality(table: LakeTable, column: str = "dur_ms") -> float:
    """Mean pairwise min/max overlap fraction across files — lower = better
    clustered. Used by tests to assert clustering actually tightened stats."""
    files = table.live_files()
    bounds = [f.bounds(column) for f in files]
    bounds = [b for b in bounds if b is not None]
    if len(bounds) < 2:
        return 0.0
    overlaps = 0
    pairs = 0
    for i in range(len(bounds)):
        for j in range(i + 1, len(bounds)):
            pairs += 1
            lo = max(bounds[i][0], bounds[j][0])
            hi = min(bounds[i][1], bounds[j][1])
            if lo <= hi:
                overlaps += 1
    return overlaps / pairs if pairs else 0.0
