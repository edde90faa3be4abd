"""Copy-on-write MERGE INTO with salted skew mitigation.

Semantics follow the reference's keystone operator — natural-key upsert
``merge(source).whenMatchedUpdateAll().whenNotMatchedInsertAll()``
(/root/reference/ofl/transform/spark/silver.py:94-101, repeated for every
fact) — extended per the north_rule with a DELETE arm and explicit skew
handling for hot ``clip_id`` ranges:

Source contract: the table's columns plus
  ``op``  STRING  ∈ {'U','D'}   (upsert / delete)
  ``seq``  LONG    monotone version — ties broken deterministically.

Phases (each partition is an independently committed, checkpointed task —
file-granularity resume):

1. **Latest-per-key dedup, salted.** The reference dedups the merge source
   with one row_number window (/root/reference/ofl/transform/spark/silver.py:67-72);
   at 10^12-clip scale a hot clip_id repeated millions of times in the source
   makes that single groupBy's hottest reducer the job's critical path. We
   reduce in two stages: ``groupBy(clip_id, salt)`` partial ``max_by`` then
   ``groupBy(clip_id)`` final ``max_by`` — the classic salted two-phase
   combine; salt is a deterministic function of ``seq`` so replay is stable.
   ``max_by(struct(all), struct(seq, op))`` keeps the pick deterministic
   under shuffle (reference's min_by/max_by discipline,
   /root/reference/ofl/streaming/silver.py:110-114).

2. **File-level pruning.** Only target files whose ``clip_id`` min/max range
   (manifest footer stats) overlaps a source key are rewritten; the check is
   a broadcast range-join of the file-bounds inventory against source keys —
   never a full-table scan.

3. **Copy-on-write join.** Touched files full-outer-joined with the deduped
   source on clip_id (unique on both sides after dedup, so no join-key
   explosion; AQE skew-join splits any residual partition skew):
   matched+U → source row, matched+D → dropped, target-only → kept,
   source-only+U → insert, source-only+D → no-op.

4. **Commit** removes exactly the touched files, adds staged files, records
   checkpoint + lineage.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.operators import binpack
from open_finance_lakehouse_spark.plans.ledger import (
    STATUS_COMMITTED,
    STATUS_REWRITING,
    CheckpointLedger,
    CheckpointRecord,
    file_set_hash,
)

MERGE_EXTRA_COLS = ("op", "seq")


def choose_salt_count(source: DataFrame, key: str = "clip_id",
                      rows_per_reducer: int = 1_000_000) -> int:
    """Planner-chosen salt count from the observed hottest key (SURVEY.md
    §7.3: salt count from observed histograms, not a hardcoded constant)."""
    hottest = (
        source.groupBy(key).count().agg(F.max("count").alias("m")).first()["m"]
    )
    if not hottest:
        return 1
    return max(1, min(64, -(-int(hottest) // rows_per_reducer)))


def dedup_latest_salted(source: DataFrame, key: str = "clip_id",
                        n_salts: int | None = None) -> DataFrame:
    """Two-phase salted latest-per-key reduction of the merge source."""
    data_cols = [c for c in source.columns]
    if n_salts is None:
        n_salts = choose_salt_count(source, key)
    payload = F.struct(*[F.col(c) for c in data_cols]).alias("payload")
    rank = F.struct(F.col("seq"), F.col("op")).alias("rank")
    salted = source.select(
        F.col(key),
        F.pmod(F.xxhash64(F.col("seq").cast("string")), F.lit(n_salts))
         .alias("__salt"),
        payload, rank,
    )
    partial = (
        salted.groupBy(key, "__salt")
        .agg(F.expr("max_by(payload, rank)").alias("payload"),
             F.max("rank").alias("rank"))
    )
    final = (
        partial.groupBy(key)
        .agg(F.expr("max_by(payload, rank)").alias("payload"))
        .select("payload.*")
    )
    return final


def _touched_files_by_partition(
    table: LakeTable, source_keys: DataFrame
) -> dict[str, list[str]]:
    """Partition → target file paths whose clip_id range may contain a
    source key. Broadcast range-join of file bounds against keys."""
    bounds = []
    for f in table.live_files():
        b = f.bounds("clip_id")
        lo, hi = (b if b is not None else (None, None))
        bounds.append((f.file_path, f.partition, lo, hi))
    if not bounds:
        return {}
    files_df = table.spark.createDataFrame(
        bounds, "file_path string, partition string, lo string, hi string"
    )
    hit = (
        source_keys.select("clip_id").distinct()
        .join(
            F.broadcast(files_df),
            (files_df.lo.isNull())
            | ((F.col("clip_id") >= files_df.lo)
               & (F.col("clip_id") <= files_df.hi)),
        )
        .select("file_path", "partition")
        .distinct()
        .collect()
    )
    out: dict[str, list[str]] = {}
    for r in hit:
        out.setdefault(r["partition"], []).append(r["file_path"])
    return out


def merge_into(
    table: LakeTable,
    source: DataFrame,
    ledger: CheckpointLedger,
    job_id: str,
    n_salts: int | None = None,
    target_bytes: int = binpack.DEFAULT_TARGET_FILE_BYTES,
    source_token: str = "",
) -> dict:
    """Execute the salted MERGE. ``source_token`` fingerprints the source
    batch (e.g. its input-file hash) so replays of the same batch are
    skipped per partition."""
    data_cols = [c for c in table._empty_df().columns]
    src = dedup_latest_salted(source, n_salts=n_salts)

    # route each source row to its target partition (same function the
    # writer uses, so inserts land in the right bucket)
    src = src.withColumn("__part", table.partition_value_col())
    src.persist()
    try:
        src_parts = [r["__part"] for r in src.select("__part").distinct().collect()]
        touched = _touched_files_by_partition(table, src)

        totals = {
            "job_id": job_id, "operation": "merge",
            "partitions_planned": len(src_parts), "partitions_rewritten": 0,
            "partitions_skipped": 0, "files_in": 0, "files_out": 0,
            "bytes_in": 0, "bytes_out": 0, "rows": 0, "engine_ms": 0,
            "upserts": 0, "deletes": 0,
        }
        for part in sorted(src_parts):
            files = sorted(touched.get(part, []))
            # idempotence key is (job_id, partition, source batch) — NOT the
            # current file list: a replayed batch must be a no-op even though
            # the first run already rewrote the files (Delta's
            # txnAppId/txnVersion semantics,
            # /root/reference/ofl/streaming/bronze.py:185-194)
            fingerprint = file_set_hash([f"merge:{source_token}"])
            part_id = f"part={part}"
            if ledger.is_committed(job_id, part_id, fingerprint):
                totals["partitions_skipped"] += 1
                continue

            t0 = time.monotonic()
            ledger.upsert(CheckpointRecord(
                job_id=job_id, table=table.meta.name, partition_id=part_id,
                file_set_hash=fingerprint, status=STATUS_REWRITING,
                files_in=len(files),
            ))

            src_p = src.filter(F.col("__part") == part)
            s = src_p.select(
                F.col("clip_id"),
                F.col("op").alias("__s_op"),
                *[F.col(c).alias(f"__s_{c}")
                  for c in data_cols if c != "clip_id"],
            )
            if files:
                paths = [os.path.join(table.location, p) for p in files]
                tgt = table.spark.read.schema(
                    table._empty_df().schema).parquet(*paths)
            else:
                tgt = table._empty_df()

            j = tgt.join(s, "clip_id", "full_outer")
            survives = j.filter(
                F.col("__s_op").isNull() | (F.col("__s_op") == "U"))
            merged = survives.select(
                "clip_id",
                *[
                    F.when(F.col("__s_op") == "U", F.col(f"__s_{c}"))
                    .otherwise(F.col(c)).alias(c)
                    for c in data_cols if c != "clip_id"
                ],
            )
            added = table.stage_dataframe(
                merged, max_records_per_file=None,
                repartition_by_partition=False,
            )
            if files:
                snap = table.commit_rewrite(
                    set(files), added, operation="merge",
                    summary={"job_id": job_id, "partition": part})
            else:
                snap = table.commit_append(
                    added, summary={"job_id": job_id, "partition": part,
                                    "operation": "merge"})
            engine_ms = int((time.monotonic() - t0) * 1000)

            ledger.append_lineage(job_id, part_id, files,
                                  [a.file_path for a in added], "merge")
            ledger.upsert(CheckpointRecord(
                job_id=job_id, table=table.meta.name, partition_id=part_id,
                file_set_hash=fingerprint, status=STATUS_COMMITTED,
                rows=sum(a.record_count for a in added),
                bytes_out=sum(a.file_size_bytes for a in added),
                files_in=len(files), files_out=len(added),
                engine_ms=engine_ms, committed_snapshot_id=snap.snapshot_id,
            ))
            totals["partitions_rewritten"] += 1
            totals["files_in"] += len(files)
            totals["files_out"] += len(added)
            totals["rows"] += sum(a.record_count for a in added)
            totals["engine_ms"] += engine_ms
        return totals
    finally:
        src.unpersist()
