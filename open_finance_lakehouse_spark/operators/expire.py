"""Snapshot expiry + orphan-file GC as a checkpointed maintenance job.

The reference's ``VACUUM ... RETAIN n HOURS``
(/root/reference/ofl/transform/spark/silver.py:372-373) collapses retention
and deletion into one proprietary call; ours is the explicit two-phase
Iceberg-style split implemented in ``LakeTable``:

  1. ``expire_snapshots`` — drop snapshot log entries (current + last-N
     always survive; readers of retained snapshots keep every file they can
     reach — snapshot isolation);
  2. ``delete_orphans`` — reachability walk over remaining manifests, delete
     unreferenced data/manifest files, with a modification-time grace window
     protecting concurrently-staged uncommitted files.

This wrapper adds job metrics + a ledger record so expiry participates in
the same resume/metrics discipline as the rewrite operators.
"""

from __future__ import annotations

import time

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.plans.ledger import (
    STATUS_COMMITTED,
    CheckpointLedger,
    CheckpointRecord,
)

# staged-but-uncommitted data files land in data/ BEFORE their snapshot
# commit; a zero-grace GC racing a concurrent writer would delete its
# in-flight files and corrupt the commit (r1 ADVICE). Default to a
# conservative window (Iceberg's orphan cleanup defaults to days); tests
# and single-writer benches pass 0 explicitly.
DEFAULT_GC_GRACE_MS = 60 * 60 * 1000


def expire(
    table: LakeTable,
    ledger: CheckpointLedger,
    job_id: str,
    retain_last: int = 2,
    older_than_ms: int | None = None,
    gc_grace_ms: int = DEFAULT_GC_GRACE_MS,
    dry_run_gc: bool = False,
) -> dict:
    t0 = time.monotonic()
    expired = table.expire_snapshots(retain_last=retain_last,
                                     older_than_ms=older_than_ms)
    orphans = table.delete_orphans(grace_ms=gc_grace_ms, dry_run=dry_run_gc)
    engine_ms = int((time.monotonic() - t0) * 1000)
    ledger.upsert(CheckpointRecord(
        job_id=job_id, table=table.meta.name, partition_id="__snapshots__",
        file_set_hash="", status=STATUS_COMMITTED,
        files_in=0 if dry_run_gc else len(orphans), engine_ms=engine_ms,
        committed_snapshot_id=table.current_snapshot_id(),
    ))
    # lineage grain is one row per files_OUT entry — deletions go there
    # (as the consumed/removed artifact of the expire), else the call
    # would emit ZERO rows and GC'd paths would be unrecorded anywhere.
    # A dry-run GC deleted NOTHING: recording its preview as deletions
    # would leave a permanent audit trail of a sweep that never ran.
    if not dry_run_gc:
        ledger.append_lineage(job_id, "__snapshots__", [], orphans,
                              "expire")
    return {
        "job_id": job_id,
        "operation": "expire",
        "expired_snapshots": expired,
        ("orphans_previewed" if dry_run_gc else "orphans_deleted"):
            len(orphans),
        "engine_ms": engine_ms,
    }
