"""Predicate-driven DELETE with three-tier file planning.

The reference deletes rows only through MERGE's delete arm
(/root/reference/ofl/transform/spark/silver.py:154-161 routes a source
``op='D'`` row through ``whenMatchedDelete``) — fine when the deletions
arrive as a keyed change batch, but a RETENTION or compliance delete is a
*predicate*, not a key list: "drop every clip shorter than 250 ms",
"purge everything ingested before 2024".  At 10^12-clip scale the whole
game is never touching bytes the predicate already decides about, so the
planner classifies every live file into one of three tiers from manifest
stats alone:

1. **untouched** — some conjunct's [lo, hi] cannot overlap the file's
   [min, max] (or, on the bucket-partition column, the literal hashes to
   a different bucket): no row can match, the file is not even read.
2. **full drop (metadata-only)** — every conjunct's range CONTAINS the
   file's [min, max] AND the manifest proves ``null_count == 0`` for each
   predicate column (a null never satisfies a predicate, so bounds alone
   would wrongly delete null rows — the reason Iceberg tracks
   null_value_counts).  The file is removed from the manifest without a
   single byte read: a date-range retention delete on a time-clustered
   table is ~all this tier.
3. **rewrite (copy-on-write)** — the file may contain both matching and
   surviving rows: read it, keep rows where the predicate is NOT
   satisfied (SQL semantics — NULL predicate outcomes survive), stage the
   survivors, swap old for new.

All tiers land in ONE atomic ``commit_rewrite`` snapshot — a DELETE is a
single user-visible transaction, unlike compaction where per-partition
commits are safe because each is row-preserving.  On ``CommitConflict``
(a concurrent writer rewrote a planned file) the staged survivors are
discarded and the conflict re-raised: the caller re-runs, and the run
replans against the new head (``refresh()`` at plan time).  Re-running a
delete with the same predicate is naturally idempotent — already-deleted
rows simply no longer match.

``residual`` extends the predicate with an arbitrary row-level condition
the stats language can't express (regex on transcript, arithmetic over
columns).  It disables tier 2 — a residual can never be proven true from
bounds — but tier-1 pruning on the ColumnRange conjuncts still stands.
"""

from __future__ import annotations

import time

from pyspark.sql import Column
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import (
    ColumnRange,
    LakeTable,
)
from open_finance_lakehouse_spark.plans.ledger import (
    STATUS_COMMITTED,
    CheckpointLedger,
    CheckpointRecord,
    file_set_hash,
)


def _proves_full_match(f, predicates: list[ColumnRange]) -> bool:
    """Stats prove EVERY row of the file satisfies every conjunct."""
    for p in predicates:
        if p.null_test is not None:
            # null tests prove from COUNTS alone: bounds are irrelevant
            # and the nulls==0 requirement below inverts for IS NULL
            if not p.proves_all_nulls(f.nulls(p.column), f.record_count):
                return False
            continue
        if f.nulls(p.column) != 0:  # unknown (None) or >0: not provable
            return False
        if not p.proves_all(f.bounds(p.column)):
            return False
    return True


def _arm_candidates(table: LakeTable,
                    predicates: list[ColumnRange],
                    files=None) -> tuple[list, int]:
    candidates, total = table.plan_files(predicates=predicates or None,
                                         files=files)
    # a file whose RANGE-predicate column is entirely null can't match
    # (bounds are absent there, so plan_files keeps it conservatively) —
    # null-TEST predicates are excluded: an all-null file is exactly what
    # IS NULL matches, and plan_files already pruned those by counts
    return [
        f for f in candidates
        if not any(f.bounds(p.column) is None
                   and f.nulls(p.column) == f.record_count
                   for p in predicates if p.null_test is None)
    ], total


def plan_delete(table: LakeTable,
                predicates: list[ColumnRange],
                residual: "str | Column | None" = None,
                any_of: "list[list[ColumnRange]] | None" = None) -> dict:
    """Classify live files into the three tiers. Pure metadata — no data
    read. Returns ``{"full": [DataFile], "rewrite": [DataFile],
    "untouched": int, "total": int}``.

    ``any_of`` carries a DISJUNCTION of conjunct arms (``WHERE (a AND b)
    OR c``): a file is a candidate iff SOME arm's ranges overlap it (the
    candidate set is the union of per-arm stats+bucket pruning), and —
    when ``residual`` is None, i.e. every arm lifted exactly — drops
    metadata-only iff SOME arm provably matches every row (sound: that
    arm alone satisfies the OR). Mutually exclusive with ``predicates``."""
    if any_of and predicates:
        raise ValueError("pass conjuncts (predicates) OR arms (any_of), "
                         "not both")
    if not predicates and not any_of and residual is None:
        raise ValueError(
            "delete_where with no predicate would truncate the table; "
            "use replace()/publish for that, explicitly")
    if any_of and residual is None and any(not arm for arm in any_of):
        # an empty arm means "this arm matches everything": with no
        # residual the OR is unconditionally true — the accidental
        # truncate the guard above exists to refuse
        raise ValueError(
            "any_of contains an empty arm with no residual — that arm "
            "matches every row, making the delete a table truncate; use "
            "replace()/publish for that, explicitly")
    if any_of:
        inventory = table.live_files()  # one manifest read for ALL arms
        by_path, total = {}, 0
        arms_of: dict[str, list] = {}
        for arm in any_of:
            cand, total = _arm_candidates(table, arm, files=inventory)
            for f in cand:
                by_path[f.file_path] = f
                arms_of.setdefault(f.file_path, []).append(arm)
        full, rewrite = [], []
        for path in sorted(by_path):
            f = by_path[path]
            if residual is None and any(
                    arm and _proves_full_match(f, arm)
                    for arm in arms_of[path]):
                full.append(f)
            else:
                rewrite.append(f)
        return {"full": full, "rewrite": rewrite,
                "untouched": total - len(full) - len(rewrite),
                "total": total}
    candidates, total = _arm_candidates(table, predicates)
    full, rewrite = [], []
    for f in candidates:
        if residual is None and predicates and _proves_full_match(f, predicates):
            full.append(f)
        else:
            rewrite.append(f)
    return {"full": full, "rewrite": rewrite,
            "untouched": total - len(full) - len(rewrite), "total": total}


def row_condition(predicates, residual,
                  any_of: "list[list[ColumnRange]] | None" = None) -> Column:
    """The row-level match condition shared by DELETE and UPDATE.

    Conjunct path: predicates AND residual (the documented API contract —
    the residual EXTENDS the ranges; run_dml's relaxed strict-bound lifts
    are supersets, so the conjunction stays exact).  Arm path (``any_of``):
    the residual alone when present — it is the exact original WHERE,
    while the arm union is a pruning superset; without one every arm
    lifted exactly and the condition is the OR of arm conjunctions."""
    if any_of:
        if residual is not None:
            return (F.expr(residual) if isinstance(residual, str)
                    else residual)
        cond = F.lit(False)
        for arm in any_of:
            arm_cond = F.lit(True)
            for p in arm:
                arm_cond = arm_cond & p.to_spark_filter()
            cond = cond | arm_cond
        return cond
    cond = F.lit(True)
    for p in predicates or []:
        cond = cond & p.to_spark_filter()
    if residual is not None:
        cond = cond & (F.expr(residual) if isinstance(residual, str)
                       else residual)
    return cond


def delete_where(
    table: LakeTable,
    ledger: CheckpointLedger,
    job_id: str,
    predicates: list[ColumnRange] | None = None,
    residual: "str | Column | None" = None,
    max_records_per_file: int | None = None,
    retries: int = 2,
    any_of: "list[list[ColumnRange]] | None" = None,
) -> dict:
    """Execute the DELETE as one atomic snapshot; returns tier counters
    and ``rows_deleted``.

    ``retries``: a CommitConflict (a concurrent rewrite took a planned
    file out of the live set) discards the staged survivors, refreshes,
    REPLANS against the new head, and tries again up to this many times
    — Iceberg's commit.retry discipline; the predicate decides the same
    logical rows whatever physical files now hold them, so a replanned
    retry is semantically identical.  ``retries=0`` restores raise-on-
    first-conflict (pure atomic abort)."""
    from open_finance_lakehouse_spark.format.table import CommitConflict

    for attempt in range(retries + 1):
        try:
            return _delete_once(table, ledger, job_id, predicates,
                                residual, max_records_per_file, any_of)
        except CommitConflict:
            if attempt == retries:
                raise
            # staged output was already discarded by _delete_once;
            # refresh happens at the top of the next attempt's plan


def _delete_once(
    table: LakeTable,
    ledger: CheckpointLedger,
    job_id: str,
    predicates,
    residual,
    max_records_per_file,
    any_of=None,
) -> dict:
    t0 = time.monotonic()
    table.refresh()  # plan against the current head (compact discipline)
    predicates = predicates or []
    plan = plan_delete(table, predicates, residual, any_of=any_of)
    full, rewrite = plan["full"], plan["rewrite"]

    totals = {
        "job_id": job_id, "operation": "delete",
        "files_untouched": plan["untouched"],
        "files_full_dropped": len(full), "files_rewritten": len(rewrite),
        "files_out": 0, "rows_deleted": 0, "rows_kept": 0,
        "bytes_in": sum(f.file_size_bytes for f in (full + rewrite)),
        "bytes_out": 0, "engine_ms": 0,
    }
    if not full and not rewrite:
        totals["engine_ms"] = int((time.monotonic() - t0) * 1000)
        return totals  # nothing matches: no new snapshot

    cond = row_condition(predicates, residual, any_of)

    added = []
    rewrite_rows_in = sum(f.record_count for f in rewrite)
    if rewrite:
        import os

        paths = [os.path.join(table.location, f.file_path) for f in rewrite]
        df = table.spark.read.schema(table.meta.schema_ddl).parquet(*paths)
        # survivors: predicate FALSE *or NULL* — null-safe negation, the
        # SQL DELETE contract (a NULL comparison outcome keeps the row)
        survivors = df.filter(~cond.eqNullSafe(F.lit(True)))
        # routed write: survivors may span partitions; the dynamic write
        # re-derives each row's bucket with the same hash the original
        # writer used, so placement is identical
        added = table.stage_dataframe(
            survivors, max_records_per_file=max_records_per_file,
            repartition_by_partition=len(rewrite) > 1)

    removed = {f.file_path for f in full} | {f.file_path for f in rewrite}
    try:
        snap = table.commit_rewrite(
            removed, added, operation="delete",
            summary={"job_id": job_id,
                     "deleted_full_files": len(full),
                     "rewritten_files": len(rewrite)})
    except Exception:
        table._discard_staged(added, [])
        raise

    rows_kept = sum(a.record_count for a in added)
    totals["files_out"] = len(added)
    totals["rows_kept"] = rows_kept
    totals["rows_deleted"] = (sum(f.record_count for f in full)
                              + rewrite_rows_in - rows_kept)
    totals["bytes_out"] = sum(a.file_size_bytes for a in added)
    totals["engine_ms"] = int((time.monotonic() - t0) * 1000)
    totals["snapshot_id"] = snap.snapshot_id

    in_paths = sorted(removed)
    ledger.append_lineage(job_id, "__delete__", in_paths,
                          [a.file_path for a in added] or ["__dropped__"],
                          "delete")
    ledger.upsert(CheckpointRecord(
        job_id=job_id, table=table.meta.name, partition_id="__delete__",
        file_set_hash=file_set_hash(in_paths), status=STATUS_COMMITTED,
        rows=totals["rows_deleted"], bytes_in=totals["bytes_in"],
        bytes_out=totals["bytes_out"], files_in=len(in_paths),
        files_out=len(added), engine_ms=totals["engine_ms"],
        committed_snapshot_id=snap.snapshot_id,
    ))
    return totals
