"""Table-as-incremental-source: the silver hop consumes only snapshots
committed since the last one it processed (SURVEY.md S8).

The reference's silver STREAMS FROM THE BRONZE TABLE, inheriting
exactly-once from the table's transaction log
(/root/reference/ofl/streaming/silver.py:186-233: readStream on the bronze
delta table, checkpoint-tracked). The frost-format equivalent: the snapshot
log IS the change log — an append snapshot's manifest diff against its
parent names exactly the files its commit added, so "rows since snapshot
S" is a plain parquet scan of the added files of every later append
snapshot. The consumer records the last processed snapshot id in the
checkpoint ledger; a replayed drain re-reads nothing (measured no-op), and
an interrupted drain resumes from the last COMMITTED position because the
position record lands only after the derived table's publish commits.

Incremental reads require an append-only interval (Iceberg's incremental
read makes the same demand); a rewrite/replace snapshot in the interval
raises. ``incremental_changes`` is the CDC drain for exactly that case:
it returns the interval's row-level changes (``operators.changelog``) so
``IncrementalSilver`` recomputes only the groups a MERGE or replace
touched instead of falling back to a full rebuild.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format import manifests as mf
from open_finance_lakehouse_spark.format.metadata import Snapshot
from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.plans.ledger import (
    STATUS_COMMITTED,
    CheckpointLedger,
    CheckpointRecord,
)


class NonAppendInterval(Exception):
    """A non-append snapshot sits between the cursor and the head — the
    interval has no pure row-delta; consumers must recompute fully."""


def ancestry_interval(meta, start_id: int | None, end_id: int | None
                      ) -> list[Snapshot]:
    """Snapshots on the CURRENT ancestry chain in (start, end], oldest
    first — the parent-chain walk, NOT a raw id range: snapshots on a
    branch abandoned by rollback stay in the log until expire, and an
    id-range scan would deliver their rows as if committed (phantom
    reads). Raises when the start cursor is not an ancestor of ``end``
    (expired from the log, or a rollback crossed it) — refusing loudly
    beats silently skipping whatever history was dropped."""
    if end_id is None or end_id == start_id:
        return []
    by_id = {s.snapshot_id: s for s in meta.snapshots}
    chain: list[Snapshot] = []
    cur = end_id
    while cur is not None and cur != start_id:
        snap = by_id.get(cur)
        if snap is None:
            raise ValueError(
                f"snapshot {cur} missing from the log while walking "
                f"{end_id} -> {start_id}: the cursor expired or a rollback "
                "crossed it — retention must exceed the consumer lag")
        chain.append(snap)
        cur = snap.parent_id
    if cur != start_id and not (cur is None and not start_id):
        raise ValueError(
            f"cursor snapshot {start_id} is not an ancestor of {end_id}")
    return list(reversed(chain))


def snapshots_since(table: LakeTable, since_snapshot_id: int | None
                    ) -> list[Snapshot]:
    """Snapshots after the cursor on the current ancestry chain, oldest
    first (current metadata)."""
    if (since_snapshot_id is not None
            and all(s.snapshot_id != since_snapshot_id
                    for s in table.meta.snapshots)):
        raise ValueError(
            f"cursor snapshot {since_snapshot_id} expired from the log — "
            "the retention window must exceed the consumer lag")
    return ancestry_interval(table.meta, since_snapshot_id,
                             table.meta.current_snapshot_id)


def added_entries(location: str, meta, snap: Snapshot) -> list[mf.DataFile]:
    """Files a snapshot added = entries of manifests not in its parent.
    Manifests are immutable and reused by path across commits, so the
    path-set diff is exact. (Shared by the ledger-cursor consumer and the
    ``format("frost")`` streaming source.)"""
    parent = next((s for s in meta.snapshots
                   if s.snapshot_id == snap.parent_id), None)
    if snap.parent_id is not None and parent is None:
        # the parent expired while this child stayed retained (expire
        # keeps the last K chain ancestors): with no parent manifests to
        # diff against, EVERY manifest would read as 'added' and the
        # consumer would silently re-deliver the whole table state —
        # the worst failure a changelog can have. Refuse loudly.
        raise ValueError(
            f"snapshot {snap.snapshot_id}'s parent {snap.parent_id} has "
            "been expired from the log — the added-files diff cannot be "
            "computed exactly; the retention window must exceed the "
            "consumer lag")
    parent_manifests = set(parent.manifests) if parent else set()
    out: list[mf.DataFile] = []
    for m in snap.manifests:
        if m not in parent_manifests:
            out.extend(mf.read_manifest(location, m))
    return out


def added_files(table: LakeTable, snap: Snapshot) -> list[mf.DataFile]:
    return added_entries(table.location, table.meta, snap)


# byte-moving, row-preserving maintenance operations: their added files
# carry only rows an incremental consumer has already seen (parity-gated),
# so the delta scan SKIPS them — maintenance on the source table no longer
# interrupts its consumers (mirrors format("frost")'s skipRewrites)
ROW_PRESERVING_OPS = {"rewrite", "cluster", "compact"}


def incremental_scan(
    table: LakeTable, since_snapshot_id: int | None
) -> tuple[DataFrame, int | None, dict]:
    """(rows appended since the cursor, new cursor, info). Refreshes the
    table first so the scan sees the latest committed snapshot.
    Row-preserving rewrites in the interval contribute no delta rows;
    row-CHANGING operations (merge/replace/overwrite) raise — the caller
    must fall back to a full recompute."""
    table.refresh()
    head = table.current_snapshot_id()
    if head == since_snapshot_id:
        return table._empty_df(), since_snapshot_id, {"files": 0, "snapshots": 0}
    delta = snapshots_since(table, since_snapshot_id)
    bad = [s for s in delta
           if s.operation != "append"
           and s.operation not in ROW_PRESERVING_OPS]
    if bad:
        raise NonAppendInterval(
            f"snapshots {[s.snapshot_id for s in bad]} are "
            f"{sorted({s.operation for s in bad})}, not append")
    files = [f for s in delta if s.operation == "append"
             for f in added_files(table, s)]
    if not files:
        return table._empty_df(), head, {"files": 0, "snapshots": len(delta)}
    paths = [os.path.join(table.location, f.file_path) for f in files]
    df = table.spark.read.schema(table._empty_df().schema).parquet(*paths)
    return df, head, {"files": len(files), "snapshots": len(delta),
                      "records": sum(f.record_count for f in files)}


def incremental_changes(
    table: LakeTable, since_snapshot_id: int | None
) -> tuple[DataFrame, int | None, dict]:
    """(row-level CHANGES since the cursor, new cursor, info) — the CDC
    drain. Same contract as :func:`incremental_scan` except the returned
    DataFrame carries the changelog columns (``_change_type`` et al.) and
    row-CHANGING commits (merge / replace) are handled instead of raising:
    their exact delta comes from ``operators.changelog.table_changes``,
    whose cost is bounded by the files those commits touched. Consumers
    that only need the affected-group keys may project the table columns
    and treat inserts and deletes alike (both mark a group dirty)."""
    # local import: changelog imports this module's ancestry helpers
    from open_finance_lakehouse_spark.operators.changelog import (
        _is_row_preserving,
        table_changes,
    )

    table.refresh()
    head = table.current_snapshot_id()

    def empty() -> DataFrame:
        return table_changes(table, head, head)

    if head == since_snapshot_id:
        return empty(), since_snapshot_id, {"files": 0, "snapshots": 0}
    delta = snapshots_since(table, since_snapshot_id)
    changed = [s for s in delta if not _is_row_preserving(s)]
    n_files = 0
    for s in changed:
        # the count is informational — take it from the commit summary
        # (every committer records added/removed_files) instead of
        # re-reading every manifest of both snapshots; table_changes
        # below re-derives the exact file sets anyway, so the manifest
        # I/O here was pure duplication
        summ = s.summary or {}
        if "added_files" in summ or "removed_files" in summ:
            n_files += (int(summ.get("added_files", 0))
                        + int(summ.get("removed_files", 0)))
        elif s.operation == "append":
            n_files += len(added_files(table, s))
        else:
            prev = ({f.file_path for f in table.live_files(s.parent_id)}
                    if s.parent_id is not None else set())
            cur = {f.file_path for f in table.live_files(s.snapshot_id)}
            n_files += len(prev ^ cur)
    if not changed or not n_files:
        return empty(), head, {"files": 0, "snapshots": len(delta)}
    return (table_changes(table, since_snapshot_id, head), head,
            {"files": n_files, "snapshots": len(delta), "mode": "cdc"})


class IncrementalSilver:
    """Ledger-checkpointed incremental maintenance of the minute rollup.

    Each ``drain()``:
      1. reads ONLY the bronze delta since the last committed cursor;
      2. finds the (window, symbol) groups the delta touches;
      3. recomputes exactly those groups from a stats-pruned bronze scan
         (parquet min/max on ``trade_time`` skip unaffected files);
      4. publishes via an atomic ``commit_rewrite`` of ONLY the silver
         files whose ``window_start`` range overlaps the affected windows
         (manifest-stats pruning on the rollup itself), carrying the
         cursor as a txn marker — so the publish is O(delta's windows),
         never O(silver): years of untouched rollup history are neither
         read nor rewritten (VERDICT r2 'what's wrong' #1);
      5. records the cursor in the ledger.

    Output files are kept time-clustered (global sort on ``window_start``
    before staging) so step 4's pruning stays sharp drain after drain —
    the same stats-skipping discipline the maintenance planner relies on.

    A drain with no delta is a measured no-op. A crash between 4 and 5
    replays safely: the publish's txn marker (cursor id) is checked before
    re-publishing, so the ledger record is bookkeeping, not the authority —
    the same atomic-marker discipline as the bronze ingest."""

    def __init__(self, spark, bronze: LakeTable, location: str,
                 ledger: CheckpointLedger, query_id: str = "silver-rollup",
                 window: str = "1 minute",
                 max_records_per_file: int | None = None):
        from open_finance_lakehouse_spark.streaming.ingest import ROLLUP_DDL

        self.spark = spark
        self.bronze = bronze
        self.ledger = ledger
        self.query_id = query_id
        self.window = window
        self._window_us()  # fail at construction, not mid-drain
        self.max_records_per_file = max_records_per_file
        if os.path.isdir(os.path.join(location, "metadata")):
            self.silver = LakeTable.load(spark, location)
        else:
            self.silver = LakeTable.create(spark, location,
                                           "silver_rollup", ROLLUP_DDL)

    def _cursor(self) -> int | None:
        rec = self.ledger.get(self.query_id, "__source__")
        if rec is not None and rec.status == STATUS_COMMITTED:
            return rec.committed_snapshot_id
        return None

    def drain(self) -> dict:
        from open_finance_lakehouse_spark.streaming.ingest import (
            build_minute_rollup,
        )

        t0 = time.monotonic()
        cursor = self._cursor()
        try:
            delta, head, info = incremental_scan(self.bronze, cursor)
        except NonAppendInterval:
            # a row-CHANGING commit (merge/replace) landed on bronze: the
            # interval has no pure append delta, but the CDC drain returns
            # its exact row-level changes — inserts AND deletes both mark
            # their (window, symbol) group dirty, and the recompute below
            # re-reads those groups from bronze's CURRENT state, so
            # upstream updates and deletes propagate without the full
            # recompute this path used to force
            changes, head, info = incremental_changes(self.bronze, cursor)
            delta = changes.select(self.bronze._empty_df().columns)
        if head == cursor:
            return {"query_id": self.query_id, "processed_rows": 0,
                    "delta_files": 0, "windows_recomputed": 0,
                    "cursor": cursor, "engine_ms": 0}
        if info["files"] == 0:
            # the head moved but the interval holds no row delta (pure
            # maintenance commits) — the cursor MUST still advance, or a
            # later expire of the old cursor snapshot would strand the
            # consumer on a position that no longer exists in the log
            self._record(head, 0, 0)
            return {"query_id": self.query_id, "processed_rows": 0,
                    "delta_files": 0, "windows_recomputed": 0,
                    "cursor": head, "engine_ms": 0}
        if self.silver.committed_txn(self.query_id, head):
            # crash replay: publish landed, ledger record didn't — re-record
            self._record(head, 0, 0)
            return {"query_id": self.query_id, "processed_rows": 0,
                    "delta_files": info["files"], "windows_recomputed": 0,
                    "cursor": head, "engine_ms": 0, "replayed": True}

        delta = delta.persist()
        try:
            n_delta = delta.count()
            if n_delta == 0:
                # touched files but no net row change (e.g. a replace that
                # rebuilt identical rows — the CDC diff cancels exactly):
                # nothing to recompute, but the cursor must still advance
                self._record(head, 0, 0)
                return {"query_id": self.query_id, "processed_rows": 0,
                        "delta_files": info["files"],
                        "windows_recomputed": 0, "cursor": head,
                        "engine_ms": int((time.monotonic() - t0) * 1000)}
            # the groups the delta touches; window() is the same algebra the
            # rollup uses, so group keys line up exactly
            affected = (
                delta.select(
                    F.window("trade_time", self.window).alias("w"), "symbol")
                .select(F.col("w.start").alias("window_start"), "symbol")
                .distinct()
            )
            # epoch-micros bounds computed engine-side (no tz-dependent
            # driver datetime math); manifest timestamp stats are µs longs
            lo_hi = affected.agg(
                F.min(F.unix_micros("window_start")).alias("lo"),
                F.max(F.unix_micros("window_start")).alias("hi")).first()
            from open_finance_lakehouse_spark.format.table import ColumnRange

            lo_us = int(lo_hi["lo"])
            hi_us = int(lo_hi["hi"]) + self._window_us()
            files, total = self.bronze.plan_files(predicates=[
                ColumnRange("trade_time", lo=lo_us, hi=hi_us)])
            paths = [os.path.join(self.bronze.location, f.file_path)
                     for f in files]
            scoped = (
                self.bronze.spark.read.schema(self.bronze._empty_df().schema)
                .parquet(*paths) if paths else self.bronze._empty_df()
            )
            recomputed = build_minute_rollup(scoped, window=self.window) \
                .join(F.broadcast(affected), ["window_start", "symbol"],
                      "left_semi")
            # O(delta) publish: only silver files whose window_start range
            # overlaps the affected windows are read and rewritten; every
            # other rollup file survives the commit by manifest reuse
            sfiles, s_total = self.silver.plan_files(predicates=[
                ColumnRange("window_start", lo=lo_us, hi=int(lo_hi["hi"]))])
            touched = {f.file_path for f in sfiles}
            if touched:
                spaths = [os.path.join(self.silver.location, p)
                          for p in sorted(touched)]
                scoped_silver = (self.silver.spark.read
                                 .schema(self.silver._empty_df().schema)
                                 .parquet(*spaths))
                survivors = scoped_silver.join(
                    F.broadcast(affected), ["window_start", "symbol"],
                    "left_anti")
                out = survivors.unionByName(recomputed)
            else:
                out = recomputed
            n_windows = affected.count()
            txn = {"txn_app_id": self.query_id, "txn_id": head,
                   "source_snapshot": head}
            added = self.silver.stage_dataframe(
                out.sort("window_start", "symbol"),
                max_records_per_file=self.max_records_per_file)
            if touched:
                # operation="merge", NOT the default "rewrite": this
                # commit CHANGES rows (recomputed windows), so consumers
                # of the silver table must refuse-and-recompute, never
                # skip it as row-preserving maintenance
                self.silver.commit_rewrite(touched, added,
                                           operation="merge", summary=txn)
            else:
                self.silver.commit_append(added, summary=txn)
            self._record(head, n_delta, n_windows)
            return {
                "query_id": self.query_id, "processed_rows": n_delta,
                **({"mode": info["mode"]} if "mode" in info else {}),
                "delta_files": info["files"],
                "source_files_pruned": total - len(files),
                "windows_recomputed": n_windows, "cursor": head,
                "silver_files_rewritten": len(touched),
                "silver_files_kept": s_total - len(touched),
                "engine_ms": int((time.monotonic() - t0) * 1000),
            }
        finally:
            delta.unpersist()

    _WINDOW_UNITS = {"second": 1, "seconds": 1, "minute": 60,
                     "minutes": 60, "hour": 3600, "hours": 3600,
                     "day": 86_400, "days": 86_400,
                     "week": 604_800, "weeks": 604_800}

    def _window_us(self) -> int:
        qty, unit = self.window.split()
        per = self._WINDOW_UNITS.get(unit)
        if per is None:
            raise ValueError(
                f"unsupported window unit {unit!r} in {self.window!r}; "
                f"supported: {sorted(set(self._WINDOW_UNITS))}")
        return int(qty) * per * 1_000_000

    def _record(self, head: int, rows: int, windows: int) -> None:
        self.ledger.upsert(CheckpointRecord(
            job_id=self.query_id, table=self.silver.meta.name,
            partition_id="__source__", file_set_hash=str(head),
            status=STATUS_COMMITTED, rows=rows, files_out=windows,
            committed_snapshot_id=head,
        ))
