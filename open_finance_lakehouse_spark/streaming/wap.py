"""Streaming write-audit-publish: the ``foreachBatch + append_staged →
audit → publish/drop`` composition — no reader ever sees an unaudited
micro-batch.

The reference's streaming lane validates rows BEFORE landing and
dead-letters violators (/root/reference/ofl/streaming/bronze.py:237-264);
that gate is row-local.  WAP audits each micro-batch against the FULL
would-be table state (cross-batch key uniqueness, referential counts)
and only then flips visibility:

    query = (df.writeStream
               .foreachBatch(streaming_audited_append(
                   table, "bronze-wap",
                   checks={"unique": lambda s: s.groupBy("clip_id")
                                                .count().filter("count > 1")}))
               .option("checkpointLocation", ckpt)
               .trigger(availableNow=True).start())

Exactly-once across replays, crash-placement-proof (the Delta
txnAppId/txnVersion discipline rebuilt on the snapshot log — every
marker commits atomically with the state transition it describes):

- each batch stages with ``summary={"txn_app_id": job_id, "txn_id":
  batch_id}``; the marker rides the snapshot through publication
  (fast-forward keeps the summary; cherry-pick carries it over).
- **replay after decide**: a PUBLISHED marker (non-staged snapshot)
  means the batch is in — no-op.  A DROPPED batch left no marker (the
  entry left the log), so the replay re-stages and re-audits — and
  reaches the same verdict on the same data.
- **replay after stage, before decide** (the crash window): the marker
  is found on a snapshot still flagged ``staged`` — the replay SKIPS
  re-staging and resumes at the audit, deciding the original staged
  bytes.  Without this check, ``committed_txn`` alone would read the
  pending marker as "done" and the batch would never publish — silent
  data loss on a one-in-a-thousand crash placement.
- breached batches can be dead-lettered before dropping: the staged
  snapshot's own manifests identify exactly the batch's files, so the
  violators land in the dead-letter table byte-exact, idempotently
  (their own txn marker under ``{job_id}-dlq``).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.operators.publish import Check, audit_staged


def _staged_batch_df(table: LakeTable, snap) -> DataFrame:
    """Exactly the batch's own rows: the files its staged manifests added."""
    from open_finance_lakehouse_spark.format import manifests as mf

    paths = []
    for m in snap.summary.get("staged_added") or []:
        paths += [os.path.join(table.location, e.file_path)
                  for e in mf.read_manifest(table.location, m)]
    # read under the snapshot's OWN schema (recorded at staging): a schema
    # rewrite landing between stage and this breach decision would make a
    # current-schema read project renamed columns as all-NULL — the DLQ
    # copy must stay byte-exact to what the batch staged
    ddl = snap.schema_ddl or table.meta.schema_ddl
    if not paths:
        return table.spark.createDataFrame([], ddl)
    return table.spark.read.schema(ddl).parquet(*paths)


def streaming_audited_append(
    table: LakeTable,
    job_id: str,
    checks: dict[str, Check] | None = None,
    dead_letter: "LakeTable | None" = None,
    max_records_per_file: int | None = None,
    on_report: "Callable[[dict], None] | None" = None,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function. ``on_report`` (optional) receives
    each batch's decision report (the ``audit_staged`` dict + batch id)."""

    def for_each_batch(batch_df: DataFrame, batch_id: int) -> None:
        from open_finance_lakehouse_spark.format.table import CommitConflict

        marker = table.find_txn(job_id, batch_id)
        if marker is not None and marker.summary.get("staged") != "true":
            return  # published in a previous attempt: replay is a no-op

        for _attempt in range(3):
            if marker is None:
                try:
                    marker = table.append_staged(
                        batch_df, max_records_per_file,
                        summary={"txn_app_id": job_id, "txn_id": batch_id})
                except CommitConflict:
                    # commit_append's in-CAS duplicate-marker fence: a
                    # concurrent run of this batch (zombie driver + its
                    # restarted query) staged first — adopt ITS snapshot
                    # instead of double-staging
                    marker = table.find_txn(job_id, batch_id)
                    if marker is None:
                        raise  # a real conflict (spec change), not a dup
                    if marker.summary.get("staged") != "true":
                        return  # the other run already published
            # decide (fresh stage AND crash-resume take the same path)
            try:
                report = audit_staged(table, marker.snapshot_id, checks,
                                      drop_on_breach=False)
                break
            except CommitConflict as e:
                from open_finance_lakehouse_spark.format.table import (
                    CommitRetriesExhausted,
                )

                if isinstance(e, CommitRetriesExhausted):
                    # pure commit contention — the staged snapshot is
                    # green and publishable; dropping it would re-run
                    # the whole stage+audit for nothing and mislabel
                    # the failure as layout drift. Surface the error:
                    # the stream's batch retry re-enters via find_txn
                    # and re-audits the SAME staged snapshot.
                    raise
                # the table's partition spec or schema drifted between
                # stage and publish: the staged files are stale-routed
                # and can never publish — drop them and re-stage under
                # the CURRENT layout (a replay loop that never drops
                # would wedge the stream forever)
                table.drop_staged(marker.snapshot_id)
                marker = None
        else:
            raise CommitConflict(
                f"{job_id} batch {batch_id}: the table layout kept "
                "changing between stage and publish across 3 attempts")

        if not report["published"]:
            if dead_letter is not None:
                app = f"{job_id}-dlq"
                if not dead_letter.committed_txn(app, batch_id):
                    bad = _staged_batch_df(table, marker).withColumn(
                        "_violation",
                        F.lit(",".join(sorted(report["violations"]))))
                    dead_letter.append(
                        bad, summary={"txn_app_id": app,
                                      "txn_id": batch_id,
                                      "source": table.meta.name})
            table.drop_staged(marker.snapshot_id)
            report = {**report, "dropped": True}
        if on_report is not None:
            on_report({**report, "batch_id": batch_id})

    return for_each_batch
