"""Streaming write-audit-publish: per-micro-batch stage → audit →
publish/drop through foreachBatch, exactly-once across replays including
the crash window between stage and decision, with dead-lettered breaches.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.sources.synth import CLIP_SCHEMA_DDL, synth_clips
from open_finance_lakehouse_spark.streaming.wap import (
    streaming_audited_append,
)

UNIQUE = {"unique_clip_id": lambda s:
          s.groupBy("clip_id").count().filter("count > 1")}


def _table(spark, tmp_path, name, n=0):
    t = LakeTable.create(
        spark, str(tmp_path / name), name, CLIP_SCHEMA_DDL,
        partition_spec={"kind": "bucket", "column": "clip_id",
                        "num_buckets": 2})
    if n:
        t.append(synth_clips(spark, n), max_records_per_file=8)
    return t


def test_streaming_wap_real_stream_publishes_audited_batches(
        spark, tmp_path):
    """True writeStream run: a file-source stream drains through the WAP
    foreachBatch with availableNow; every landed row passed the audit."""
    t = _table(spark, tmp_path, "swap1")
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    synth_clips(spark, 30).coalesce(1).write.mode("append").parquet(landing)
    reports = []
    q = (spark.readStream.schema(CLIP_SCHEMA_DDL)
         .option("maxFilesPerTrigger", "1").parquet(landing)
         .writeStream
         .foreachBatch(streaming_audited_append(
             t, "swap1-job", checks=UNIQUE, on_report=reports.append))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert t.refresh().scan().count() == 30
    assert reports and all(r["published"] for r in reports)
    # no pending staged snapshots left behind
    assert all(s.summary.get("staged") != "true" for s in t.snapshots())


def test_streaming_wap_breach_dead_letters_and_drops(spark, tmp_path):
    t = _table(spark, tmp_path, "swap2", n=20)
    dl = LakeTable.create(
        spark, str(tmp_path / "dlq"), "dlq",
        CLIP_SCHEMA_DDL + ", _violation STRING")
    fn = streaming_audited_append(t, "swap2-job", checks=UNIQUE,
                                  dead_letter=dl)
    dupes = t.scan().limit(3)  # duplicate keys vs the table
    fn(dupes, 0)
    assert t.refresh().scan().count() == 20  # breach never became visible
    assert dl.refresh().scan().count() == 3
    got = dl.scan().select("_violation").distinct().collect()
    assert got == [("unique_clip_id",)] or \
        got[0]["_violation"] == "unique_clip_id"
    # replaying the dropped batch re-audits and re-drops, and the
    # dead-letter append is NOT duplicated (its own txn marker)
    fn(dupes, 0)
    assert t.refresh().scan().count() == 20
    assert dl.refresh().scan().count() == 3
    assert t.delete_orphans(grace_ms=0) != []  # dropped staged bytes GC-able
    assert t.scan().count() == 20


def test_streaming_wap_replay_after_publish_is_noop(spark, tmp_path):
    t = _table(spark, tmp_path, "swap3", n=10)
    fn = streaming_audited_append(t, "swap3-job", checks=UNIQUE)
    batch = synth_clips(spark, 5, id_offset=7000)
    fn(batch, 1)
    assert t.refresh().scan().count() == 15
    fn(batch, 1)  # replay: marker found on a published snapshot
    assert t.refresh().scan().count() == 15


def test_streaming_wap_crash_between_stage_and_decide_resumes(
        spark, tmp_path, monkeypatch):
    """The one-in-a-thousand crash placement: the batch staged but the
    decision never ran. The replay must find the pending marker, SKIP
    re-staging (no duplicate files), and decide the ORIGINAL staged
    bytes."""
    from open_finance_lakehouse_spark.operators import publish as pub_mod

    t = _table(spark, tmp_path, "swap4", n=10)
    batch = synth_clips(spark, 5, id_offset=8000)

    # first attempt: crash injected right after staging
    def boom(*a, **kw):
        raise RuntimeError("crash before decide")

    monkeypatch.setattr(pub_mod, "audit_staged", boom)
    import importlib

    import open_finance_lakehouse_spark.streaming.wap as wap_mod
    importlib.reload(wap_mod)  # rebind the patched audit_staged
    fn = wap_mod.streaming_audited_append(t, "swap4-job", checks=UNIQUE)
    try:
        fn(batch, 1)
        raise AssertionError("expected injected crash")
    except RuntimeError:
        pass
    t.refresh()
    assert t.scan().count() == 10  # invisible: crash window is clean
    staged = [s for s in t.snapshots()
              if s.summary.get("staged") == "true"]
    assert len(staged) == 1

    # replay with the real decide path: resumes the SAME staged snapshot
    monkeypatch.undo()
    importlib.reload(wap_mod)
    fn2 = wap_mod.streaming_audited_append(t, "swap4-job", checks=UNIQUE)
    fn2(batch, 1)
    t.refresh()
    assert t.scan().count() == 15
    assert all(s.summary.get("staged") != "true" for s in t.snapshots())
    # exactly one copy of the batch landed (resume did not re-stage)
    assert t.scan().filter(F.col("clip_id").isin(
        [r["clip_id"] for r in batch.select("clip_id").collect()])
    ).count() == 5
    assert t.delete_orphans(grace_ms=0) == []


def test_staged_batch_df_reads_under_snapshot_schema(spark, tmp_path):
    """Regression: the dead-letter read used the table's CURRENT schema;
    a rename landing between stage and the breach decision projected the
    renamed column as all-NULL, corrupting the 'byte-exact' DLQ copy."""
    from open_finance_lakehouse_spark.streaming.wap import _staged_batch_df

    t = LakeTable.create(spark, str(tmp_path / "sch"), "sch",
                         CLIP_SCHEMA_DDL)
    t.append(synth_clips(spark, 6), max_records_per_file=4)
    snap = t.append_staged(synth_clips(spark, 4, id_offset=9000))
    t.rewrite_schema(
        "clip_id STRING, bytes BINARY, sr_hz INT, dur_ms INT, "
        "codec STRING, text STRING", mapping={"text": "transcript"})
    df = _staged_batch_df(t.refresh(), t.meta.snapshot(snap.snapshot_id))
    assert "transcript" in df.columns  # the schema the batch staged under
    assert df.count() == 4
    assert df.filter("transcript IS NULL").count() == 0


def test_streaming_wap_recovers_from_layout_drift(spark, tmp_path):
    """Regression: a partition-spec change landing in the stage-to-decide
    window makes publish conflict (stale-routed files). The old code
    replayed into the identical conflict forever; the sink must drop the
    stale staged snapshot and re-stage under the CURRENT layout."""
    t = _table(spark, tmp_path, "drift", n=10)
    batch = synth_clips(spark, 5, id_offset=8500)
    # simulate the crash window: the batch staged (marker pending), the
    # decision never ran, and the table was re-bucketed meanwhile
    t.append_staged(batch, summary={"txn_app_id": "drift-job", "txn_id": 2})
    t.rewrite_partitioning({"kind": "bucket", "column": "clip_id",
                            "num_buckets": 4})
    reports = []
    fn = streaming_audited_append(t, "drift-job", checks=UNIQUE,
                                  on_report=reports.append)
    fn(batch, 2)  # replay: finds pending marker, publish conflicts,
    #               drops, re-stages under 4 buckets, publishes
    t.refresh()
    assert t.scan().count() == 15
    assert reports and reports[-1]["published"]
    assert all(s.summary.get("staged") != "true" for s in t.snapshots())
    # the stale staged files became orphans, sweepable
    assert t.delete_orphans(grace_ms=0) != []
    assert t.scan().count() == 15


def test_streaming_wap_breach_report_records_drop(spark, tmp_path):
    """on_report must say dropped=True once the sink dropped the staged
    snapshot (the audit itself ran with drop_on_breach=False)."""
    t = _table(spark, tmp_path, "reportdrop", n=12)
    reports = []
    fn = streaming_audited_append(t, "rd-job", checks=UNIQUE,
                                  on_report=reports.append)
    fn(t.scan().limit(2), 0)  # duplicate keys: breach
    assert reports and not reports[0]["published"]
    assert reports[0]["dropped"] is True
    assert all(s.summary.get("staged") != "true"
               for s in t.refresh().snapshots())


def test_streaming_wap_contention_keeps_staged_snapshot(
        spark, tmp_path, monkeypatch):
    """Commit contention (CommitRetriesExhausted) is NOT layout drift:
    the audited staged snapshot must survive — dropped-and-restaged
    would waste the whole batch's work and mislabel the failure — and
    the batch's replay must publish the SAME staged snapshot."""
    import pytest

    from open_finance_lakehouse_spark.format.table import (
        CommitRetriesExhausted,
        LakeTable as LT,
    )

    t = _table(spark, tmp_path, "swapc")
    fn = streaming_audited_append(t, "cont-job", checks=UNIQUE)
    batch = synth_clips(spark, 6)

    orig = LT.publish_staged
    calls = []

    def contended(self, snapshot_id):
        if not calls:
            calls.append(True)
            raise CommitRetriesExhausted("gave up after 50 commit attempts")
        return orig(self, snapshot_id)

    monkeypatch.setattr(LT, "publish_staged", contended)
    with pytest.raises(CommitRetriesExhausted):
        fn(batch, 0)
    staged = t.refresh().find_txn("cont-job", 0)
    assert staged is not None and staged.summary.get("staged") == "true"

    fn(batch, 0)  # the stream's batch retry
    t.refresh()
    assert t.find_txn("cont-job", 0).summary.get("staged") != "true"
    assert t.scan().count() == 6
