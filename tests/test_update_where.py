"""Predicate UPDATE: stats-pruned rewrite, type-invariant SET, NULL
outcomes unchanged, bucket-column updates re-route rows, conflict
atomicity. (The reference's only update path is MERGE's
whenMatchedUpdate, /root/reference/ofl/transform/spark/silver.py:94-101.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import (
    ColumnRange,
    CommitConflict,
    LakeTable,
)
from open_finance_lakehouse_spark.operators.update_where import update_where
from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
from open_finance_lakehouse_spark.sources.synth import CLIP_SCHEMA_DDL, synth_clips


def _table(spark, tmp_path, name, n=60, buckets=2, per_file=6, **kw):
    t = LakeTable.create(
        spark, str(tmp_path / name), name, CLIP_SCHEMA_DDL,
        partition_spec={"kind": "bucket", "column": "clip_id",
                        "num_buckets": buckets})
    t.append(synth_clips(spark, n, **kw), max_records_per_file=per_file)
    return t


def test_update_matched_rows_only_and_schema_invariant(spark, tmp_path):
    t = _table(spark, tmp_path, "upd", n=60, dur_max_ms=2000)
    before = {r["clip_id"]: r.asDict() for r in t.scan().collect()}
    k = t.scan().filter("dur_ms <= 800").count()
    assert 0 < k < 60
    res = update_where(
        t, CheckpointLedger(str(tmp_path / "led")), "u1",
        set={"codec": "'requeued'", "sr_hz": "sr_hz * 2"},
        predicates=[ColumnRange("dur_ms", hi=800)])
    assert res["rows_updated"] == k
    after = t.refresh().scan()
    assert after.schema == t._empty_df().schema  # casts kept types
    rows = {r["clip_id"]: r.asDict() for r in after.collect()}
    assert len(rows) == 60
    for cid, r in rows.items():
        b = before[cid]
        if b["dur_ms"] <= 800:
            assert r["codec"] == "requeued" and r["sr_hz"] == b["sr_hz"] * 2
            assert r["transcript"] == b["transcript"]  # untouched columns
        else:
            assert r == b  # unmatched rows byte-equal


def test_update_stats_pruning_skips_files(spark, tmp_path):
    """Files whose bounds can't match the predicate are never rewritten."""
    t = LakeTable.create(spark, str(tmp_path / "prune"), "prune",
                         CLIP_SCHEMA_DDL)
    for lo in (100, 200, 300):
        df = (spark.range(10)
              .select((F.lit(lo) + F.col("id") * 10).cast("int")
                      .alias("dur_ms"))
              .withColumn("clip_id", F.concat(F.lit(f"c{lo}-"),
                                              F.col("dur_ms")))
              .withColumn("bytes", F.lit(b"\x00"))
              .withColumn("sr_hz", F.lit(16000))
              .withColumn("codec", F.lit("pcm16"))
              .withColumn("transcript", F.lit("x"))
              .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                      "transcript"))
        t.append(df.coalesce(1))
    res = update_where(
        t, CheckpointLedger(str(tmp_path / "led")), "u2",
        set={"codec": "'short'"}, predicates=[ColumnRange("dur_ms", hi=150)])
    assert res["files_untouched"] == 2
    assert res["files_rewritten"] == 1
    assert res["rows_updated"] == 6  # 100..150
    assert t.refresh().scan().filter("codec = 'short'").count() == 6


def test_update_null_outcome_rows_unchanged(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "un"), "un", CLIP_SCHEMA_DDL)
    df = (spark.range(6)
          .select(F.concat(F.lit("n-"), F.col("id")).alias("clip_id"))
          .withColumn("bytes", F.lit(b"\x00"))
          .withColumn("sr_hz", F.lit(16000))
          .withColumn("dur_ms", F.when(F.col("clip_id") < "n-4",
                                       F.lit(100)).cast("int"))
          .withColumn("codec", F.lit("pcm16"))
          .withColumn("transcript", F.lit("x"))
          .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                  "transcript"))
    t.append(df.coalesce(1))
    res = update_where(
        t, CheckpointLedger(str(tmp_path / "led")), "u3",
        set={"codec": "'hit'"}, predicates=[ColumnRange("dur_ms", hi=200)])
    assert res["rows_updated"] == 4
    after = t.refresh().scan()
    assert after.filter("dur_ms IS NULL AND codec = 'pcm16'").count() == 2


def test_update_bucket_column_reroutes_rows(spark, tmp_path):
    """SET on the partition column moves the row to its NEW bucket, so a
    stats+bucket-pruned point lookup on the new key still finds it."""
    t = _table(spark, tmp_path, "rekey", n=40, buckets=4, per_file=5)
    victim = t.scan().select("clip_id").orderBy("clip_id").first()["clip_id"]
    res = update_where(
        t, CheckpointLedger(str(tmp_path / "led")), "u4",
        set={"clip_id": "'moved-0001'"},
        predicates=[ColumnRange("clip_id", values=(victim,))])
    assert res["rows_updated"] == 1
    t.refresh()
    # bucket-pruned point lookup on the NEW key must return the row
    got = t.scan(predicates=[ColumnRange("clip_id",
                                         values=("moved-0001",))])
    assert got.count() == 1
    assert t.scan().filter(F.col("clip_id") == victim).count() == 0
    # and the moved row's file really lives in the new key's bucket
    from open_finance_lakehouse_spark.functions.xxh64 import buckets_for

    bucket = next(iter(buckets_for({"moved-0001"}, "string", 4)))
    hit = t.scan(predicates=[ColumnRange("clip_id", values=("moved-0001",))],
                 with_file_path=True).select("_file").first()["_file"]
    assert f"part={bucket}" in hit


def test_update_without_where_touches_everything(spark, tmp_path):
    t = _table(spark, tmp_path, "all", n=20, buckets=2, per_file=5)
    res = update_where(t, CheckpointLedger(str(tmp_path / "led")), "u5",
                       set={"codec": "'flat'"})
    assert res["rows_updated"] == 20
    assert t.refresh().scan().filter("codec <> 'flat'").count() == 0


def test_update_rejects_unknown_set_column(spark, tmp_path):
    t = _table(spark, tmp_path, "bad", n=10, buckets=1, per_file=10)
    with pytest.raises(ValueError, match="not in table schema"):
        update_where(t, CheckpointLedger(str(tmp_path / "led")), "u6",
                     set={"nope": "'x'"},
                     predicates=[ColumnRange("dur_ms", hi=100)])


def test_update_conflict_is_atomic_and_retry_converges(
        spark, tmp_path, monkeypatch):
    t = _table(spark, tmp_path, "uc", n=40, buckets=2, per_file=5,
               dur_max_ms=2000)
    n0 = t.scan().count()
    k = t.scan().filter("dur_ms <= 900").count()

    real_commit = LakeTable.commit_rewrite
    state = {"raised": False}

    def flaky(self, *a, **kw):
        if not state["raised"] and kw.get("operation") == "update":
            state["raised"] = True
            raise CommitConflict("synthetic: file no longer live")
        return real_commit(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "commit_rewrite", flaky)
    led = CheckpointLedger(str(tmp_path / "led"))
    # retries=0: pure atomic abort
    with pytest.raises(CommitConflict):
        update_where(t, led, "u7", set={"codec": "'r'"},
                     predicates=[ColumnRange("dur_ms", hi=900)],
                     retries=0)
    t.refresh()
    assert t.scan().filter("codec = 'r'").count() == 0  # nothing changed
    assert t.delete_orphans(grace_ms=0, dry_run=True) == []

    # default retries: the same single conflict converges in one call
    state["raised"] = False
    res = update_where(t, led, "u7", set={"codec": "'r'"},
                       predicates=[ColumnRange("dur_ms", hi=900)])
    assert state["raised"]  # the conflict really happened mid-call
    assert res["rows_updated"] == k
    assert t.refresh().scan().count() == n0
    assert t.scan().filter("codec = 'r'").count() == k
    assert t.delete_orphans(grace_ms=0, dry_run=True) == []


# ------------------------------------------- round-5 review regressions


def test_set_evaluates_against_pre_update_row(spark, tmp_path):
    """SQL UPDATE semantics: every SET expression AND the WHERE evaluate
    against the PRE-update row. The old sequential-withColumn build
    re-resolved the match condition and later SET expressions against
    already-updated columns: with the predicate column itself in SET,
    the second SET column was silently never written."""
    t = _table(spark, tmp_path, "pre", n=60)
    led = CheckpointLedger(str(tmp_path / "led"))
    k = t.scan().filter("codec = 'ulaw'").count()
    assert k > 0
    res = update_where(
        t, led, "pre1",
        set={"codec": "'requeued'", "sr_hz": "0"},   # predicate col FIRST
        residual="codec = 'ulaw'")
    assert res["rows_updated"] == k
    after = t.refresh().scan()
    assert after.filter("codec = 'requeued'").count() == k
    # the regression: sr_hz stayed untouched because `matched` re-resolved
    # against the already-rewritten codec
    assert after.filter("codec = 'requeued' AND sr_hz != 0").count() == 0
    assert after.filter("codec = 'ulaw'").count() == 0


def test_set_cross_references_read_old_values(spark, tmp_path):
    """SET a = a+1, b = a must write b = OLD a (standard SQL), not the
    freshly incremented one."""
    t = _table(spark, tmp_path, "xref", n=30)
    led = CheckpointLedger(str(tmp_path / "led"))
    before = {r["clip_id"]: r["dur_ms"] for r in t.scan().collect()}
    res = update_where(
        t, led, "x1",
        set={"dur_ms": "dur_ms + 1", "sr_hz": "dur_ms"},
        residual="dur_ms >= 0")
    assert res["rows_updated"] == 30
    for r in t.refresh().scan().collect():
        assert r["dur_ms"] == before[r["clip_id"]] + 1
        assert r["sr_hz"] == before[r["clip_id"]]  # old value, not +1
