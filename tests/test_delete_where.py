"""Predicate DELETE: three-tier planning (stats-pruned / metadata-only /
copy-on-write), null-row safety, bucket point deletes, atomicity under a
concurrent-writer conflict, and retention-delete idempotence.

The reference only deletes through MERGE's keyed delete arm
(/root/reference/ofl/transform/spark/silver.py:154-161); these suites pin
the predicate-delete semantics it has no analogue for — in particular the
SQL contract that a NULL predicate outcome KEEPS the row, which is exactly
what the manifest null counts exist to protect in the metadata-only tier.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import (
    ColumnRange,
    CommitConflict,
    LakeTable,
)
from open_finance_lakehouse_spark.operators.delete_where import (
    delete_where,
    plan_delete,
)
from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
from open_finance_lakehouse_spark.sources.synth import CLIP_SCHEMA_DDL, synth_clips


def _table(spark, tmp_path, name, n=60, buckets=2, per_file=6, **kw):
    t = LakeTable.create(
        spark, str(tmp_path / name), name, CLIP_SCHEMA_DDL,
        partition_spec={"kind": "bucket", "column": "clip_id",
                        "num_buckets": buckets})
    t.append(synth_clips(spark, n, **kw), max_records_per_file=per_file)
    return t


def test_plan_tiers_from_stats(spark, tmp_path):
    """Files are classified without reading data: fully-below-threshold
    files drop metadata-only, straddling files rewrite, fully-above files
    are untouched."""
    t = LakeTable.create(
        spark, str(tmp_path / "tiers"), "tiers", CLIP_SCHEMA_DDL)
    # three files with disjoint dur_ms ranges: [100..190], [200..290], [300..390]
    for lo in (100, 200, 300):
        df = (spark.range(10)
              .select((F.lit(lo) + F.col("id") * 10).cast("int").alias("dur_ms"))
              .withColumn("clip_id", F.concat(F.lit(f"c{lo}-"), F.col("dur_ms")))
              .withColumn("bytes", F.lit(b"\x00\x01"))
              .withColumn("sr_hz", F.lit(16000))
              .withColumn("codec", F.lit("pcm16"))
              .withColumn("transcript", F.lit("x"))
              .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                      "transcript"))
        t.append(df.coalesce(1))
    # delete dur_ms <= 250: file1 full-drop, file2 rewrite, file3 untouched
    plan = plan_delete(t, [ColumnRange("dur_ms", hi=250)])
    assert len(plan["full"]) == 1
    assert len(plan["rewrite"]) == 1
    assert plan["untouched"] == 1

    res = delete_where(t, CheckpointLedger(str(tmp_path / "led")),
                       "del-tiers", [ColumnRange("dur_ms", hi=250)])
    assert res["files_full_dropped"] == 1
    assert res["files_rewritten"] == 1
    assert res["files_untouched"] == 1
    assert res["rows_deleted"] == 16  # 10 (file1) + 6 of file2 (200..250)
    left = t.refresh().scan()
    assert left.count() == 14
    assert left.filter(F.col("dur_ms") <= 250).count() == 0


def test_null_rows_survive_and_block_metadata_drop(spark, tmp_path):
    """SQL DELETE contract: a NULL predicate outcome keeps the row — so a
    file whose non-null values all match but which CONTAINS nulls must be
    rewritten, never metadata-dropped, and the null rows survive."""
    t = LakeTable.create(
        spark, str(tmp_path / "nulls"), "nulls", CLIP_SCHEMA_DDL)
    df = (spark.range(10)
          .select(F.concat(F.lit("n-"), F.col("id")).alias("clip_id"))
          .withColumn("bytes", F.lit(b"\x00"))
          .withColumn("sr_hz", F.lit(16000))
          # ids 0..7 -> dur 100 (all match `dur_ms <= 200`), ids 8,9 -> NULL
          .withColumn("dur_ms", F.when(F.col("clip_id") < "n-8",
                                       F.lit(100)).cast("int"))
          .withColumn("codec", F.lit("pcm16"))
          .withColumn("transcript", F.lit("x"))
          .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                  "transcript"))
    t.append(df.coalesce(1))
    plan = plan_delete(t, [ColumnRange("dur_ms", hi=200)])
    assert plan["full"] == []  # nulls present: not provable
    assert len(plan["rewrite"]) == 1

    res = delete_where(t, CheckpointLedger(str(tmp_path / "led")),
                       "del-nulls", [ColumnRange("dur_ms", hi=200)])
    assert res["rows_deleted"] == 8
    left = t.refresh().scan()
    assert left.count() == 2
    assert left.filter(F.col("dur_ms").isNull()).count() == 2


def test_all_null_stat_file_untouched(spark, tmp_path):
    """A file whose predicate column is entirely NULL has no bounds; the
    null count proves no row can match, so it is not even rewritten."""
    t = LakeTable.create(
        spark, str(tmp_path / "allnull"), "allnull", CLIP_SCHEMA_DDL)
    df = (spark.range(5)
          .select(F.concat(F.lit("an-"), F.col("id")).alias("clip_id"))
          .withColumn("bytes", F.lit(b"\x00"))
          .withColumn("sr_hz", F.lit(16000))
          .withColumn("dur_ms", F.lit(None).cast("int"))
          .withColumn("codec", F.lit("pcm16"))
          .withColumn("transcript", F.lit("x"))
          .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                  "transcript"))
    t.append(df.coalesce(1))
    plan = plan_delete(t, [ColumnRange("dur_ms", hi=10**9)])
    assert plan["full"] == [] and plan["rewrite"] == []
    assert plan["untouched"] == 1
    res = delete_where(t, CheckpointLedger(str(tmp_path / "led")),
                       "del-an", [ColumnRange("dur_ms", hi=10**9)])
    assert res["rows_deleted"] == 0
    assert t.refresh().scan().count() == 5


def test_bucket_point_delete_prunes_partitions(spark, tmp_path):
    """Equality/IN on the bucket column routes through bucket-value
    pruning: a point delete plans only the key's own bucket's files."""
    t = _table(spark, tmp_path, "point", n=80, buckets=4, per_file=5)
    victim = t.scan().select("clip_id").orderBy("clip_id").first()["clip_id"]
    pred = [ColumnRange("clip_id", values=(victim,))]
    plan = plan_delete(t, pred)
    touched = len(plan["full"]) + len(plan["rewrite"])
    # one bucket of four: at most ~1/4 of the files survive pruning
    assert touched <= plan["total"] / 2
    n0 = t.scan().count()
    res = delete_where(t, CheckpointLedger(str(tmp_path / "led")),
                       "del-pt", pred)
    assert res["rows_deleted"] == 1
    after = t.refresh().scan()
    assert after.count() == n0 - 1
    assert after.filter(F.col("clip_id") == victim).count() == 0


def test_residual_predicate_disables_metadata_drop(spark, tmp_path):
    """A residual row-level condition can't be proven from stats: no
    metadata-only drops, but the delete itself is exact."""
    t = _table(spark, tmp_path, "resid", n=40, buckets=1, per_file=10)
    n0 = t.scan().count()
    k = t.scan().filter("transcript LIKE '%the%'").count()
    res = delete_where(t, CheckpointLedger(str(tmp_path / "led")),
                       "del-res", residual="transcript LIKE '%the%'")
    assert res["files_full_dropped"] == 0
    assert res["rows_deleted"] == k
    assert t.refresh().scan().count() == n0 - k


def test_delete_rerun_is_noop_and_orphan_free(spark, tmp_path):
    """Re-running the same retention delete is a natural no-op (matching
    rows are already gone) and leaves no staged litter behind."""
    t = _table(spark, tmp_path, "rerun", n=60, buckets=2, per_file=6,
               dur_max_ms=2000)
    led = CheckpointLedger(str(tmp_path / "led"))
    pred = [ColumnRange("dur_ms", hi=800)]
    res1 = delete_where(t, led, "del-r1", pred)
    assert res1["rows_deleted"] > 0
    snap1 = t.meta.current_snapshot_id
    res2 = delete_where(t, led, "del-r2", pred)
    assert res2["rows_deleted"] == 0
    assert res2["files_full_dropped"] == res2["files_rewritten"] == 0
    assert t.meta.current_snapshot_id == snap1  # no empty snapshot
    assert t.delete_orphans(grace_ms=0, dry_run=True) == []


def test_delete_conflict_discards_staging_and_retry_converges(
        spark, tmp_path, monkeypatch):
    """A concurrent rewrite landing between plan and commit aborts the
    delete atomically: nothing changed, staged survivors discarded; the
    retry replans against the new head and lands the exact state."""
    t = _table(spark, tmp_path, "conflict", n=60, buckets=2, per_file=6,
               dur_max_ms=2000)
    n0 = t.scan().count()
    k = t.scan().filter("dur_ms <= 800").count()
    assert k > 0

    real_commit = LakeTable.commit_rewrite
    state = {"injected": False}

    def inject(self, removed, added, *a, **kw):
        if not state["injected"] and kw.get("operation") == "delete":
            state["injected"] = True
            other = LakeTable.load(spark, t.location)
            victim = sorted(removed)[0]
            df = spark.read.schema(other._empty_df().schema).parquet(
                os.path.join(other.location, victim))
            part = victim.split("part=")[1].split("/")[0]
            staged = other.stage_dataframe(
                df, repartition_by_partition=False, fixed_partition=part)
            real_commit(other, {victim}, staged, operation="rewrite")
        return real_commit(self, removed, added, *a, **kw)

    monkeypatch.setattr(LakeTable, "commit_rewrite", inject)
    led = CheckpointLedger(str(tmp_path / "led"))
    # retries=0: pure atomic abort — nothing changed, nothing staged left
    with pytest.raises(CommitConflict):
        delete_where(t, led, "del-c", [ColumnRange("dur_ms", hi=800)],
                     retries=0)
    assert state["injected"]
    t.refresh()
    assert t.scan().count() == n0  # atomic: nothing changed
    assert t.delete_orphans(grace_ms=0, dry_run=True) == []

    # default retries: the same single-conflict race converges in ONE
    # call — replan against the new head, commit on attempt 2 (Iceberg's
    # commit.retry discipline)
    state["injected"] = False
    res = delete_where(t, led, "del-c", [ColumnRange("dur_ms", hi=800)])
    assert state["injected"]  # the conflict really happened mid-call
    assert res["rows_deleted"] == k
    after = t.refresh().scan()
    assert after.count() == n0 - k
    assert after.filter("dur_ms <= 800").count() == 0
    assert t.delete_orphans(grace_ms=0, dry_run=True) == []


def test_delete_refuses_unbounded(spark, tmp_path):
    t = _table(spark, tmp_path, "guard", n=10, buckets=1, per_file=10)
    with pytest.raises(ValueError, match="truncate"):
        delete_where(t, CheckpointLedger(str(tmp_path / "led")), "del-g")


def test_null_counts_roundtrip_and_back_compat(spark, tmp_path):
    """New manifests carry per-column null counts; DataFile.nulls returns
    None (never 0) when the manifest predates the column."""
    from open_finance_lakehouse_spark.format import manifests as mf

    t = _table(spark, tmp_path, "nc", n=12, buckets=1, per_file=12)
    f = t.live_files()[0]
    assert f.nulls("dur_ms") == 0
    assert f.nulls("transcript") == 0
    assert f.nulls("no_such_column") is None
    # simulate a pre-upgrade manifest: strip the column and re-read
    import pyarrow.parquet as pq

    snap = t.meta.snapshot()
    path = os.path.join(t.location, snap.manifests[0])
    tbl = pq.read_table(path)
    old = tbl.drop_columns(["null_count"])
    legacy_rel = snap.manifests[0].replace(".parquet", "-legacy.parquet")
    pq.write_table(old, os.path.join(t.location, legacy_rel))
    entries = mf.read_manifest(t.location, legacy_rel)
    assert entries and entries[0].nulls("dur_ms") is None
