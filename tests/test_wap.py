"""Write-audit-publish: staged appends are invisible until published,
auditable by snapshot id, expire/GC-safe while pending, fast-forward or
cherry-pick on publish, orphaned on drop.

The reference audits AFTER publication (gold checks run post-overwrite,
withhold on the NEXT rebuild); WAP closes the gap the other way — a
reader can never observe an unaudited row. Iceberg's wap.id staged
commits are the public model."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.operators.publish import append_audited
from open_finance_lakehouse_spark.sources.synth import CLIP_SCHEMA_DDL, synth_clips


def _table(spark, tmp_path, name, n=40, **kw):
    t = LakeTable.create(
        spark, str(tmp_path / name), name, CLIP_SCHEMA_DDL,
        partition_spec={"kind": "bucket", "column": "clip_id",
                        "num_buckets": 2})
    t.append(synth_clips(spark, n, **kw), max_records_per_file=8)
    return t


def _batch(spark, n, offset):
    return synth_clips(spark, n, id_offset=offset)


def test_staged_append_invisible_until_published(spark, tmp_path):
    t = _table(spark, tmp_path, "wap1")
    snap = t.append_staged(_batch(spark, 10, 1000))
    assert t.scan().count() == 40  # readers see nothing
    # auditable by id: the staged snapshot is the would-be table state
    assert t.scan(snapshot_id=snap.snapshot_id).count() == 50
    pub = t.publish_staged(snap.snapshot_id)
    assert pub.snapshot_id == snap.snapshot_id  # fast-forward, as-is
    assert t.scan().count() == 50


def test_staged_survives_expire_and_gc_until_decided(spark, tmp_path):
    t = _table(spark, tmp_path, "wap2")
    snap = t.append_staged(_batch(spark, 10, 2000))
    t.append(_batch(spark, 5, 3000))  # head moves past the staged commit
    expired = t.expire_snapshots(retain_last=1)
    assert snap.snapshot_id not in expired  # immune while pending
    assert t.delete_orphans(grace_ms=0) == []  # staged files reachable
    assert t.scan(snapshot_id=snap.snapshot_id).count() == 50

    # publish after the head moved: cherry-pick onto the new head
    pub = t.publish_staged(snap.snapshot_id)
    assert pub.snapshot_id != snap.snapshot_id
    assert pub.summary["published"] == "cherry_pick"
    assert t.scan().count() == 55  # base 40 + append 5 + staged 10
    # the consumed staged entry is gone; nothing orphaned
    assert all(s.snapshot_id != snap.snapshot_id for s in t.snapshots())
    assert t.delete_orphans(grace_ms=0) == []


def test_drop_staged_orphans_its_files(spark, tmp_path):
    t = _table(spark, tmp_path, "wap3")
    n_files = len(t.live_files())
    snap = t.append_staged(_batch(spark, 10, 4000))
    assert t.delete_orphans(grace_ms=0) == []
    t.drop_staged(snap.snapshot_id)
    assert t.scan().count() == 40
    orphans = t.delete_orphans(grace_ms=0)
    assert orphans  # the staged batch's data + manifest litter
    assert len(t.live_files()) == n_files
    with pytest.raises(ValueError):
        t.scan(snapshot_id=snap.snapshot_id)  # gone from the log


def test_publish_rejects_non_staged_and_double_publish(spark, tmp_path):
    t = _table(spark, tmp_path, "wap4")
    with pytest.raises(ValueError, match="not an unpublished staged"):
        t.publish_staged(t.meta.current_snapshot_id)
    snap = t.append_staged(_batch(spark, 5, 5000))
    t.publish_staged(snap.snapshot_id)
    with pytest.raises(ValueError, match="not an unpublished staged"):
        t.publish_staged(snap.snapshot_id)


def test_append_audited_publishes_clean_batch(spark, tmp_path):
    t = _table(spark, tmp_path, "wap5")
    res = append_audited(
        t, _batch(spark, 10, 6000),
        checks={"no_null_ids": lambda df:
                df.filter(F.col("clip_id").isNull())})
    assert res["published"] and res["rows"] == 10
    assert t.refresh().scan().count() == 50


def test_append_audited_drops_breaching_batch(spark, tmp_path):
    """A global invariant (cross-batch uniqueness) catches a duplicate
    the batch alone couldn't show — the audit runs on the full would-be
    state; readers never saw the bad rows and GC reclaims them."""
    t = _table(spark, tmp_path, "wap6")
    dupes = t.scan().limit(3)  # re-append 3 existing keys
    res = append_audited(
        t, dupes,
        checks={"unique_clip_id": lambda df:
                df.groupBy("clip_id").count().filter("count > 1")})
    assert not res["published"]
    assert "unique_clip_id" in res["violations"]
    assert t.refresh().scan().count() == 40  # untouched
    assert t.delete_orphans(grace_ms=0)  # staged bytes reclaimed
    assert t.scan().count() == 40


def test_cherry_pick_refuses_stale_routed_files_after_spec_change(
        spark, tmp_path):
    """Regression: the cherry-pick path did a pure manifest union with no
    spec validation, so a rewrite_partitioning landing between stage and
    publish landed files routed under the OLD bucket count — invisible to
    point-lookup pruning and missed by per-bucket MERGE joins."""
    from open_finance_lakehouse_spark.format.table import CommitConflict

    t = _table(spark, tmp_path, "respec")
    snap = t.append_staged(_batch(spark, 6, 5000))
    t.rewrite_partitioning({"kind": "bucket", "column": "clip_id",
                            "num_buckets": 4})
    with pytest.raises(CommitConflict, match="partition spec"):
        t.publish_staged(snap.snapshot_id)
    # the staged entry survives the refusal: drop + re-stage converges
    t.drop_staged(snap.snapshot_id)
    out = append_audited(t, _batch(spark, 6, 5000))
    assert out["published"]
    assert t.refresh().scan().count() == 46
    # every landed row is findable through bucket pruning under the new spec
    victim = t.scan().filter("clip_id like '%5000%'").first()
    assert victim is not None


def test_cherry_pick_refuses_staged_files_after_schema_rewrite(
        spark, tmp_path):
    from open_finance_lakehouse_spark.format.table import CommitConflict

    t = LakeTable.create(spark, str(tmp_path / "reschema"), "reschema",
                         CLIP_SCHEMA_DDL)
    t.append(synth_clips(spark, 10), max_records_per_file=8)
    snap = t.append_staged(synth_clips(spark, 4, id_offset=6000))
    t.rewrite_schema(
        "clip_id STRING, bytes BINARY, sr_hz INT, dur_ms INT, "
        "codec STRING, text STRING", mapping={"text": "transcript"})
    with pytest.raises(CommitConflict, match="schema"):
        t.publish_staged(snap.snapshot_id)
    t.drop_staged(snap.snapshot_id)
    assert t.refresh().scan().count() == 10


def test_cherry_pick_allows_additive_schema_evolution(spark, tmp_path):
    """Additive update_schema (ADD COLUMN) keeps old files valid — scan
    projects the missing column as NULL — so a staged batch publishes
    fine across it; only destructive rewrites conflict."""
    t = _table(spark, tmp_path, "addcol")
    snap = t.append_staged(_batch(spark, 6, 7000))
    t.update_schema(CLIP_SCHEMA_DDL + ", lang STRING")
    t.append(synth_clips(spark, 4, id_offset=7700)
             .withColumn("lang", F.lit("en")))  # head moves -> cherry-pick
    pub = t.publish_staged(snap.snapshot_id)
    assert pub.summary["published"] == "cherry_pick"
    after = t.refresh().scan()
    assert after.count() == 50
    # staged rows (ids 7000-7005, both plain and hot-prefixed forms)
    # project the new column as NULL
    assert after.filter("clip_id like '%00000000700_' AND lang IS NULL") \
                .count() == 6


def test_staged_txn_marker_fence_blocks_duplicate_runs(spark, tmp_path):
    """Exactly-once under CONCURRENT duplicate execution: the marker is
    validated inside commit_append's CAS, so a second stage of the same
    (app, batch) conflicts instead of double-landing."""
    from open_finance_lakehouse_spark.format.table import CommitConflict

    t = _table(spark, tmp_path, "fence")
    t.append_staged(_batch(spark, 5, 8100),
                    summary={"txn_app_id": "job", "txn_id": 7})
    with pytest.raises(CommitConflict, match="txn marker"):
        t.append_staged(_batch(spark, 5, 8100),
                        summary={"txn_app_id": "job", "txn_id": 7})
    # a different batch id stages fine
    t.append_staged(_batch(spark, 5, 8200),
                    summary={"txn_app_id": "job", "txn_id": 8})


def test_audit_staged_replay_after_decision_returns_prior_outcome(
        spark, tmp_path):
    """A crash after the decision replays into audit_staged with the
    already-decided snapshot id: fast-forward-published (still in the
    log, staged='false'), cherry-pick-published (consumed, twin stamped
    cherry_picked_from), and dropped snapshots must all return the prior
    outcome with replayed=True — never an unrelated ValueError."""
    from open_finance_lakehouse_spark.operators.publish import audit_staged

    t = _table(spark, tmp_path, "wapr")
    # fast-forward: publish, then replay the audit
    s1 = t.append_staged(_batch(spark, 5, 1000))
    r1 = audit_staged(t, s1.snapshot_id)
    assert r1["published"] and "replayed" not in r1
    r1b = audit_staged(t, s1.snapshot_id)
    assert r1b["published"] and r1b["replayed"] is True
    assert r1b["snapshot_id"] == r1["snapshot_id"]

    # cherry-pick: another commit lands between stage and publish
    s2 = t.append_staged(_batch(spark, 5, 2000))
    t.append(_batch(spark, 3, 3000))  # moves the head
    r2 = audit_staged(t, s2.snapshot_id)
    assert r2["published"]
    r2b = audit_staged(t, s2.snapshot_id)
    assert r2b["published"] and r2b["replayed"] is True
    assert r2b["snapshot_id"] == r2["snapshot_id"]

    # dropped: replay reports the drop
    s3 = t.append_staged(_batch(spark, 5, 4000))
    t.drop_staged(s3.snapshot_id)
    r3 = audit_staged(t, s3.snapshot_id)
    assert not r3["published"] and r3["dropped"] and r3["replayed"] is True


def test_publish_overwrite_enforces_schema_and_contract(spark, tmp_path):
    """The publish lane is a write: a misnamed candidate column must
    refuse (it would read back all-NULL), and a declared table contract
    withholds the publish on breach like every other writer."""
    from open_finance_lakehouse_spark.operators.publish import (
        publish_overwrite,
    )
    from open_finance_lakehouse_spark.quality.contracts import (
        Contract,
        SchemaMismatch,
    )

    t = LakeTable.create(
        spark, str(tmp_path / "pog"), "pog", "k BIGINT, price DOUBLE",
        contract=Contract(bounds={"price": [0.0, 100.0]}))
    t.append(spark.createDataFrame([(1, 5.0)], "k BIGINT, price DOUBLE"))

    bad_schema = spark.createDataFrame([(2, 6.0)],
                                       "k BIGINT, pricee DOUBLE")
    with pytest.raises(SchemaMismatch):
        publish_overwrite(t, bad_schema)

    breach = spark.createDataFrame([(2, 999.0)], "k BIGINT, price DOUBLE")
    rep = publish_overwrite(t, breach)
    assert not rep["published"] and "_contract" in rep["violations"]
    assert [r["k"] for r in t.refresh().scan().collect()] == [1]

    ok = spark.createDataFrame([(3, 7.0)], "k BIGINT, price DOUBLE")
    rep2 = publish_overwrite(t, ok)
    assert rep2["published"]
    assert [r["k"] for r in t.refresh().scan().collect()] == [3]
