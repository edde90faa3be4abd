"""``format("frost")`` Python Data Source: batch parity with scan(), and a
real push-mode ``readStream`` whose offsets are snapshot ids — restart
resumes from the checkpoint, compaction between drains emits nothing
(row-preserving rewrites skipped), merge in the interval refuses.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.streaming.frost_source import (
    register_frost_source,
)
from open_finance_lakehouse_spark.streaming.ingest import (
    BRONZE_DDL,
    prepare_events,
)

BASE_MS = 1_700_000_040_000


def _event(sym, tid, ts_ms):
    return {"e": "trade", "E": ts_ms, "s": sym, "t": tid, "p": "10",
            "q": "1", "T": ts_ms, "m": False}


def _rows(spark, events):
    raw = spark.createDataFrame([(json.dumps(e),) for e in events],
                                "value string")
    return prepare_events(raw).filter("_valid").select(
        "event_key", "symbol", "trade_id", "price", "qty", "trade_time",
        "is_maker", "raw")


@pytest.fixture()
def bronze(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "bronze"), "bronze_events",
                         BRONZE_DDL)
    register_frost_source(spark)
    return t


def _drain(spark, loc, out, ckpt):
    q = (spark.readStream.format("frost").option("location", loc).load()
         .writeStream.outputMode("append").format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_frost_batch_read_matches_scan(spark, bronze):
    bronze.append(_rows(spark, [_event("BTC", i, BASE_MS + i * 1000)
                                for i in range(25)]))
    df = (spark.read.format("frost")
          .option("location", bronze.location).load())
    assert df.count() == 25
    assert df.exceptAll(bronze.scan()).count() == 0
    assert bronze.scan().exceptAll(df).count() == 0
    assert dict(df.dtypes) == dict(bronze.scan().dtypes)


def test_frost_stream_resumes_and_skips_rewrites(spark, bronze, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    bronze.append(_rows(spark, [_event("BTC", i, BASE_MS + i * 1000)
                                for i in range(10)]))
    _drain(spark, bronze.location, out, ckpt)
    assert spark.read.parquet(out).count() == 10

    # a compaction between drains: row-preserving rewrite must emit NOTHING
    live = {f.file_path for f in bronze.live_files()}
    staged = bronze.stage_dataframe(bronze.scan().coalesce(1))
    bronze.commit_rewrite(live, staged, operation="rewrite")

    bronze.append(_rows(spark, [_event("ETH", 100 + i, BASE_MS + 60_000 + i)
                                for i in range(5)]))
    _drain(spark, bronze.location, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 15  # 10 + 5, NOT 10 + 10 + 5 (no re-delivery)
    assert got.filter(F.col("symbol") == "ETH").count() == 5

    # nothing new -> a drain delivers nothing
    _drain(spark, bronze.location, out, ckpt)
    assert spark.read.parquet(out).count() == 15


def test_frost_stream_refuses_row_changing_interval(spark, bronze, tmp_path):
    out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    bronze.append(_rows(spark, [_event("BTC", 1, BASE_MS)]))
    _drain(spark, bronze.location, out, ckpt)

    bronze.replace(bronze.scan())  # row-CHANGING operation in the interval
    bronze.append(_rows(spark, [_event("BTC", 2, BASE_MS + 1000)]))
    with pytest.raises(Exception) as ei:
        _drain(spark, bronze.location, out, ckpt)
    assert "replace" in str(ei.value) or "append-only" in str(ei.value)


def test_frost_stream_skips_real_maintenance_commits(spark, bronze, tmp_path):
    """A REAL compact() between drains (operation='compact', not a generic
    'rewrite') must be skipped by the stream — maintenance never
    re-delivers rows to downstream consumers."""
    from open_finance_lakehouse_spark.operators.compact import compact
    from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger

    out, ckpt = str(tmp_path / "out3"), str(tmp_path / "ckpt3")
    bronze.append(_rows(spark, [_event("BTC", i, BASE_MS + i * 1000)
                                for i in range(8)]), max_records_per_file=2)
    _drain(spark, bronze.location, out, ckpt)
    assert spark.read.parquet(out).count() == 8

    res = compact(bronze, CheckpointLedger(str(tmp_path / "led")),
                  "stream-compact", target_bytes=8 * 1024 * 1024)
    assert res["partitions_rewritten"] >= 1
    bronze.append(_rows(spark, [_event("ETH", 50, BASE_MS + 50_000)]))
    _drain(spark, bronze.location, out, ckpt)
    assert spark.read.parquet(out).count() == 9  # 8 + 1, no re-delivery


def test_frost_batch_pushdown_prunes_files(spark, tmp_path):
    """format("frost") batch reads receive pushed comparison filters and
    prune whole files via manifest min/max stats — the scan's partition
    count (one per surviving file) shrinks while results stay exact."""
    register_frost_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "pf"), "pf",
                         "k BIGINT, v DOUBLE")
    for lo in range(0, 500, 100):  # 5 files with disjoint k ranges
        t.append(spark.range(lo, lo + 100).coalesce(1).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")))

    df = spark.read.format("frost").option("location", t.location).load()
    pruned = df.filter((F.col("k") >= 250) & (F.col("k") <= 260))
    assert pruned.count() == 11  # rows exact regardless of pruning
    assert pruned.agg(F.min("k"), F.max("k")).first() == (250, 260)

    # the reader-level witness: pushed range filters shrink the file list
    # 5 -> 1 via manifest stats (the DF API hides source partition counts)
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual
    from open_finance_lakehouse_spark.streaming.frost_source import (
        FrostBatchReader,
    )

    rd = FrostBatchReader(t._empty_df().schema, t.location)
    assert len(rd.partitions()) == 5  # no filters: every file scans
    rd2 = FrostBatchReader(t._empty_df().schema, t.location)
    leftover = rd2.pushFilters([GreaterThanOrEqual(("k",), 250),
                                LessThanOrEqual(("k",), 260)])
    assert len(list(leftover)) == 2  # ALL filters re-applied by Spark
    assert len(rd2.partitions()) == 1  # 4 of 5 files pruned by stats


def test_frost_stream_starting_snapshot_latest(spark, bronze, tmp_path):
    """startingSnapshotId='latest': existing rows are NOT delivered; only
    commits after the query's first start flow."""
    out, ckpt = str(tmp_path / "out4"), str(tmp_path / "ckpt4")
    bronze.append(_rows(spark, [_event("BTC", i, BASE_MS + i * 1000)
                                for i in range(6)]))

    def drain():
        q = (spark.readStream.format("frost")
             .option("location", bronze.location)
             .option("startingSnapshotId", "latest").load()
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()  # pre-existing 6 rows skipped
    import os as _os
    n0 = (spark.read.parquet(out).count()
          if _os.path.isdir(out) and any(
              f.endswith(".parquet") for _r, _d, fs in _os.walk(out)
              for f in fs) else 0)
    assert n0 == 0

    bronze.append(_rows(spark, [_event("ETH", 50, BASE_MS + 50_000)]))
    drain()  # checkpointed offset — only the new commit flows
    assert spark.read.parquet(out).count() == 1


def test_frost_fresh_stream_after_expire_delivers_full_table(
        spark, bronze, tmp_path):
    """A NEW stream on a table whose pre-maintenance history was expired
    (only a rewrite snapshot survives) must still deliver every live row:
    the initial load materializes the current snapshot's live files, not
    a replay of (possibly truncated) append history."""
    from open_finance_lakehouse_spark.operators.compact import compact
    from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger

    bronze.append(_rows(spark, [_event("BTC", i, BASE_MS + i * 1000)
                                for i in range(8)]), max_records_per_file=2)
    compact(bronze, CheckpointLedger(str(tmp_path / "led")),
            "fresh-compact", target_bytes=8 * 1024 * 1024)
    bronze.expire_snapshots(retain_last=1)  # only the compact snapshot left
    assert {s.operation for s in bronze.snapshots()} == {"compact"}

    out, ckpt = str(tmp_path / "out5"), str(tmp_path / "ckpt5")
    _drain(spark, bronze.location, out, ckpt)
    assert spark.read.parquet(out).count() == 8  # NOT an empty first batch


def test_frost_pushdown_timestamp_filter_does_not_crash(spark, bronze):
    """Pushed timestamp filters arrive as datetime objects while manifest
    long stats are epoch-micros — the reader must canonicalize, prune
    correctly, and never throw a mixed-type comparison."""
    import datetime

    from pyspark.sql.datasource import GreaterThan
    from open_finance_lakehouse_spark.streaming.frost_source import (
        FrostBatchReader,
    )

    # two files in disjoint minute ranges
    bronze.append(_rows(spark, [_event("BTC", 1, BASE_MS)]))
    bronze.append(_rows(spark, [_event("BTC", 2, BASE_MS + 600_000)]))
    cutoff = datetime.datetime.fromtimestamp(
        (BASE_MS + 300_000) / 1000, datetime.timezone.utc)
    rd = FrostBatchReader(bronze._empty_df().schema, bronze.location)
    rd.pushFilters([GreaterThan(("trade_time",), cutoff)])
    assert len(rd.partitions()) == 1  # first file pruned, no TypeError

    # and through the engine path: row-exact
    df = (spark.read.format("frost").option("location", bronze.location)
          .load().filter(F.col("trade_time") > F.lit(cutoff)))
    assert df.count() == 1


def test_frost_batch_write_append_and_overwrite(spark, tmp_path):
    """df.write.format("frost"): append commits a snapshot; overwrite
    publishes a replace — both readable back via scan()."""
    register_frost_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "bw"), "bw",
                         "k BIGINT, v DOUBLE")
    df = spark.range(10).select(F.col("id").alias("k"),
                                (F.col("id") * 2.0).alias("v"))
    df.write.format("frost").option("location", t.location) \
        .mode("append").save()
    assert t.refresh().scan().count() == 10
    assert t.meta.snapshot().operation == "append"

    spark.range(3).select(F.col("id").alias("k"), F.lit(0.0).alias("v")) \
        .write.format("frost").option("location", t.location) \
        .mode("overwrite").save()
    assert t.refresh().scan().count() == 3
    assert t.meta.snapshot().operation == "replace"


def test_frost_stream_writer_exactly_once_pipe(spark, bronze, tmp_path):
    """frost→frost streaming pipe: readStream from bronze, writeStream
    into a copy table — counts match after two drains, and a re-drain
    with nothing new commits nothing (txn-marker exactly-once)."""
    copy = LakeTable.create(spark, str(tmp_path / "copy"), "copy",
                            BRONZE_DDL)
    ckpt = str(tmp_path / "ckpt_w")

    def pipe():
        q = (spark.readStream.format("frost")
             .option("location", bronze.location).load()
             .writeStream.format("frost")
             .option("location", copy.location)
             .option("txnAppId", "pipe-1")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    bronze.append(_rows(spark, [_event("BTC", i, BASE_MS + i * 1000)
                                for i in range(7)]))
    pipe()
    assert copy.refresh().scan().count() == 7

    bronze.append(_rows(spark, [_event("ETH", 50, BASE_MS + 50_000)]))
    pipe()
    assert copy.refresh().scan().count() == 8
    assert copy.scan().exceptAll(bronze.scan()).count() == 0
    assert bronze.scan().exceptAll(copy.scan()).count() == 0

    snaps = len(copy.snapshots())
    pipe()  # nothing new: no data snapshot may land
    data_snaps = [s for s in copy.refresh().snapshots()
                  if int(s.summary.get("added_records", 0) or 0) > 0]
    assert copy.scan().count() == 8
    assert len(data_snaps) == 2  # one per real micro-batch, none extra


def test_frost_writer_guards(spark, tmp_path):
    """Writer refusals: missing txnAppId (stream), declared contract,
    type-mismatched schema — each fails loudly before any data lands."""
    from open_finance_lakehouse_spark.quality.contracts import Contract

    register_frost_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "wg"), "wg",
                         "k BIGINT, v DOUBLE")

    # type mismatch (names match): refused, nothing committed
    bad = spark.range(3).select(F.col("id").alias("k"),
                                F.lit("oops").alias("v"))
    with pytest.raises(Exception, match="schema mismatch"):
        bad.write.format("frost").option("location", t.location) \
           .mode("append").save()
    assert t.refresh().current_snapshot_id() is None

    # contract-protected table: format("frost") bypasses enforcement
    c = LakeTable.create(spark, str(tmp_path / "wc"), "wc",
                         "k STRING, v DOUBLE",
                         contract=Contract(not_null=["k"]))
    good = spark.createDataFrame([("a", 1.0)], "k STRING, v DOUBLE")
    with pytest.raises(Exception, match="contract"):
        good.write.format("frost").option("location", c.location) \
            .mode("append").save()

    # streaming sink requires a per-query txnAppId
    src = LakeTable.create(spark, str(tmp_path / "ws"), "ws",
                           "k BIGINT, v DOUBLE")
    src.append(spark.range(2).select(F.col("id").alias("k"),
                                     F.lit(1.0).alias("v")))
    with pytest.raises(Exception, match="txnAppId"):
        q = (spark.readStream.format("frost")
             .option("location", src.location).load()
             .writeStream.format("frost").option("location", t.location)
             .option("checkpointLocation", str(tmp_path / "ck_g"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)


def test_frost_stream_writer_complete_mode_replaces(spark, bronze, tmp_path):
    """outputMode('complete') aggregation into a frost sink: every
    micro-batch REPLACES the table with the recomputed result."""
    agg_t = LakeTable.create(spark, str(tmp_path / "agg"), "agg",
                             "symbol STRING, n BIGINT")
    ckpt = str(tmp_path / "ck_c")

    def pipe():
        counts = (spark.readStream.format("frost")
                  .option("location", bronze.location).load()
                  .groupBy("symbol")
                  .agg(F.count(F.lit(1)).alias("n")))
        q = (counts.writeStream.outputMode("complete").format("frost")
             .option("location", agg_t.location)
             .option("txnAppId", "agg-pipe")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    bronze.append(_rows(spark, [_event("BTC", i, BASE_MS + i * 1000)
                                for i in range(4)]))
    pipe()
    got = {r["symbol"]: r["n"] for r in agg_t.refresh().scan().collect()}
    assert got == {"BTC": 4}

    bronze.append(_rows(spark, [_event("ETH", 9, BASE_MS + 9000),
                                _event("BTC", 10, BASE_MS + 10_000)]))
    pipe()
    got = {r["symbol"]: r["n"] for r in agg_t.refresh().scan().collect()}
    assert got == {"BTC": 5, "ETH": 1}  # replaced, not appended
    assert agg_t.meta.snapshot().operation == "replace"


def test_frost_batch_time_travel(spark, tmp_path):
    """option("snapshotId"): batch reads time-travel with the snapshot's
    commit-time schema, matching scan(snapshot_id=...)."""
    register_frost_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "tt"), "tt",
                         "k BIGINT, v DOUBLE")
    s1 = t.append(spark.range(5).select(F.col("id").alias("k"),
                                        F.lit(1.0).alias("v")))
    t.update_schema("k BIGINT, v DOUBLE, tag STRING")
    t.append(spark.createDataFrame([(9, 2.0, "new")],
                                   "k BIGINT, v DOUBLE, tag STRING"))

    old = (spark.read.format("frost").option("location", t.location)
           .option("snapshotId", str(s1.snapshot_id)).load())
    assert old.count() == 5
    assert set(old.columns) == {"k", "v"}  # pre-evolution schema

    cur = (spark.read.format("frost")
           .option("location", t.location).load())
    assert cur.count() == 6 and "tag" in cur.columns
