"""Streaming-lane tests: wire-schema validation split, dual-sink ingest
with idempotent replay across separate queries, availableNow drain,
watermark/window mirror equivalence (reference layers 3/4/6,
/root/reference/tests/test_streaming_windows.py and
/root/reference/tools/streaming_idempotence.py patterns)."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.streaming import windows as mw
from open_finance_lakehouse_spark.streaming.ingest import (
    StreamingIngest,
    build_minute_rollup,
    prepare_events,
    write_jsonl_batch,
)

US = mw.MICROS_PER_SEC


# ------------------------------------------------------------- pure mirror


def test_window_boundary_belongs_to_later_window():
    size = 60 * US
    assert mw.window_of(59_999_999, size) == (0, size)
    assert mw.window_of(60 * US, size) == (size, 2 * size)  # boundary → later


def test_pre_epoch_floor_division():
    size = 60 * US
    start, end = mw.window_of(-1, size)
    assert start == -size and end == 0


def test_watermark_moves_only_forward_and_late_rule():
    t = mw.WatermarkTracker(delay_us=120 * US)
    t.observe(300 * US)
    assert t.advance() == 180 * US
    t.observe(240 * US)  # older event must not move watermark back
    assert t.advance() == 180 * US
    assert t.is_late(179 * US)
    assert not t.is_late(180 * US)  # on-watermark survives (strictly-before)


def test_tumbling_aggregate_emits_closed_windows_and_drops_late():
    size, delay = 60 * US, 120 * US
    batches = [
        [(10 * US, "A"), (70 * US, "A"), (70 * US, "B")],
        [(400 * US, "A")],          # advances watermark to 280s → closes all
        [(5 * US, "A")],            # late: before watermark
    ]
    emitted, dropped = mw.tumbling_aggregate(size, delay, batches)
    assert emitted == {(0, "A"): 1, (60 * US, "A"): 1, (60 * US, "B"): 1}
    assert dropped == 1


# --------------------------------------------------------- validation split


def _mk_raw(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def good_event(sym="BTC", tid=1, ts_ms=1_700_000_000_000, p="100.5", q="2"):
    return {"e": "trade", "E": ts_ms, "s": sym, "t": tid, "p": p, "q": q,
            "T": ts_ms, "m": False}


def test_prepare_events_validity_reasons(spark):
    rows = [
        json.dumps(good_event()),
        "not json at all {",
        json.dumps({"e": "trade", "E": 1, "s": "ETH", "t": 2, "p": "1.0",
                    "q": "3", "m": True}),              # missing T
        json.dumps(good_event(sym="SOL", tid=3, p="NaNope")),  # bad decimal
    ]
    out = prepare_events(_mk_raw(spark, rows)).collect()
    by_reason = {r["_reason"]: r for r in out}
    assert by_reason[None]["_valid"] and by_reason[None]["symbol"] == "BTC"
    assert by_reason[None]["event_key"] == "BTC:1"
    assert by_reason[None]["price"] == 100.5
    assert "unparseable_json" in by_reason
    assert "missing_required_field" in by_reason
    assert "bad_decimal" in by_reason
    assert not by_reason["bad_decimal"]["_valid"]


# ---------------------------------------------------- rollup algebra (batch)


def test_minute_rollup_deterministic_ohlc(spark):
    base = 1_700_000_040_000  # exactly on a minute boundary
    rows = [
        good_event("BTC", 1, base + 1_000, "10", "1"),
        good_event("BTC", 2, base + 2_000, "30", "1"),
        good_event("BTC", 3, base + 59_000, "20", "2"),
        good_event("BTC", 4, base + 61_000, "40", "1"),   # next minute
        good_event("BTC", 3, base + 59_000, "20", "2"),   # exact duplicate
    ]
    ev = prepare_events(_mk_raw(spark, [json.dumps(r) for r in rows])) \
        .filter("_valid")
    bars = {r["window_start"].isoformat(): r
            for r in build_minute_rollup(ev).collect()}
    assert len(bars) == 2
    first = sorted(bars)[0]
    b = bars[first]
    # dedup removed the replayed trade_id 3 → counts and volume exclude it
    assert b["n_trades"] == 3 and b["volume"] == 4.0
    assert (b["open"], b["close"], b["high"], b["low"]) == (10.0, 20.0, 30.0, 10.0)


def test_rollup_matches_pure_python_mirror(spark):
    """Spark window assignment == the JVM-free mirror, including the
    boundary-to-later-window rule (reference layer-3 discipline)."""
    base_ms = 1_700_000_040_000  # exactly on a minute boundary
    rows = [good_event("X", i, base_ms + off_ms, "1", "1")
            for i, off_ms in enumerate([0, 59_999, 60_000, 61_000])]
    ev = prepare_events(_mk_raw(spark, [json.dumps(r) for r in rows])) \
        .filter("_valid")
    bars = build_minute_rollup(ev).collect()
    spark_counts = {
        int(r["window_start"].timestamp() * US): r["n_trades"] for r in bars}

    size = 60 * US
    mirror: dict[int, int] = {}
    for i, off_ms in enumerate([0, 59_999, 60_000, 61_000]):
        ts_us = (base_ms + off_ms) * 1000
        start, _ = mw.window_of(ts_us, size)
        mirror[start] = mirror.get(start, 0) + 1
    assert spark_counts == mirror


# ------------------------------------------------- end-to-end micro-batches


@pytest.mark.parametrize("replays", [1, 2])
def test_bronze_dual_sink_availablenow_idempotent(spark, tmp_path, replays):
    """Drain a landing dir with availableNow; re-running the same drain (and
    re-delivering the same batch) leaves committed table state identical —
    verified on TABLE STATE, not run stats (reference layer-6,
    /root/reference/tools/streaming_idempotence.py:17-23)."""
    landing = str(tmp_path / "landing")
    work = str(tmp_path / "stream")
    events = [good_event("BTC", i, 1_700_000_000_000 + i * 1000)
              for i in range(20)]
    bad = ["junk{", json.dumps({"e": "trade", "s": "ETH"})]
    write_jsonl_batch(os.path.join(landing, "b0.jsonl"),
                      events[:10])
    with open(os.path.join(landing, "b1.jsonl"), "w") as f:
        f.write("\n".join([json.dumps(e) for e in events[10:]] + bad))

    ing = StreamingIngest(spark, work)
    for _ in range(replays):
        q = ing.start_bronze(landing, available_now=True)
        q.awaitTermination(120)
        assert not q.isActive

    bronze = ing.bronze.scan()
    assert bronze.count() == 20
    assert bronze.select("event_key").distinct().count() == 20
    dead = ing.dead.scan().collect()
    assert sorted(r["_reason"] for r in dead) == \
        ["missing_required_field", "unparseable_json"]

    # direct replay of an already-committed batch id is a measured no-op
    snaps_before = len(ing.bronze.refresh().snapshots())
    ing.write_batch(_mk_raw(spark, [json.dumps(e) for e in events[:10]]), 0)
    assert len(ing.bronze.refresh().snapshots()) == snaps_before

    bars = ing.run_silver_rollup().collect()
    assert sum(r["n_trades"] for r in bars) == 20


def test_streaming_silver_watermarked_window(spark, tmp_path):
    """True streaming aggregation: watermark + tumbling window + bounded
    dedup in append mode over a file source, drained with availableNow."""
    landing = str(tmp_path / "landing2")
    base = 1_700_000_000_000
    evs = [good_event("BTC", i, base + i * 10_000) for i in range(30)]
    evs.append(good_event("BTC", 5, base + 50_000))  # duplicate event_key
    write_jsonl_batch(os.path.join(landing, "all.jsonl"), evs)

    raw = spark.readStream.format("text").load(landing)
    bars = build_minute_rollup(prepare_events(raw).filter("_valid"))
    out = str(tmp_path / "out")
    q = (
        bars.writeStream.outputMode("append").format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # watermark closed all but the tail window; emitted bars are exact,
    # duplicate suppressed by dropDuplicatesWithinWatermark
    emitted = {r["window_start"].isoformat(): r["n_trades"]
               for r in got.collect()}
    # events every 10s from 22:13:20 for 30 ticks; watermark (max−2min =
    # 22:16:10) closes the first three windows: partial [22:13,22:14) = 4
    # trades, then 6 per full minute; the duplicate event_key is suppressed
    # by dropDuplicatesWithinWatermark; later windows stay open (append)
    assert sorted(emitted.values()) == [4, 6, 6]


# ------------------------------------------------------ streaming upsert


def test_streaming_upsert_foreachbatch_merge(spark, tmp_path):
    """The frost sink's update-mode recipe: foreachBatch + merge_into with
    source_token=f"batch-{batch_id}". A REAL stream (file source, flat
    landing files, maxFilesPerTrigger=1 → one merge per micro-batch)
    applies out-of-order duplicate rows; the final table equals the
    batch-MERGE oracle, and a replayed micro-batch is a metadata no-op."""
    import shutil

    from open_finance_lakehouse_spark.format.table import LakeTable
    from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
    from open_finance_lakehouse_spark.streaming.upsert import streaming_upsert

    t = LakeTable.create(
        spark, str(tmp_path / "fact"), "fact",
        "series_id STRING, day DATE, value DOUBLE",
        partition_spec={"kind": "bucket", "column": "series_id",
                        "num_buckets": 2})
    t.append(spark.sql("""
        SELECT concat('s', cast(id % 8 AS STRING)) AS series_id,
               date_add(date'2026-01-01', cast(id / 8 AS INT)) AS day,
               cast(id AS DOUBLE) AS value FROM range(40)"""),
        max_records_per_file=8)
    base = {(r["series_id"], str(r["day"])): r["value"]
            for r in t.scan().collect()}

    src_ddl = ("series_id STRING, day DATE, value DOUBLE, "
               "op STRING, seq LONG")
    # batch A: update (s1, 01-01) — winner seq 3 sandwiched between stale
    # seq 1/2 duplicates (out-of-order WITHIN the batch; salted dedup
    # resolves) + insert a brand-new key. batch B: delete + update.
    # Key-disjoint batches: final state is batch-order independent.
    batches = [
        [("s1", "2026-01-01", -1.0, "U", 1),
         ("s1", "2026-01-01", 111.0, "U", 3),
         ("s1", "2026-01-01", -2.0, "U", 2),
         ("s9", "2026-03-01", 900.0, "U", 1)],
        [("s2", "2026-01-01", None, "D", 5),
         ("s3", "2026-01-02", 333.0, "U", 5)],
    ]
    # land as FLAT files (the parquet file source does not recurse into
    # subdirectories) with increasing mtimes so batch order is stable
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, src_ddl.replace("DATE", "STRING")
        ).withColumn("day", F.col("day").cast("date"))
        stage = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = str(landing / f"b{i}.parquet")
        shutil.copyfile(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    led = CheckpointLedger(str(tmp_path / "led"))
    inner = streaming_upsert(t, led, "stream-upsert",
                             key=["series_id", "day"], n_salts=2)
    seen = []  # (batch_id, rows) — replayed verbatim below

    def sink(df, bid):
        seen.append((bid, df.collect()))
        inner(df, bid)

    q = (spark.readStream.schema(src_ddl).option("maxFilesPerTrigger", "1")
         .parquet(str(landing))
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert q.exception() is None
    assert len(seen) == 2  # maxFilesPerTrigger=1 → one merge per file

    after = {(r["series_id"], str(r["day"])): r["value"]
             for r in t.scan().collect()}
    # batch-MERGE oracle: base minus delete, plus update winners + insert
    expected = dict(base)
    expected[("s1", "2026-01-01")] = 111.0
    expected[("s3", "2026-01-02")] = 333.0
    expected[("s9", "2026-03-01")] = 900.0
    del expected[("s2", "2026-01-01")]
    assert after == expected

    # replay the FIRST recorded micro-batch verbatim (same batch_id, same
    # rows — what Spark's checkpoint does after a crash): metadata no-op
    snaps = len(t.snapshots())
    bid, rows = seen[0]
    inner(spark.createDataFrame(rows,
                                t._empty_df().schema.add("op", "string")
                                .add("seq", "long")), bid)
    assert len(t.snapshots()) == snaps
    assert {(r["series_id"], str(r["day"])): r["value"]
            for r in t.scan().collect()} == expected


def test_streaming_upsert_never_advances_past_conflicted_partitions(
        spark, tmp_path, monkeypatch):
    """Regression: merge_into SURRENDERS conflicted partitions (returns
    partitions_conflicted > 0 instead of raising); the sink once advanced
    the batch watermark anyway, so the replay was rejected as done and the
    surrendered partition's upserts were lost forever. The sink must
    retry the merge (same source_token: committed partitions no-op) and,
    if still conflicted, raise WITHOUT advancing the watermark."""
    from open_finance_lakehouse_spark.format.table import LakeTable
    from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
    from open_finance_lakehouse_spark.streaming import upsert as up

    t = LakeTable.create(
        spark, str(tmp_path / "cfact"), "cfact",
        "series_id STRING, day DATE, value DOUBLE",
        partition_spec={"kind": "bucket", "column": "series_id",
                        "num_buckets": 2})
    t.append(spark.sql("""
        SELECT concat('s', cast(id % 4 AS STRING)) AS series_id,
               date_add(date'2026-01-01', cast(id / 4 AS INT)) AS day,
               cast(id AS DOUBLE) AS value FROM range(16)"""),
        max_records_per_file=4)
    batch = (spark.createDataFrame(
        [("s1", "2026-01-01", 111.0, "U", 3)],
        "series_id STRING, day STRING, value DOUBLE, op STRING, seq LONG")
        .withColumn("day", F.col("day").cast("date")))

    led = CheckpointLedger(str(tmp_path / "led"))
    real = up.merge_into
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return {"partitions_conflicted": 1}
        return real(*a, **kw)

    monkeypatch.setattr(up, "merge_into", flaky)
    sink = up.streaming_upsert(t, led, "cw", key=["series_id", "day"],
                               n_salts=2)
    sink(batch, 0)  # first attempt "conflicts", retry applies for real
    assert calls["n"] == 2
    assert led.get("cw", up.TXN_PARTITION_ID).file_set_hash == "0"
    assert (t.refresh().scan()
            .filter("series_id = 's1' AND day = date'2026-01-01'")
            .first()["value"] == 111.0)

    # permanently conflicted: the sink raises and the watermark stays put
    monkeypatch.setattr(
        up, "merge_into", lambda *a, **kw: {"partitions_conflicted": 2})
    sink2 = up.streaming_upsert(t, led, "cw2", key=["series_id", "day"],
                                n_salts=2, conflict_retries=1)
    with pytest.raises(RuntimeError, match="still.*conflicted"):
        sink2(batch, 0)
    assert led.get("cw2", up.TXN_PARTITION_ID) is None
