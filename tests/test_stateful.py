"""Custom stateful operator (applyInPandasWithState sessionization):
stream == JVM-free mirror, closure via in-batch gap AND via event-time
timeout keyed to the checkpointed watermark."""

from __future__ import annotations

import os

import pandas as pd

from open_finance_lakehouse_spark.streaming.ingest import (
    prepare_events,
    write_jsonl_batch,
)
from open_finance_lakehouse_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)

BASE = 1_700_000_040_000  # ms, minute-aligned


def _ev(sym, tid, off_s, p="10", q="2"):
    ts = BASE + off_s * 1000
    return {"e": "trade", "E": ts, "s": sym, "t": tid, "p": p, "q": q,
            "T": ts, "m": False}


def _drain(spark, landing, out_dir, ckpt):
    raw = (spark.readStream.format("text")
           .option("maxFilesPerTrigger", "1").load(landing))
    events = prepare_events(raw).filter("_valid")
    sessions = sessionize_stream(events, gap_ms=60_000)
    q = (sessions.writeStream.outputMode("append").format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_sessionization_stream_matches_mirror(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # file 1: BTC session A (0,10,20s), gap, session B (200,210s), gap,
    # session C opens at 500s (also drives the watermark)
    f1 = [_ev("BTC", 1, 0), _ev("BTC", 2, 10, p="20"), _ev("BTC", 3, 20),
          _ev("BTC", 4, 200), _ev("BTC", 5, 210),
          _ev("BTC", 6, 500)]
    # file 2: ETH opens at 900s (watermark → 780s, past C's 560s horizon)
    f2 = [_ev("ETH", 7, 900)]
    # file 3: ETH at 1000s closes ETH(900) by gap; BTC C closes by TIMEOUT
    f3 = [_ev("ETH", 8, 1000)]
    write_jsonl_batch(os.path.join(landing, "f1.jsonl"), f1)
    _drain(spark, landing, out, ckpt)
    got1 = spark.read.parquet(out)
    # in-batch closures only: sessions A and B
    assert got1.count() == 2

    write_jsonl_batch(os.path.join(landing, "f2.jsonl"), f2)
    _drain(spark, landing, out, ckpt)
    write_jsonl_batch(os.path.join(landing, "f3.jsonl"), f3)
    _drain(spark, landing, out, ckpt)

    got = spark.read.parquet(out).toPandas()
    # mirror over ALL events; the stream must have emitted every session
    # except the still-open tail (ETH@1000s)
    all_events = prepare_events(
        spark.createDataFrame(
            [(__import__("json").dumps(e),) for e in f1 + f2 + f3],
            "value string")
    ).filter("_valid").select(
        "symbol", "trade_time", "trade_id", "price", "qty").toPandas()
    mirror = sessionize_batch(all_events, gap_ms=60_000)

    def key(df):
        return sorted(
            (r.symbol, int(pd.Timestamp(r.session_start).value // 10**6),
             int(pd.Timestamp(r.session_end).value // 10**6),
             int(r.n_trades), float(r.volume), round(float(r.vwap), 9))
            for r in df.itertuples(index=False))

    open_tail = {("ETH", BASE + 1_000_000)}
    expected = [s for s in key(mirror)
                if (s[0], s[1]) not in open_tail]
    assert key(got) == expected
    # VWAP of session A: (10*2 + 20*2 + 10*2) / 6
    a = [s for s in key(got) if s[1] == BASE][0]
    assert a[3] == 3 and abs(a[5] - (80.0 / 6.0)) < 1e-9

    # replaying the last drain with no new data emits nothing new
    _drain(spark, landing, out, ckpt)
    assert spark.read.parquet(out).count() == len(expected)
