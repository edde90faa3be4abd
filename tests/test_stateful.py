"""Custom stateful operator (applyInPandasWithState sessionization):
stream == JVM-free mirror, closure driven by the WATERMARK (never by
arrival order — an out-of-order but in-watermark trade must still be able
to extend or bridge sessions, so nothing emits before its horizon)."""

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


def _mirror(spark, events):
    all_events = prepare_events(
        spark.createDataFrame(
            [(__import__("json").dumps(e),) for e in events],
            "value string")
    ).filter("_valid").select(
        "symbol", "trade_time", "trade_id", "price", "qty").toPandas()
    return sessionize_batch(all_events, gap_ms=60_000)


def _key(df):
    return sorted(
        (r.symbol, int(pd.Timestamp(r.session_start).value // 10**6),
         int(pd.Timestamp(r.session_end).value // 10**6),
         int(r.n_trades), float(r.volume), round(float(r.vwap), 9))
        for r in df.itertuples(index=False))


def test_sessionization_stream_matches_mirror(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # file 1: BTC session A (0,10,20s), gap, session B (200,210s), gap,
    # session C opens at 500s (also drives the watermark)
    f1 = [_ev("BTC", 1, 0), _ev("BTC", 2, 10, p="20"), _ev("BTC", 3, 20),
          _ev("BTC", 4, 200), _ev("BTC", 5, 210),
          _ev("BTC", 6, 500)]
    # file 2: ETH opens at 900s (watermark → 380s: A and B close)
    f2 = [_ev("ETH", 7, 900)]
    # file 3: ETH at 1000s (watermark → 780s: BTC C closes via timeout)
    f3 = [_ev("ETH", 8, 1000)]
    # file 4: ETH at 1300s (watermark → 880s+: both earlier ETH sessions'
    # horizons (960s, 1060s) close once the watermark passes them)
    f4 = [_ev("ETH", 9, 1300)]
    write_jsonl_batch(os.path.join(landing, "f1.jsonl"), f1)
    _drain(spark, landing, out, ckpt)
    # WATERMARK-driven closure: after batch 1 the watermark advances to
    # 380s (500s − 2min) and the no-data micro-batch fires the timeout —
    # A (horizon 80s) and B (270s) close; C (560s) must stay open even
    # though the in-batch fold already SAW a bigger gap after it
    assert spark.read.parquet(out).count() == 2

    write_jsonl_batch(os.path.join(landing, "f2.jsonl"), f2)
    _drain(spark, landing, out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.count() == 3  # + C via timeout (horizon 560s < wm 780s)

    write_jsonl_batch(os.path.join(landing, "f3.jsonl"), f3)
    _drain(spark, landing, out, ckpt)
    write_jsonl_batch(os.path.join(landing, "f4.jsonl"), f4)
    _drain(spark, landing, out, ckpt)

    got = spark.read.parquet(out).toPandas()
    mirror = _mirror(spark, f1 + f2 + f3 + f4)
    # the stream must have emitted every session except the still-open
    # tail (ETH@1300s, horizon above the final watermark)
    open_tail = {("ETH", BASE + 1_300_000)}
    expected = [s for s in _key(mirror) if (s[0], s[1]) not in open_tail]
    assert _key(got) == expected
    # VWAP of session A: (10*2 + 20*2 + 10*2) / 6
    a = [s for s in _key(got) if s[1] == BASE][0]
    assert a[3] == 3 and abs(a[5] - (80.0 / 6.0)) < 1e-9

    # replaying the last drain with no new data emits nothing new
    _drain(spark, landing, out, ckpt)
    assert spark.read.parquet(out).count() == len(expected)


def test_sessionization_out_of_order_extends_open_session(spark, tmp_path):
    """The regression the watermark-driven design exists for: a trade
    arriving LATER but timestamped EARLIER (still within the watermark)
    must extend the session it belongs to — the eager fold had already
    emitted a wrong session row that append mode can never retract."""
    landing = str(tmp_path / "landing2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")

    # batch 1: BTC at 0s and at 100s (gap 100s > 60s -> two sessions)
    f1 = [_ev("BTC", 1, 0), _ev("BTC", 2, 100)]
    # batch 2: OUT-OF-ORDER BTC at 30s — joins the FIRST session (30<=60)
    # but not the second (100-30=70>60); watermark still 0 at processing
    f2 = [_ev("BTC", 3, 30)]
    # batch 3: far-future trade drives the watermark past every horizon
    f3 = [_ev("BTC", 4, 1000)]
    for i, f in enumerate((f1, f2, f3)):
        write_jsonl_batch(os.path.join(landing, f"f{i}.jsonl"), f)
        _drain(spark, landing, out, ckpt)

    got = spark.read.parquet(out).toPandas()
    mirror = _mirror(spark, f1 + f2 + f3)
    open_tail = {("BTC", BASE + 1_000_000)}
    expected = [s for s in _key(mirror) if (s[0], s[1]) not in open_tail]
    assert _key(got) == expected
    # the first emitted session is [0s, 30s] with BOTH trades
    first = expected[0]
    assert first[1] == BASE and first[2] == BASE + 30_000 and first[3] == 2


def test_sessionize_batch_empty_keeps_schema():
    """Zero rows must still return the documented session columns — a
    column-less frame KeyErrors any consumer selecting them."""
    import pandas as pd

    from open_finance_lakehouse_spark.streaming.stateful import (
        sessionize_batch,
    )

    out = sessionize_batch(pd.DataFrame(
        columns=["symbol", "trade_time", "trade_id", "price", "qty"]))
    assert list(out.columns) == ["symbol", "session_start", "session_end",
                                 "n_trades", "volume", "vwap"]
    assert len(out) == 0


def test_write_jsonl_batch_bare_filename(tmp_path, monkeypatch):
    """A path with no directory component must land in the cwd, not
    crash on makedirs('')."""
    from open_finance_lakehouse_spark.streaming.ingest import (
        write_jsonl_batch,
    )

    monkeypatch.chdir(tmp_path)
    write_jsonl_batch("events.jsonl", [{"a": 1}])
    assert (tmp_path / "events.jsonl").read_text().strip() == '{"a": 1}'
