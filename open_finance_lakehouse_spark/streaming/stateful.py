"""Custom stateful streaming operator: per-symbol trade SESSIONIZATION via
``applyInPandasWithState`` (arbitrary stateful processing — the escape
hatch for operators Spark's windowed aggregations cannot express).

Semantics: consecutive trades of one symbol belong to one session while the
gap between event times stays under ``gap_ms``; a session CLOSES when a
later trade of that symbol arrives more than ``gap_ms`` after the
session's last trade, or when the state times out (event-time timeout
keyed to the watermark — so closure is driven by stream progress, exactly
like Spark's own session windows). Each closed session emits ONE row:

  symbol, session_start, session_end, n_trades, volume, vwap

Everything here follows the engine's streaming discipline:
- deterministic under replay: state transitions depend only on event
  times/values, ties broken by trade_id; batch order inside a group is
  normalized by sorting on (trade_time, trade_id);
- bounded state: one open session per symbol + the watermark timeout, the
  same bounded-state story as dropDuplicatesWithinWatermark;
- two code paths: ``sessionize_batch`` computes identical sessions over a
  static frame (pure pandas, no Spark) and the tests assert
  stream == batch (reference mirror discipline,
  /root/reference/ofl/streaming/windows.py:1-28).

The reference's silver lane has no session operator — this is part of the
beyond-reference streaming surface (SURVEY.md §2.9 T-items), built because
training-data pipelines cut audio/transcript streams into utterance
sessions with precisely this gap rule.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

SESSION_DDL = (
    "symbol STRING, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_trades LONG, volume DOUBLE, vwap DOUBLE"
)

_STATE_DDL = (
    "start_ms LONG, last_ms LONG, n LONG, volume DOUBLE, notional DOUBLE"
)


def _emit(symbol: str, st: tuple) -> dict:
    start_ms, last_ms, n, volume, notional = st
    return {
        "symbol": symbol,
        "session_start": pd.Timestamp(start_ms, unit="ms"),
        "session_end": pd.Timestamp(last_ms, unit="ms"),
        "n_trades": int(n),
        "volume": float(volume),
        "vwap": float(notional / volume) if volume else 0.0,
    }


def make_session_fn(gap_ms: int):
    """Returns the (key, batches, state) -> batches function for
    ``applyInPandasWithState`` with ``GroupStateTimeout.EventTimeTimeout``."""

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        symbol = key[0]
        if state.hasTimedOut:
            # watermark passed the open session's horizon — close and emit
            if state.exists:
                yield pd.DataFrame([_emit(symbol, tuple(state.get))])
                state.remove()
            return

        rows = []
        for pdf in pdf_iter:
            rows.append(pdf[["trade_time", "trade_id", "price", "qty"]])
        batch = pd.concat(rows).sort_values(["trade_time", "trade_id"])

        closed: list[dict] = []
        st = tuple(state.get) if state.exists else None
        for t, _tid, price, qty in batch.itertuples(index=False):
            ms = int(pd.Timestamp(t).value // 1_000_000)
            if st is not None and ms - st[1] > gap_ms:
                closed.append(_emit(symbol, st))
                st = None
            if st is None:
                st = (ms, ms, 1, float(qty), float(price) * float(qty))
            else:
                st = (st[0], max(st[1], ms), st[2] + 1,
                      st[3] + float(qty),
                      st[4] + float(price) * float(qty))
        state.update(st)
        # close the open session once the WATERMARK passes its gap horizon
        # (event-time timeout — deterministic against stream progress)
        state.setTimeoutTimestamp(st[1] + gap_ms)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def sessionize_stream(events, gap_ms: int = 60_000, watermark: str = "2 minutes"):
    """Streaming sessionization: watermark → groupBy(symbol) →
    applyInPandasWithState, append mode (rows emitted only on closure)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("trade_time", watermark)
        .groupBy("symbol")
        .applyInPandasWithState(
            make_session_fn(gap_ms),
            outputStructType=SESSION_DDL,
            stateStructType=_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(pdf: pd.DataFrame, gap_ms: int = 60_000) -> pd.DataFrame:
    """JVM-free mirror: identical session algebra over a static pandas frame
    (columns symbol, trade_time, trade_id, price, qty). Emits ALL sessions
    (a batch has a definite end, so nothing stays open)."""
    out: list[dict] = []
    for symbol, g in pdf.sort_values(
            ["symbol", "trade_time", "trade_id"]).groupby("symbol"):
        st = None
        for t, _tid, price, qty in g[
                ["trade_time", "trade_id", "price", "qty"]].itertuples(
                index=False):
            ms = int(pd.Timestamp(t).value // 1_000_000)
            if st is not None and ms - st[1] > gap_ms:
                out.append(_emit(symbol, st))
                st = None
            if st is None:
                st = (ms, ms, 1, float(qty), float(price) * float(qty))
            else:
                st = (st[0], max(st[1], ms), st[2] + 1,
                      st[3] + float(qty), st[4] + float(price) * float(qty))
        if st is not None:
            out.append(_emit(symbol, st))
    return pd.DataFrame(out)
