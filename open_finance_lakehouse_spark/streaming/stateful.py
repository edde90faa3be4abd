"""Custom stateful streaming operator: per-symbol trade SESSIONIZATION via
``applyInPandasWithState`` (arbitrary stateful processing — the escape
hatch for operators Spark's windowed aggregations cannot express).

Semantics: consecutive trades of one symbol belong to one session while the
gap between event times stays under ``gap_ms``. Closure is driven by the
WATERMARK, never by arrival order: a session emits only once the watermark
passes its gap horizon (``last + gap``), because until then an out-of-order
but in-watermark trade may still extend it — or BRIDGE it with a later
session. Eager closure on observing a larger gap (the naive fold) would
emit rows that batch semantics retroactively merge, and append mode can
never retract them; this operator therefore keeps ALL open sessions of a
key in state (as parallel arrays) and merges each micro-batch's trades
into that interval set. This is exactly how Spark's own
``session_window`` aggregation handles late bridging rows. Each closed
session emits ONE row:

  symbol, session_start, session_end, n_trades, volume, vwap

Engine streaming discipline held throughout:
- deterministic under replay: the interval merge folds points in
  (event-time, trade_id) order, so state transitions are independent of
  arrival interleaving;
- bounded state: open sessions all have horizons above the watermark, so
  a key holds at most (watermark delay / gap) + 1 sessions — the same
  bounded-state story as dropDuplicatesWithinWatermark;
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

# parallel arrays: one entry per OPEN session (sorted by start)
_STATE_DDL = (
    "starts array<long>, lasts array<long>, ns array<long>, "
    "vols array<double>, nots array<double>"
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


def _merge_sessions(sessions: list[tuple], gap_ms: int) -> list[tuple]:
    """Gap-merge a list of (start, last, n, vol, notional) intervals:
    sort by start, fold left — adjacent intervals within ``gap_ms`` fuse
    (bridging works because a point is a unit interval). Left-fold in
    start order keeps the float accumulation deterministic."""
    sessions = sorted(sessions, key=lambda s: (s[0], s[1]))
    out: list[tuple] = []
    for s in sessions:
        if out and s[0] - out[-1][1] <= gap_ms:
            p = out[-1]
            out[-1] = (p[0], max(p[1], s[1]), p[2] + s[2],
                       p[3] + s[3], p[4] + s[4])
        else:
            out.append(s)
    return out


def make_session_fn(gap_ms: int, tz: str = "UTC"):
    """Returns the (key, batches, state) -> batches function for
    ``applyInPandasWithState`` with ``GroupStateTimeout.EventTimeTimeout``.

    ``tz`` is the SESSION timezone (``spark.sql.session.timeZone``):
    Arrow hands pandas tz-naive timestamps in that zone, while the
    watermark is true UTC epoch-ms — all session arithmetic runs in
    session-tz WALL ms (matching the row values and the batch mirror)
    and the watermark/timeout convert at the boundary. With the
    engine's pinned UTC both conversions are identity."""

    def _wall(utc_ms: int) -> int:
        if tz == "UTC" or not utc_ms:
            return utc_ms
        return int(pd.Timestamp(utc_ms, unit="ms", tz="UTC")
                   .tz_convert(tz).tz_localize(None).value // 1_000_000)

    def _utc(wall_ms: int) -> int:
        if tz == "UTC":
            return wall_ms
        return int(pd.Timestamp(wall_ms, unit="ms").tz_localize(tz)
                   .tz_convert("UTC").value // 1_000_000)

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        symbol = key[0]
        wm = _wall(int(state.getCurrentWatermarkMs() or 0))
        if state.exists:
            starts, lasts, ns, vols, nots = state.get
            sessions = list(zip(starts, lasts, ns, vols, nots))
        else:
            sessions = []

        if not state.hasTimedOut:
            pts: list[tuple] = []
            for pdf in pdf_iter:
                for t, _tid, price, qty in pdf[
                        ["trade_time", "trade_id", "price", "qty"]
                        ].itertuples(index=False):
                    ms = int(pd.Timestamp(t).value // 1_000_000)
                    pts.append((ms, ms, 1, float(qty),
                                float(price) * float(qty)))
            sessions = _merge_sessions(sessions + pts, gap_ms)

        # a session is CLOSED once the watermark passes STRICTLY beyond
        # its horizon: a non-late row at ts == wm == last+gap would still
        # merge under the batch rule (closure only on strict gap excess),
        # so equality must keep the session open
        closed = [s for s in sessions if wm and s[1] + gap_ms < wm]
        open_ = [s for s in sessions if not (wm and s[1] + gap_ms < wm)]

        if open_:
            state.update((
                [s[0] for s in open_], [s[1] for s in open_],
                [s[2] for s in open_], [s[3] for s in open_],
                [s[4] for s in open_],
            ))
            # fire when the watermark passes the EARLIEST open horizon
            # (+1 ms: closure requires wm STRICTLY beyond the horizon;
            # EventTimeTimeout fires at wm >= timeout). The timeout API
            # takes true-UTC epoch-ms, so convert back from wall ms.
            state.setTimeoutTimestamp(
                _utc(min(s[1] + gap_ms for s in open_) + 1))
        else:
            state.remove()
        if closed:
            yield pd.DataFrame([_emit(symbol, s) for s in closed])

    return fn


def sessionize_stream(events, gap_ms: int = 60_000, watermark: str = "2 minutes"):
    """Streaming sessionization: watermark → groupBy(symbol) →
    applyInPandasWithState, append mode (rows emitted only on closure)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    return (
        events.withWatermark("trade_time", watermark)
        .groupBy("symbol")
        .applyInPandasWithState(
            make_session_fn(gap_ms, tz=tz),
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
    if not out:
        # a column-less frame would KeyError any consumer selecting the
        # documented session columns; empty must still carry the schema
        return pd.DataFrame(columns=[
            "symbol", "session_start", "session_end", "n_trades",
            "volume", "vwap"])
    return pd.DataFrame(out)
