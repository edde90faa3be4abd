"""Post-drain run metrics from Structured Streaming progress telemetry.

The reference derives a late-data run report from the query's progress and
the checkpointed watermark after every silver run
(/root/reference/ofl/streaming/silver.py:265-314 and windows.py:109-149):
how many rows the watermark dropped, where the watermark stands, and which
windows are still open (not yet emitted in append mode). Re-expressed on
Spark's own telemetry: ``StreamingQueryProgress.stateOperators`` carries
``numRowsDroppedByWatermark`` per stateful operator and the event-time
watermark per trigger; open windows are derivable either from the final
aggregation state size (engine-reported) or from the drained input + the
watermark (data-derived) — the tests assert both against the JVM-free
mirror in ``streaming.windows``.

Run metrics and table metrics stay separate surfaces (the reference's
metrics discipline, /root/reference/ofl/streaming/metrics.py:1-26).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def progress_dicts(query) -> list[dict]:
    """recentProgress as plain dicts across PySpark versions."""
    out = []
    for p in query.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        else:
            j = p.json() if callable(getattr(p, "json", None)) else p.json
            out.append(json.loads(j))
    return out


def _parse_iso_us(ts: str) -> int:
    dt = datetime.strptime(ts.replace("Z", "+0000"),
                           "%Y-%m-%dT%H:%M:%S.%f%z")
    return int(dt.astimezone(timezone.utc).timestamp() * 1_000_000)


def _aggregation_state(ops: list[dict]) -> dict | None:
    """The windowed AGGREGATION's state entry. Spark lists state operators
    in PRE-order (sink side first), so for dedup→window-agg plans the
    aggregation is the FIRST ``stateStoreSave`` entry — ``ops[-1]`` would
    read the upstream dedup's retained-keys count instead. Select by
    operatorName, falling back to the first entry for engines that omit
    the name."""
    for so in ops:
        if "statestoresave" in str(so.get("operatorName", "")).lower():
            return so
    return ops[0] if ops else None


def run_report(query) -> dict:
    """Drain-level accounting: rows in/out per trigger, rows dropped by the
    watermark (summed over all stateful operators and triggers), the final
    watermark (ISO + epoch-µs), and the engine-reported open-group count
    (state rows of the windowed aggregation at the last trigger: groups
    buffered but not yet emitted in append mode).

    ``truncated`` flags when ``recentProgress`` hit Spark's retention cap
    (``spark.sql.streaming.numRecentProgressUpdates``, default 100): the
    per-trigger SUMS then cover only the retained window and under-count
    the drain — callers needing exact long-run totals should attach a
    StreamingQueryListener instead."""
    progs = progress_dicts(query)
    dropped = 0
    rows_in = 0
    watermark_iso = None
    open_groups = None
    for p in progs:
        rows_in += int(p.get("numInputRows", 0) or 0)
        for so in p.get("stateOperators", []):
            dropped += int(so.get("numRowsDroppedByWatermark", 0) or 0)
        wm = (p.get("eventTime") or {}).get("watermark")
        if wm and not wm.startswith("1970-01-01T00:00:00"):
            watermark_iso = wm
        agg = _aggregation_state(p.get("stateOperators", []))
        if agg is not None:
            open_groups = int(agg.get("numRowsTotal", 0) or 0)
    return {
        "batches": len(progs),
        "input_rows": rows_in,
        "dropped_by_watermark": dropped,
        "watermark": watermark_iso,
        "watermark_us": _parse_iso_us(watermark_iso) if watermark_iso else None,
        "open_groups": open_groups,
        "truncated": len(progs) >= _progress_cap(),
    }


def _progress_cap() -> int:
    """Spark's recentProgress retention cap — read from the live session's
    conf (it is tunable), falling back to the engine default of 100."""
    try:
        from pyspark.sql import SparkSession

        sess = SparkSession.getActiveSession()
        if sess is not None:
            return int(sess.conf.get(
                "spark.sql.streaming.numRecentProgressUpdates", "100"))
    except Exception:
        pass
    return 100


def open_windows(events: DataFrame, watermark_us: int | None,
                 window: str = "1 minute") -> DataFrame:
    """Data-derived open windows: (window_start, window_end, symbol) groups
    of the drained input whose window end is AFTER the watermark — exactly
    the groups append mode is still buffering (Spark emits a window once
    watermark >= end; the mirror's ``window_closed`` rule)."""
    w = events.select(F.window("trade_time", window).alias("w"), "symbol") \
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "symbol").distinct()
    if watermark_us is None:
        return w
    return w.filter(F.unix_micros("window_end") > F.lit(watermark_us))
