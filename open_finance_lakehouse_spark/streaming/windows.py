"""JVM-free mirror of Spark's tumbling-window + watermark algebra.

Pattern from the reference (/root/reference/ofl/streaming/windows.py:1-28:
a pure-Python reimplementation of exactly the engine semantics the
streaming lane relies on, unit-tested without a SparkSession) — the tests
assert our Spark results against this mirror, so a semantic drift in either
is caught.

Semantics mirrored (Spark's documented rules):
- tumbling windows are epoch-floored, [start, end); a boundary timestamp
  belongs to the LATER window;
- watermark = max observed event time − delay; only moves forward;
- the windowed AGGREGATION drops a row iff its window's END <= watermark
  (that window's state was already emitted and evicted) — a row behind
  the watermark whose window is still open IS aggregated;
- per-event lateness (``is_late``, event time < watermark) is the
  DEDUP-state rule (dropDuplicatesWithinWatermark's eviction horizon),
  not the aggregation's;
- a window can emit (append mode) once watermark >= window end.
"""

from __future__ import annotations

from dataclasses import dataclass

MICROS_PER_SEC = 1_000_000


def floor_window_start(ts_us: int, size_us: int) -> int:
    """Epoch-floored window start (floor division handles pre-epoch)."""
    return (ts_us // size_us) * size_us


def window_of(ts_us: int, size_us: int) -> tuple[int, int]:
    start = floor_window_start(ts_us, size_us)
    return start, start + size_us


@dataclass
class WatermarkTracker:
    delay_us: int
    watermark_us: int | None = None
    _max_event_us: int | None = None

    def observe(self, ts_us: int) -> None:
        if self._max_event_us is None or ts_us > self._max_event_us:
            self._max_event_us = ts_us

    def advance(self) -> int | None:
        """Batch boundary: watermark moves to max_event − delay, never back
        (Spark advances at the END of a batch; batch N filters with batch
        N−1's watermark)."""
        if self._max_event_us is None:
            return self.watermark_us
        cand = self._max_event_us - self.delay_us
        if self.watermark_us is None or cand > self.watermark_us:
            self.watermark_us = cand
        return self.watermark_us

    def is_late(self, ts_us: int) -> bool:
        return self.watermark_us is not None and ts_us < self.watermark_us

    def window_closed(self, window_end_us: int) -> bool:
        return self.watermark_us is not None \
            and self.watermark_us >= window_end_us


def tumbling_aggregate(size_us: int, delay_us: int, batches):
    """Reference implementation of watermarked windowed counting over a
    sequence of micro-batches. ``batches`` is a list of lists of
    (ts_us, key); returns (emitted, dropped_late) where emitted maps
    (window_start, key) -> count for CLOSED windows only (append mode).

    The drop rule is the aggregation's: a row is discarded iff its
    WINDOW's end <= the watermark (the window already emitted and its
    state was evicted) — a behind-the-watermark row whose window is
    still open joins the aggregate, exactly as Spark's stateStoreSave
    operator behaves."""
    tracker = WatermarkTracker(delay_us)
    state: dict[tuple[int, str], int] = {}
    emitted: dict[tuple[int, str], int] = {}
    dropped = 0
    for batch in batches:
        for ts_us, key in batch:
            start, end = window_of(ts_us, size_us)
            if tracker.window_closed(end):
                dropped += 1
                continue
            state[(start, key)] = state.get((start, key), 0) + 1
            tracker.observe(ts_us)
        tracker.advance()
        for (start, key) in list(state):
            if tracker.window_closed(start + size_us):
                emitted[(start, key)] = state.pop((start, key))
    return emitted, dropped
