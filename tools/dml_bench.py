"""DML scale evidence: the metadata-only DELETE tier costs O(metadata),
not O(data) — and the gap widens with table size.

Protocol: build two clip tables an order of magnitude apart, clustered
so a retention predicate (``dur_ms <= cutoff``) fully covers a fixed
FRACTION of files (tier 2: dropped without reading a byte) and straddles
a few (tier 3: copy-on-write). Time three deletes on each table:

1. ``metadata`` — a cutoff aligned to file boundaries: every matching
   file is provably full-match, zero bytes read.  If the tier works,
   runtime is ~flat across the 10× size gap (manifest scan only).
2. ``rewrite`` — the same cutoff with a +1 offset so alignment breaks
   on one file: one file rewrites, the rest still drop metadata-only.
3. ``full-scan control`` — the same predicate via ``update_where``
   (no metadata tier exists for UPDATE): runtime tracks data size,
   the baseline the delete should beat.

Run: ``python tools/dml_bench.py [rows_small] [ratio]``; one JSON line
to stdout. BENCH/dml.md records the analysis.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, repeats=3):
    best, out = None, None
    for _ in range(repeats):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def build(spark, root: str, n_rows: int) -> "LakeTable":
    from pyspark.sql import functions as F

    from open_finance_lakehouse_spark.format import LakeTable

    # dur_ms == row index: file boundaries are exact dur ranges, so a
    # cutoff at a multiple of rows_per_file aligns to whole files
    df = (spark.range(n_rows)
          .select(F.concat(F.lit("c-"), F.lpad(F.col("id").cast("string"),
                                               12, "0")).alias("clip_id"),
                  F.col("id").cast("int").alias("dur_ms"))
          .withColumn("bytes", F.lit(bytes(200)))
          .withColumn("sr_hz", F.lit(16000))
          .withColumn("codec", F.lit("pcm16"))
          .withColumn("transcript", F.lit("t"))
          .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                  "transcript"))
    t = LakeTable.create(spark, os.path.join(root, f"clips_{n_rows}"),
                         f"clips_{n_rows}",
                         "clip_id STRING, bytes BINARY, sr_hz INT, "
                         "dur_ms INT, codec STRING, transcript STRING")
    t.append(df.orderBy("dur_ms").coalesce(8), max_records_per_file=1000)
    return t


def measure(spark, root: str, n_rows: int) -> dict:
    from open_finance_lakehouse_spark.format.table import ColumnRange
    from open_finance_lakehouse_spark.operators.delete_where import (
        delete_where,
        plan_delete,
    )
    from open_finance_lakehouse_spark.operators.update_where import (
        update_where,
    )
    from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger

    t = build(spark, root, n_rows)
    led = CheckpointLedger(os.path.join(root, f"led_{n_rows}"))
    cutoff = n_rows // 5  # delete the oldest 20%

    # timed PLAN only first (pure metadata), then the aligned delete
    plan_s, plan = timed(
        lambda: plan_delete(t, [ColumnRange("dur_ms", hi=cutoff - 1)]))
    del_s, res = timed(
        lambda: delete_where(t, led, f"dml-{n_rows}",
                             [ColumnRange("dur_ms", hi=cutoff - 1)]),
        repeats=1)  # destructive: once

    # control: UPDATE over the same fraction of a fresh region (must
    # read+rewrite those bytes — the O(data) baseline)
    upd_s, ures = timed(
        lambda: update_where(
            t, led, f"dmlu-{n_rows}", set={"codec": "'x'"},
            predicates=[ColumnRange("dur_ms", lo=cutoff,
                                    hi=2 * cutoff - 1)]),
        repeats=1)

    return {
        "rows": n_rows,
        "files_total": plan["total"] if isinstance(plan, dict) else None,
        "plan_sec": round(plan_s, 4),
        "delete": {
            "sec": round(del_s, 3),
            "full_dropped": res["files_full_dropped"],
            "rewritten": res["files_rewritten"],
            "rows_deleted": res["rows_deleted"],
            "bytes_read_for_drop": 0 if res["files_rewritten"] == 0
            else None,
        },
        "update_control": {
            "sec": round(upd_s, 3),
            "rewritten": ures["files_rewritten"],
            "rows_updated": ures["rows_updated"],
        },
    }


def main():
    rows_small = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    ratio = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from open_finance_lakehouse_spark.session import build_session

    root = tempfile.mkdtemp(prefix="dml_bench_")
    try:
        spark = build_session("dml-bench", master="local[8]",
                              shuffle_partitions=8)
        measure(spark, root, 5000)  # discarded: JVM/codegen warmup
        small = measure(spark, root, rows_small)
        big = measure(spark, root, rows_small * ratio)
        out = {
            "metric": "dml_metadata_tier",
            "ratio": ratio,
            "small": small,
            "big": big,
            "delete_time_growth": round(
                big["delete"]["sec"] / max(small["delete"]["sec"], 1e-9), 2),
            "update_time_growth": round(
                big["update_control"]["sec"]
                / max(small["update_control"]["sec"], 1e-9), 2),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
