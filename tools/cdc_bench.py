"""CDC cost evidence: change-feed read time tracks CHANGE VOLUME, not
table size.

Protocol: build two bucket-partitioned clip tables an order of magnitude
apart in row count but with identical file sizing, apply the SAME-sized
MERGE batch (same key count, same payload shape) to each, then time

1. ``operators.changelog.table_changes`` over the merge interval
   (count + per-change-type aggregate — forces the full diff), and
2. the same interval after a row-preserving compact commit lands inside
   it (maintenance must contribute nothing AND read nothing), and
3. a maintenance-ONLY interval (zero changes, near-zero time).

If CDC were O(table), the big table's read would be ~RATIO× slower; the
claim in operators/changelog.py is that both reads cost the touched-file
bytes of the merge commit only.  Run:

    python tools/cdc_bench.py [rows_small] [ratio] [merge_keys]

Writes one JSON line to stdout; BENCH/cdc.md records the analysis.
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
    """min-of-N wall time (seconds) + the last result."""
    best, out = None, None
    for _ in range(repeats):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def build_and_measure(spark, root: str, n_rows: int, merge_keys: int) -> dict:
    from pyspark.sql import functions as F

    from open_finance_lakehouse_spark.format import LakeTable
    from open_finance_lakehouse_spark.operators.changelog import table_changes
    from open_finance_lakehouse_spark.operators.compact import compact
    from open_finance_lakehouse_spark.operators.merge_into import merge_into
    from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
    from open_finance_lakehouse_spark.sources.synth import (
        CLIP_SCHEMA_DDL,
        synth_clips,
    )

    loc = os.path.join(root, f"clips_{n_rows}")
    t = LakeTable.create(
        spark, loc, f"clips_{n_rows}", CLIP_SCHEMA_DDL,
        partition_spec={"kind": "bucket", "column": "clip_id",
                        "num_buckets": 8})
    # identical file sizing across scales: file COUNT grows with the table,
    # bytes-per-file stays fixed — the shape a streaming writer produces
    t.append(synth_clips(spark, n_rows, dur_max_ms=600),
             max_records_per_file=200)
    base = t.current_snapshot_id()
    n_files = len(t.live_files())

    # the SAME-sized merge batch at every scale: update half the keys,
    # delete the other half — change volume is constant by construction
    ids = [r["clip_id"] for r in
           t.scan().select("clip_id").orderBy("clip_id")
           .limit(merge_keys).collect()]
    upd, dele = ids[: merge_keys // 2], ids[merge_keys // 2:]
    rows = t.scan().filter(F.col("clip_id").isin(ids))
    src = (
        rows.filter(F.col("clip_id").isin(upd))
        .withColumn("transcript", F.concat(F.lit("v2 "), "transcript"))
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(2).cast("long"))
        .unionByName(
            rows.filter(F.col("clip_id").isin(dele))
            .withColumn("op", F.lit("D"))
            .withColumn("seq", F.lit(2).cast("long")))
    )
    led = CheckpointLedger(os.path.join(root, f"led_{n_rows}"))
    mres = merge_into(t, src, led, f"cdc-merge-{n_rows}",
                      source_token="cdc-b1")
    after_merge = t.current_snapshot_id()

    def drain():
        df = table_changes(t, base, after_merge)
        return {r["_change_type"]: r["n"] for r in
                df.groupBy("_change_type").agg(F.count("*").alias("n"))
                .collect()}

    t_merge, counts = timed(drain)

    # land a row-preserving compact INSIDE a wider interval: CDC must not
    # read it (same counts, no extra cost beyond the merge diff)
    compact(t, led, f"cdc-compact-{n_rows}")
    after_compact = t.refresh().current_snapshot_id()

    def drain_wide():
        df = table_changes(t, base, after_compact)
        return {r["_change_type"]: r["n"] for r in
                df.groupBy("_change_type").agg(F.count("*").alias("n"))
                .collect()}

    t_wide, counts_wide = timed(drain_wide)

    # maintenance-only interval: zero changes
    def drain_maint():
        return table_changes(t, after_merge, after_compact).count()

    t_maint, n_maint = timed(drain_maint)

    return {
        "rows": n_rows,
        "files_at_base": n_files,
        "merge_files_touched": mres["files_in"],
        "merge_bytes_touched": mres["bytes_in"],
        "cdc_merge_interval_s": round(t_merge, 3),
        "cdc_counts": counts,
        "cdc_wide_interval_s": round(t_wide, 3),
        "cdc_counts_with_compact_inside": counts_wide,
        "cdc_maintenance_only_s": round(t_maint, 3),
        "cdc_maintenance_only_rows": n_maint,
    }


def main():
    rows_small = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    ratio = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    merge_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    from open_finance_lakehouse_spark.session import build_session

    spark = build_session("cdc_bench", master="local[8]",
                          shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="cdc_bench_")
    try:
        small = build_and_measure(spark, root, rows_small, merge_keys)
        big = build_and_measure(spark, root, rows_small * ratio, merge_keys)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    out = {
        "metric": "cdc_read_seconds_vs_table_size",
        "merge_keys": merge_keys,
        "table_size_ratio": ratio,
        "small": small,
        "big": big,
        "cdc_time_ratio_big_over_small": round(
            big["cdc_merge_interval_s"]
            / max(small["cdc_merge_interval_s"], 1e-9), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
