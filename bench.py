"""Benchmark: headline queries + the full maintenance pipeline at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "e2e_seconds", "value": <total>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "maintenance_clips_per_sec": <engine-measured throughput>, ...}

Measurement discipline (BASELINE.md): maintenance throughput divides clip
count by ENGINE-measured stage time (never wall clock / JVM startup);
query timings are wall seconds for plan+execute (collect-to-count).
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "brand_lineitem_rollup",
    "lineitem_order_share",
    "hourly_event_ohlc",
    "merge_semantics",
    "doc_minhash_lsh_pairs",
    "doc_simhash_near_pairs",
    "doc_ngram_jaccard_pairs_pm1",
    "embedding_topk_bruteforce",
    "embedding_ivf_ann",
    "embedding_ivf_kmeans",
]


def run_bench(sf_dir: str, cpus: str, out=None):
    import tempfile

    from open_finance_lakehouse_spark.format.table import LakeTable
    from open_finance_lakehouse_spark.operators.pipeline import run_maintenance
    from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
    from open_finance_lakehouse_spark.queries import REGISTRY
    from open_finance_lakehouse_spark.queries.multimodal import (
        clips_from_documents,
    )
    from open_finance_lakehouse_spark.session import build_session
    from open_finance_lakehouse_spark.sources.synth import CLIP_SCHEMA_DDL

    spark = build_session("bench", master=f"local[{cpus}]")
    timings: dict[str, float] = {}

    # UNTIMED warm-up: compile the codegen/shuffle/parquet paths once so
    # query timings measure steady-state engine time, per the BASELINE.md
    # discipline (JVM/JIT startup excluded — the reference divides by
    # trigger execution time, ofl/streaming/metrics.py:53-62). Without
    # this the first headline query absorbs ~3 s of one-time JIT.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").groupBy("n_regionkey") \
        .count().collect()

    # MIN-OF-N, INTERLEAVED: this host's shared-tenancy noise is ±3×
    # (BENCH/BASELINE.md), so single-shot timings make round-over-round
    # comparisons unreadable. Repeats are interleaved (full query list per
    # round, not N back-to-back runs of one query) so a noisy minute hits
    # every query equally — the tools/scaling_bench.py protocol; the min
    # is the host's best sustained engine time.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _rep in range(repeats):
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            samples[name].append(time.monotonic() - t0)
            assert n >= 0
            # queries persist() signature/normalized subplans internally
            # and the returned plan can't unpersist them — drop the cache
            # between queries so storage memory never accumulates across
            # the run (and timings stay independent)
            spark.catalog.clearCache()
    for name in HEADLINE:
        timings[name] = round(min(samples[name]), 3)

    # maintenance pipeline on a clip table derived from this SF's documents
    # — min-of-N over FRESH tables (a rerun on the same table would be a
    # measured no-op, not a repeat)
    synth_s, maint_s, metric_s = [], [], []
    for _rep in range(repeats):
        workdir = os.path.join(tempfile.gettempdir(),
                               f"ofl_bench_{uuid.uuid4().hex[:8]}")
        t = LakeTable.create(
            spark, os.path.join(workdir, "clips"), "clips", CLIP_SCHEMA_DDL,
            partition_spec={"kind": "bucket", "column": "clip_id",
                            "num_buckets": int(cpus)},
        )
        t0 = time.monotonic()
        t.append(clips_from_documents(spark, sf_dir), max_records_per_file=64)
        synth_s.append(time.monotonic() - t0)

        ledger = CheckpointLedger(os.path.join(workdir, "ledger"))
        t0 = time.monotonic()
        m = run_maintenance(t, ledger, job_id="bench",
                            target_bytes=32 * 1024 * 1024, with_audit=False)
        maint_s.append(time.monotonic() - t0)
        metric_s.append(m)
    timings["clip_synthesis_write"] = round(min(synth_s), 3)
    timings["maintenance_pipeline"] = round(min(maint_s), 3)
    metrics = max(metric_s, key=lambda m: m["clips_per_sec"])

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "e2e_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        "repeats": repeats,
        "protocol": "min-of-N interleaved",
        "maintenance_clips": metrics["clips"],
        "maintenance_engine_ms": metrics["engine_ms"],
        "maintenance_clips_per_sec": round(metrics["clips_per_sec"], 2),
    }
    line = json.dumps(result)
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    return result


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    run_bench(sf_dir, cpus)
