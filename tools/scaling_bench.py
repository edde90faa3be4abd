"""Two-parallelism scaling evidence (BASELINE.md protocol).

Runs the identical compact→cluster→expire pipeline on an identical input
clip table at two parallelism levels (default local[8] vs local[32]) in
SEPARATE OS processes (fresh JVM each — the reference's independent-process
discipline, /root/reference/tools/streaming_idempotence.py:57-92), and
reports clips/sec at both plus scaling efficiency
  (throughput@4N / throughput@N) / (4N/N).

Throughput divides clip count by ENGINE-measured stage time (JVM startup
and table synthesis excluded). Usage:
  python tools/scaling_bench.py [--rows 20000] [--n 8] [--m 32] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from open_finance_lakehouse_spark.session import build_session
from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
from open_finance_lakehouse_spark.operators.pipeline import run_maintenance
from open_finance_lakehouse_spark.sources.synth import CLIP_SCHEMA_DDL, synth_clips
import shutil

cpus = {cpus}
rows = {rows}
workdir = {workdir!r}
mode = {mode!r}

spark = build_session("scale-%d" % cpus, master="local[%d]" % cpus)
table_loc = os.path.join(workdir, "clips")
if mode == "prepare":
    t = LakeTable.create(spark, table_loc, "clips", CLIP_SCHEMA_DDL,
                         partition_spec={{"kind": "bucket", "column": "clip_id",
                                         "num_buckets": 32}})
    t.append(synth_clips(spark, rows, dur_max_ms=4000),
             max_records_per_file=256)
    print(json.dumps({{"prepared_rows": t.scan().count(),
                       "files": len(t.live_files())}}))
else:
    # fresh copy of the prepared table so both runs see identical input
    run_loc = os.path.join(workdir, "run_%d" % cpus)
    shutil.copytree(table_loc, os.path.join(run_loc, "clips"))
    t = LakeTable.load(spark, os.path.join(run_loc, "clips"))
    ledger = CheckpointLedger(os.path.join(run_loc, "ledger"))
    m = run_maintenance(t, ledger, job_id="scale-%d" % cpus,
                        target_bytes=32 * 1024 * 1024, with_audit=False)
    print(json.dumps({{"cpus": cpus, "clips": m["clips"],
                       "engine_ms": m["engine_ms"],
                       "clips_per_sec": m["clips_per_sec"]}}))
"""


def run_proc(code: str) -> dict:
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"worker failed:\n{r.stderr[-3000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    workdir = os.path.join(tempfile.gettempdir(),
                           f"ofl_scale_{uuid.uuid4().hex[:8]}")
    os.makedirs(workdir)

    prep = run_proc(_WORKER.format(repo=REPO, cpus=args.m, rows=args.rows,
                                   workdir=workdir, mode="prepare"))
    lo = run_proc(_WORKER.format(repo=REPO, cpus=args.n, rows=args.rows,
                                 workdir=workdir, mode="run"))
    hi = run_proc(_WORKER.format(repo=REPO, cpus=args.m, rows=args.rows,
                                 workdir=workdir, mode="run"))

    ratio = args.m / args.n
    eff = (hi["clips_per_sec"] / lo["clips_per_sec"]) / ratio
    result = {
        "rows": args.rows,
        "prepared": prep,
        f"local[{args.n}]": lo,
        f"local[{args.m}]": hi,
        "speedup": round(hi["clips_per_sec"] / lo["clips_per_sec"], 3),
        "parallelism_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
