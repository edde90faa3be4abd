"""Measured idempotence evidence, the reference's strongest discipline
(/root/reference/tools/streaming_idempotence.py:1-31): run the SAME
maintenance job twice in SEPARATE OS processes against one table, then
compare committed TABLE STATE read by an INDEPENDENT engine (DuckDB reads
the live data files directly — not the Spark session that wrote them,
mirroring the delta-rs witness at
/root/reference/ofl/streaming/metrics.py:100-104).

Pass criteria printed as one JSON line:
  run2 commits nothing (snapshot count unchanged),
  rows / distinct keys / duplicate keys / payload bytes identical,
  witnessed by DuckDB.

Usage: python tools/idempotence_check.py [--rows 2000]
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
import sys, os, json
sys.path.insert(0, {repo!r})
from open_finance_lakehouse_spark.session import build_session
from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
from open_finance_lakehouse_spark.operators.pipeline import run_maintenance
from open_finance_lakehouse_spark.sources.synth import CLIP_SCHEMA_DDL, synth_clips

workdir = {workdir!r}
phase = {phase!r}
spark = build_session("idem-" + phase, master="local[8]")
loc = os.path.join(workdir, "clips")
if phase == "prepare":
    t = LakeTable.create(spark, loc, "clips", CLIP_SCHEMA_DDL,
                         partition_spec={{"kind": "bucket",
                                         "column": "clip_id",
                                         "num_buckets": 4}})
    t.append(synth_clips(spark, {rows}, dur_max_ms=1200),
             max_records_per_file=32)
    print(json.dumps({{"prepared": t.scan().count()}}))
else:
    t = LakeTable.load(spark, loc)
    led = CheckpointLedger(os.path.join(workdir, "ledger"))
    m = run_maintenance(t, led, job_id="idem", with_audit=False,
                        target_bytes=8 * 1024 * 1024, retain_last=1)
    t.refresh()
    print(json.dumps({{
        "snapshots": len(t.snapshots()),
        "current": t.current_snapshot_id(),
        "stages": {{k: {{kk: v[kk] for kk in
                        ("partitions_rewritten", "partitions_skipped")
                        if kk in v}}
                    for k, v in m["stages"].items()}},
    }}))
"""


def run_proc(code: str) -> dict:
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return json.loads(r.stdout.strip().splitlines()[-1])


def witness(workdir: str) -> dict:
    """Independent reader: DuckDB over the CURRENT snapshot's live files."""
    import duckdb

    sys.path.insert(0, REPO)
    from open_finance_lakehouse_spark.format import metadata as md
    from open_finance_lakehouse_spark.format import manifests as mf

    loc = os.path.join(workdir, "clips")
    meta = md.read_current_metadata(loc)
    meta.location = loc
    snap = meta.snapshot()
    files = []
    for m in snap.manifests:
        files.extend(os.path.join(loc, e.file_path)
                     for e in mf.read_manifest(loc, m))
    con = duckdb.connect()
    row = con.execute(
        "SELECT count(*), count(DISTINCT clip_id), "
        "count(*) - count(DISTINCT clip_id), sum(octet_length(bytes)) "
        f"FROM read_parquet({files!r})").fetchone()
    return {"rows": row[0], "distinct_keys": row[1],
            "duplicate_keys": row[2], "payload_bytes": row[3]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2000)
    args = ap.parse_args()
    workdir = os.path.join(tempfile.gettempdir(),
                           f"ofl_idem_{uuid.uuid4().hex[:8]}")
    os.makedirs(workdir)

    run_proc(_WORKER.format(repo=REPO, workdir=workdir, phase="prepare",
                            rows=args.rows))
    r1 = run_proc(_WORKER.format(repo=REPO, workdir=workdir, phase="run",
                                 rows=args.rows))
    w1 = witness(workdir)
    r2 = run_proc(_WORKER.format(repo=REPO, workdir=workdir, phase="run",
                                 rows=args.rows))
    w2 = witness(workdir)

    verdict = {
        "run1": r1, "run2": r2,
        "witness_after_run1": w1, "witness_after_run2": w2,
        "table_state_identical": w1 == w2,
        "run2_committed_nothing": r2["snapshots"] == r1["snapshots"]
        and r2["current"] == r1["current"],
    }
    verdict["pass"] = (verdict["table_state_identical"]
                       and verdict["run2_committed_nothing"])
    print(json.dumps(verdict))
    sys.exit(0 if verdict["pass"] else 1)


if __name__ == "__main__":
    main()
