"""Subprocess worker for the cross-process commit-race test.

Runs WITHOUT Spark: commits are pure metadata CAS (O_EXCL version files),
and the data files are written with pyarrow directly — so each OS process
exercises the real commit protocol at full speed, maximizing contention.

Usage: python race_worker.py append <table> <writer_id> <rounds>
       python race_worker.py rewrite <table> <rounds>
"""

from __future__ import annotations

import os
import sys
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_finance_lakehouse_spark.format import manifests as mf  # noqa: E402
from open_finance_lakehouse_spark.format.table import (  # noqa: E402
    CommitConflict,
    LakeTable,
)


def _write_file(location: str, ks: list[int]) -> mf.DataFile:
    part_dir = os.path.join(location, "data", "part=0")
    os.makedirs(part_dir, exist_ok=True)
    rel = os.path.join("data", "part=0", f"{uuid.uuid4().hex}.parquet")
    ap = os.path.join(location, rel)
    pq.write_table(pa.table({"k": pa.array(ks, pa.int64())}), ap)
    return mf.collect_file_stats(ap, rel, "0")


def run_appender(location: str, writer_id: int, rounds: int) -> None:
    t = LakeTable.load(None, location)
    for r in range(rounds):
        ks = [writer_id * 1_000_000 + r * 1_000 + i for i in range(10)]
        entry = _write_file(location, ks)
        t.commit_append([entry], summary={"writer": writer_id, "round": r})
    print(f"appender {writer_id}: {rounds} commits ok")


def run_rewriter(location: str, rounds: int) -> None:
    """Repeatedly merge the two oldest live files into one. A concurrent
    appender/rewriter may invalidate the claim — CommitConflict is the
    EXPECTED loser outcome and the worker just retries with fresh state."""
    import time

    t = LakeTable.load(None, location)
    done = 0
    attempts = 0
    deadline = time.monotonic() + 120
    while done < rounds and time.monotonic() < deadline:
        t.refresh()
        files = sorted(t.live_files(), key=lambda f: f.file_path)
        if len(files) < 2:
            time.sleep(0.05)  # appenders haven't landed files yet
            continue
        attempts += 1
        victims = files[:2]
        ks: list[int] = []
        for f in victims:
            ks.extend(pq.read_table(os.path.join(location, f.file_path))
                      .column("k").to_pylist())
        entry = _write_file(location, ks)
        try:
            t.commit_rewrite({f.file_path for f in victims}, [entry],
                             summary={"rewriter_round": done})
            done += 1
        except CommitConflict:
            continue  # lost the race legitimately; re-read and retry
    print(f"rewriter: {done}/{rounds} rewrites in {attempts} attempts")
    if done < rounds:
        sys.exit(3)


def run_propmerger(location: str, writer_id: int, rounds: int) -> None:
    """Race set_properties(transform): each round merges one key into a
    JSON-dict property INSIDE the commit CAS — the exact read-modify-
    write shape ADD/DROP CONSTRAINT uses. Every writer's every key must
    survive arbitrary interleaving (the lost-update test)."""
    import json

    t = LakeTable.load(None, location)
    for r in range(rounds):
        key = f"w{writer_id}-r{r}"

        def xf(props: dict, meta, _k=key) -> dict:
            doc = json.loads(props.get("registry", "{}"))
            doc[_k] = 1
            out = dict(props)
            out["registry"] = json.dumps(doc, sort_keys=True)
            return out

        t.set_properties(transform=xf)
    print(f"propmerger {writer_id}: {rounds} merges ok")


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "append":
        run_appender(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    elif mode == "rewrite":
        run_rewriter(sys.argv[2], int(sys.argv[3]))
    elif mode == "propmerge":
        run_propmerger(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        raise SystemExit(f"unknown mode {mode}")
