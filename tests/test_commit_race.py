"""Cross-process commit contention: the O_EXCL CAS loop must serialize
concurrent writers from SEPARATE OS processes (thread locks can't help),
with a post-hoc audit that the snapshot log is one linear chain and not a
row was lost or duplicated (VERDICT r3 item 10).
"""

from __future__ import annotations

import os
import subprocess
import sys

from open_finance_lakehouse_spark.format.table import LakeTable

WORKER = os.path.join(os.path.dirname(__file__), "race_worker.py")


def test_cross_process_commit_race_linear_history_no_lost_rows(
        spark, tmp_path):
    loc = str(tmp_path / "race")
    LakeTable.create(None, loc, "race", "k BIGINT")

    appenders = 3
    rounds = 8  # 3 appenders x 8 + >=4 rewrites = >=28 contended commits
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "append", loc, str(i), str(rounds)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(appenders)
    ] + [
        subprocess.Popen(
            [sys.executable, WORKER, "rewrite", loc, "4"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out.decode()

    t = LakeTable.load(spark, loc)
    snaps = t.snapshots()
    assert len(snaps) == appenders * rounds + 4  # every commit landed

    # the parent chain from current covers EVERY snapshot exactly once —
    # a lost CAS race that still committed would fork the history
    by_id = {s.snapshot_id: s for s in snaps}
    chain = []
    cur = t.current_snapshot_id()
    while cur is not None:
        chain.append(cur)
        cur = by_id[cur].parent_id
    assert sorted(chain) == sorted(by_id)  # linear, no forks, no orphans

    # metadata versions are contiguous (one CAS winner per version)
    from open_finance_lakehouse_spark.format import metadata as md
    versions = md.list_metadata_versions(loc)
    assert versions == list(range(1, len(versions) + 1))

    # row conservation: every appended key present exactly once — rewrites
    # moved bytes but neither lost nor duplicated a row
    expect = {w * 1_000_000 + r * 1_000 + i
              for w in range(appenders) for r in range(rounds)
              for i in range(10)}
    got = [r["k"] for r in t.scan().collect()]
    assert len(got) == len(expect)
    assert set(got) == expect


def test_cross_process_property_transform_race_no_lost_updates(
        spark, tmp_path):
    """set_properties(transform) under TRUE cross-process contention:
    four OS processes each merge 6 keys into one JSON-dict property
    (the ADD/DROP CONSTRAINT shape). Every key must survive — a merge
    composed outside the commit CAS would lose whole writers' worth of
    updates when commits interleave."""
    import json

    loc = str(tmp_path / "prace")
    LakeTable.create(None, loc, "prace", "k BIGINT")

    writers, rounds = 4, 6
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "propmerge", loc, str(i), str(rounds)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(writers)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out.decode()

    t = LakeTable.load(spark, loc)
    doc = json.loads(t.meta.properties["registry"])
    assert sorted(doc) == sorted(
        f"w{w}-r{r}" for w in range(writers) for r in range(rounds))
    # property commits move no snapshot; versions stay contiguous
    from open_finance_lakehouse_spark.format import metadata as md

    versions = md.list_metadata_versions(loc)
    assert versions == list(range(1, len(versions) + 1))
    assert len(versions) == 1 + writers * rounds  # create + every merge
