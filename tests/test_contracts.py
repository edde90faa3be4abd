"""Write-time contracts, check-then-overwrite publish, SQL front door
(reference: ofl/quality/contracts.py validate-before-landing,
ofl/transform/gold/runner.py check-gated publish + temp-view registration)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.operators.publish import publish_overwrite
from open_finance_lakehouse_spark.quality.contracts import (
    Contract,
    ContractViolation,
    SchemaMismatch,
)
from open_finance_lakehouse_spark.sql import register_tables, run_sql

DDL = "k STRING, v DOUBLE, grade STRING"

CONTRACT = Contract(not_null=["k"], unique=["k"],
                    bounds={"v": [0.0, 100.0]},
                    allowed={"grade": ["a", "b", "c"]})


@pytest.fixture()
def contracted(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), "t", DDL,
                            contract=CONTRACT)


def _df(spark, rows):
    return spark.createDataFrame(rows, DDL)


def test_contract_rejects_bad_batch_commits_nothing(spark, contracted):
    bad = _df(spark, [("k1", 5.0, "a"),
                      ("k1", 6.0, "b"),      # duplicate key in batch
                      (None, 1.0, "a"),      # null key
                      ("k2", 500.0, "a"),    # out of bounds
                      ("k3", 1.0, "z")])     # disallowed value
    with pytest.raises(ContractViolation) as ei:
        contracted.append(bad)
    reasons = {r["_violation"] for r in ei.value.sample}
    assert {"unique:k", "not_null:k", "bounds:v", "allowed:grade"} <= reasons
    # reject mode: NOTHING committed — no snapshot, no rows
    assert contracted.refresh().current_snapshot_id() is None
    assert contracted.scan().count() == 0


def test_contract_dead_letter_splits_batch(spark, contracted, tmp_path):
    dl = LakeTable.create(spark, str(tmp_path / "dl"), "dl",
                          DDL + ", _violation STRING")
    mixed = _df(spark, [("a1", 5.0, "a"), ("a2", 7.0, "b"),
                        (None, 1.0, "a"), ("a3", -4.0, "c")])
    snap = contracted.append(mixed, on_violation="dead_letter",
                             dead_letter=dl)
    assert snap.summary["contract_violations"] == 2
    assert contracted.scan().count() == 2  # good rows only
    dead = dl.scan().collect()
    assert sorted(r["_violation"] for r in dead) == ["bounds:v", "not_null:k"]


def test_contract_clean_batch_commits(spark, contracted):
    ok = _df(spark, [("c1", 1.0, "a"), ("c2", 2.5, "b")])
    snap = contracted.append(ok)
    assert snap.summary["contract_violations"] == 0
    assert contracted.scan().count() == 2


def test_contract_schema_mismatch_is_plan_time(spark, contracted):
    wrong = spark.createDataFrame([("x", 1)], "k STRING, v INT")
    with pytest.raises(SchemaMismatch) as ei:
        contracted.append(wrong)
    assert "type_drift" in str(ei.value) or "missing" in str(ei.value)


# ------------------------------------------------------------------ publish


def test_publish_withholds_on_breach_then_publishes(spark, tmp_path):
    gold = LakeTable.create(spark, str(tmp_path / "gold"), "gold",
                            "k STRING, total DOUBLE")
    baseline = spark.createDataFrame([("k1", 10.0)], "k STRING, total DOUBLE")
    assert publish_overwrite(gold, baseline)["published"]
    v1 = gold.refresh().current_snapshot_id()

    checks = {
        "no_negative_totals":
            lambda df: df.filter(F.col("total") < 0),
        "no_null_keys": lambda df: df.filter(F.col("k").isNull()),
    }
    bad = spark.createDataFrame([("k1", -5.0), ("k2", 3.0)],
                                "k STRING, total DOUBLE")
    rep = publish_overwrite(gold, bad, checks=checks)
    assert not rep["published"]
    assert list(rep["violations"]) == ["no_negative_totals"]
    # withheld: previous published state stays current
    assert gold.refresh().current_snapshot_id() == v1
    assert gold.scan().collect()[0]["total"] == 10.0
    # withheld staged files are orphans → GC'able after grace
    assert len(gold.delete_orphans(grace_ms=0, dry_run=True)) > 0

    good = spark.createDataFrame([("k1", 4.0), ("k2", 3.0)],
                                 "k STRING, total DOUBLE")
    rep2 = publish_overwrite(gold, good, checks=checks)
    assert rep2["published"]
    # replace semantics: ONLY the new rows are visible
    assert sorted(r["total"] for r in gold.scan().collect()) == [3.0, 4.0]
    # time travel still reaches the previous publish (snapshot isolation)
    assert gold.scan(snapshot_id=v1).collect()[0]["total"] == 10.0


# ---------------------------------------------------------------- SQL front


def test_sql_front_door_and_missing_table_skip(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "tt"), "tt",
                         "k STRING, v DOUBLE")
    t.append(spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("a", 3.0)], "k STRING, v DOUBLE"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = register_tables(
            spark, {"tt_view": t, "ghost": str(tmp_path / "nope")})
    assert res == {"registered": ["tt_view"], "skipped": ["ghost"]}
    assert any("ghost" in str(x.message) for x in w)

    out = run_sql(spark, "SELECT k, round(sum(v), 2) AS s FROM tt_view "
                         "GROUP BY k ORDER BY k").collect()
    assert [(r["k"], r["s"]) for r in out] == [("a", 4.0), ("b", 2.0)]

    with pytest.raises(FileNotFoundError):
        register_tables(spark, {"ghost": str(tmp_path / "nope")},
                        on_missing="raise")


def test_append_rejects_unknown_violation_mode(spark, contracted):
    """A typo'd on_violation (e.g. 'deadletter') must raise, not silently
    drop violators down the dead-letter branch with no dead-letter table."""
    ok = _df(spark, [("z1", 5.0, "a")])
    with pytest.raises(ValueError, match="on_violation"):
        contracted.append(ok, on_violation="deadletter")
    assert contracted.refresh().current_snapshot_id() is None


def test_dead_letter_mode_requires_destination(spark, contracted):
    """on_violation='dead_letter' with no dead_letter table would silently
    discard violators — refuse instead."""
    mixed = _df(spark, [("m1", 5.0, "a"), (None, 1.0, "a")])
    with pytest.raises(ValueError, match="dead_letter"):
        contracted.append(mixed, on_violation="dead_letter")
    assert contracted.refresh().current_snapshot_id() is None


def test_dead_letter_replay_with_txn_marker_no_duplicates(
        spark, contracted, tmp_path):
    """A replayed batch whose summary carries txn markers must not append
    its violators to the dead-letter table a second time."""
    dl = LakeTable.create(spark, str(tmp_path / "dl2"), "dl2",
                          DDL + ", _violation STRING")
    mixed = _df(spark, [("r1", 5.0, "a"), (None, 1.0, "a")])
    txn = {"txn_app_id": "batch-app", "txn_id": 7}
    contracted.append(mixed, on_violation="dead_letter", dead_letter=dl,
                      summary=dict(txn))
    assert dl.refresh().scan().count() == 1
    # replay the same batch (same markers): dead letter must NOT grow
    contracted.append(mixed, on_violation="dead_letter", dead_letter=dl,
                      summary=dict(txn))
    assert dl.refresh().scan().count() == 1


def test_register_tables_tolerates_half_created_dir(spark, tmp_path):
    """A crashed create leaves metadata/ with no version file; warn mode
    must skip it (load is the authoritative existence check), and a
    typo'd on_missing refuses."""
    import os

    half = tmp_path / "half"
    (half / "metadata").mkdir(parents=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        reg = register_tables(spark, {"h": str(half)})
    assert reg["skipped"] == ["h"] and any("skipping" in str(x.message)
                                           for x in w)
    with pytest.raises(ValueError, match="on_missing"):
        register_tables(spark, {}, on_missing="skip")


def test_contract_checks_tag_and_gate(spark, tmp_path):
    """`checks` (named boolean SQL expressions — the CHECK-constraint
    rule class) gate writes through the same tag column as the built-in
    rules: FALSE violates, NULL passes, and the dead-letter split
    carries the `check:<name>` reason."""
    from open_finance_lakehouse_spark.quality.contracts import (
        VIOLATION_COL,
        tag_violations,
    )

    c = Contract(checks={"v_small": "v < 50", "graded": "grade != 'z'"})
    df = _df(spark, [("k1", 5.0, "a"),      # passes both
                     ("k2", 99.0, "a"),     # v_small FALSE
                     ("k3", None, "z"),     # v_small NULL-passes; graded FALSE
                     ("k4", None, None)])   # both NULL -> passes
    tags = {r["k"]: r[VIOLATION_COL]
            for r in tag_violations(df, c).collect()}
    assert tags == {"k1": None, "k2": "check:v_small",
                    "k3": "check:graded", "k4": None}

    t = LakeTable.create(spark, str(tmp_path / "ckt"), "ckt", DDL,
                         contract=c)
    dead = LakeTable.create(spark, str(tmp_path / "ckdl"), "ckdl",
                            DDL + ", _violation STRING")
    t.append(df, on_violation="dead_letter", dead_letter=dead)
    assert sorted(r["k"] for r in t.scan().collect()) == ["k1", "k4"]
    assert sorted(r["k"] for r in dead.scan().collect()) == ["k2", "k3"]
