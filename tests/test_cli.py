"""CLI front-door tests: every new surface callable end-to-end via argv
(north_rule M5 'maintenance implemented and callable')."""

from __future__ import annotations

import json

from open_finance_lakehouse_spark import cli
from open_finance_lakehouse_spark.format.table import LakeTable


def _run(capsys, argv) -> dict:
    assert cli.main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_synth_pipeline_sql(spark, tmp_path, capsys):
    loc = str(tmp_path / "clips")
    out = _run(capsys, ["synth", "--table", loc, "--rows", "40",
                        "--buckets", "2", "--records-per-file", "8"])
    assert out["rows"] == 40

    out = _run(capsys, ["pipeline", "--table", loc,
                        "--ledger", str(tmp_path / "led"),
                        "--target-mb", "2"])
    assert out["clips"] == 40 and out["table_audit"]["rows"] == 40

    out = _run(capsys, ["sql", "--register", f"clips_v={loc}",
                        "--query",
                        "SELECT count(*) AS n, count(DISTINCT clip_id) AS k "
                        "FROM clips_v"])
    assert out["rows"] == [{"n": 40, "k": 40}]


def test_cli_history_and_rollback(spark, tmp_path, capsys):
    loc = str(tmp_path / "clips_rb")
    _run(capsys, ["synth", "--table", loc, "--rows", "20", "--buckets", "2"])
    t = LakeTable.load(spark, loc)
    good = t.current_snapshot_id()
    t.replace(t.scan().limit(5))  # a "bad" rebuild drops rows
    out = _run(capsys, ["rollback", "--table", loc,
                        "--snapshot-id", str(good)])
    assert out["current"] == good and out["rows"] == 20
    out = _run(capsys, ["history", "--table", loc])
    ops = [s["operation"] for s in out["snapshots"]]
    assert "append" in ops and "replace" in ops


def test_cli_publish_withholds_then_publishes(spark, tmp_path, capsys):
    gold = LakeTable.create(spark, str(tmp_path / "gold"), "gold",
                            "k STRING, v DOUBLE")
    bad = spark.createDataFrame([(None, 1.0), ("a", 2.0)],
                                "k STRING, v DOUBLE")
    bad.write.parquet(str(tmp_path / "cand_bad"))
    out = _run(capsys, ["publish", "--table", str(tmp_path / "gold"),
                        "--source", str(tmp_path / "cand_bad"),
                        "--require-cols", "k"])
    assert out["published"] is False and "non_null_k" in out["violations"]

    good = spark.createDataFrame([("a", 1.0), ("b", 2.0)],
                                 "k STRING, v DOUBLE")
    good.write.parquet(str(tmp_path / "cand_good"))
    out = _run(capsys, ["publish", "--table", str(tmp_path / "gold"),
                        "--source", str(tmp_path / "cand_good"),
                        "--require-cols", "k"])
    assert out["published"] is True
    assert gold.refresh().scan().count() == 2


def test_cli_lanes_emit_run_lineage_events(spark, tmp_path, capsys):
    """Every ledger/table-rooted lane wraps in START → COMPLETE run events;
    a failing lane leaves a paired FAIL event carrying the exception."""
    import pytest

    from open_finance_lakehouse_spark.plans.lineage import RunLog

    loc = str(tmp_path / "clips_lin")
    _run(capsys, ["synth", "--table", loc, "--rows", "10", "--buckets", "2"])
    _run(capsys, ["pipeline", "--table", loc,
                  "--ledger", str(tmp_path / "led"), "--target-mb", "2"])

    # synth logged into the table root; pipeline into the ledger root
    synth_ev = RunLog(loc).events()
    assert [e["event"] for e in synth_ev] == ["START", "COMPLETE"]
    assert synth_ev[0]["run_id"] == synth_ev[1]["run_id"]
    assert synth_ev[1]["summary"]["rows"] == 10

    pipe_ev = RunLog(str(tmp_path / "led")).events()
    assert [e["event"] for e in pipe_ev] == ["START", "COMPLETE"]
    assert pipe_ev[1]["summary"]["clips"] == 10

    # a failing lane: rollback to a snapshot that does not exist
    with pytest.raises(ValueError):
        cli.main(["rollback", "--table", loc, "--snapshot-id", "999"])
    fail_ev = RunLog(loc).events()
    assert fail_ev[-1]["event"] == "FAIL"
    assert "999" in fail_ev[-1]["error"]
    assert fail_ev[-1]["run_id"] == fail_ev[-2]["run_id"]  # paired with START

    # the run log is queryable as a DataFrame
    df = RunLog(loc).runs_df(spark)
    assert df.filter("event = 'FAIL'").count() == 1


def test_cli_runs_lists_paired_lineage(spark, tmp_path, capsys):
    """`runs` surfaces the run log operably: one row per run_id with the
    terminal status (COMPLETE / FAIL+error) folded in, filterable by job —
    and, being read-only, logs no run about itself."""
    import pytest

    from open_finance_lakehouse_spark.plans.lineage import RunLog

    loc = str(tmp_path / "clips_runs")
    _run(capsys, ["synth", "--table", loc, "--rows", "10", "--buckets", "2"])
    with pytest.raises(ValueError):
        cli.main(["rollback", "--table", loc, "--snapshot-id", "999"])
    capsys.readouterr()

    out = _run(capsys, ["runs", "--root", loc])
    assert out["operation"] == "runs"
    by_job = {r["job"]: r for r in out["runs"]}
    assert by_job["synth"]["status"] == "COMPLETE"
    assert by_job["synth"]["summary"]["rows"] == 10
    assert by_job["synth"]["started_ms"] <= by_job["synth"]["ended_ms"]
    assert by_job["rollback"]["status"] == "FAIL"
    assert "999" in by_job["rollback"]["error"]

    filtered = _run(capsys, ["runs", "--root", loc, "--job", "rollback"])
    assert [r["job"] for r in filtered["runs"]] == ["rollback"]

    # reading the log must not append to it
    assert len(RunLog(loc).events()) == 4


def test_cli_rejects_nonpositive_target_mb(spark, tmp_path, capsys):
    import pytest

    loc = str(tmp_path / "clips_tmb")
    _run(capsys, ["synth", "--table", loc, "--rows", "5", "--buckets", "2"])
    with pytest.raises(SystemExit, match="positive"):
        cli.main(["compact", "--table", loc,
                  "--ledger", str(tmp_path / "led"), "--target-mb", "0"])


def test_cli_evolve_schema(spark, tmp_path, capsys):
    loc = str(tmp_path / "clips_ev")
    _run(capsys, ["synth", "--table", loc, "--rows", "5", "--buckets", "2"])
    from open_finance_lakehouse_spark.sources.synth import CLIP_SCHEMA_DDL

    out = _run(capsys, ["evolve-schema", "--table", loc,
                        "--ddl", CLIP_SCHEMA_DDL + ", lang STRING"])
    assert "lang" in out["schema"]
    t = LakeTable.load(spark, loc)
    assert t.scan().filter("lang IS NULL").count() == 5


def test_cli_rewrite_schema_rename_and_drop(spark, tmp_path, capsys):
    loc = str(tmp_path / "clips_rw")
    _run(capsys, ["synth", "--table", loc, "--rows", "6", "--buckets", "2"])

    out = _run(capsys, ["rewrite-schema", "--table", loc,
                        "--ddl", "clip_id STRING, payload BINARY, sr_hz INT, "
                                 "dur_ms INT, codec STRING",
                        "--rename", "payload=bytes"])
    assert out["rows"] == 6
    assert "payload" in out["schema"] and "transcript" not in out["schema"]
    t = LakeTable.load(spark, loc)
    cols = t.scan().columns
    assert "payload" in cols and "bytes" not in cols and "transcript" not in cols


def test_cli_rewrite_partitioning(spark, tmp_path, capsys):
    loc = str(tmp_path / "clips_rp")
    _run(capsys, ["synth", "--table", loc, "--rows", "12", "--buckets", "2"])

    out = _run(capsys, ["rewrite-partitioning", "--table", loc,
                        "--bucket-column", "clip_id", "--num-buckets", "8"])
    assert out["rows"] == 12
    assert out["partition_spec"]["num_buckets"] == 8
    t = LakeTable.load(spark, loc)
    assert t.meta.partition_spec["num_buckets"] == 8


def test_cli_cluster_respects_declared_curve_none(spark, tmp_path, capsys):
    from open_finance_lakehouse_spark.format.table import LakeTable as LT
    from open_finance_lakehouse_spark.sources.synth import (
        CLIP_SCHEMA_DDL,
        synth_clips,
    )

    loc = str(tmp_path / "nocurve")
    t = LT.create(spark, loc, "nocurve", CLIP_SCHEMA_DDL,
                  maintenance={"curve": "none"})
    t.append(synth_clips(spark, 5, dur_max_ms=300))
    out = _run(capsys, ["cluster", "--table", loc,
                        "--ledger", str(tmp_path / "led")])
    assert out["skipped"] is True and "curve=none" in out["reason"]
    # an explicit flag overrides the declared none
    out = _run(capsys, ["cluster", "--table", loc, "--curve", "zorder",
                        "--ledger", str(tmp_path / "led")])
    assert out.get("skipped") is not True


def test_cli_changes_reports_cdc_counts(spark, tmp_path, capsys):
    loc = str(tmp_path / "clips_cdc")
    _run(capsys, ["synth", "--table", loc, "--rows", "15", "--buckets", "2"])
    t = LakeTable.load(spark, loc)
    s1 = t.current_snapshot_id()
    t.replace(t.scan().limit(10))  # row-changing rebuild: 5 net deletes
    out = _run(capsys, ["changes", "--table", loc,
                        "--from-snapshot", str(s1)])
    assert out["inserts"] == 0 and out["deletes"] == 5
    out = _run(capsys, ["changes", "--table", loc])  # since genesis
    assert out["inserts"] == 15 and out["deletes"] == 5


def test_cli_delete_where(spark, tmp_path, capsys):
    loc = str(tmp_path / "delclips")
    _run(capsys, ["synth", "--table", loc, "--rows", "60",
                  "--buckets", "2", "--records-per-file", "6"])
    t = LakeTable.load(spark, loc)
    k = t.scan().filter("dur_ms <= 2000").count()
    assert k > 0
    out = _run(capsys, ["delete", "--table", loc,
                        "--ledger", str(tmp_path / "led"),
                        "--where", "dur_ms<=2000"])
    assert out["rows_deleted"] == k
    assert t.refresh().scan().filter("dur_ms <= 2000").count() == 0

    # point delete on the bucket column routes through bucket pruning
    victim = t.scan().select("clip_id").first()["clip_id"]
    out = _run(capsys, ["delete", "--table", loc,
                        "--ledger", str(tmp_path / "led"),
                        "--where", f"clip_id={victim}"])
    assert out["rows_deleted"] == 1
    assert out["files_untouched"] > 0

    # residual SQL lane
    out = _run(capsys, ["delete", "--table", loc,
                        "--ledger", str(tmp_path / "led"),
                        "--residual", "transcript LIKE '%zulu%'"])
    assert t.refresh().scan().filter(
        "transcript LIKE '%zulu%'").count() == 0

    # malformed --where exits with usage, not a stack trace
    import pytest
    with pytest.raises(SystemExit, match="--where"):
        cli.main(["delete", "--table", loc,
                  "--ledger", str(tmp_path / "led"),
                  "--where", "dur_ms!!800"])


def test_cli_update_where(spark, tmp_path, capsys):
    loc = str(tmp_path / "updclips")
    _run(capsys, ["synth", "--table", loc, "--rows", "40",
                  "--buckets", "2", "--records-per-file", "8"])
    t = LakeTable.load(spark, loc)
    k = t.scan().filter("dur_ms <= 3000").count()
    out = _run(capsys, ["update", "--table", loc,
                        "--ledger", str(tmp_path / "led"),
                        "--set", "codec='requeued'",
                        "--where", "dur_ms<=3000"])
    assert out["rows_updated"] == k
    assert t.refresh().scan().filter("codec = 'requeued'").count() == k

    import pytest
    with pytest.raises(SystemExit, match="--set"):
        cli.main(["update", "--table", loc,
                  "--ledger", str(tmp_path / "led"),
                  "--set", "codec requeued"])


def test_cli_sql_dml_routes_to_operators(spark, tmp_path, capsys):
    loc = str(tmp_path / "sqldml")
    _run(capsys, ["synth", "--table", loc, "--rows", "40",
                  "--buckets", "2", "--records-per-file", "8"])
    t = LakeTable.load(spark, loc)
    k = t.scan().filter("dur_ms <= 4000").count()
    out = _run(capsys, ["sql", "--register", f"clips={loc}",
                        "--ledger", str(tmp_path / "led"),
                        "--query", "DELETE FROM clips WHERE dur_ms <= 4000"])
    assert out["operation"] == "delete" and out["rows_deleted"] == k

    out = _run(capsys, ["sql", "--register", f"clips={loc}",
                        "--ledger", str(tmp_path / "led"),
                        "--query",
                        "UPDATE clips SET codec = 'x' WHERE sr_hz >= 8000"])
    assert out["operation"] == "update" and out["rows_updated"] == 40 - k

    # SELECT still goes through the view path
    out = _run(capsys, ["sql", "--register", f"clips={loc}",
                        "--query", "SELECT count(*) AS n FROM clips"])
    assert out["rows"] == [{"n": 40 - k}]

    import pytest
    with pytest.raises(SystemExit, match="--ledger"):
        cli.main(["sql", "--register", f"clips={loc}",
                  "--query", "DELETE FROM clips WHERE dur_ms <= 1"])


def test_cli_doctor(spark, tmp_path, capsys):
    loc = str(tmp_path / "docclips")
    _run(capsys, ["synth", "--table", loc, "--rows", "40",
                  "--buckets", "2", "--records-per-file", "4"])
    out = _run(capsys, ["doctor", "--table", loc,
                        "--cluster-column", "dur_ms"])
    assert out["signals"]["rows"] == 40
    assert "stat_overlap" in out["signals"]
    assert out["advice"]  # small files from records-per-file=4


def test_parse_where_in_is_case_insensitive():
    """Regression: 'day In 3,4' passed the lowercase membership test but
    neither ' in ' nor ' IN ' split the raw string — the whole expression
    became a garbage column name with values=('',)."""
    from open_finance_lakehouse_spark.cli import _parse_where

    for kw in ("in", "IN", "In", "iN"):
        (p,) = _parse_where([f"day {kw} 3,4"])
        assert p.column == "day" and p.values == (3, 4)


def test_parse_where_equality_value_containing_in_word():
    """Regression: the IN split ran before the comparison branches, so an
    equality whose value contains ' in ' misparsed into an IN-list over a
    garbage column name."""
    from open_finance_lakehouse_spark.cli import _parse_where

    (p,) = _parse_where(["transcript = call in progress"])
    assert p.column == "transcript"
    assert p.lo == "call in progress" and p.hi == "call in progress"


def test_cli_sql_maintenance_statements(spark, tmp_path, capsys):
    loc = str(tmp_path / "sqlmaint")
    _run(capsys, ["synth", "--table", loc, "--rows", "40",
                  "--buckets", "2", "--records-per-file", "4"])
    led = str(tmp_path / "led")

    out = _run(capsys, ["sql", "--register", f"clips={loc}",
                        "--ledger", led, "--query", "OPTIMIZE clips"])
    assert out["operation"] == "compact" and out["partitions_rewritten"] > 0

    # sub-default horizons need the Delta-style retention-check opt-out
    from open_finance_lakehouse_spark.sql import VACUUM_RETENTION_CHECK_CONF

    prev = spark.conf.get(VACUUM_RETENTION_CHECK_CONF, "true")
    spark.conf.set(VACUUM_RETENTION_CHECK_CONF, "false")
    try:
        out = _run(capsys, ["sql", "--register", f"clips={loc}",
                            "--ledger", led,
                            "--query", "VACUUM clips RETAIN 0 HOURS"])
    finally:
        spark.conf.set(VACUUM_RETENTION_CHECK_CONF, prev)
    assert out["operation"] == "expire"
    assert out["orphans_deleted"] > 0

    # DESCRIBE HISTORY renders rows; plain DESCRIBE stays a catalog query
    out = _run(capsys, ["sql", "--register", f"clips={loc}",
                        "--query", "DESCRIBE HISTORY clips"])
    assert out["rows"][0]["is_current"] is True

    # INSERT and ALTER route through the sql lane too (no ledger needed)
    out = _run(capsys, ["sql", "--register", f"clips={loc}",
                        "--query",
                        "INSERT INTO clips VALUES ('cli_x', "
                        "CAST('b' AS BINARY), 8000, 10, 'pcm16', 'hi')"])
    assert out["operation"] == "insert_into" and out["rows"] == 1
    out = _run(capsys, ["sql", "--register", f"clips={loc}",
                        "--query", "ALTER TABLE clips SET TBLPROPERTIES "
                                   "('owner'='cli')"])
    assert out["operation"] == "set_tblproperties"
    assert LakeTable.load(spark, loc).meta.properties["owner"] == "cli"

    t = LakeTable.load(spark, loc)
    good = t.current_snapshot_id()
    t.replace(t.scan().limit(5))
    out = _run(capsys, ["sql", "--register", f"clips={loc}",
                        "--query",
                        f"RESTORE TABLE clips TO VERSION AS OF {good}"])
    assert out["operation"] == "restore" and out["restored_to"] == good
    assert LakeTable.load(spark, loc).scan().count() == 41  # 40 + INSERT
