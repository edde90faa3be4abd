"""INSERT INTO/OVERWRITE and ALTER TABLE SQL front doors, lowered onto
append/replace and the schema/property evolution primitives — the write
and DDL half of the SQL surface (the reference's gold models land full
rebuilds, /root/reference/ofl/transform/gold/runner.py:150-162)."""

from __future__ import annotations

import pytest

from open_finance_lakehouse_spark.format.table import (
    LakeTable,
    SchemaEvolutionError,
)
from open_finance_lakehouse_spark.operators.config import maintenance_config
from open_finance_lakehouse_spark.sources.synth import (
    CLIP_SCHEMA_DDL,
    synth_clips,
)
from open_finance_lakehouse_spark.sql import run_alter, run_insert


def _table(spark, tmp_path, name, n=20, **kw):
    t = LakeTable.create(
        spark, str(tmp_path / name), name, CLIP_SCHEMA_DDL,
        partition_spec={"kind": "bucket", "column": "clip_id",
                        "num_buckets": 2})
    t.append(synth_clips(spark, n, **kw), max_records_per_file=8)
    return t


def _ids(t):
    return sorted(r["clip_id"] for r in
                  t.refresh().scan().select("clip_id").collect())


# ------------------------------------------------------------- INSERT

def test_insert_values_positional(spark, tmp_path):
    t = _table(spark, tmp_path, "ins1")
    res = run_insert(
        spark,
        "INSERT INTO ins1 VALUES "
        "('zz_1', CAST('ab' AS BINARY), 16000, 1200, 'pcm16', 'hello'), "
        "('zz_2', CAST('cd' AS BINARY), 8000, 900, 'ulaw', 'world');",
        {"ins1": t})
    assert res["operation"] == "insert_into" and res["rows"] == 2
    ids = _ids(t)
    assert "zz_1" in ids and "zz_2" in ids and len(ids) == 22
    row = {r["clip_id"]: r for r in t.scan().collect()}["zz_1"]
    assert row["sr_hz"] == 16000 and row["transcript"] == "hello"


def test_insert_with_shuffled_column_list(spark, tmp_path):
    t = _table(spark, tmp_path, "ins2", n=5)
    res = run_insert(
        spark,
        "INSERT INTO ins2 (transcript, clip_id, codec, dur_ms, sr_hz, "
        "bytes) VALUES ('t', 'zz_9', 'pcm16', 50, 8000, "
        "CAST('x' AS BINARY))",
        {"ins2": t})
    assert res["rows"] == 1
    row = {r["clip_id"]: r for r in t.refresh().scan().collect()}["zz_9"]
    assert row["transcript"] == "t" and row["dur_ms"] == 50


def test_insert_select_cross_and_self(spark, tmp_path):
    t = _table(spark, tmp_path, "ins3", n=6)
    n0 = len(_ids(t))
    res = run_insert(
        spark,
        "INSERT INTO ins3 SELECT concat(clip_id, '_copy'), bytes, sr_hz, "
        "dur_ms, codec, transcript FROM ins3",
        {"ins3": t})
    assert res["rows"] == n0
    assert len(_ids(t)) == 2 * n0

    # overwrite from the target itself: stages from the pre-insert
    # snapshot, lands as ONE replace
    res = run_insert(
        spark,
        "INSERT OVERWRITE ins3 SELECT * FROM ins3 "
        "WHERE clip_id NOT LIKE '%_copy'",
        {"ins3": t})
    assert res["operation"] == "insert_overwrite" and res["rows"] == n0
    assert len(_ids(t)) == n0


def test_insert_casts_to_declared_types(spark, tmp_path):
    t = _table(spark, tmp_path, "ins4", n=3)
    # string sr_hz/dur_ms cast to the declared ints
    run_insert(
        spark,
        "INSERT INTO ins4 VALUES ('zz_c', CAST('b' AS BINARY), '44100', "
        "'10', 'pcm16', 'x')",
        {"ins4": t})
    row = {r["clip_id"]: r for r in t.refresh().scan().collect()}["zz_c"]
    assert row["sr_hz"] == 44100 and isinstance(row["sr_hz"], int)


def test_insert_cte_body(spark, tmp_path):
    t = _table(spark, tmp_path, "ins6", n=4)
    res = run_insert(
        spark,
        "INSERT INTO ins6 WITH src AS (SELECT * FROM ins6 WHERE "
        "dur_ms >= 0) SELECT concat(clip_id, '_c'), bytes, sr_hz, "
        "dur_ms, codec, transcript FROM src",
        {"ins6": t})
    assert res["rows"] == 4 and len(_ids(t)) == 8


def test_insert_refusals(spark, tmp_path):
    t = _table(spark, tmp_path, "ins5", n=3)
    with pytest.raises(ValueError, match="omits"):
        run_insert(spark, "INSERT INTO ins5 (clip_id) VALUES ('a')",
                   {"ins5": t})
    with pytest.raises(ValueError, match="produces 2 columns"):
        run_insert(spark, "INSERT INTO ins5 VALUES ('a', 'b')",
                   {"ins5": t})
    with pytest.raises(ValueError, match="unknown columns"):
        run_insert(
            spark,
            "INSERT INTO ins5 (clip_id, nope, bytes, sr_hz, dur_ms, "
            "codec) VALUES (1,2,3,4,5,6)", {"ins5": t})
    with pytest.raises(ValueError, match="not in tables"):
        run_insert(spark, "INSERT INTO ghost VALUES (1)", {"ins5": t})


def test_insert_enforces_contract_on_both_paths(spark, tmp_path):
    """append() gates on the table contract natively; the OVERWRITE path
    must too — a user statement landing violating rows is quiet
    corruption either way."""
    from open_finance_lakehouse_spark.quality.contracts import (
        Contract,
        ContractViolation,
    )

    t = LakeTable.create(
        spark, str(tmp_path / "insc"), "insc", CLIP_SCHEMA_DDL,
        partition_spec={"kind": "bucket", "column": "clip_id",
                        "num_buckets": 2},
        contract=Contract(not_null=["transcript"]))
    t.append(synth_clips(spark, 4), max_records_per_file=4)
    before = _ids(t)
    bad = ("VALUES ('zz_bad', CAST('b' AS BINARY), 8000, 10, 'pcm16', "
           "NULL)")
    with pytest.raises(ContractViolation):
        run_insert(spark, f"INSERT INTO insc {bad}", {"insc": t})
    with pytest.raises(ContractViolation):
        run_insert(spark, f"INSERT OVERWRITE insc {bad}", {"insc": t})
    assert _ids(t) == before  # nothing landed on either refusal


# -------------------------------------------------------------- ALTER

def test_alter_add_columns_metadata_only(spark, tmp_path):
    t = _table(spark, tmp_path, "alt1")
    files_before = sorted(f.file_path for f in t.live_files())
    res = run_alter(
        spark, "ALTER TABLE alt1 ADD COLUMNS (speaker string, score "
        "double)", {"alt1": t})
    assert res["added"] == ["speaker", "score"]
    t.refresh()
    # add is metadata-only: not one byte moved
    assert sorted(f.file_path for f in t.live_files()) == files_before
    rows = t.scan().select("clip_id", "speaker", "score").collect()
    assert rows and all(r["speaker"] is None and r["score"] is None
                        for r in rows)


def test_alter_add_nested_and_parameterized_types(spark, tmp_path):
    """Commas nest inside both () and <> in DDL types — the column-spec
    split must not break them apart."""
    t = _table(spark, tmp_path, "alt7", n=3)
    res = run_alter(
        spark,
        "ALTER TABLE alt7 ADD COLUMNS (price decimal(10,2), "
        "meta struct<lang: string, rev: int>)", {"alt7": t})
    assert res["added"] == ["price", "meta"]
    t.refresh()
    types = dict(t.scan().dtypes)
    assert types["price"] == "decimal(10,2)"
    assert types["meta"].startswith("struct<lang:string")


def test_alter_column_widen_and_refuse_narrow(spark, tmp_path):
    t = _table(spark, tmp_path, "alt2", n=4)
    res = run_alter(spark, "ALTER TABLE alt2 ALTER COLUMN dur_ms TYPE "
                    "bigint", {"alt2": t})
    assert res["type"] == "bigint"
    t.refresh()
    assert dict(t.scan().dtypes)["dur_ms"] == "bigint"
    with pytest.raises(SchemaEvolutionError, match="not a widening"):
        run_alter(spark, "ALTER TABLE alt2 ALTER COLUMN dur_ms TYPE int",
                  {"alt2": t})


def test_alter_drop_and_rename_copy_on_write(spark, tmp_path):
    t = _table(spark, tmp_path, "alt3", n=8)
    before = sorted((r["clip_id"], r["transcript"])
                    for r in t.scan().collect())
    run_alter(spark, "ALTER TABLE alt3 DROP COLUMN codec", {"alt3": t})
    t.refresh()
    assert "codec" not in t.scan().columns
    res = run_alter(spark, "ALTER TABLE alt3 RENAME COLUMN transcript "
                    "TO text", {"alt3": t})
    assert res["renamed"] == {"transcript": "text"}
    t.refresh()
    after = sorted((r["clip_id"], r["text"]) for r in t.scan().collect())
    assert after == before

    # the bucket column cannot be dropped — the table would be unroutable
    with pytest.raises(SchemaEvolutionError, match="no successor"):
        run_alter(spark, "ALTER TABLE alt3 DROP COLUMN clip_id",
                  {"alt3": t})


def test_alter_tblproperties_roundtrip(spark, tmp_path):
    t = _table(spark, tmp_path, "alt4", n=3)
    res = run_alter(
        spark, "ALTER TABLE alt4 SET TBLPROPERTIES "
        "('maintenance.target_bytes'='1048576', "
        "'maintenance.curve'='hilbert', 'owner'='ingest-team')",
        {"alt4": t})
    assert res["operation"] == "set_tblproperties"
    t.refresh()
    cfg = maintenance_config(t)
    assert cfg["target_bytes"] == 1048576 and cfg["curve"] == "hilbert"
    assert t.meta.properties["owner"] == "ingest-team"

    run_alter(spark, "ALTER TABLE alt4 UNSET TBLPROPERTIES "
              "('maintenance.curve', 'owner')", {"alt4": t})
    t.refresh()
    assert maintenance_config(t)["curve"] == "zorder"  # back to default
    assert "owner" not in t.meta.properties


def test_alter_tblproperties_validates_maintenance_keys(spark, tmp_path):
    t = _table(spark, tmp_path, "alt5", n=3)
    with pytest.raises(ValueError, match="unknown maintenance property"):
        run_alter(spark, "ALTER TABLE alt5 SET TBLPROPERTIES "
                  "('maintenance.target_byte'='1')", {"alt5": t})
    with pytest.raises(ValueError, match="must be an integer"):
        run_alter(spark, "ALTER TABLE alt5 SET TBLPROPERTIES "
                  "('maintenance.target_bytes'='big')", {"alt5": t})
    with pytest.raises(ValueError, match="must be one of"):
        run_alter(spark, "ALTER TABLE alt5 SET TBLPROPERTIES "
                  "('maintenance.curve'='zordr')", {"alt5": t})


def test_alter_refusals(spark, tmp_path):
    t = _table(spark, tmp_path, "alt6", n=3)
    with pytest.raises(ValueError, match="already exists"):
        run_alter(spark, "ALTER TABLE alt6 ADD COLUMN CLIP_ID string",
                  {"alt6": t})
    with pytest.raises(ValueError, match="no column"):
        run_alter(spark, "ALTER TABLE alt6 DROP COLUMN ghost", {"alt6": t})
    with pytest.raises(ValueError, match="run_alter handles"):
        run_alter(spark, "ALTER TABLE alt6 CLUSTER BY (x)", {"alt6": t})
    with pytest.raises(ValueError, match="not in tables"):
        run_alter(spark, "ALTER TABLE ghost DROP COLUMN x", {"alt6": t})


# -------------------------------------------------------- CREATE/DROP

def test_create_table_full_clause_chain(spark, tmp_path):
    from open_finance_lakehouse_spark.sql import (
        run_create_table,
        run_drop_table,
    )

    loc = str(tmp_path / "ct1")
    res = run_create_table(
        spark,
        f"CREATE TABLE ct1 (clip_id string, dur_ms int, price "
        f"decimal(10,2)) USING frost PARTITIONED BY (bucket(4, clip_id)) "
        f"LOCATION '{loc}' TBLPROPERTIES "
        f"('maintenance.curve'='hilbert', 'owner'='sql')",
        {})
    assert res["created"] is True
    t = LakeTable.load(spark, loc)
    assert t.meta.partition_spec == {"kind": "bucket", "column": "clip_id",
                                     "num_buckets": 4}
    assert t.meta.properties["maintenance.curve"] == "hilbert"
    assert dict(t.scan().dtypes)["price"] == "decimal(10,2)"

    # IF NOT EXISTS is a no-op on the existing table; bare CREATE refuses
    res = run_create_table(
        spark, f"CREATE TABLE IF NOT EXISTS ct1 (a int) LOCATION '{loc}'",
        {})
    assert res["created"] is False
    with pytest.raises(ValueError, match="already exists"):
        run_create_table(
            spark, f"CREATE TABLE ct1 (a int) LOCATION '{loc}'", {})

    # the write path works on the created table
    from open_finance_lakehouse_spark.sql import run_insert as _ri
    _ri(spark, "INSERT INTO ct1 VALUES ('a', 5, 1.25)",
        {"ct1": t})
    assert t.refresh().scan().count() == 1

    # DROP requires PURGE; with it the tree is gone
    with pytest.raises(ValueError, match="PURGE"):
        run_drop_table(spark, "DROP TABLE ct1", {"ct1": loc})
    res = run_drop_table(spark, "DROP TABLE ct1 PURGE", {"ct1": loc})
    assert res["dropped"] is True
    import os
    assert not os.path.exists(loc)
    res = run_drop_table(spark, "DROP TABLE IF EXISTS ct1 PURGE",
                         {"ct1": loc})
    assert res["dropped"] is False


def test_create_table_as_select(spark, tmp_path):
    from open_finance_lakehouse_spark.sql import run_create_table

    src = _table(spark, tmp_path, "ctsrc", n=10)
    loc = str(tmp_path / "ct2")
    res = run_create_table(
        spark,
        f"CREATE TABLE ct2 PARTITIONED BY (bucket(2, clip_id)) "
        f"LOCATION '{loc}' AS SELECT clip_id, dur_ms, transcript "
        f"FROM ctsrc WHERE dur_ms >= 0",
        {"ctsrc": src})
    assert res["created"] is True and res["rows"] == 10
    t = LakeTable.load(spark, loc)
    assert t.scan().columns == ["clip_id", "dur_ms", "transcript"]
    assert t.scan().count() == 10


def test_create_table_props_with_parens_in_values(spark, tmp_path):
    """Property values may contain parens — the clause scan must not
    close inside the quoted literal."""
    from open_finance_lakehouse_spark.sql import run_create_table

    loc = str(tmp_path / "ctp")
    run_create_table(
        spark,
        f"CREATE TABLE ctp (a int) LOCATION '{loc}' TBLPROPERTIES "
        f"('comment'='uses (parens) inside')", {})
    t = LakeTable.load(spark, loc)
    assert t.meta.properties["comment"] == "uses (parens) inside"


def test_create_table_refusals(spark, tmp_path):
    from open_finance_lakehouse_spark.sql import run_create_table

    with pytest.raises(ValueError, match="path-addressed"):
        run_create_table(spark, "CREATE TABLE nowhere (a int)", {})
    loc = str(tmp_path / "ct3")
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_create_table(
            spark, f"CREATE TABLE ct3 (a int) LOCATION '{loc}' "
            f"AS SELECT 1", {})
    with pytest.raises(ValueError, match="column list or AS SELECT"):
        run_create_table(spark, f"CREATE TABLE ct3 LOCATION '{loc}'", {})
    with pytest.raises(ValueError, match="bucket transform"):
        run_create_table(
            spark, f"CREATE TABLE ct3 (a int) PARTITIONED BY (a) "
            f"LOCATION '{loc}'", {})
    with pytest.raises(ValueError, match="format is 'frost'"):
        run_create_table(
            spark, f"CREATE TABLE ct3 (a int) USING delta "
            f"LOCATION '{loc}'", {})
    with pytest.raises(ValueError, match="unknown maintenance property"):
        run_create_table(
            spark, f"CREATE TABLE ct3 (a int) LOCATION '{loc}' "
            f"TBLPROPERTIES ('maintenance.curv'='zorder')", {})


def test_create_table_imports_plain_parquet_dir(spark, tmp_path):
    """The CONVERT-TO-DELTA migration shape: CTAS over Spark's
    parquet.`/path` table syntax imports a plain parquet directory into
    a governed table — the body goes verbatim to spark.sql, so the
    reader handles layout/compression, and the engine lands it as one
    append with stats and bucket routing."""
    from open_finance_lakehouse_spark.sql import run_create_table

    raw = str(tmp_path / "raw_parquet")
    _table(spark, tmp_path, "impsrc", n=15).scan() \
        .select("clip_id", "dur_ms", "transcript") \
        .write.parquet(raw)

    loc = str(tmp_path / "imported")
    res = run_create_table(
        spark,
        f"CREATE TABLE imported PARTITIONED BY (bucket(2, clip_id)) "
        f"LOCATION '{loc}' AS SELECT * FROM parquet.`{raw}`",
        {})
    assert res["rows"] == 15
    t = LakeTable.load(spark, loc)
    assert t.scan().count() == 15
    assert t.meta.partition_spec["num_buckets"] == 2


# ----------------------------------------------------- SELECT time travel

def test_select_inline_time_travel(spark, tmp_path):
    """Delta's inline FROM t VERSION|TIMESTAMP AS OF syntax on the read
    path — each travelled mention pins its own view, so one query can
    join the present to the past."""
    from open_finance_lakehouse_spark.sql import run_select

    t = _table(spark, tmp_path, "tt1", n=10)
    v1 = t.current_snapshot_id()
    ts1 = t.meta.snapshot(v1).timestamp_ms
    import time as _time
    _time.sleep(0.05)
    t.append(synth_clips(spark, 5, id_offset=900), max_records_per_file=8)

    n_now = run_select(spark, "SELECT count(*) AS n FROM tt1",
                       {"tt1": t}).first()["n"]
    n_v1 = run_select(
        spark, f"SELECT count(*) AS n FROM tt1 VERSION AS OF {v1}",
        {"tt1": t}).first()["n"]
    n_ts = run_select(
        spark, f"SELECT count(*) AS n FROM tt1 TIMESTAMP AS OF {ts1}",
        {"tt1": t}).first()["n"]
    assert (n_now, n_v1, n_ts) == (15, 10, 10)

    # join the table to its own past in ONE query
    row = run_select(
        spark,
        f"SELECT count(*) AS added FROM tt1 a LEFT ANTI JOIN "
        f"tt1 VERSION AS OF {v1} b ON a.clip_id = b.clip_id",
        {"tt1": t}).first()
    assert row["added"] == 5

    # quote-awareness: a literal containing the phrase is untouched
    row = run_select(
        spark,
        "SELECT 'tt1 VERSION AS OF 1' AS s, count(*) AS n FROM tt1",
        {"tt1": t}).first()
    assert row["s"] == "tt1 VERSION AS OF 1" and row["n"] == 15


# ------------------------------------------------- contract property SQL

def test_set_tblproperties_rejects_malformed_contract(spark, tmp_path):
    """A contract the JSON grammar can't parse must refuse AT THE SET —
    stored as-is it surfaces as an opaque JSONDecodeError at the first
    INSERT, statements away from the typo that caused it."""
    t = _table(spark, tmp_path, "cprop1", n=3)
    with pytest.raises(ValueError, match="contract.*Expected JSON"):
        run_alter(
            spark,
            "ALTER TABLE cprop1 SET TBLPROPERTIES "
            "('contract'='sr_hz > 0; dur_ms >= 0')",
            {"cprop1": t})
    # wrong keys refuse too (valid JSON, invalid Contract shape)
    with pytest.raises(ValueError, match="contract"):
        run_alter(
            spark,
            'ALTER TABLE cprop1 SET TBLPROPERTIES '
            '(\'contract\'=\'{"nonnull": ["clip_id"]}\')',
            {"cprop1": t})
    assert "contract" not in t.refresh().meta.properties


def test_contract_set_via_sql_gates_inserts(spark, tmp_path):
    """The valid shape lands via ALTER and the NEXT insert enforces it:
    the SQL surface and the write gate share one property."""
    from open_finance_lakehouse_spark.quality.contracts import (
        ContractViolation,
    )

    t = _table(spark, tmp_path, "cprop2", n=3)
    run_alter(
        spark,
        'ALTER TABLE cprop2 SET TBLPROPERTIES '
        '(\'contract\'=\'{"bounds": {"sr_hz": [1, 192000]}}\')',
        {"cprop2": t})
    with pytest.raises(ContractViolation):
        run_insert(
            spark,
            "INSERT INTO cprop2 VALUES "
            "('bad_1', CAST('x' AS BINARY), -5, 100, 'pcm16', 't')",
            {"cprop2": t})
    res = run_insert(
        spark,
        "INSERT INTO cprop2 VALUES "
        "('ok_1', CAST('x' AS BINARY), 16000, 100, 'pcm16', 't')",
        {"cprop2": t})
    assert res["rows"] == 1
    assert "bad_1" not in _ids(t) and "ok_1" in _ids(t)


# -------------------------------------------------- CHECK constraints

def test_add_constraint_gates_subsequent_writes(spark, tmp_path):
    """Delta's ADD CONSTRAINT ... CHECK: the named predicate joins the
    table contract (ONE property — every writer enforces it), so the
    next INSERT of a violating row refuses while conforming rows land."""
    from open_finance_lakehouse_spark.quality.contracts import (
        ContractViolation,
    )

    t = _table(spark, tmp_path, "ck1", n=5)
    res = run_alter(
        spark,
        "ALTER TABLE ck1 ADD CONSTRAINT dur_nonneg CHECK (dur_ms >= 0)",
        {"ck1": t})
    assert res["operation"] == "add_constraint"
    assert res["constraint"] == "dur_nonneg"
    with pytest.raises(ContractViolation, match="check:dur_nonneg"):
        run_insert(
            spark,
            "INSERT INTO ck1 VALUES "
            "('bad_1', CAST('x' AS BINARY), 8000, -5, 'pcm16', 't')",
            {"ck1": t})
    run_insert(
        spark,
        "INSERT INTO ck1 VALUES "
        "('ok_1', CAST('x' AS BINARY), 8000, 5, 'pcm16', 't')",
        {"ck1": t})
    assert "ok_1" in _ids(t) and "bad_1" not in _ids(t)


def test_add_constraint_refuses_existing_violations(spark, tmp_path):
    """Delta discipline: a constraint EXISTING rows already violate must
    refuse at the ADD (with a row sample), else the table is born in
    violation of its own declared contract."""
    t = _table(spark, tmp_path, "ck2", n=5)
    with pytest.raises(ValueError, match="existing rows violate"):
        run_alter(
            spark,
            "ALTER TABLE ck2 ADD CONSTRAINT impossible "
            "CHECK (sr_hz > 1000000000)",
            {"ck2": t})
    assert "contract" not in t.refresh().meta.properties


def test_add_constraint_expression_validation(spark, tmp_path):
    """Bad expressions refuse AT THE ADD, not at the first write:
    unknown columns, non-boolean results, aggregates (legal in SELECT
    but not per-row), and duplicate names (case-insensitive)."""
    t = _table(spark, tmp_path, "ck3", n=3)
    with pytest.raises(ValueError, match="does not analyze"):
        run_alter(spark, "ALTER TABLE ck3 ADD CONSTRAINT c1 "
                  "CHECK (no_such_col > 0)", {"ck3": t})
    with pytest.raises(ValueError, match="not boolean"):
        run_alter(spark, "ALTER TABLE ck3 ADD CONSTRAINT c2 "
                  "CHECK (dur_ms + 1)", {"ck3": t})
    with pytest.raises(ValueError, match="per-row"):
        run_alter(spark, "ALTER TABLE ck3 ADD CONSTRAINT c3 "
                  "CHECK (max(dur_ms) > 0)", {"ck3": t})
    run_alter(spark, "ALTER TABLE ck3 ADD CONSTRAINT dur_ok "
              "CHECK (dur_ms >= 0)", {"ck3": t})
    with pytest.raises(ValueError, match="already has"):
        run_alter(spark, "ALTER TABLE ck3 ADD CONSTRAINT DUR_OK "
                  "CHECK (dur_ms >= 1)", {"ck3": t})


def test_constraint_edits_merge_inside_the_commit_cas(spark, tmp_path):
    """ADD/DROP CONSTRAINT resolve the contract at COMMIT time, not from
    the issuing handle's snapshot: a stale handle's edit must not drop a
    constraint another writer added after the handle loaded (the classic
    lost update), and an ADD revalidates rows committed between its
    pre-check and the property commit."""
    from open_finance_lakehouse_spark.quality.contracts import Contract

    t = _table(spark, tmp_path, "ck9", n=5)
    stale = LakeTable.load(spark, t.location)  # snapshot taken NOW
    run_alter(spark, "ALTER TABLE ck9 ADD CONSTRAINT a "
              "CHECK (dur_ms >= 0)", {"ck9": t})
    # the stale handle never saw constraint a; its ADD must keep it
    run_alter(spark, "ALTER TABLE ck9 ADD CONSTRAINT b "
              "CHECK (sr_hz > 0)", {"ck9": stale})
    c = Contract.from_properties(t.refresh().meta.properties)
    assert set(c.checks) == {"a", "b"}

    # DROP through another stale handle keeps the sibling added after it
    stale2 = LakeTable.load(spark, t.location)
    run_alter(spark, "ALTER TABLE ck9 ADD CONSTRAINT c "
              "CHECK (length(transcript) >= 0)", {"ck9": t})
    run_alter(spark, "ALTER TABLE ck9 DROP CONSTRAINT a", {"ck9": stale2})
    c2 = Contract.from_properties(t.refresh().meta.properties)
    assert set(c2.checks) == {"b", "c"}

    # rows committed after a stale handle's pre-check scan are
    # revalidated inside the CAS: the ADD must see them and refuse
    stale3 = LakeTable.load(spark, t.location)
    t.append(synth_clips(spark, 1, id_offset=77_000, dur_max_ms=100))
    with pytest.raises(ValueError, match="concurrently violate"):
        run_alter(spark, "ALTER TABLE ck9 ADD CONSTRAINT no_new "
                  "CHECK (clip_id NOT LIKE '%77000')", {"ck9": stale3})


def test_check_constraint_null_passes(spark, tmp_path):
    """SQL CHECK semantics: a NULL result satisfies the constraint
    (violation requires an explicit FALSE) — require values with
    not_null, not with CHECK. Consistent with the bounds/allowed rules."""
    from open_finance_lakehouse_spark.quality.contracts import (
        ContractViolation,
    )

    t = _table(spark, tmp_path, "ck4", n=3)
    run_alter(spark, "ALTER TABLE ck4 ADD CONSTRAINT transcript_nonempty "
              "CHECK (length(transcript) > 0)", {"ck4": t})
    # NULL transcript: check evaluates NULL -> passes
    run_insert(
        spark,
        "INSERT INTO ck4 VALUES "
        "('null_1', CAST('x' AS BINARY), 8000, 5, 'pcm16', NULL)",
        {"ck4": t})
    assert "null_1" in _ids(t)
    # empty string: check evaluates FALSE -> refuses
    with pytest.raises(ContractViolation, match="transcript_nonempty"):
        run_insert(
            spark,
            "INSERT INTO ck4 VALUES "
            "('emp_1', CAST('x' AS BINARY), 8000, 5, 'pcm16', '')",
            {"ck4": t})


def test_drop_constraint(spark, tmp_path):
    """DROP CONSTRAINT removes the gate; dropping the LAST rule unsets
    the property so writers regain the no-contract fast path; unknown
    names refuse unless IF EXISTS."""
    t = _table(spark, tmp_path, "ck5", n=3)
    run_alter(spark, "ALTER TABLE ck5 ADD CONSTRAINT dur_pos "
              "CHECK (dur_ms > 0)", {"ck5": t})
    res = run_alter(spark, "ALTER TABLE ck5 DROP CONSTRAINT dur_pos",
                    {"ck5": t})
    assert res["dropped"] == "dur_pos"
    assert "contract" not in t.refresh().meta.properties
    run_insert(  # previously-gated row now lands
        spark,
        "INSERT INTO ck5 VALUES "
        "('neg_1', CAST('x' AS BINARY), 8000, -5, 'pcm16', 't')",
        {"ck5": t})
    assert "neg_1" in _ids(t)
    with pytest.raises(ValueError, match="no CHECK constraint"):
        run_alter(spark, "ALTER TABLE ck5 DROP CONSTRAINT nope",
                  {"ck5": t})
    res = run_alter(spark, "ALTER TABLE ck5 DROP CONSTRAINT IF EXISTS "
                    "nope", {"ck5": t})
    assert res["dropped"] is None


def test_drop_constraint_preserves_other_rules(spark, tmp_path):
    """Dropping one named check keeps the contract's other rules (and
    other checks) intact — the property is rewritten, not cleared."""
    import json

    from open_finance_lakehouse_spark.quality.contracts import (
        ContractViolation,
    )

    t = _table(spark, tmp_path, "ck6", n=3)
    t.set_properties(set_props={
        "contract": json.dumps({"bounds": {"sr_hz": [1, 192000]}})})
    run_alter(spark, "ALTER TABLE ck6 ADD CONSTRAINT dur_pos "
              "CHECK (dur_ms > 0)", {"ck6": t})
    run_alter(spark, "ALTER TABLE ck6 DROP CONSTRAINT dur_pos",
              {"ck6": t})
    props = t.refresh().meta.properties
    assert json.loads(props["contract"])["bounds"] == {
        "sr_hz": [1, 192000]}
    with pytest.raises(ContractViolation):  # bounds rule still gates
        run_insert(
            spark,
            "INSERT INTO ck6 VALUES "
            "('bad_1', CAST('x' AS BINARY), -5, 5, 'pcm16', 't')",
            {"ck6": t})


def test_schema_rewrite_carries_or_refuses_contract(spark, tmp_path):
    """A schema rewrite must not orphan the contract: rules on a RENAMED
    column carry forward under the new name (and keep gating), rules on
    a DROPPED column refuse the rewrite, and an opaque CHECK expression
    refuses whenever it no longer analyzes (rename included — the
    expression still names the old column)."""
    import json

    from open_finance_lakehouse_spark.format.table import (
        SchemaEvolutionError,
    )
    from open_finance_lakehouse_spark.quality.contracts import (
        ContractViolation,
    )

    t = _table(spark, tmp_path, "cc1", n=3)
    t.set_properties(set_props={
        "contract": json.dumps({"bounds": {"sr_hz": [1, 192000]}})})

    # dropping the ruled column refuses, naming the rule
    with pytest.raises(SchemaEvolutionError, match="bounds"):
        run_alter(spark, "ALTER TABLE cc1 DROP COLUMN sr_hz", {"cc1": t})

    # renaming it carries the rule under the new name — and still gates
    run_alter(spark, "ALTER TABLE cc1 RENAME COLUMN sr_hz TO sample_rate",
              {"cc1": t})
    c = json.loads(t.refresh().meta.properties["contract"])
    assert c["bounds"] == {"sample_rate": [1, 192000]}
    with pytest.raises(ContractViolation):
        run_insert(
            spark,
            "INSERT INTO cc1 VALUES "
            "('bad_1', CAST('x' AS BINARY), -5, 5, 'pcm16', 't')",
            {"cc1": t})

    # CHECK constraints are opaque expressions: both dropping AND
    # renaming a referenced column refuse (DROP CONSTRAINT first)
    run_alter(spark, "ALTER TABLE cc1 ADD CONSTRAINT dur_pos "
              "CHECK (dur_ms > 0)", {"cc1": t})
    for stmt in ("ALTER TABLE cc1 DROP COLUMN dur_ms",
                 "ALTER TABLE cc1 RENAME COLUMN dur_ms TO duration_ms"):
        with pytest.raises(SchemaEvolutionError, match="dur_pos"):
            run_alter(spark, stmt, {"cc1": t})
    # the advertised path works: drop the constraint, then evolve
    run_alter(spark, "ALTER TABLE cc1 DROP CONSTRAINT dur_pos", {"cc1": t})
    run_alter(spark, "ALTER TABLE cc1 RENAME COLUMN dur_ms TO duration_ms",
              {"cc1": t})
    assert "duration_ms" in [f.name for f in
                             t.refresh()._empty_df().schema.fields]


def test_add_constraint_preserves_literal_whitespace(spark, tmp_path):
    """The stored CHECK expression keeps interior whitespace — a string
    literal with two spaces must not silently become one space."""
    import json

    t = _table(spark, tmp_path, "cc2", n=3)
    run_alter(spark, "ALTER TABLE cc2 ADD CONSTRAINT no_marker "
              "CHECK (transcript != 'a  b')", {"cc2": t})
    c = json.loads(t.refresh().meta.properties["contract"])
    assert c["checks"]["no_marker"] == "transcript != 'a  b'"


def test_tblproperties_value_with_trailing_backslash_round_trips(
        spark, tmp_path):
    """TBLPROPERTIES values use '' doubling as the ONLY escape — a value
    ending in a backslash (regex fragments in contracts) must not
    swallow its closing quote in the pair splitter."""
    t = _table(spark, tmp_path, "bsp", n=3)
    run_alter(spark,
              r"ALTER TABLE bsp SET TBLPROPERTIES ('re'='\d+\', "
              r"'other'='x')", {"bsp": t})
    props = t.refresh().meta.properties
    assert props["re"] == "\\d+\\" and props["other"] == "x"
