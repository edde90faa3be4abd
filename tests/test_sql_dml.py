"""SQL DML front door: DELETE FROM / UPDATE ... SET routed to the
predicate operators, with top-level conjuncts lifted into ColumnRange so
manifest stats + bucket pruning fire from plain SQL — the statement
shapes a Delta user writes against the reference's tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import ColumnRange, LakeTable
from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
from open_finance_lakehouse_spark.sources.synth import CLIP_SCHEMA_DDL, synth_clips
from open_finance_lakehouse_spark.sql import (
    _extract_conjuncts,
    _split_top,
    run_dml,
)


# -------------------------------------------------- parser (no Spark)


def test_split_top_respects_quotes_and_parens():
    assert _split_top("a = 1 and b = 2", " and ") == ["a = 1", "b = 2"]
    assert _split_top("a = 'x and y' and b = 2", " and ") == [
        "a = 'x and y'", "b = 2"]
    assert _split_top("f(a, b) and c in (1, 2)", " and ") == [
        "f(a, b)", "c in (1, 2)"]
    # 'band' must not split on the embedded 'and'
    assert _split_top("band = 1", " and ") == ["band = 1"]


def test_extract_exact_conjuncts():
    preds, fully = _extract_conjuncts(
        "dur_ms <= 800 and sr_hz >= 16000 and codec = 'pcm16' "
        "and clip_id in ('a', 'b') and dur_ms between 10 and 20")
    assert fully
    by = {(p.column, p.lo, p.hi, p.values) for p in preds}
    assert ("dur_ms", None, 800, None) in by
    assert ("sr_hz", 16000, None, None) in by
    assert ("codec", "pcm16", "pcm16", None) in by
    assert ("clip_id", None, None, ("a", "b")) in by
    assert ("dur_ms", 10, 20, None) in by


def test_extract_relaxed_and_unliftable():
    # strict < lifts a RELAXED inclusive bound, marked not-fully-parsed
    preds, fully = _extract_conjuncts("dur_ms < 800")
    assert not fully and preds[0].hi == 800
    # non-literal RHS and OR-ish shapes stay residual-only
    preds, fully = _extract_conjuncts("dur_ms <= sr_hz")
    assert not fully and preds == []
    preds, fully = _extract_conjuncts("(a = 1 or b = 2) and c = 3")
    assert not fully
    assert [(p.column, p.lo) for p in preds] == [("c", 3)]


# ---------------------------------------------------------- execution


def _table(spark, tmp_path, name, n=60, **kw):
    t = LakeTable.create(
        spark, str(tmp_path / name), name, CLIP_SCHEMA_DDL,
        partition_spec={"kind": "bucket", "column": "clip_id",
                        "num_buckets": 2})
    t.append(synth_clips(spark, n, **kw), max_records_per_file=6)
    return t


def test_sql_delete_matches_operator_semantics(spark, tmp_path):
    t = _table(spark, tmp_path, "sdel", dur_max_ms=2000)
    led = CheckpointLedger(str(tmp_path / "led"))
    k = t.scan().filter("dur_ms <= 900").count()
    res = run_dml(spark, "DELETE FROM sdel WHERE dur_ms <= 900;",
                  {"sdel": t}, led)
    assert res["operation"] == "delete" and res["rows_deleted"] == k
    assert t.refresh().scan().filter("dur_ms <= 900").count() == 0


def test_sql_delete_point_lookup_bucket_prunes(spark, tmp_path):
    t = _table(spark, tmp_path, "spt", n=80)
    led = CheckpointLedger(str(tmp_path / "led"))
    victim = t.scan().select("clip_id").first()["clip_id"]
    res = run_dml(spark, f"DELETE FROM spt WHERE clip_id = '{victim}'",
                  {"spt": t}, led)
    assert res["rows_deleted"] == 1
    assert res["files_untouched"] > 0  # bucket pruning fired through SQL


def test_sql_update_with_residual_where(spark, tmp_path):
    t = _table(spark, tmp_path, "supd", dur_max_ms=2000)
    led = CheckpointLedger(str(tmp_path / "led"))
    k = t.scan().filter(
        "dur_ms <= 1200 AND transcript LIKE '%a%'").count()
    res = run_dml(
        spark,
        "UPDATE supd SET codec = 'retagged', sr_hz = sr_hz * 2 "
        "WHERE dur_ms <= 1200 and transcript LIKE '%a%'",
        {"supd": str(tmp_path / "supd")}, led)  # location resolution path
    assert res["operation"] == "update" and res["rows_updated"] == k
    after = t.refresh().scan()
    assert after.filter("codec = 'retagged'").count() == k
    assert after.filter(
        "dur_ms > 1200 AND codec = 'retagged'").count() == 0


def test_sql_update_without_where(spark, tmp_path):
    t = _table(spark, tmp_path, "sall", n=20)
    led = CheckpointLedger(str(tmp_path / "led"))
    res = run_dml(spark, "UPDATE sall SET codec = 'flat'", {"sall": t}, led)
    assert res["rows_updated"] == 20


def test_sql_dml_rejects_unknown_statements_and_tables(spark, tmp_path):
    t = _table(spark, tmp_path, "serr", n=10)
    led = CheckpointLedger(str(tmp_path / "led"))
    with pytest.raises(ValueError, match="SELECTs go to run_sql"):
        run_dml(spark, "SELECT * FROM serr", {"serr": t}, led)
    with pytest.raises(ValueError, match="unknown table"):
        run_dml(spark, "DELETE FROM nope WHERE dur_ms <= 1",
                {"serr": t}, led)
    with pytest.raises(ValueError, match="bad SET assignment"):
        run_dml(spark, "UPDATE serr SET 1bad = 2 WHERE dur_ms <= 1",
                {"serr": t}, led)


def test_sql_delete_fully_lifted_keeps_metadata_tier(spark, tmp_path):
    """A WHERE that lifts exactly drops the residual, so the
    metadata-only tier still fires — SQL is not a slower path."""
    t = LakeTable.create(spark, str(tmp_path / "smeta"), "smeta",
                         CLIP_SCHEMA_DDL)
    for lo in (100, 200, 300):
        df = (spark.range(10)
              .select((F.lit(lo) + F.col("id") * 10).cast("int")
                      .alias("dur_ms"))
              .withColumn("clip_id", F.concat(F.lit(f"c{lo}-"),
                                              F.col("dur_ms")))
              .withColumn("bytes", F.lit(b"\x00"))
              .withColumn("sr_hz", F.lit(16000))
              .withColumn("codec", F.lit("pcm16"))
              .withColumn("transcript", F.lit("x"))
              .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                      "transcript"))
        t.append(df.coalesce(1))
    led = CheckpointLedger(str(tmp_path / "led"))
    res = run_dml(spark, "DELETE FROM smeta WHERE dur_ms <= 250",
                  {"smeta": t}, led)
    assert res["files_full_dropped"] == 1  # tier 2 fired through SQL
    assert res["files_rewritten"] == 1
    assert res["files_untouched"] == 1
    assert t.refresh().scan().count() == 14


# ------------------------------------------- round-5 review regressions


def test_or_tail_string_literal_is_not_mislifted():
    """Regression: ``a = 'x' OR b = 'y'`` once fullmatched the comparison
    grammar (the rhs regex is greedy) and the old first-and-last-quote
    literal check accepted ``'x' or b = 'y'`` as ONE string — lifting a
    bogus equality, marking the clause fully parsed, and DROPPING the OR
    from the residual: the DML silently no-opped."""
    from open_finance_lakehouse_spark.sql import _parse_literal

    assert _parse_literal("'x'") == "x"
    assert _parse_literal("'x''y'") == "x'y"          # '' escape
    assert _parse_literal("''") == ""
    assert _parse_literal("'x' or b = 'y'") is None   # text past the quote
    assert _parse_literal("'unterminated") is None
    preds, fully = _extract_conjuncts("codec = 'x' or sr_hz = 8000")
    assert not fully and preds == []


def test_sql_delete_with_or_string_tail_deletes_exactly(spark, tmp_path):
    t = _table(spark, tmp_path, "sor", dur_max_ms=2000)
    led = CheckpointLedger(str(tmp_path / "led"))
    cond = "dur_ms <= 400 OR codec = 'ulaw'"
    k = t.scan().filter(cond).count()
    assert 0 < k < 60
    res = run_dml(spark,
                  "DELETE FROM sor WHERE dur_ms <= 400 or codec = 'ulaw'",
                  {"sor": t}, led)
    assert res["rows_deleted"] == k
    after = t.refresh().scan()
    assert after.filter(cond).count() == 0
    assert after.count() == 60 - k


def test_sql_update_set_literal_containing_where_keyword(spark, tmp_path):
    """Regression: the UPDATE regex's lazy ``\\s+where\\s+`` split bound
    INSIDE a SET string literal, mangling a legal statement into an
    unterminated expression."""
    t = _table(spark, tmp_path, "swh", n=20)
    led = CheckpointLedger(str(tmp_path / "led"))
    res = run_dml(spark, "UPDATE swh SET transcript = 'no where clause'",
                  {"swh": t}, led)
    assert res["rows_updated"] == 20
    assert (t.refresh().scan()
            .filter("transcript = 'no where clause'").count() == 20)
    # a literal containing ' where ' followed by a REAL where clause
    res = run_dml(spark,
                  "UPDATE swh SET transcript = 'a where b' "
                  "WHERE sr_hz >= 0",
                  {"swh": t}, led)
    assert res["rows_updated"] == 20
    assert (t.refresh().scan()
            .filter("transcript = 'a where b'").count() == 20)


def test_top_level_or_disables_all_lifting():
    """Regression: ``p AND q OR r`` parses as ``(p AND q) OR r`` — lifting
    p as a pruning/filter predicate silently excluded rows matching only
    r. Any top-level OR must disable lifting entirely."""
    preds, fully = _extract_conjuncts("a = 'x' and b = 'y' or c = 'z'")
    assert preds == [] and not fully
    preds, fully = _extract_conjuncts("a = 1 or b = 2 and c = 3")
    assert preds == [] and not fully
    # ORs INSIDE parens bound their own conjunct; siblings still lift
    preds, fully = _extract_conjuncts("(a = 1 or b = 2) and c = 3")
    assert [(p.column, p.lo) for p in preds] == [("c", 3)] and not fully
    # an OR inside a string literal is data, not precedence
    preds, fully = _extract_conjuncts("a = 'x or y' and c = 3")
    assert fully and {(p.column, p.lo) for p in preds} == {
        ("a", "x or y"), ("c", 3)}


def test_sql_delete_mixed_and_or_deletes_exactly(spark, tmp_path):
    t = _table(spark, tmp_path, "mao", dur_max_ms=2000)
    led = CheckpointLedger(str(tmp_path / "led"))
    cond = "dur_ms <= 400 AND codec = 'ulaw' OR codec = 'alaw'"
    k = t.scan().filter(cond).count()
    assert 0 < k < 60
    res = run_dml(
        spark,
        "DELETE FROM mao WHERE dur_ms <= 400 and codec = 'ulaw' "
        "or codec = 'alaw'", {"mao": t}, led)
    assert res["rows_deleted"] == k
    assert t.refresh().scan().filter(cond).count() == 0
    assert t.scan().count() == 60 - k


def _banded_table(spark, tmp_path, name):
    """Three files with disjoint dur_ms bands: [100,190], [200,290],
    [300,390] — one file per band."""
    t = LakeTable.create(spark, str(tmp_path / name), name, CLIP_SCHEMA_DDL)
    for lo in (100, 200, 300):
        df = (spark.range(10)
              .select((F.lit(lo) + F.col("id") * 10).cast("int")
                      .alias("dur_ms"))
              .withColumn("clip_id", F.concat(F.lit(f"c{lo}-"),
                                              F.col("dur_ms")))
              .withColumn("bytes", F.lit(b"\x00"))
              .withColumn("sr_hz", F.lit(16000))
              .withColumn("codec", F.lit("pcm16"))
              .withColumn("transcript", F.lit("x"))
              .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                      "transcript"))
        t.append(df.coalesce(1))
    return t


def test_or_predicate_prunes_disjunctively(spark, tmp_path):
    """A top-level OR lifts into pruning ARMS: files NO arm can overlap
    are never read, and a fully-lifted OR keeps the metadata-only tier
    (a file SOME arm provably matches entirely drops without a byte
    read)."""
    t = _banded_table(spark, tmp_path, "orband")
    led = CheckpointLedger(str(tmp_path / "led"))
    # straddling OR: middle file untouched, outer files rewritten
    res = run_dml(spark,
                  "DELETE FROM orband WHERE dur_ms <= 150 or dur_ms >= 320",
                  {"orband": t}, led)
    assert res["files_untouched"] == 1   # the [200,290] file never read
    assert res["files_rewritten"] == 2
    assert res["rows_deleted"] == 6 + 8  # <=150: 100..150; >=320: 320..390
    assert t.refresh().scan().count() == 16

    # fully-covering OR: both remaining outer bands drop METADATA-ONLY
    t2 = _banded_table(spark, tmp_path, "orfull")
    res = run_dml(spark,
                  "DELETE FROM orfull WHERE dur_ms <= 190 or dur_ms >= 300",
                  {"orfull": t2}, led)
    assert res["files_full_dropped"] == 2  # zero bytes read for these
    assert res["files_rewritten"] == 0
    assert res["files_untouched"] == 1
    assert res["rows_deleted"] == 20
    assert t2.refresh().scan().count() == 10


def test_or_predicate_update_prunes_and_matches_exactly(spark, tmp_path):
    t = _banded_table(spark, tmp_path, "orupd")
    led = CheckpointLedger(str(tmp_path / "led"))
    res = run_dml(spark,
                  "UPDATE orupd SET codec = 'x' "
                  "WHERE dur_ms <= 150 or dur_ms >= 320",
                  {"orupd": t}, led)
    assert res["files_untouched"] == 1
    assert res["rows_updated"] == 14
    after = t.refresh().scan()
    assert after.filter("codec = 'x'").count() == 14
    assert after.filter(
        "codec = 'x' AND dur_ms > 150 AND dur_ms < 320").count() == 0


def test_extract_predicates_arm_shapes():
    from open_finance_lakehouse_spark.sql import _extract_predicates

    preds, any_of, fully = _extract_predicates(
        "dur_ms <= 400 or codec = 'ulaw'")
    assert preds == [] and fully
    assert [[(p.column, p.lo, p.hi) for p in arm] for arm in any_of] == [
        [("dur_ms", None, 400)], [("codec", "ulaw", "ulaw")]]
    # a mixed AND arm inside an OR
    preds, any_of, fully = _extract_predicates(
        "dur_ms <= 400 and codec = 'ulaw' or sr_hz >= 44100")
    assert fully and len(any_of) == 2 and len(any_of[0]) == 2
    # an unliftable arm keeps the clause residual but other arms prune
    preds, any_of, fully = _extract_predicates(
        "transcript LIKE '%a%' or dur_ms <= 10")
    assert not fully and any_of[0] == [] and len(any_of[1]) == 1
    # no OR: conjunct path unchanged
    preds, any_of, fully = _extract_predicates("dur_ms <= 400")
    assert any_of is None and fully and len(preds) == 1


def test_parenthesized_or_arms_still_prune(spark, tmp_path):
    """Regression: '(a AND b) OR c' — the textbook OR shape — lifted as
    an EMPTY arm (the parens matched no pattern), so the candidate union
    was every live file."""
    from open_finance_lakehouse_spark.sql import _extract_predicates

    preds, any_of, fully = _extract_predicates(
        "(dur_ms <= 150 and codec = 'pcm16') or (dur_ms >= 320)")
    assert fully and len(any_of) == 2
    assert len(any_of[0]) == 2 and len(any_of[1]) == 1
    # whole-clause parens too
    preds, any_of, fully = _extract_predicates("((dur_ms <= 150))")
    assert any_of is None and fully and preds[0].hi == 150
    # a parenthesized conjunct inside an AND keeps pruning
    preds, fully = _extract_conjuncts("(dur_ms <= 150) and (codec = 'x')")
    assert fully and len(preds) == 2

    t = _banded_table(spark, tmp_path, "orparen")
    led = CheckpointLedger(str(tmp_path / "led"))
    res = run_dml(
        spark,
        "DELETE FROM orparen WHERE (dur_ms <= 150 and codec = 'pcm16') "
        "or (dur_ms >= 320)", {"orparen": t}, led)
    assert res["files_untouched"] == 1  # middle band never read
    assert res["rows_deleted"] == 14


def test_empty_arm_without_residual_refuses_truncate(spark, tmp_path):
    from open_finance_lakehouse_spark.operators.delete_where import (
        delete_where,
    )

    t = _table(spark, tmp_path, "earm", n=10)
    led = CheckpointLedger(str(tmp_path / "led"))
    with pytest.raises(ValueError, match="empty arm"):
        delete_where(t, led, "e1", any_of=[[], [ColumnRange("dur_ms",
                                                            hi=100)]])
    assert t.refresh().scan().count() == 10


def test_is_null_lifts_and_keeps_metadata_tier(spark, tmp_path):
    """IS [NOT] NULL conjuncts lift into null-count pruning: an all-null
    file drops METADATA-ONLY under IS NULL, a zero-null file is never
    read, and mixed files rewrite — exact results either way."""
    from open_finance_lakehouse_spark.sql import _extract_conjuncts as ec

    preds, fully = ec("transcript is null and dur_ms <= 400")
    assert fully and preds[0].null_test == "null"
    preds, fully = ec("transcript IS NOT NULL")
    assert fully and preds[0].null_test == "notnull"

    t = LakeTable.create(spark, str(tmp_path / "nulldel"), "nulldel",
                         CLIP_SCHEMA_DDL)

    def band(lo, transcript_expr):
        return (spark.range(10)
                .select((F.lit(lo) + F.col("id") * 10).cast("int")
                        .alias("dur_ms"))
                .withColumn("clip_id", F.concat(F.lit(f"c{lo}-"),
                                                F.col("dur_ms")))
                .withColumn("bytes", F.lit(b"\x00"))
                .withColumn("sr_hz", F.lit(16000))
                .withColumn("codec", F.lit("pcm16"))
                .withColumn("transcript", transcript_expr)
                .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                        "transcript"))

    t.append(band(100, F.lit("x")).coalesce(1))                    # no nulls
    t.append(band(200, F.lit(None).cast("string")).coalesce(1))    # all null
    t.append(band(300, F.when(F.col("dur_ms") % 20 == 0,
                              F.lit("y"))).coalesce(1))            # mixed
    led = CheckpointLedger(str(tmp_path / "led"))
    res = run_dml(spark, "DELETE FROM nulldel WHERE transcript is null",
                  {"nulldel": t}, led)
    assert res["files_untouched"] == 1      # the no-null file never read
    assert res["files_full_dropped"] == 1   # the all-null file: zero bytes
    assert res["files_rewritten"] == 1      # the mixed file
    assert res["rows_deleted"] == 15
    after = t.refresh().scan()
    assert after.count() == 15
    assert after.filter("transcript IS NULL").count() == 0

    # IS NOT NULL: the all-null file is untouched, the no-null drops
    t2 = LakeTable.create(spark, str(tmp_path / "nn2"), "nn2",
                          CLIP_SCHEMA_DDL)
    t2.append(band(100, F.lit("x")).coalesce(1))
    t2.append(band(200, F.lit(None).cast("string")).coalesce(1))
    res = run_dml(spark, "DELETE FROM nn2 WHERE transcript IS NOT NULL",
                  {"nn2": t2}, led)
    assert res["files_untouched"] == 1 and res["files_full_dropped"] == 1
    assert t2.refresh().scan().count() == 10
    assert t2.scan().filter("transcript IS NOT NULL").count() == 0


# ------------------------------------------------------- MERGE INTO SQL


def _merge_target(spark, tmp_path, name):
    t = LakeTable.create(
        spark, str(tmp_path / name), name,
        "series_id STRING, day DATE, value DOUBLE",
        partition_spec={"kind": "bucket", "column": "series_id",
                        "num_buckets": 2})
    t.append(spark.sql("""
        SELECT concat('s', cast(id % 4 AS STRING)) AS series_id,
               date_add(date'2026-01-01', cast(id / 4 AS INT)) AS day,
               cast(id AS DOUBLE) AS value FROM range(16)"""),
        max_records_per_file=4)
    return t


def _src(spark, rows):
    return (spark.createDataFrame(
        rows, "series_id STRING, day STRING, delta DOUBLE")
        .withColumn("day", F.col("day").cast("date")))


def test_merge_sql_update_delete_insert(spark, tmp_path):
    """Full three-clause MERGE: matched-update referencing both aliases,
    conditional matched-delete, not-matched insert with explicit values."""
    from open_finance_lakehouse_spark.sql import run_merge

    t = _merge_target(spark, tmp_path, "msql")
    led = CheckpointLedger(str(tmp_path / "led"))
    src = _src(spark, [
        ("s1", "2026-01-01", 100.0),   # matched, delta >= 0 -> update
        ("s2", "2026-01-01", -1.0),    # matched, delta < 0  -> delete
        ("s9", "2026-03-01", 7.0),     # not matched         -> insert
    ])
    res = run_merge(
        spark,
        """MERGE INTO msql t USING changes s
           ON t.series_id = s.series_id AND t.day = s.day
           WHEN MATCHED AND s.delta < 0 THEN DELETE
           WHEN MATCHED THEN UPDATE SET value = t.value + s.delta
           WHEN NOT MATCHED THEN INSERT (series_id, day, value)
             VALUES (s.series_id, s.day, s.delta)""",
        {"msql": t}, led, source=src)
    assert res["rows"] > 0
    after = {(r["series_id"], str(r["day"])): r["value"]
             for r in t.refresh().scan().collect()}
    assert after[("s1", "2026-01-01")] == 1.0 + 100.0  # t.value + s.delta
    assert ("s2", "2026-01-01") not in after           # deleted
    assert after[("s9", "2026-03-01")] == 7.0          # inserted
    assert len(after) == 16  # 16 - 1 delete + 1 insert
    # unclaimed rows untouched
    assert after[("s3", "2026-01-01")] == 3.0


def test_merge_sql_insert_star_and_duplicate_source_refusal(
        spark, tmp_path):
    from open_finance_lakehouse_spark.sql import run_merge

    t = _merge_target(spark, tmp_path, "mstar")
    led = CheckpointLedger(str(tmp_path / "led"))
    src = (spark.createDataFrame(
        [("s8", "2026-05-01", 80.0), ("s1", "2026-01-01", 111.0)],
        "series_id STRING, day STRING, value DOUBLE")
        .withColumn("day", F.col("day").cast("date")))
    run_merge(
        spark,
        "MERGE INTO mstar t USING u s ON t.series_id = s.series_id "
        "AND t.day = s.day "
        "WHEN MATCHED THEN UPDATE SET value = s.value "
        "WHEN NOT MATCHED THEN INSERT *",
        {"mstar": t}, led, source=src)
    after = {(r["series_id"], str(r["day"])): r["value"]
             for r in t.refresh().scan().collect()}
    assert after[("s8", "2026-05-01")] == 80.0
    assert after[("s1", "2026-01-01")] == 111.0
    assert len(after) == 17

    dup = (spark.createDataFrame(
        [("s1", "2026-01-01", 1.0), ("s1", "2026-01-01", 2.0)],
        "series_id STRING, day STRING, value DOUBLE")
        .withColumn("day", F.col("day").cast("date")))
    with pytest.raises(ValueError, match="multiple.*rows"):
        run_merge(
            spark,
            "MERGE INTO mstar t USING u s ON t.series_id = s.series_id "
            "AND t.day = s.day WHEN MATCHED THEN UPDATE SET value = "
            "s.value", {"mstar": t}, led, source=dup)


def test_merge_sql_grammar_errors(spark, tmp_path):
    from open_finance_lakehouse_spark.sql import run_merge

    t = _merge_target(spark, tmp_path, "merr")
    led = CheckpointLedger(str(tmp_path / "led"))
    src = _src(spark, [("s1", "2026-01-01", 1.0)])
    with pytest.raises(ValueError, match="alias equalities"):
        run_merge(spark,
                  "MERGE INTO merr t USING u s ON t.series_id > s.series_id "
                  "WHEN MATCHED THEN DELETE", {"merr": t}, led, source=src)
    with pytest.raises(ValueError, match="SAME column name"):
        run_merge(spark,
                  "MERGE INTO merr t USING u s ON t.series_id = s.day "
                  "WHEN MATCHED THEN DELETE", {"merr": t}, led, source=src)
    with pytest.raises(ValueError, match="unsupported MERGE action"):
        run_merge(spark,
                  "MERGE INTO merr t USING u s ON t.series_id = s.series_id "
                  "AND t.day = s.day WHEN NOT MATCHED THEN UPDATE SET "
                  "value = 1", {"merr": t}, led, source=src)


def test_merge_sql_review_regressions(spark, tmp_path):
    """Round-5 review fixes: alias-free form, newline-AND in ON, CASE
    WHEN inside SET, typo'd SET/INSERT columns refuse, key-column SET
    refuses, duplicate TARGET keys refuse."""
    from open_finance_lakehouse_spark.sql import run_merge

    t = _merge_target(spark, tmp_path, "mreg")
    led = CheckpointLedger(str(tmp_path / "led"))
    src = _src(spark, [("s1", "2026-01-01", 100.0),
                       ("s2", "2026-01-01", -5.0)])
    src.createOrReplaceTempView("chg")
    # alias-free (table-name qualifiers), newline before AND, CASE in SET
    res = run_merge(
        spark,
        """MERGE INTO mreg USING chg
           ON mreg.series_id = chg.series_id
AND mreg.day = chg.day
           WHEN MATCHED THEN UPDATE SET
             value = CASE WHEN chg.delta > 0 THEN mreg.value + chg.delta
                          ELSE 0 END""",
        {"mreg": t}, led)
    assert res["rows"] > 0
    after = {(r["series_id"], str(r["day"])): r["value"]
             for r in t.refresh().scan().collect()}
    assert after[("s1", "2026-01-01")] == 101.0  # CASE positive arm
    assert after[("s2", "2026-01-01")] == 0.0    # CASE else arm

    stmt = ("MERGE INTO mreg t USING chg s ON t.series_id = s.series_id "
            "AND t.day = s.day ")
    with pytest.raises(ValueError, match="not in the target schema"):
        run_merge(spark, stmt + "WHEN MATCHED THEN UPDATE SET vlaue = 1",
                  {"mreg": t}, led)
    with pytest.raises(ValueError, match="not in the target schema"):
        run_merge(spark, stmt + "WHEN NOT MATCHED THEN INSERT "
                  "(series_id, dy, value) VALUES (s.series_id, s.day, 1)",
                  {"mreg": t}, led)
    with pytest.raises(ValueError, match="ON-key column"):
        run_merge(spark, stmt + "WHEN MATCHED THEN UPDATE SET "
                  "day = date_add(t.day, 1)", {"mreg": t}, led)

    # duplicate TARGET keys refuse (the keyed upsert can't apply per-row
    # clauses to them)
    t.append(spark.sql("""SELECT 's1' AS series_id,
        date'2026-01-01' AS day, cast(999.0 AS double) AS value"""))
    with pytest.raises(ValueError, match="target has multiple rows"):
        run_merge(spark, stmt + "WHEN MATCHED THEN UPDATE SET value = 1",
                  {"mreg": t}, led)


def test_merge_sql_second_review_regressions(spark, tmp_path):
    """Unclaimed duplicate target rows refuse BEFORE claiming; case
    variants canonicalize (no key-guard bypass, no false refusal);
    INSERT lists must cover the ON keys; 't.end'-style qualified names
    and double-quoted literals don't confuse the clause scanner."""
    from open_finance_lakehouse_spark.sql import run_merge

    t = _merge_target(spark, tmp_path, "mrev2")
    led = CheckpointLedger(str(tmp_path / "led"))
    src = _src(spark, [("s1", "2026-01-01", 100.0)])
    stmt = ("MERGE INTO mrev2 t USING chg s ON t.series_id = s.series_id "
            "AND t.day = s.day ")

    # case-variant key in ON must still trip the key-SET guard
    with pytest.raises(ValueError, match="ON-key column"):
        run_merge(spark,
                  "MERGE INTO mrev2 t USING chg s ON t.series_id = "
                  "s.series_id AND t.Day = s.Day WHEN MATCHED THEN "
                  "UPDATE SET day = date_add(t.day, 1)",
                  {"mrev2": t}, led, source=src)
    # case-variant SET column is legal (Spark resolves it)
    res = run_merge(spark, stmt + "WHEN MATCHED THEN UPDATE SET "
                    "Value = t.value + s.delta",
                    {"mrev2": t}, led, source=src)
    assert res["rows"] > 0
    assert (t.refresh().scan()
            .filter("series_id='s1' AND day=date'2026-01-01'")
            .first()["value"] == 101.0)

    # INSERT list omitting an ON key refuses (NULL keys would collapse)
    with pytest.raises(ValueError, match="must include the ON-key"):
        run_merge(spark, stmt + "WHEN NOT MATCHED THEN INSERT (value) "
                  "VALUES (s.delta)", {"mrev2": t}, led, source=src)

    # duplicate target keys refuse even when the clause is CONDITIONAL
    # and would claim only one of the duplicates
    t.append(spark.sql("""SELECT 's1' AS series_id,
        date'2026-01-01' AS day, cast(999.0 AS double) AS value"""))
    with pytest.raises(ValueError, match="target has multiple rows"):
        run_merge(spark, stmt + "WHEN MATCHED AND t.value < 500 "
                  "THEN DELETE", {"mrev2": t}, led, source=src)
    # both duplicate rows still present: nothing was claimed or dropped
    assert (t.refresh().scan()
            .filter("series_id='s1' AND day=date'2026-01-01'")
            .count() == 2)


def test_merge_sql_scanner_edges(spark, tmp_path):
    from open_finance_lakehouse_spark.sql import _merge_clauses

    # a double-quoted literal containing WHEN/THEN is opaque
    cls = _merge_clauses(
        'when matched then update set note = "updated when matched" '
        'when not matched then insert *')
    assert len(cls) == 2 and cls[0]["action"] == "update"
    assert cls[1]["action"] == "insert" and cls[1]["insert"] is None
    # a qualified column named like a keyword does not close the CASE
    cls = _merge_clauses(
        "when matched then update set value = "
        "case when t.delta > 0 then 1 else 0 end")
    assert len(cls) == 1
    assert "case when" in cls[0]["set"]["value"].lower()


# ------------------------------------------- round-5 escape-aware parsing


def test_backslash_escape_literals_are_not_lifted():
    """Spark DECODES backslash escapes in literals ('a\\nb' is a-LF-b):
    lifting the raw text would compare (and prune on) the wrong value —
    such conjuncts must stay residual, and an escaped quote must not
    flip the splitter's quote parity."""
    preds, fully = _extract_conjuncts(r"transcript = 'a\nb'")
    assert preds == [] and not fully
    # escaped quote inside the literal: the AND belongs to the literal's
    # text continuation, not the grammar — nothing mis-lifts
    preds, fully = _extract_conjuncts(r"msg = 'a \' and b' AND k = 5")
    assert not fully
    assert all(p.column != "msg" for p in preds)
    assert any(p.column == "k" and p.lo == 5 for p in preds)
    # plain '' doubling still lifts exactly
    preds, fully = _extract_conjuncts("name = 'it''s'")
    assert fully and preds[0].lo == "it's"


def test_sql_delete_backslash_literal_deletes_exactly(spark, tmp_path):
    """End-to-end: a DELETE whose literal carries a backslash escape
    must delete the decoded-match rows (Spark's semantics), not the
    raw-text matches."""
    t = LakeTable.create(spark, str(tmp_path / "besc"), "besc",
                         "k BIGINT, msg STRING")
    t.append(spark.createDataFrame(
        [(1, "a\nb"), (2, "a\\nb"), (3, "c")], "k BIGINT, msg STRING"))
    led = CheckpointLedger(str(tmp_path / "led_besc"))
    res = run_dml(spark, r"DELETE FROM besc WHERE msg = 'a\nb'",
                  {"besc": t}, led)
    assert res["rows_deleted"] == 1
    assert sorted(r["k"] for r in t.refresh().scan().collect()) == [2, 3]


def test_select_time_travel_ignores_escaped_quote_literals(spark, tmp_path):
    """The inline time-travel scanner must not treat text after an
    escaped quote as code: 'version as of' INSIDE a literal never
    rewrites, and a literal containing \\' keeps its content intact."""
    from open_finance_lakehouse_spark.sql import run_select

    t = LakeTable.create(spark, str(tmp_path / "ttq"), "ttq", "k BIGINT")
    t.append(spark.createDataFrame([(1,)], "k BIGINT"))
    got = run_select(
        spark,
        r"SELECT 'x \' ttq version as of 3' AS s, k FROM ttq",
        {"ttq": t}).collect()
    assert got[0]["s"] == "x ' ttq version as of 3" and got[0]["k"] == 1


def test_cli_parse_where_quotes_and_bad_operators():
    """SQL-habit quoting strips; unsupported operators refuse at parse
    time instead of silently matching nothing."""
    from open_finance_lakehouse_spark.cli import _parse_where

    [p] = _parse_where(["codec='pcm'"])
    assert p.column == "codec" and p.lo == "pcm" and p.hi == "pcm"
    [q] = _parse_where(['name="x y"'])
    assert q.lo == "x y"
    for bad in ["codec==pcm", "codec!=pcm", "dur<>5"]:
        with pytest.raises(SystemExit, match="does not support"):
            _parse_where([bad])
