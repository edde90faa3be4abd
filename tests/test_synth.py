"""Clip-table synthesis tests: determinism across parallelism, schema,
skewed hot keys, payload SNR invariant, and curve-key UDFs on Spark."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_finance_lakehouse_spark.functions.curves import curve_key_col
from open_finance_lakehouse_spark.sources import synth


def test_schema_and_determinism_across_parallelism(spark):
    a = synth.synth_clips(spark, 200, dur_max_ms=1500).repartition(7)
    b = synth.synth_clips(spark, 200, dur_max_ms=1500).repartition(2)
    assert a.schema.simpleString() == (
        "struct<clip_id:string,bytes:binary,sr_hz:int,dur_ms:int,"
        "codec:string,transcript:string>"
    )
    # identical content regardless of partitioning (hash-of-key derivation)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.select("clip_id").distinct().count() == 200


def test_hot_key_skew_exists(spark):
    df = synth.clip_attrs_df(spark, 2000, hot_fraction=0.2, n_hot_prefixes=4)
    hot = df.filter(F.col("clip_id").startswith("clip-hot")).count()
    assert 250 <= hot <= 550  # ~20%
    prefixes = (
        df.filter(F.col("clip_id").startswith("clip-hot"))
        .select(F.substring("clip_id", 1, 10).alias("p"))
        .distinct()
        .count()
    )
    assert prefixes == 4


def test_payload_snr_invariant_holds(spark):
    clips = synth.synth_clips(spark, 60, dur_max_ms=1200,
                              sample_rates=(8000, 16000))
    scores = synth.verify_snr_df(clips)
    bad = scores.filter(F.col("snr_db") < 30.0).count()
    assert bad == 0
    # and n_samples matches dur*sr/1000
    joined = clips.join(scores, "clip_id")
    mism = joined.filter(
        F.col("n_samples") != (F.col("dur_ms") * F.col("sr_hz") / 1000).cast("int")
    ).count()
    assert mism == 0


def test_snr_gate_catches_corrupted_payloads(spark):
    """Negative: flip payloads between two clips -> SNR gate must fire."""
    clips = synth.synth_clips(spark, 20, dur_max_ms=800,
                              sample_rates=(8000,), codecs=("pcm16",))
    # corrupt: give every clip the bytes of some other clip (shift by 1)
    w = F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("clip_id"))
    idx = clips.withColumn("rn", w)
    swapped = (
        idx.alias("a")
        .join(idx.alias("b"),
              F.col("a.rn") == (F.col("b.rn") % 20) + 1)
        .select(
            F.col("a.clip_id"), F.col("b.bytes"), F.col("a.sr_hz"),
            F.col("a.dur_ms"), F.col("a.codec"), F.col("a.transcript"),
        )
    )
    bad = synth.verify_snr_df(swapped).filter(F.col("snr_db") < 30.0).count()
    assert bad == 20


def test_curve_key_udfs_run_and_are_deterministic(spark):
    df = synth.clip_attrs_df(spark, 300, dur_max_ms=2000)
    z1 = df.withColumn("zval", curve_key_col("zorder"))
    z2 = df.withColumn("zval", curve_key_col("zorder"))
    assert z1.exceptAll(z2).count() == 0
    h = df.withColumn("hval", curve_key_col("hilbert"))
    assert h.select("hval").distinct().count() > 250  # keys mostly unique
    assert z1.filter(F.col("zval") < 0).count() == 0  # fits signed int64
