"""Multimodal (audio) operators over driver test tables.

The clip table is derived DETERMINISTICALLY from ``documents`` (doc_id →
clip attributes via the same hash-of-key rules as FIXTURES.md §1), so these
queries run on the driver's parquet without external data while exercising
the real binary-payload plumbing: schema with BinaryType, Arrow-batched
mapInPandas encode/decode, SNR verification, and the maintenance pipeline.

``audio_payload_profile`` carries a real DuckDB oracle (clip attributes
derive via the cross-engine md5 h32, so the oracle recomputes expected
payload sizes independently); the decode/SNR and pipeline queries remain
rows-only — numpy DSP is outside DuckDB's reach — and enforce correctness
through the violation shape instead: they RETURN VIOLATING ROWS (reference
gold-check discipline, /root/reference/ofl/transform/gold/runner.py:82-107),
so a correct engine yields deterministic summary rows with zero violation
counts.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.operators.pipeline import run_maintenance
from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
from open_finance_lakehouse_spark.queries import register
from open_finance_lakehouse_spark.queries.base import H32_SQL, h32, load
from open_finance_lakehouse_spark.sources import synth
from open_finance_lakehouse_spark.sources.synth import CLIP_SCHEMA_DDL


def clips_from_documents(spark, sf_dir, limit: int | None = None):
    """Deterministic clip table keyed by doc_id: every attribute is a pure
    function of clip_id (FIXTURES.md determinism rule), payload synthesized
    by the vectorized mapInPandas kernel.

    Scalar attributes derive via the CROSS-ENGINE h32 hash (md5-based) so a
    DuckDB oracle can re-derive (codec, sr_hz, dur_ms) — and therefore the
    exact expected payload size — independently; only the waveform seed
    stays xxhash64 (the oracle never decodes audio)."""
    d = load(spark, sf_dir, "documents")
    if limit is not None:  # 0 means an EMPTY clip table, not 'no limit'
        d = d.filter(F.col("doc_id") < limit)
    attrs = d.select(
        F.format_string("clip-%012d", F.col("doc_id")).alias("clip_id"),
        F.col("text"),
    )
    hid = F.xxhash64("clip_id")
    sr = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(22050), F.lit(44100)),
        (F.pmod(h32(F.concat(F.col("clip_id"), F.lit(":sr"))), F.lit(4)) + 1
         ).cast("int"),
    )
    dur = (200 + F.pmod(h32(F.concat(F.col("clip_id"), F.lit(":dur"))),
                        F.lit(1800))).cast("int")
    codec = F.element_at(
        F.array(F.lit("pcm16"), F.lit("ulaw"), F.lit("alaw")),
        (F.pmod(h32(F.concat(F.col("clip_id"), F.lit(":codec"))), F.lit(3)) + 1
         ).cast("int"),
    )
    attrs = (
        attrs.withColumn("sr_hz", sr)
        .withColumn("dur_ms", dur)
        .withColumn("codec", codec)
        .withColumn("seed", hid)
        .withColumn("transcript", F.col("text"))
        .drop("text")
    )
    # the documents parquet is a single input split at sandbox SFs — fan
    # the DSP kernel out across the cluster or the whole synthesis runs in
    # ONE task (measured: 10 s single-task vs ~1 s spread at local[32])
    attrs = attrs.repartition(
        spark.sparkContext.defaultParallelism)
    return attrs.mapInPandas(synth._payload_batches,
                             schema=synth._PAYLOAD_SCHEMA)


@register("audio_codec_roundtrip_stats", None)
def audio_codec_roundtrip_stats(spark, sf_dir):
    """Per-codec round-trip audit: every encoded payload decodes to SNR ≥ 30
    dB against its reference waveform (BASELINE.json per-row invariant).
    Violations counted per codec — expected 0 everywhere."""
    clips = clips_from_documents(spark, sf_dir)
    # codec passes through the SNR kernel, so ONE synthesis+decode pass
    # feeds the whole audit (a join back to clips would re-run the
    # mapInPandas synthesis for the second consumer)
    scored = synth.verify_snr_df(clips)
    return (
        scored.groupBy("codec")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.when(F.col("snr_db") < 30.0, 1).otherwise(0))
            .alias("snr_violations"),
            F.sum("n_samples").alias("total_samples"),
        )
        .orderBy("codec")
    )


@register(
    "audio_payload_profile",
    f"""
    WITH derived AS (
      SELECT ['pcm16','ulaw','alaw'][
               CAST({H32_SQL.format(x="clip_id || ':codec'")} % 3 AS INT) + 1]
               AS codec,
             [8000,16000,22050,44100][
               CAST({H32_SQL.format(x="clip_id || ':sr'")} % 4 AS INT) + 1]
               AS sr_hz,
             200 + {H32_SQL.format(x="clip_id || ':dur'")} % 1800 AS dur_ms
      FROM (SELECT printf('clip-%012d', doc_id) AS clip_id FROM documents))
    SELECT codec,
           CAST(count(*) AS BIGINT) AS n_clips,
           CAST(0 AS BIGINT) AS size_violations,
           CAST(sum((CASE WHEN codec = 'pcm16' THEN 2 ELSE 1 END)
                    * ((dur_ms * sr_hz) // 1000)) AS BIGINT) AS total_bytes
    FROM derived GROUP BY codec ORDER BY codec
    """,
)
def audio_payload_profile(spark, sf_dir):
    """Binary-column profiling without decode: payload sizes must equal the
    codec's bytes-per-sample × sample count — a pure metadata invariant
    checkable at full scale (no DSP in the plan).

    The DuckDB oracle re-derives (codec, sr_hz, dur_ms) from the shared
    h32 rules and sums the EXPECTED sizes; Spark sums the ACTUAL stored
    payload lengths — a real three-way check that the synthesized binary
    payloads have exactly the contracted size (violations must hash-match
    the oracle's literal zeros)."""
    clips = clips_from_documents(spark, sf_dir)
    expected = (
        F.when(F.col("codec") == "pcm16", 2).otherwise(1)
        * (F.col("dur_ms").cast("long") * F.col("sr_hz") / 1000).cast("long")
    )
    return (
        clips.select(
            "codec",
            F.length("bytes").alias("payload_bytes"),
            expected.alias("expected_bytes"),
        )
        .groupBy("codec")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.when(F.col("payload_bytes") != F.col("expected_bytes"), 1)
                  .otherwise(0)).alias("size_violations"),
            F.sum("payload_bytes").alias("total_bytes"),
        )
        .orderBy("codec")
    )


@register(
    "audio_frame_features",
    f"""
    WITH derived AS (
      SELECT ['pcm16','ulaw','alaw'][
               CAST({H32_SQL.format(x="clip_id || ':codec'")} % 3 AS INT) + 1]
               AS codec,
             [8000,16000,22050,44100][
               CAST({H32_SQL.format(x="clip_id || ':sr'")} % 4 AS INT) + 1]
               AS sr_hz,
             200 + {H32_SQL.format(x="clip_id || ':dur'")} % 1800 AS dur_ms
      FROM (SELECT printf('clip-%012d', doc_id) AS clip_id FROM documents))
    SELECT codec, sr_hz,
           CAST(count(*) AS BIGINT) AS n_clips,
           CAST(sum(((dur_ms * sr_hz) // 1000) // ((sr_hz * 25) // 1000))
                AS BIGINT) AS total_frames,
           CAST(0 AS BIGINT) AS zcr_violations
    FROM derived GROUP BY codec, sr_hz ORDER BY codec, sr_hz
    """,
)
def audio_frame_features(spark, sf_dir):
    """Feature extraction over the binary audio column: decode → 25 ms
    frame RMS + zero-crossing rate (vectorized mapInPandas), audited per
    (codec, sr_hz) stratum.

    The DuckDB oracle recomputes the arithmetic SKELETON independently —
    clip counts and exact frame totals are integer functions of the
    h32-derived attrs (n_samples = dur·sr/1000, frame = sr·25/1000, floor
    division end to end) — while Spark's numbers flow THROUGH the real
    decode kernel, so the oracle genuinely checks the kernel's framing.
    The ZCR physics gate (two-tone waveform ⇒ 0 < zcr < 0.5 strictly)
    must match the oracle's literal zeros, same discipline as
    ``audio_payload_profile``'s size_violations. The rms/zcr AVERAGES —
    the only numbers DuckDB cannot re-derive — live in
    ``audio_frame_dsp_profile`` (rows-only)."""
    from open_finance_lakehouse_spark.functions import audio

    clips = clips_from_documents(spark, sf_dir)
    feats = clips.select("clip_id", "bytes", "sr_hz", "codec").mapInPandas(
        audio.frame_feature_batches, schema=audio.FEATURE_SCHEMA)
    return (
        feats.groupBy("codec", "sr_hz")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.sum(F.when((F.col("zcr") <= 0.0) | (F.col("zcr") >= 0.5), 1)
                  .otherwise(0)).cast("long").alias("zcr_violations"),
        )
        .orderBy("codec", "sr_hz")
    )


@register("audio_frame_dsp_profile", None)
def audio_frame_dsp_profile(spark, sf_dir):
    """The DSP half of the frame audit: per-stratum RMS/ZCR averages from
    the vectorized kernel. Deterministic fixture rows (payloads are pure
    functions of clip_id) — numpy DSP is outside DuckDB's reach, so this
    half is rows-only while ``audio_frame_features`` carries the oracled
    skeleton."""
    from open_finance_lakehouse_spark.functions import audio

    clips = clips_from_documents(spark, sf_dir)
    feats = clips.select("clip_id", "bytes", "sr_hz", "codec").mapInPandas(
        audio.frame_feature_batches, schema=audio.FEATURE_SCHEMA)
    return (
        feats.groupBy("codec", "sr_hz")
        .agg(
            F.round(F.avg("rms_mean"), 6).alias("avg_rms"),
            F.round(F.avg("zcr"), 6).alias("avg_zcr"),
        )
        .orderBy("codec", "sr_hz")
    )


@register("audio_maintenance_pipeline", None)
def audio_maintenance_pipeline(spark, sf_dir):
    """End-to-end maintenance over a real table of derived clips:
    small-files write → compact → Z-order → expire, then the full
    post-maintenance gate (row parity + SNR). Returns one summary row per
    stage with violation counts — all zeros on a correct engine."""
    import shutil

    workdir = os.path.join(tempfile.gettempdir(),
                           f"ofl_mm_{uuid.uuid4().hex[:8]}")
    try:
        t = LakeTable.create(
            spark, os.path.join(workdir, "clips"), "clips", CLIP_SCHEMA_DDL,
            partition_spec={"kind": "bucket", "column": "clip_id",
                            "num_buckets": 4},
        )
        clips = clips_from_documents(spark, sf_dir, limit=200)
        t.append(clips, max_records_per_file=10)
        n_before = t.scan().count()

        ledger = CheckpointLedger(os.path.join(workdir, "ledger"))
        # gates run INSIDE the pipeline: parity before expire (files of
        # both snapshots still on disk — never a cache-resurrected read of
        # deleted paths, r1 ADVICE), SNR overlapped with the rewrite
        metrics = run_maintenance(t, ledger, job_id="mm-pipe",
                                  target_bytes=4 * 1024 * 1024,
                                  with_audit=True,
                                  snr_gate="overlap", parity_gate=True)
        parity_bad = metrics["gates"]["parity_violations"]
        snr_bad = metrics["gates"].get("snr_violations", -1)
        # the violations column carries the metric's ACTUAL violation
        # count (0 for pure counters): a literal-0 column next to a
        # *_violations value row would read as "no violations" to any
        # consumer checking the column by name
        rows = [
            ("rows_before", int(n_before), 0),
            ("rows_after", int(metrics["table_audit"]["rows"]), 0),
            ("duplicate_keys",
             int(metrics["table_audit"]["duplicate_keys"]),
             int(metrics["table_audit"]["duplicate_keys"])),
            ("parity_violations", int(parity_bad), int(parity_bad)),
            ("snr_violations", int(snr_bad), max(0, int(snr_bad))),
            ("files_rewritten",
             int(metrics["stages"]["cluster"]["files_in"]), 0),
            ("snapshots_after_expire", len(t.snapshots()), 0),
        ]
        # the returned frame is LOCAL rows — safe to collect the scratch
        # table now; without this every invocation leaks a full clip
        # table of binary payloads under the system tempdir
        return spark.createDataFrame(
            rows, "metric string, value long, violations long")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
