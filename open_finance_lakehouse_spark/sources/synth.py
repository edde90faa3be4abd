"""Deterministic synthesis of the audio clip table (FIXTURES.md §1).

Every attribute is a pure function of ``clip_id`` (hash-of-key derivation),
so the table is reproducible at any scale and any parallelism — no
row-order- or RNG-order-dependence (the FIXTURES.md determinism rule; the
reference applies the same discipline by pinning schemas and rejecting
inference, /root/reference/ofl/streaming/schema.py:1-18).

The plan is pure DataFrame algebra for every scalar column; only waveform
synthesis + codec encode run in a vectorized ``mapInPandas`` kernel
(sanctioned escape #2, SURVEY.md §2.10). Skew: a configurable fraction of
rows shares a small set of hot ``clip_id`` prefixes, creating the hot key
ranges the salted MERGE and skew tests need.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.functions import audio

CLIP_SCHEMA_DDL = (
    "clip_id STRING, bytes BINARY, sr_hz INT, dur_ms INT, "
    "codec STRING, transcript STRING"
)

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu zero one two three four five six seven eight "
    "nine north south east west river mountain valley harbor meadow forest "
    "stone iron copper silver amber crimson azure violet ochre teal signal "
    "vector tensor matrix scalar kernel lattice cipher quorum ledger beacon"
).split()


def clip_attrs_df(
    spark: SparkSession,
    n_rows: int,
    dur_min_ms: int = 200,
    dur_max_ms: int = 15000,
    sample_rates: tuple[int, ...] = (8000, 16000, 22050, 44100),
    codecs: tuple[str, ...] = audio.CODECS,
    hot_fraction: float = 0.2,
    n_hot_prefixes: int = 4,
    id_offset: int = 0,
    words_per_second: float = 2.5,
) -> DataFrame:
    """All scalar columns of the clip table — pure DataFrame plan, no UDF."""
    base = spark.range(id_offset, id_offset + n_rows).withColumnRenamed("id", "i")
    h = F.xxhash64(F.col("i").cast("string"))
    hot_pct = int(round(hot_fraction * 100))
    if hot_fraction > 0 and hot_pct == 0:
        # whole-percent quantization (kept: changing the base would
        # silently regenerate every existing fixture) — a sub-percent
        # request would otherwise produce ZERO hot keys with no error,
        # quietly voiding any skew test configured with it
        raise ValueError(
            f"hot_fraction={hot_fraction} quantizes to zero hot keys "
            "(whole-percent resolution); use >= 0.01 or 0")
    is_hot = F.pmod(h, F.lit(100)) < F.lit(hot_pct)
    hot_idx = F.pmod(F.xxhash64(F.col("i").cast("string"), F.lit("hot")),
                     F.lit(n_hot_prefixes))
    clip_id = F.when(
        is_hot,
        F.format_string("clip-hot%02d-%012d", hot_idx, F.col("i")),
    ).otherwise(F.format_string("clip-%012d", F.col("i")))

    df = base.withColumn("clip_id", clip_id)
    hid = F.xxhash64("clip_id")
    sr = F.element_at(
        F.array(*[F.lit(s) for s in sample_rates]),
        (F.pmod(F.xxhash64("clip_id", F.lit("sr")), F.lit(len(sample_rates))) + 1
         ).cast("int"),
    )
    dur = (F.lit(dur_min_ms)
           + F.pmod(F.xxhash64("clip_id", F.lit("dur")),
                    F.lit(dur_max_ms - dur_min_ms + 1))).cast("int")
    codec = F.element_at(
        F.array(*[F.lit(c) for c in codecs]),
        (F.pmod(F.xxhash64("clip_id", F.lit("codec")), F.lit(len(codecs))) + 1
         ).cast("int"),
    )
    df = (
        df.withColumn("sr_hz", sr)
        .withColumn("dur_ms", dur)
        .withColumn("codec", codec)
        .withColumn("seed", hid)
    )
    # transcript: dur-proportional word count, vocabulary indexed by
    # xxhash64(clip_id, position) — all built-in higher-order functions
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    n_words = F.greatest(
        F.lit(1), F.ceil(F.col("dur_ms") / F.lit(1000.0 / words_per_second))
    ).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(F.col("clip_id"), j.cast("string")),
                    F.lit(len(_VOCAB))) + 1).cast("int"),
        ),
    )
    return df.withColumn("transcript", F.concat_ws(" ", words)).drop("i")


_PAYLOAD_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string"
)


def _payload_batches(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: synthesize + encode each clip's waveform."""
    for pdf in batch_iter:
        payloads = []
        for seed, sr, dur, codec in zip(
            pdf["seed"], pdf["sr_hz"], pdf["dur_ms"], pdf["codec"]
        ):
            n = int(int(dur) * int(sr) // 1000)
            wave = audio.synth_wave(int(seed), n, int(sr))
            payloads.append(audio.encode(wave, str(codec)))
        yield pd.DataFrame(
            {
                "clip_id": pdf["clip_id"],
                "bytes": payloads,
                "sr_hz": pdf["sr_hz"],
                "dur_ms": pdf["dur_ms"],
                "codec": pdf["codec"],
                "transcript": pdf["transcript"],
            }
        )


def synth_clips(spark: SparkSession, n_rows: int, **attr_kwargs) -> DataFrame:
    """The full clip table ``(clip_id, bytes, sr_hz, dur_ms, codec,
    transcript)`` — deterministic at any scale/parallelism."""
    attrs = clip_attrs_df(spark, n_rows, **attr_kwargs)
    return attrs.mapInPandas(_payload_batches, schema=_PAYLOAD_SCHEMA)


def verify_snr_df(clips: DataFrame) -> DataFrame:
    """Per-row SNR of stored payloads vs re-synthesized reference waveforms.

    Usable on any scan of the clip table (no generator state needed) because
    the reference waveform derives from xxhash64(clip_id) alone.
    """
    with_seed = clips.withColumn("seed", F.xxhash64("clip_id"))
    return with_seed.mapInPandas(audio.snr_batches, schema=audio.SNR_SCHEMA)
