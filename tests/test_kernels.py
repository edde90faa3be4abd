"""JVM-free kernel tests: codecs, SNR, Morton, Hilbert vs pure mirrors."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_finance_lakehouse_spark.functions import audio, curves
from tests import mirrors


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("codec", audio.CODECS)
@pytest.mark.parametrize("seed", [1, 0xDEADBEEF, 2**63 + 11])
def test_roundtrip_snr_over_30db(codec, seed):
    wave = audio.synth_wave(seed, n_samples=8000, sr_hz=16000)
    dec = audio.decode(audio.encode(wave, codec), codec)
    assert len(dec) == len(wave)
    assert audio.snr_db(wave, dec) >= 30.0


def test_pcm16_is_near_lossless():
    wave = audio.synth_wave(42, 4000, 8000)
    dec = audio.decode(audio.encode(wave, "pcm16"), "pcm16")
    assert audio.snr_db(wave, dec) >= 80.0


def test_synth_is_deterministic():
    a = audio.synth_wave(123, 1000, 8000)
    b = audio.synth_wave(123, 1000, 8000)
    assert np.array_equal(a, b)
    c = audio.synth_wave(124, 1000, 8000)
    assert not np.array_equal(a, c)


def test_snr_detects_corruption():
    """Negative test (reference layer-2 pattern): a corrupted payload must
    fail the 30 dB gate — the check can fail."""
    wave = audio.synth_wave(7, 4000, 8000)
    payload = bytearray(audio.encode(wave, "pcm16"))
    payload[: len(payload) // 2] = bytes(len(payload) // 2)  # zero half
    dec = audio.decode(bytes(payload), "pcm16")
    assert audio.snr_db(wave, dec) < 30.0


@given(st.lists(st.floats(-1.0, 1.0, allow_nan=False), min_size=1, max_size=64))
@settings(max_examples=50, deadline=None)
def test_ulaw_matches_scalar_mirror(samples):
    arr = np.array(samples, dtype=np.float32)
    enc = np.frombuffer(audio.encode_ulaw(arr), dtype=np.uint8)
    mirror = [mirrors.ulaw_encode_sample(float(x)) for x in arr]
    assert enc.tolist() == mirror
    dec = audio.decode_ulaw(enc.tobytes())
    mirror_dec = [mirrors.ulaw_decode_sample(q) for q in mirror]
    np.testing.assert_allclose(dec, mirror_dec, atol=1e-6)


@given(st.lists(st.floats(-1.0, 1.0, allow_nan=False), min_size=1, max_size=64))
@settings(max_examples=50, deadline=None)
def test_alaw_matches_scalar_mirror(samples):
    arr = np.array(samples, dtype=np.float32)
    enc = np.frombuffer(audio.encode_alaw(arr), dtype=np.uint8)
    mirror = [mirrors.alaw_encode_sample(float(x)) for x in arr]
    assert enc.tolist() == mirror


# ---------------------------------------------------------------------------
# Morton / Z-order
# ---------------------------------------------------------------------------

@given(
    st.integers(0, 2**21 - 1),
    st.integers(0, 2**21 - 1),
    st.integers(0, 2**21 - 1),
)
@settings(max_examples=200, deadline=None)
def test_morton_matches_mirror(a, b, c):
    vec = curves.morton3(
        np.array([a], dtype=np.uint64),
        np.array([b], dtype=np.uint64),
        np.array([c], dtype=np.uint64),
    )
    assert int(vec[0]) == mirrors.morton3(a, b, c)


def test_morton_known_values():
    # hand-checkable: (1,0,0)->1, (0,1,0)->2, (0,0,1)->4, (1,1,1)->7
    a = np.array([1, 0, 0, 1], dtype=np.uint64)
    b = np.array([0, 1, 0, 1], dtype=np.uint64)
    c = np.array([0, 0, 1, 1], dtype=np.uint64)
    assert curves.morton3(a, b, c).tolist() == [1, 2, 4, 7]


def test_morton_fits_signed_int64():
    top = np.array([2**21 - 1], dtype=np.uint64)
    z = curves.morton3(top, top, top)
    assert int(z[0]) == 2**63 - 1  # max 63-bit value, safe as signed long


def test_morton_preserves_locality_monotone_diagonal():
    # along the diagonal a=b=c=k the key is strictly increasing
    k = np.arange(0, 1000, dtype=np.uint64)
    z = curves.morton3(k, k, k)
    assert np.all(np.diff(z.astype(np.int64)) > 0)


# ---------------------------------------------------------------------------
# Hilbert
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(0, 2**21 - 1), min_size=3, max_size=3))
@settings(max_examples=200, deadline=None)
def test_hilbert_matches_mirror(coords):
    vec = curves.hilbert_axes_to_key(np.array([coords], dtype=np.uint64))
    assert int(vec[0]) == mirrors.hilbert_axes_to_key(coords)


def test_hilbert_is_a_bijection_on_small_grid():
    """Every cell of the 8x8x8 grid maps to a unique index in [0, 512)."""
    grid = np.array(
        [[i, j, k] for i in range(8) for j in range(8) for k in range(8)],
        dtype=np.uint64,
    )
    keys = curves.hilbert_axes_to_key(grid, bits=3)
    assert sorted(keys.tolist()) == list(range(512))


def test_hilbert_consecutive_cells_are_adjacent():
    """Defining property of the Hilbert curve: consecutive indices differ by
    exactly one unit step in exactly one axis."""
    grid = np.array(
        [[i, j, k] for i in range(8) for j in range(8) for k in range(8)],
        dtype=np.uint64,
    )
    keys = curves.hilbert_axes_to_key(grid, bits=3)
    order = np.argsort(keys)
    path = grid[order].astype(np.int64)
    steps = np.abs(np.diff(path, axis=0)).sum(axis=1)
    assert np.all(steps == 1)


def test_normalize_to_bits_monotone_and_clamped():
    x = np.array([-5.0, 0.0, 8192.0, 16384.0, 99999.0])
    codes = curves.normalize_to_bits(x, 0.0, 16384.0)
    assert codes[0] == 0 and codes[1] == 0
    assert codes[3] == 2**21 - 1 and codes[4] == 2**21 - 1
    assert np.all(np.diff(codes.astype(np.int64)) >= 0)


def test_native_zorder_matches_vectorized_udf(spark):
    """Two code paths for the same key: the pure-JVM column expression must
    equal the Arrow-vectorized numpy kernel row-for-row (which is itself
    asserted against the scalar mirror above)."""
    from pyspark.sql import functions as F

    from open_finance_lakehouse_spark.functions.curves import (
        make_curve_key_udf,
        zorder_key_native,
    )
    from open_finance_lakehouse_spark.sources.synth import clip_attrs_df

    bounds = {"dur_ms": (150.0, 9000.0), "sr_hz": (8000.0, 44100.0)}
    df = clip_attrs_df(spark, 500).select("clip_id", "dur_ms", "sr_hz")
    udf = make_curve_key_udf("zorder", bounds)
    both = df.select(
        zorder_key_native(bounds).alias("native"),
        udf(F.xxhash64("clip_id"), F.col("dur_ms"), F.col("sr_hz"))
        .alias("vectorized"),
    )
    assert both.filter(F.col("native") != F.col("vectorized")).count() == 0


@given(
    st.lists(st.tuples(st.integers(1, 400), st.integers(1, 1000)),
             min_size=0, max_size=80),
    st.integers(50, 500),
)
@settings(max_examples=200, deadline=None)
def test_binpack_invariants_hold_for_any_inventory(sizes, target):
    """Property test over the FFD bin planner: on any file inventory —
    (1) no file appears in two bins; (2) only small files (< threshold)
    are packed; (3) a bin never exceeds target unless it is a single
    file; (4) every bin meets the min-files floor; (5) planning is
    deterministic."""
    from open_finance_lakehouse_spark.operators import binpack

    files = [(f"f{i}", s, r) for i, (s, r) in enumerate(sizes)]
    bins = binpack.plan_bins(files, target_bytes=target,
                             small_file_ratio=0.75, min_files_per_bin=2)
    seen = [p for b in bins for p in b.paths]
    assert len(seen) == len(set(seen))
    threshold = target * 0.75
    by_path = dict((p, s) for p, s, _ in files)
    for b in bins:
        assert len(b.paths) >= 2
        assert all(by_path[p] < threshold for p in b.paths)
        assert b.total_bytes <= target or len(b.paths) == 1
        assert b.total_bytes == sum(by_path[p] for p in b.paths)
    again = binpack.plan_bins(files, target_bytes=target,
                              small_file_ratio=0.75, min_files_per_bin=2)
    assert [b.paths for b in again] == [b.paths for b in bins]


# ---------------------------------------------------------------------------
# XXH64 bucket router (frost writer's JVM-free routing)
# ---------------------------------------------------------------------------

@given(st.lists(st.binary(min_size=0, max_size=100), min_size=1, max_size=40))
@settings(max_examples=120, deadline=None)
def test_xxh64_vectorized_matches_scalar_mirror(blobs):
    from open_finance_lakehouse_spark.functions.xxh64 import _pack_bytes, xxh64

    data, lengths = _pack_bytes(blobs)
    got = xxh64(data, lengths)
    want = [mirrors.xxh64_scalar(b) for b in blobs]
    assert [int(h) for h in got] == want


def test_xxh64_matches_spark_all_bucket_types(spark):
    """Bit-exact parity with F.xxhash64 over every type the bucket router
    accepts — strings (incl. empty/unicode/length-boundary), int-family,
    bigint, boolean, NULLs — one batched collect per type (the reference's
    Python/SQL pair-equivalence discipline,
    /root/reference/ofl/streaming/schema.py:57-73)."""
    import random
    import string as _st

    from pyspark.sql import functions as F

    from open_finance_lakehouse_spark.functions.xxh64 import (
        bucket_of,
        xxh64_spark_column,
    )

    rng = random.Random(20260817)
    cases = {
        "string": (["", "a", "abcd", "abcdefgh", "x" * 31, "x" * 32,
                    "y" * 33, "z" * 200, "héllo ✓ 音声", None]
                   + ["".join(rng.choices(_st.printable, k=rng.randrange(120)))
                      for _ in range(200)]),
        "int": ([0, 1, -1, 2**31 - 1, -2**31, None]
                + [rng.randrange(-2**31, 2**31) for _ in range(200)]),
        "bigint": ([0, 1, -1, 2**63 - 1, -2**63, None]
                   + [rng.randrange(-2**63, 2**63) for _ in range(200)]),
        "smallint": [0, 1, -1, 32767, -32768, None],
        "boolean": [True, False, None],
    }
    for dtype, values in cases.items():
        df = spark.createDataFrame([(v,) for v in values], f"v {dtype}")
        want = [r[0] for r in df.select(F.xxhash64("v")).collect()]
        got = [int(h) for h in xxh64_spark_column(values, dtype)]
        assert got == want, dtype

    # and the full router expression: pmod(xxhash64(col), n) as string
    df = spark.createDataFrame([(v,) for v in cases["string"]], "v string")
    want = [r[0] for r in
            df.select(F.pmod(F.xxhash64("v"), F.lit(16)).cast("string"))
            .collect()]
    got = [str(int(b)) for b in bucket_of(cases["string"], "string", 16)]
    assert got == want
