"""Space-filling-curve key kernels: Morton (Z-order) and Hilbert.

The reference gets clustering for free from Delta's proprietary
``OPTIMIZE ... ZORDER BY`` (/root/reference/ofl/transform/spark/silver.py:368-371);
OSS Spark has no equivalent, so these kernels are the engine's replacement:
compute a curve key per row with a vectorized Arrow/pandas UDF, then
``repartitionByRange(zval).sortWithinPartitions(zval)`` so rewritten files
carry tight per-file min/max stats on the clustered dimensions.

Both kernels are pure-numpy bit arithmetic over uint64 arrays — no per-row
Python (north_rule). Pure-Python scalar mirrors live in ``tests/mirrors.py``
and are asserted equivalent (the reference's two-code-path pattern,
/root/reference/ofl/streaming/windows.py:47-153).

Hilbert uses Skilling's public-domain transpose algorithm
("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

BITS_3D = 21  # 3 dims x 21 bits = 63 bits, fits signed int64

_U64 = np.uint64

# masks for spreading 21 bits so each lands at every 3rd position
_SPREAD_MASKS = [
    (_U64(32), _U64(0x1F00000000FFFF)),
    (_U64(16), _U64(0x1F0000FF0000FF)),
    (_U64(8), _U64(0x100F00F00F00F00F)),
    (_U64(4), _U64(0x10C30C30C30C30C3)),
    (_U64(2), _U64(0x1249249249249249)),
]


def _spread_bits_3(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of each uint64 to every 3rd bit position."""
    x = x.astype(_U64) & _U64(0x1FFFFF)
    for shift, mask in _SPREAD_MASKS:
        x = (x | (x << shift)) & mask
    return x


def morton3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Interleave three 21-bit coordinate arrays into a 63-bit Morton key.

    Bit layout (LSB first): a0 b0 c0 a1 b1 c1 ...
    """
    return _spread_bits_3(a) | (_spread_bits_3(b) << _U64(1)) | (
        _spread_bits_3(c) << _U64(2)
    )


def normalize_to_bits(
    x: np.ndarray, lo: float, hi: float, bits: int = BITS_3D
) -> np.ndarray:
    """Linear map of values in [lo, hi] onto unsigned ``bits``-bit ints.

    Out-of-range values clamp; the map is monotone so range predicates on the
    source column translate to range predicates on the curve coordinate.
    """
    span = max(hi - lo, 1e-300)
    max_code = (1 << bits) - 1
    f = (np.asarray(x, dtype=np.float64) - lo) / span
    return np.clip(np.floor(f * max_code), 0, max_code).astype(_U64)


def hilbert_axes_to_key(coords: np.ndarray, bits: int = BITS_3D) -> np.ndarray:
    """Hilbert curve index for an (n, ndim) array of unsigned coordinates.

    Skilling transpose algorithm, vectorized: O(bits * ndim) numpy ops per
    batch, no Python per-row work.
    """
    x = coords.astype(_U64).copy()
    n, ndim = x.shape
    m = _U64(1) << _U64(bits - 1)

    # inverse undo of excess work
    q = m
    while q > _U64(1):
        p = q - _U64(1)
        for i in range(ndim):
            hit = (x[:, i] & q) != 0
            # invert low bits of axis 0 where bit set
            x[hit, 0] ^= p
            # exchange low bits of axis i and axis 0 where bit clear
            miss = ~hit
            t = (x[miss, 0] ^ x[miss, i]) & p
            x[miss, 0] ^= t
            x[miss, i] ^= t
        q >>= _U64(1)

    # Gray encode
    for i in range(1, ndim):
        x[:, i] ^= x[:, i - 1]
    t = np.zeros(n, dtype=_U64)
    q = m
    while q > _U64(1):
        hit = (x[:, ndim - 1] & q) != 0
        t[hit] ^= q - _U64(1)
        q >>= _U64(1)
    for i in range(ndim):
        x[:, i] ^= t

    # interleave transpose bits, axis 0 most significant
    h = np.zeros(n, dtype=_U64)
    for b in range(bits - 1, -1, -1):
        for i in range(ndim):
            h = (h << _U64(1)) | ((x[:, i] >> _U64(b)) & _U64(1))
    return h


# ---------------------------------------------------------------------------
# Spark columns
# ---------------------------------------------------------------------------

# Fallback bounds for normalizing the clip table's clustering dimensions
# (the deterministic generator's value domains, FIXTURES.md §1). The planner
# passes *observed* bounds from the current snapshot's manifest stats instead
# — normalizing against the data's real range is what gives each dimension
# full bit-resolution in the interleave (a dimension occupying 5% of a fixed
# range has constant high bits and contributes nothing to the sort order).
CLIP_DIM_BOUNDS = {
    "dur_ms": (0.0, 16384.0),
    "sr_hz": (0.0, 49152.0),
}


def _make_coords(bounds: dict[str, tuple[float, float]]):
    lo_d, hi_d = bounds["dur_ms"]
    lo_s, hi_s = bounds["sr_hz"]

    def clip_coords(pdf_hash: pd.Series, pdf_dur: pd.Series, pdf_sr: pd.Series):
        # xxhash64 is already uniform; take its top 21 bits as the first axis
        a = (pdf_hash.to_numpy().astype(np.int64).astype(_U64)
             ) >> _U64(64 - BITS_3D)
        b = normalize_to_bits(pdf_dur.to_numpy(), lo_d, hi_d)
        c = normalize_to_bits(pdf_sr.to_numpy(), lo_s, hi_s)
        return a, b, c

    return clip_coords


def make_curve_key_udf(curve: str, bounds: dict[str, tuple[float, float]]):
    """Vectorized pandas UDF computing the curve key with the given
    normalization bounds (planner-supplied, from manifest min/max stats)."""
    coords_fn = _make_coords(bounds)

    if curve == "zorder":

        @F.pandas_udf(LongType())
        def key_udf(h: pd.Series, dur_ms: pd.Series, sr_hz: pd.Series
                    ) -> pd.Series:
            a, b, c = coords_fn(h, dur_ms, sr_hz)
            return pd.Series(morton3(a, b, c).astype(np.int64))

    elif curve == "hilbert":

        @F.pandas_udf(LongType())
        def key_udf(h: pd.Series, dur_ms: pd.Series, sr_hz: pd.Series
                    ) -> pd.Series:
            a, b, c = coords_fn(h, dur_ms, sr_hz)
            coords = np.stack([a, b, c], axis=1)
            return pd.Series(hilbert_axes_to_key(coords).astype(np.int64))

    else:
        raise ValueError(f"unknown curve {curve!r}")
    return key_udf


# module-level UDFs with the generator's fallback bounds (test surface)
zorder_key_udf = make_curve_key_udf("zorder", CLIP_DIM_BOUNDS)
hilbert_key_udf = make_curve_key_udf("hilbert", CLIP_DIM_BOUNDS)


# ---------------------------------------------------------------------------
# pure-JVM Morton key (no Python worker in the plan)
# ---------------------------------------------------------------------------


def _spread_bits_3_col(col):
    """Column-expression version of ``_spread_bits_3``: 5 shift-or-mask
    steps, all JVM bitwise ops inside whole-stage codegen."""
    x = col.bitwiseAND(F.lit(0x1FFFFF))
    for shift, mask in _SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, int(shift)))).bitwiseAND(
            F.lit(int(mask)))
    return x


def _normalize_col(col, lo: float, hi: float, bits: int = BITS_3D):
    """JVM mirror of ``normalize_to_bits`` (same clamp/floor math)."""
    span = max(hi - lo, 1e-300)
    max_code = (1 << bits) - 1
    f = (col.cast("double") - F.lit(float(lo))) / F.lit(span)
    return F.least(
        F.greatest(F.floor(f * max_code), F.lit(0)), F.lit(max_code)
    ).cast("long")


def zorder_key_native(bounds: dict[str, tuple[float, float]] | None = None):
    """Morton key as a PURE column expression — bitwise interleave entirely
    inside whole-stage codegen, no Arrow transfer, no Python worker. This is
    the hot-path clustering key: with N concurrent partition rewrites the
    Python-UDF variant serializes on worker spawn-per-stage, while this
    expression scales with cores. Equivalence with the vectorized numpy
    kernel (and the scalar mirror) is asserted in tests."""
    b = bounds or CLIP_DIM_BOUNDS
    lo_d, hi_d = b["dur_ms"]
    lo_s, hi_s = b["sr_hz"]
    a = F.shiftrightunsigned(F.xxhash64(F.col("clip_id")), 64 - BITS_3D)
    dd = _normalize_col(F.col("dur_ms"), lo_d, hi_d)
    ss = _normalize_col(F.col("sr_hz"), lo_s, hi_s)
    return (
        _spread_bits_3_col(a)
        .bitwiseOR(F.shiftleft(_spread_bits_3_col(dd), 1))
        .bitwiseOR(F.shiftleft(_spread_bits_3_col(ss), 2))
    )


def curve_key_col(curve: str = "zorder",
                  bounds: dict[str, tuple[float, float]] | None = None):
    """Column expression producing the clustering key for the clip table.

    Z-order uses the native JVM expression; Hilbert (a bit-serial state
    machine, not expressible as closed-form column algebra) stays on the
    Arrow-vectorized pandas UDF."""
    if curve == "zorder":
        return zorder_key_native(bounds)
    udf = make_curve_key_udf(curve, bounds or CLIP_DIM_BOUNDS)
    return udf(F.xxhash64(F.col("clip_id")), F.col("dur_ms"), F.col("sr_hz"))
