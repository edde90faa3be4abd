"""Pure-Python scalar mirrors of the vectorized kernels.

Pattern from the reference: engine semantics mirrored JVM-free and
unit-tested without a session (/root/reference/ofl/streaming/windows.py:1-28,
exhaustively tested in tests/test_streaming_windows.py). Here the mirrored
semantics are bit-interleaving, Hilbert indexing, companding, and
bin-packing — each asserted equivalent to the numpy / planner code.
"""

from __future__ import annotations

import math

MU = 255.0
A_LAW_A = 87.6


def spread_bits_3(x: int) -> int:
    """Place bit i of the low 21 bits of x at position 3*i."""
    out = 0
    for i in range(21):
        out |= ((x >> i) & 1) << (3 * i)
    return out


def morton3(a: int, b: int, c: int) -> int:
    return (
        spread_bits_3(a & 0x1FFFFF)
        | (spread_bits_3(b & 0x1FFFFF) << 1)
        | (spread_bits_3(c & 0x1FFFFF) << 2)
    )


def hilbert_axes_to_key(coords: list[int], bits: int = 21) -> int:
    """Scalar Skilling transpose -> Hilbert index."""
    x = list(coords)
    ndim = len(x)
    m = 1 << (bits - 1)

    q = m
    while q > 1:
        p = q - 1
        for i in range(ndim):
            if x[i] & q:
                x[0] ^= p
            else:
                t = (x[0] ^ x[i]) & p
                x[0] ^= t
                x[i] ^= t
        q >>= 1

    for i in range(1, ndim):
        x[i] ^= x[i - 1]
    t = 0
    q = m
    while q > 1:
        if x[ndim - 1] & q:
            t ^= q - 1
        q >>= 1
    for i in range(ndim):
        x[i] ^= t

    h = 0
    for b in range(bits - 1, -1, -1):
        for i in range(ndim):
            h = (h << 1) | ((x[i] >> b) & 1)
    return h


def ulaw_encode_sample(x: float) -> int:
    x = max(-1.0, min(1.0, x))
    y = math.copysign(math.log1p(MU * abs(x)) / math.log1p(MU), x)
    return max(0, min(255, round((y + 1.0) * 127.5)))


def ulaw_decode_sample(q: int) -> float:
    y = q / 127.5 - 1.0
    return math.copysign(math.expm1(abs(y) * math.log1p(MU)) / MU, y)


def alaw_encode_sample(x: float) -> int:
    x = max(-1.0, min(1.0, x))
    ax = abs(x)
    denom = 1.0 + math.log(A_LAW_A)
    if ax < 1.0 / A_LAW_A:
        y = A_LAW_A * ax / denom
    else:
        y = (1.0 + math.log(A_LAW_A * ax)) / denom
    y = math.copysign(y, x)
    return max(0, min(255, round((y + 1.0) * 127.5)))


def alaw_decode_sample(q: int) -> float:
    y = q / 127.5 - 1.0
    ay = abs(y)
    denom = 1.0 + math.log(A_LAW_A)
    if ay < 1.0 / denom:
        x = ay * denom / A_LAW_A
    else:
        x = math.exp(ay * denom - 1.0) / A_LAW_A
    return math.copysign(x, y)


# ---------------------------------------------------------------------------
# XXH64 (seed 42) — scalar mirror of functions/xxh64.py's vectorized kernel
# ---------------------------------------------------------------------------

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _xrotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64_scalar(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 of a byte string (unsigned result), one byte at a
    time — the slow obviously-correct twin of the numpy lanes."""
    n = len(data)
    off = 0
    if n >= 32:
        v = [(seed + _XXP1 + _XXP2) & _M64, (seed + _XXP2) & _M64,
             seed & _M64, (seed - _XXP1) & _M64]
        while off + 32 <= n:
            for j in range(4):
                k = int.from_bytes(data[off:off + 8], "little")
                v[j] = (_xrotl((v[j] + k * _XXP2) & _M64, 31) * _XXP1) & _M64
                off += 8
        h = (_xrotl(v[0], 1) + _xrotl(v[1], 7)
             + _xrotl(v[2], 12) + _xrotl(v[3], 18)) & _M64
        for j in range(4):
            h ^= _xrotl((v[j] * _XXP2) & _M64, 31) * _XXP1 & _M64
            h = (h * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while off + 8 <= n:
        k = int.from_bytes(data[off:off + 8], "little")
        h ^= _xrotl((k * _XXP2) & _M64, 31) * _XXP1 & _M64
        h = (_xrotl(h, 27) * _XXP1 + _XXP4) & _M64
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(data[off:off + 4], "little") * _XXP1) & _M64
        h = (_xrotl(h, 23) * _XXP2 + _XXP3) & _M64
        off += 4
    while off < n:
        h ^= (data[off] * _XXP5) & _M64
        h = (_xrotl(h, 11) * _XXP1) & _M64
        off += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h
