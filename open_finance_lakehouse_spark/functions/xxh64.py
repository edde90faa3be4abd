"""Vectorized XXH64 (seed 42) — bit-exact with Spark's ``F.xxhash64``.

Purpose: the ``format("frost")`` Python Data Source writers run on
executors with no JVM access, but a bucket-partitioned table routes rows
with ``pmod(xxhash64(col), num_buckets)`` (``LakeTable.partition_value_col``,
``format/table.py``).  This module reimplements the hash in numpy so the
Python write path lands rows in exactly the partitions the JVM path
would — property-tested for bit-equality against ``F.xxhash64`` over
randomized strings/ints/longs (the reference proves Python/SQL dedup-key
equivalence the same way: /root/reference/ofl/streaming/schema.py:57-73).

Spark's hash (catalyst XXH64) is standard XXH64 over the value's
little-endian encoding: 4 bytes for int-family (tinyint/smallint/int,
boolean as 0/1), 8 bytes for bigint, the raw UTF-8 bytes for strings.
NULL leaves the accumulator at the seed, so ``xxhash64(NULL) == seed``.

Everything below is numpy array algebra over uint64 lanes — one pass over
a zero-padded byte matrix, masks selecting the rows still inside each
length-dependent phase.  No per-row Python in the hot loop (the only
row loop is the memcpy that packs variable-length strings into the
matrix).
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

DEFAULT_SEED = 42  # Spark's XxHash64 default


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = np.uint64(r)
    return (x << rr) | (x >> (np.uint64(64) - rr))


def xxh64(data: np.ndarray, lengths: np.ndarray,
          seed: int = DEFAULT_SEED) -> np.ndarray:
    """XXH64 of ``n`` byte strings packed row-major.

    ``data``: ``(n, W)`` uint8, row ``i``'s bytes in ``data[i, :lengths[i]]``,
    zero-padded, ``W`` a multiple of 8 and ``>= max(lengths)``.
    Returns ``(n,)`` uint64.
    """
    n, w = data.shape
    if w % 8:
        raise ValueError("row width must be a multiple of 8")
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    out = np.empty(n, dtype=np.uint64)
    if not n:
        return out
    data = np.ascontiguousarray(data)
    words8 = data.view("<u8").reshape(n, w // 8)
    words4 = data.view("<u4").reshape(n, w // 4)
    seed_u = np.uint64(np.int64(seed))

    with np.errstate(over="ignore"):
        acc = np.full(n, seed_u + _P5, dtype=np.uint64)

        # --- 32-byte stripe phase (rows with length >= 32) ---------------
        nstripes = lengths // 32
        max_stripes = int(nstripes.max())
        if max_stripes:
            v = [
                np.full(n, seed_u + _P1 + _P2, dtype=np.uint64),
                np.full(n, seed_u + _P2, dtype=np.uint64),
                np.full(n, seed_u, dtype=np.uint64),
                np.full(n, seed_u - _P1, dtype=np.uint64),
            ]
            for s in range(max_stripes):
                rows = np.flatnonzero(nstripes > s)
                base = s * 4  # word index of the stripe's first lane
                for j in range(4):
                    k = words8[rows, base + j]
                    v[j][rows] = _rotl(v[j][rows] + k * _P2, 31) * _P1
            h = (_rotl(v[0], 1) + _rotl(v[1], 7)
                 + _rotl(v[2], 12) + _rotl(v[3], 18))
            for j in range(4):  # mergeRound
                h ^= _rotl(v[j] * _P2, 31) * _P1
                h = h * _P1 + _P4
            long_rows = nstripes > 0
            acc[long_rows] = h[long_rows]

        acc += lengths.astype(np.uint64)

        # --- 8-byte chunk phase ------------------------------------------
        base = nstripes * 32
        n8 = (lengths - base) // 8  # 0..3 chunks per row
        for k in range(int(n8.max()) if n else 0):
            rows = np.flatnonzero(n8 > k)
            k1 = words8[rows, base[rows] // 8 + k]
            a = acc[rows]
            a ^= _rotl(k1 * _P2, 31) * _P1
            acc[rows] = _rotl(a, 27) * _P1 + _P4

        # --- 4-byte chunk ------------------------------------------------
        off = base + 8 * n8
        has4 = (lengths - off) >= 4
        rows = np.flatnonzero(has4)
        if rows.size:
            u32 = words4[rows, off[rows] // 4].astype(np.uint64)
            a = acc[rows]
            a ^= u32 * _P1
            acc[rows] = _rotl(a, 23) * _P2 + _P3
        off = off + np.where(has4, 4, 0)

        # --- tail bytes --------------------------------------------------
        rem = lengths - off  # 0..3
        for k in range(int(rem.max()) if n else 0):
            rows = np.flatnonzero(rem > k)
            b = data[rows, off[rows] + k].astype(np.uint64)
            a = acc[rows]
            a ^= b * _P5
            acc[rows] = _rotl(a, 11) * _P1

        # --- avalanche ---------------------------------------------------
        acc ^= acc >> np.uint64(33)
        acc *= _P2
        acc ^= acc >> np.uint64(29)
        acc *= _P3
        acc ^= acc >> np.uint64(32)
    out[:] = acc
    return out


def _pack_bytes(items: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    lengths = np.fromiter((len(b) for b in items), dtype=np.int64,
                          count=len(items))
    w = max(8, (int(lengths.max(initial=0)) + 7) // 8 * 8)
    data = np.zeros((len(items), w), dtype=np.uint8)
    for i, b in enumerate(items):
        if b:
            data[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return data, lengths


def _fixed_width(values: np.ndarray, nbytes: int,
                 seed: int = DEFAULT_SEED) -> np.ndarray:
    """Hash fixed-width little-endian encodings (int=4, bigint=8)."""
    n = len(values)
    w = max(8, (nbytes + 7) // 8 * 8)
    data = np.zeros((n, w), dtype=np.uint8)
    data[:, :nbytes] = np.ascontiguousarray(values).view(np.uint8).reshape(
        n, nbytes)
    return xxh64(data, np.full(n, nbytes, dtype=np.int64), seed)


def xxh64_spark_column(values, dtype: str,
                       seed: int = DEFAULT_SEED) -> np.ndarray:
    """Spark-typed hash: ``values`` is a sequence (None = SQL NULL),
    ``dtype`` a Spark simple type name.  Returns signed int64 — exactly
    ``F.xxhash64(col)``.  NULL rows hash to the seed (Spark leaves the
    accumulator untouched for null children)."""
    mask = np.fromiter((v is None for v in values), dtype=bool,
                       count=len(values))
    n = len(values)
    out = np.full(n, np.int64(seed), dtype=np.int64)
    live = np.flatnonzero(~mask)
    if not live.size:
        return out
    lv = [values[i] for i in live]
    if dtype in ("string", "varchar", "char"):
        data, lengths = _pack_bytes(
            [v.encode("utf-8") if isinstance(v, str) else bytes(v)
             for v in lv])
        h = xxh64(data, lengths, seed)
    elif dtype in ("int", "integer", "smallint", "tinyint", "short", "byte"):
        h = _fixed_width(np.array(lv, dtype="<i4"), 4, seed)
    elif dtype == "boolean":
        h = _fixed_width(np.array(lv, dtype="<i4"), 4, seed)
    elif dtype in ("bigint", "long"):
        h = _fixed_width(np.array(lv, dtype="<i8"), 8, seed)
    else:
        raise TypeError(
            f"xxh64 bucket routing not implemented for type {dtype!r}")
    out[live] = h.view(np.int64)
    return out


def bucket_of(values, dtype: str, num_buckets: int) -> np.ndarray:
    """``pmod(xxhash64(col), num_buckets)`` — the table's bucket router
    (``LakeTable.partition_value_col``), JVM-free.  numpy's ``%`` is
    floored like Spark's ``pmod``, so one op suffices."""
    return xxh64_spark_column(values, dtype) % np.int64(num_buckets)


_INT32_TYPES = ("int", "integer", "smallint", "tinyint", "short", "byte")


def buckets_for(values, dtype: str, num_buckets: int) -> set[str] | None:
    """Partition values (stringified bucket ids, as manifests store them)
    hit by an equality/IN predicate value set — the point-lookup pruning
    primitive: hash each literal with the table's own router and keep only
    those buckets' files (min/max stats CANNOT do this — the hash scatters
    the keyspace, so within any one bucket the column's min/max spans
    nearly everything).

    Returns ``None`` when a value's Python type doesn't match the column
    dtype (hashing a mis-typed literal would prune the WRONG files — the
    caller must skip pruning, never guess).  Literals outside the dtype's
    domain match no row, so they contribute no buckets; an empty return
    set legitimately prunes every file."""
    vals = list(values)
    for v in vals:
        if dtype in ("string", "varchar", "char"):
            ok = isinstance(v, str)
        elif dtype == "boolean":
            ok = isinstance(v, bool)
        elif dtype in _INT32_TYPES or dtype in ("bigint", "long"):
            ok = isinstance(v, int) and not isinstance(v, bool)
        else:
            return None  # un-routable dtype: no bucket pruning
        if not ok:
            return None
    if dtype in _INT32_TYPES:
        vals = [v for v in vals if -(2 ** 31) <= v < 2 ** 31]
    elif dtype in ("bigint", "long"):
        vals = [v for v in vals if -(2 ** 63) <= v < 2 ** 63]
    if not vals:
        return set()
    return {str(int(b)) for b in bucket_of(vals, dtype, num_buckets)}
