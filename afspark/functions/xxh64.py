"""Vectorized numpy twin of Spark's ``xxhash64`` expression (XXH64).

Bit-exact re-implementation of the xxHash64 variant Spark evaluates in
``org.apache.spark.sql.catalyst.expressions.XxHash64`` (seed 42, column
values folded left-to-right with the running hash as the next seed;
LongType through ``hashLong``, IntegerType through ``hashInt``,
UTF8String through the byte-buffer path).  Equality with the Spark
expression is asserted in tests for every entry point — these kernels
exist so Arrow-batched operators can compute *identical* hashes to the
Catalyst plan without a JVM round-trip per row (the minhash signature
kernel replaces a 64-aggregate shuffle with one vectorized pass).

xxHash64 is a public-domain algorithm (Yann Collet); the constants and
step structure below follow the published specification, restricted to
inputs shorter than 32 bytes (no striped accumulator phase), which is
all the shingle kernels need.
"""

from __future__ import annotations

import numpy as np

SPARK_SEED = np.uint64(42)

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_longs(vals: np.ndarray, seed=SPARK_SEED) -> np.ndarray:
    """XXH64.hashLong over an int64/uint64 vector (scalar or vector seed).

    Twin of ``xxhash64(col_long)`` (seed 42) and of the running-hash fold
    for a LongType child.  Returns int64 (Spark's result type).
    """
    with np.errstate(over="ignore"):
        v = vals.astype(np.uint64, copy=False)
        h = np.uint64(0) + np.asarray(seed, dtype=np.uint64) + _P5 + np.uint64(8)
        k1 = _rotl(v * _P2, 31) * _P1
        h = _rotl(h ^ k1, 27) * _P1 + _P4
        return _fmix(h).astype(np.int64)


def xxh64_int(val: int, seeds: np.ndarray) -> np.ndarray:
    """XXH64.hashInt of one 32-bit literal against a vector of seeds.

    Twin of folding an IntegerType literal child (e.g. the minhash lane
    index in ``xxhash64(sh, lit(i))``) into per-row running hashes.
    """
    with np.errstate(over="ignore"):
        s = seeds.astype(np.uint64, copy=False)
        h = s + _P5 + np.uint64(4)
        h = h ^ (np.uint64(val & 0xFFFFFFFF) * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h).astype(np.int64)


def sliding_words(buf: np.ndarray, width: int) -> np.ndarray:
    """Little-endian ``width``-byte words at EVERY byte offset of ``buf``.

    Returns uint64 vector of length ``len(buf) - width + 1`` (width 1-8).
    """
    n = len(buf) - width + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    w = buf[:n].astype(np.uint64)
    for b in range(1, width):
        w |= buf[b : b + n].astype(np.uint64) << np.uint64(8 * b)
    return w


def xxh64_ascii_sliding(buf: np.ndarray, k: int, seed=SPARK_SEED) -> np.ndarray:
    """XXH64 of every sliding ``k``-byte window of a uint8 buffer.

    Twin of ``xxhash64(substring(text, i, k))`` for ASCII text (char ==
    byte), evaluated at every 1-based position i in one vectorized pass.
    Supports k < 32 (the shingle regime; larger k would need the striped
    accumulator phase).  Returns int64 vector of len(buf) - k + 1 hashes.
    """
    if not 1 <= k < 32:
        raise ValueError("xxh64_ascii_sliding supports 1 <= k < 32")
    n = len(buf) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        h = np.full(n, np.uint64(0) + np.uint64(seed) + _P5 + np.uint64(k))
        pos = 0
        if k >= 8:
            w8 = sliding_words(buf, 8)
            while pos + 8 <= k:
                w = w8[pos : pos + n]
                h = _rotl(h ^ (_rotl(w * _P2, 31) * _P1), 27) * _P1 + _P4
                pos += 8
        if pos + 4 <= k:
            w4 = sliding_words(buf[pos:], 4)[:n]
            h = _rotl(h ^ (w4 * _P1), 23) * _P2 + _P3
            pos += 4
        while pos < k:
            w1 = buf[pos : pos + n].astype(np.uint64)
            h = _rotl(h ^ (w1 * _P5), 11) * _P1
            pos += 1
        return _fmix(h).astype(np.int64)


def xxh64_buf(b: bytes, seed=SPARK_SEED) -> int:
    """Scalar XXH64 of one byte string (any length) — the non-ASCII
    fallback twin of ``xxhash64(string)``; exact for any UTF-8 payload,
    including the striped accumulator phase for >= 32 bytes."""
    n = len(b)
    with np.errstate(over="ignore"):
        seed = np.uint64(seed)
        i = 0
        if n >= 32:
            v1 = seed + _P1 + _P2
            v2 = seed + _P2
            v3 = seed + np.uint64(0)
            v4 = seed - _P1
            while i + 32 <= n:
                ws = [
                    np.uint64(int.from_bytes(b[i + 8 * j : i + 8 * j + 8], "little"))
                    for j in range(4)
                ]
                v1 = _rotl(v1 + ws[0] * _P2, 31) * _P1
                v2 = _rotl(v2 + ws[1] * _P2, 31) * _P1
                v3 = _rotl(v3 + ws[2] * _P2, 31) * _P1
                v4 = _rotl(v4 + ws[3] * _P2, 31) * _P1
                i += 32
            h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
            for v in (v1, v2, v3, v4):
                h = (h ^ (_rotl(v * _P2, 31) * _P1)) * _P1 + _P4
            h = h + np.uint64(n)
        else:
            h = seed + _P5 + np.uint64(n)
        while i + 8 <= n:
            w = np.uint64(int.from_bytes(b[i : i + 8], "little"))
            h = _rotl(h ^ (_rotl(w * _P2, 31) * _P1), 27) * _P1 + _P4
            i += 8
        if i + 4 <= n:
            w = np.uint64(int.from_bytes(b[i : i + 4], "little"))
            h = _rotl(h ^ (w * _P1), 23) * _P2 + _P3
            i += 4
        while i < n:
            h = _rotl(h ^ (np.uint64(b[i]) * _P5), 11) * _P1
            i += 1
        return int(_fmix(h).astype(np.int64))
