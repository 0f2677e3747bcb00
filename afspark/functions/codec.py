"""Gorilla XOR float codec + delta-of-delta timestamp codec.

north_rule storage kernels (SURVEY.md §2.10; no reference analog — the
reference keeps raw Float64 arrays).  Implemented from the published
scheme in the Gorilla paper:

  T. Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
  Database", PVLDB 8(12), 2015.

Values: first float64 raw; then XOR with the previous value —
  '0'                      -> identical value
  '10' + meaningful bits   -> reuse previous leading/length window
  '11' + 5b lead + 6b (len-1) + meaningful bits

Timestamps (int64): first raw 64b; first delta zigzagged 32b; then
delta-of-delta buckets
  '0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+64b  (offset-encoded)

Both are lossless at the bit level (floats round-trip NaN payloads,
signed zeros, denormals), preserving the engine's bit-for-bit guarantee.
Encoding is numpy-vectorized for the analysis passes (XOR, leading /
trailing zeros, bucket choice); only the final bit-packing walks the
array, inside one pandas-UDF call per chunk.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining > 0:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            remaining -= take
            self.pos += take
        return out


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (0 -> 64)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    # log2 via float conversion is unsafe >2^53; do it in two 32-bit halves
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi_bits = np.zeros(x.shape, dtype=np.int64)
    lo_bits = np.zeros(x.shape, dtype=np.int64)
    m = hi != 0
    hi_bits[m] = np.floor(np.log2(hi[m].astype(np.float64))).astype(np.int64) + 1
    m2 = (~m) & (lo != 0)
    lo_bits[m2] = np.floor(np.log2(lo[m2].astype(np.float64))).astype(np.int64) + 1
    out[nz & m] = 64 - (32 + hi_bits[nz & m])
    out[nz & m2] = 64 - lo_bits[nz & m2]
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (0 -> 64)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    low = (x & (~x + np.uint64(1))).astype(np.uint64)  # isolate lowest set bit
    out[nz] = 64 - _clz64(low[nz]) - 1
    return out


def encode_values(vals: np.ndarray) -> bytes:
    """Gorilla-encode a float64 array; '' for empty input."""
    vals = np.asarray(vals, dtype=np.float64)
    n = len(vals)
    if n == 0:
        return b""
    bits = vals.view(np.uint64)
    xors = np.zeros(n, dtype=np.uint64)
    xors[1:] = bits[1:] ^ bits[:-1]
    lz = np.minimum(_clz64(xors), 31)
    tz = _ctz64(xors)
    w = _BitWriter()
    w.write(int(bits[0]), 64)
    prev_lz, prev_tz = -1, -1
    for i in range(1, n):
        x = int(xors[i])
        if x == 0:
            w.write(0, 1)
            continue
        cur_lz, cur_tz = int(lz[i]), int(tz[i])
        if prev_lz >= 0 and cur_lz >= prev_lz and cur_tz >= prev_tz:
            mlen = 64 - prev_lz - prev_tz
            w.write(0b10, 2)
            w.write(x >> prev_tz, mlen)
        else:
            mlen = 64 - cur_lz - cur_tz
            w.write(0b11, 2)
            w.write(cur_lz, 5)
            w.write(mlen - 1, 6)
            w.write(x >> cur_tz, mlen)
            prev_lz, prev_tz = cur_lz, cur_tz
    return w.getvalue()


def decode_values(data: bytes, n: int) -> np.ndarray:
    """Inverse of encode_values; needs the element count."""
    if n == 0:
        return np.empty(0, dtype=np.float64)
    r = _BitReader(data)
    out = np.empty(n, dtype=np.uint64)
    out[0] = r.read(64)
    prev_lz = prev_tz = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = out[i - 1]
            continue
        if r.read(1) == 0:  # '10': reuse window
            lz_, tz_ = prev_lz, prev_tz
        else:  # '11': new window
            lz_ = r.read(5)
            tz_ = 64 - lz_ - (r.read(6) + 1)
            prev_lz, prev_tz = lz_, tz_
        mlen = 64 - lz_ - tz_
        x = r.read(mlen) << tz_
        out[i] = out[i - 1] ^ np.uint64(x)
    return out.view(np.float64).copy()


_DOD_BUCKETS = [(7, 0b10, 2), (9, 0b110, 3), (12, 0b1110, 4)]

_U64 = (1 << 64) - 1


def _wrap_i64(x: int) -> int:
    """Two's-complement wrap of a Python int into signed 64-bit range."""
    x &= _U64
    return x - (1 << 64) if x >= 1 << 63 else x


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 array (epoch seconds/millis/us).

    Delta arithmetic is mod-2^64 (two's complement), so the codec
    round-trips the ENTIRE int64 range — deltas between extreme values
    wrap identically on encode and decode (hypothesis-tested).
    """
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    if n == 0:
        return b""
    w = _BitWriter()
    w.write(int(ts[0]) & _U64, 64)
    if n == 1:
        return w.getvalue()
    d0 = _wrap_i64(int(ts[1]) - int(ts[0]))
    w.write(d0 & _U64, 64)  # first delta (64b: micros deltas exceed 32b)
    with np.errstate(over="ignore"):
        deltas = np.diff(ts)  # int64 wraparound == mod-2^64
        dods = np.diff(deltas)
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
            continue
        for bits, marker, mbits in _DOD_BUCKETS:
            lo = -(1 << (bits - 1)) + 1
            hi = 1 << (bits - 1)
            if lo <= dod <= hi:
                w.write(marker, mbits)
                w.write(dod - lo, bits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
    return w.getvalue()


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    r = _BitReader(data)
    out = np.empty(n, dtype=np.int64)
    first = r.read(64)
    out[0] = np.uint64(first).astype(np.int64)
    if n == 1:
        return out
    d = r.read(64)
    if d >= 1 << 63:
        d -= 1 << 64
    out[1] = out[0] + d
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            for bits, _, mbits in _DOD_BUCKETS:
                if r.read(1) == 0:
                    lo = -(1 << (bits - 1)) + 1
                    dod = r.read(bits) + lo
                    break
            else:
                dod = r.read(64)
                if dod >= 1 << 63:
                    dod -= 1 << 64
        d = _wrap_i64(d + dod)
        out[i] = np.int64(_wrap_i64(int(out[i - 1]) + d))
    return out
