"""Standalone XXH64 implementing the hash Spark's ``xxhash64`` expression
evaluates — derived from the public xxHash specification (Cyan4973/xxHash)
and Spark's documented chaining (fold the children through the one-shot
kernels with accumulator seed 42).  Deliberately engine-import-free: this
module is ORACLE code, re-derived from the spec so the dedup golden
fixtures are produced by an implementation independent of
``timeseriesvectordbpattermatcher_spark``.  Parity with ``F.xxhash64``
itself is pinned in tests/test_golden_oracle.py.
"""

from __future__ import annotations

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def hash_long(v: int, seed: int) -> int:
    """XXH64.hashLong — v, seed, result all as uint64."""
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def hash_int(v: int, seed: int) -> int:
    """XXH64.hashInt — v is the 32-bit value (any sign), seed uint64."""
    h = (seed + P5 + 4) & M64
    h ^= ((v & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def _round(acc: int, k: int) -> int:
    acc = (acc + k * P2) & M64
    return (_rotl(acc, 31) * P1) & M64


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 one-shot over a byte string (the kernel Spark applies to
    UTF8String children), little-endian word reads per the spec."""
    length = len(data)
    pos = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while pos + 32 <= length:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + length) & M64
    while pos + 8 <= length:
        h ^= _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M64
        pos += 8
    if pos + 4 <= length:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        pos += 4
    while pos < length:
        h ^= (data[pos] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        pos += 1
    return _fmix(h)


def to_i64(u: int) -> int:
    """uint64 -> the signed long Spark surfaces."""
    return u - (1 << 64) if u >= (1 << 63) else u


def to_u64(s: int) -> int:
    return s & M64


def spark_xxhash64_str_int(s: str, const: int) -> int:
    """``F.xxhash64(strCol, lit(intConst))``: chain = hashInt(const,
    hash_bytes(utf8(s), 42)); returns the signed long."""
    return to_i64(hash_int(const, hash_bytes(s.encode("utf-8"), SPARK_SEED)))


def spark_xxhash64_longs(vals: list[int]) -> int:
    """``F.xxhash64(l1, l2, ...)`` over signed longs: fold hashLong with
    accumulator starting at 42; returns the signed long."""
    acc = SPARK_SEED
    for v in vals:
        acc = hash_long(to_u64(v), acc)
    return to_i64(acc)


def spark_xxhash64_long_int(v: int, const: int) -> int:
    """``F.xxhash64(longCol, lit(intConst))`` for a signed long v."""
    return to_i64(hash_int(const, hash_long(to_u64(v), SPARK_SEED)))
