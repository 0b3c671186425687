"""Vectorized numpy re-implementation of Spark's ``xxhash64`` expression.

Spark evaluates ``xxhash64(c1, c2, ...)`` by folding the children through
``XxHash64Function`` with an accumulator that starts at the fixed seed 42:
``acc = hashLong(longChild, acc)`` / ``acc = hashInt(intChild, acc)`` (see
Spark's ``sql/catalyst`` ``XXH64.java`` — the xxHash64 one-shot long/int
kernels).  The two entry points here reproduce those kernels bit-exactly so
an Arrow-batch stage can re-mix millions of already-JVM-hashed shingle
hashes without a per-element interpreted lambda, while keeping signatures
(and every golden fixture derived from them) byte-identical to the pure
expression plan.

Parity is pinned by ``tests/test_dedup_textstats.py::test_xxhash64_parity``
against ``F.xxhash64`` itself.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def xxh64_long(vals: np.ndarray, seed) -> np.ndarray:
    """``XXH64.hashLong(v, seed)`` — vals uint64 array, seed scalar/array."""
    old = np.seterr(over="ignore")
    try:
        h = seed + _P5 + np.uint64(8)
        h = h ^ (_rotl(vals * _P2, 31) * _P1)
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)
    finally:
        np.seterr(**old)


def xxh64_int_const(const: int, seeds: np.ndarray) -> np.ndarray:
    """``XXH64.hashInt(const, seed)`` with a fixed 32-bit value over a seed
    vector — the shape Spark produces for ``xxhash64(longCol, lit(intC))``
    where the accumulated hash of ``longCol`` is the seed."""
    old = np.seterr(over="ignore")
    try:
        k = (np.uint64(np.int64(const).view(np.uint64)) & np.uint64(0xFFFFFFFF)) * _P1
        h = seeds + _P5 + np.uint64(4)
        h = _rotl(h ^ k, 23) * _P2 + _P3
        return _fmix(h)
    finally:
        np.seterr(**old)


def spark_xxhash64_long_int(vals: np.ndarray, const: int) -> np.ndarray:
    """Bit-exact ``F.xxhash64(longCol, F.lit(intConst))`` over an int64
    array: chain = hashInt(const, hashLong(v, 42))."""
    inner = xxh64_long(vals.view(np.uint64), _SPARK_SEED)
    return xxh64_int_const(const, inner).view(np.int64)
