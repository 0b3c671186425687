"""Pure-python/numpy oracle for the MinHash-LSH dedup and SimHash pair
operators — re-derived from the documented algorithms (MinHash banding per
Broder '97 / MMDS ch.3; SimHash per Charikar '02) on top of the standalone
XXH64 in ``xxh64_pure.py``.  NO engine imports: these functions produce the
golden fixtures the engine must then hash-match at the driver gate, so a
bug in the engine cannot ratify itself into the fixture.

Semantics intentionally mirrored from the contract (not from engine code):

- tokenization: lowercase, collapse ``[^a-z0-9]+`` to single spaces, trim,
  split; docs with < n words have no shingles and drop out of minhash.
- shingle hash: ``xxhash64(gram, lit(seed))`` Spark chaining.
- permutation p: ``xxhash64(h, lit(seed + p))`` chaining; signature entry =
  signed-long min over the doc's shingle hashes.
- bands: ``xxhash64(sig[b*r] ... sig[b*r + r-1])`` multi-long chaining;
  candidates collide on (band, band_hash); verified by estimated jaccard
  (= fraction of equal signature positions) >= threshold.
- dedup survivor: min doc_id of each connected component (union-find over
  the verified pairs); docs with no edges survive.
- simhash: per word-hash bit, sign of the +/-1 vote sum; pairs = popcount
  of the XOR <= max_hamming (banding is pigeonhole-complete for
  bands > max_hamming, so the exact set IS the operator's output).
"""

from __future__ import annotations

import re

import numpy as np

from .xxh64_pure import (
    SPARK_SEED,
    hash_bytes,
    hash_int,
    hash_long,
    spark_xxhash64_longs,
    to_i64,
    to_u64,
)

_NONWORD = re.compile(r"[^a-z0-9]+")


def words(text: str | None) -> list[str]:
    if text is None:
        return []
    cleaned = _NONWORD.sub(" ", text.lower()).strip()
    return cleaned.split(" ") if cleaned else []


def ngrams(ws: list[str], n: int = 3) -> list[str]:
    if len(ws) < n:
        return []
    seen, out = set(), []
    for i in range(len(ws) - n + 1):
        g = " ".join(ws[i : i + n])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def minhash_signature(text: str | None, num_perm: int = 32, n: int = 3,
                      seed: int = 7) -> list[int] | None:
    """Signed-long signature, or None when the doc has no shingles."""
    grams = ngrams(words(text), n)
    if not grams:
        return None
    hs = np.array(
        [hash_int(seed, hash_bytes(g.encode("utf-8"), SPARK_SEED)) for g in grams],
        dtype=np.uint64,
    )
    inner = _vec_hash_long(hs, np.uint64(SPARK_SEED))
    sig = []
    for p in range(num_perm):
        mixed = _vec_hash_int_const(seed + p, inner).view(np.int64)
        sig.append(int(mixed.min()))
    return sig


# vectorized mirrors of xxh64_pure.hash_long / hash_int (same spec, numpy)
_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _vrotl(x, r):
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _vfmix(h):
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def _vec_hash_long(vals, seed):
    old = np.seterr(over="ignore")
    try:
        h = seed + _P5 + np.uint64(8)
        h = h ^ (_vrotl(vals * _P2, 31) * _P1)
        h = _vrotl(h, 27) * _P1 + _P4
        return _vfmix(h)
    finally:
        np.seterr(**old)


def _vec_hash_int_const(const, seeds):
    old = np.seterr(over="ignore")
    try:
        k = (np.uint64(np.int64(const).view(np.uint64)) & np.uint64(0xFFFFFFFF)) * _P1
        h = seeds + _P5 + np.uint64(4)
        h = _vrotl(h ^ k, 23) * _P2 + _P3
        return _vfmix(h)
    finally:
        np.seterr(**old)


def minhash_pairs(docs: list[tuple[str, str | None]], threshold: float = 0.5,
                  num_perm: int = 32, bands: int = 8, n: int = 3,
                  seed: int = 7) -> list[tuple[str, str, float]]:
    """(doc_a, doc_b, jaccard_est) with doc_a < doc_b — banded candidates,
    signature-estimate verified. ``docs`` = [(doc_id, text), ...]."""
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs = {}
    for doc_id, text in docs:
        s = minhash_signature(text, num_perm=num_perm, n=n, seed=seed)
        if s is not None:
            sigs[doc_id] = s
    buckets: dict[tuple[int, int], list[str]] = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            bh = spark_xxhash64_longs(sig[b * r : (b + 1) * r])
            buckets.setdefault((b, bh), []).append(doc_id)
    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(cands):
        sa, sb = sigs[a], sigs[b]
        est = sum(1 for x, y in zip(sa, sb) if x == y) / float(num_perm)
        if est >= threshold:
            out.append((a, b, est))
    return out


def minhash_dedup_survivors(docs: list[tuple[str, str | None]],
                            threshold: float = 0.5, **kw) -> list[str]:
    """Survivor doc_ids: min id per connected component of the pair graph;
    unpaired docs survive."""
    pairs = minhash_pairs(docs, threshold=threshold, **kw)
    parent: dict[str, str] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b, _ in pairs:
        union(a, b)
    losers = {x for x in parent if find(x) != x}
    return [doc_id for doc_id, _ in docs if doc_id not in losers]


def simhash(text: str | None, seed: int = 11) -> int | None:
    """Signed 64-bit simhash; None for null text (excluded from pairing),
    0 for empty-word docs (the vote sum over an empty set is 0 -> all bits
    0, matching aggregate()'s initial value semantics)."""
    if text is None:
        return None
    ws = words(text)
    hs = np.array(
        [to_u64(hash_int(seed, hash_bytes(w.encode("utf-8"), SPARK_SEED))) for w in ws],
        dtype=np.uint64,
    )
    out = 0
    for i in range(64):
        if len(hs):
            votes = int((2 * ((hs >> np.uint64(i)) & np.uint64(1)).astype(np.int64) - 1).sum())
        else:
            votes = 0
        if votes > 0:
            out |= 1 << i
    return to_i64(out)


def simhash_pairs(docs: list[tuple[str, str | None]], max_hamming: int = 3,
                  bands: int = 4, seed: int = 11) -> list[tuple[str, str, int]]:
    """All (doc_a < doc_b, hamming) with hamming <= max_hamming. Pigeonhole
    banding (bands > max_hamming) makes the operator's banded candidate set
    complete, so the exact set is the answer."""
    assert bands > max_hamming
    shs = [(doc_id, simhash(text, seed=seed)) for doc_id, text in docs]
    shs = [(d, s) for d, s in shs if s is not None]
    out = []
    for i in range(len(shs)):
        for j in range(len(shs)):
            a, sa = shs[i]
            b, sb = shs[j]
            if a < b:
                h = bin(to_u64(sa) ^ to_u64(sb)).count("1")
                if h <= max_hamming:
                    out.append((a, b, h))
    return sorted(out)


def bloom_words_oracle(digests, m_bits: int, k: int) -> list[int]:
    """Engine-free replay of curation.digest_bloom_words: Kirsch-
    Mitzenmacher double hashing on the standalone XXH64, mod-before-
    combine, bits packed into signed int64 words."""
    from .xxh64_pure import spark_xxhash64_str_int

    words = [0] * (m_bits // 64)
    for d in digests:
        a = spark_xxhash64_str_int(d, 0) % m_bits
        b = spark_xxhash64_str_int(d, 1) % m_bits
        for i in range(k):
            p = (a + i * b) % m_bits
            words[p >> 6] |= 1 << (p & 63)
    return [to_i64(w) for w in words]


def bloom_contains_oracle(words, digest: str, m_bits: int, k: int) -> bool:
    """Engine-free replay of curation.bloom_might_contain for one digest."""
    from .xxh64_pure import spark_xxhash64_str_int

    a = spark_xxhash64_str_int(digest, 0) % m_bits
    b = spark_xxhash64_str_int(digest, 1) % m_bits
    for i in range(k):
        p = (a + i * b) % m_bits
        if not (to_u64(words[p >> 6]) >> (p & 63)) & 1:
            return False
    return True
