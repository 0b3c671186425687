"""Pure-numpy oracle for the ANN recall contract query — re-derives the
random-hyperplane LSH (Charikar '02 sign-bit sketches) and the IVF coarse
quantizer (Lloyd k-means on a seeded sample, per IVFADC / Jégou et al.) from
their published definitions plus the documented parameters, with NO engine
imports. The seeded randomness (``np.random.default_rng`` = PCG64) is part
of the operator's documented contract, so the oracle draws the same planes
and seeds independently.

Semantics mirrored from the contract:

- truth: exact cosine top-10 per query, ties broken by ref id ascending;
- LSH: per table, bucket id = sum(sign_bit_b << b) over ``n_bits``
  hyperplane dot-product signs; candidates = refs sharing any table's
  bucket with the query; exact cosine re-rank, top-10;
- IVF: centroids from 10 Lloyd iterations over the L2-normalized,
  id-ordered sample (seeded initial choice), centroids re-normalized each
  step; refs assigned to argmax-dot list; each query probes its ``nprobe``
  best lists; exact cosine re-rank of candidates, top-10;
- recall = |approx top-10 ∩ exact top-10| / 10, queries with zero hits
  drop out (the engine's semi-join + groupBy emits no row for them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _cosine_scores(q: np.ndarray, mat: np.ndarray) -> np.ndarray:
    qn = float(np.linalg.norm(q))
    rn = np.linalg.norm(mat, axis=1)
    scores = np.zeros(len(mat))
    ok = (rn > 0) & (qn > 0)
    if qn > 0:
        scores[ok] = (mat[ok] @ q) / (rn[ok] * qn)
    return scores


def _topk_ids(q: np.ndarray, ids: np.ndarray, mat: np.ndarray, k: int) -> list:
    scores = _cosine_scores(q, mat)
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:k]
    return [ids[i] for i in order]


def _lsh_buckets(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) x (tables, bits, dim) -> (n, tables) integer bucket ids."""
    n_tables, n_bits, _ = planes.shape
    out = np.zeros((len(mat), n_tables), dtype=np.int64)
    for t in range(n_tables):
        for b in range(n_bits):
            out[:, t] |= ((mat @ planes[t, b]) > 0).astype(np.int64) << b
    return out


def _ivf_centroids(
    sample: np.ndarray, n_lists: int, iters: int, seed: int
) -> np.ndarray:
    x = _unit(sample)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for j in range(len(cents)):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cents[j] = c / max(np.linalg.norm(c), 1e-12)
    return cents


def oracle_ann_recall(
    emb: pd.DataFrame,
    n_queries: int = 5,
    k: int = 10,
    lsh_bits: int = 4,
    lsh_tables: int = 16,
    lsh_seed: int = 23,
    ivf_lists: int = 8,
    ivf_nprobe: int = 4,
    ivf_seed: int = 37,
    ivf_iters: int = 10,
    ivf_sample: int = 10_000,
    round_digits: int = 6,
) -> pd.DataFrame:
    """embeddings(vec_id, embedding) -> (method, query_id, recall, recall_ok)."""
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    dim = mat.shape[1]
    q_mask = ids < n_queries
    q_ids, q_mat = ids[q_mask], mat[q_mask]

    truth = {qid: set(_topk_ids(q, ids, mat, k)) for qid, q in zip(q_ids, q_mat)}

    # ---- LSH ----
    planes = np.random.default_rng(lsh_seed).normal(size=(lsh_tables, lsh_bits, dim))
    r_buckets = _lsh_buckets(mat, planes)
    q_buckets = _lsh_buckets(q_mat, planes)
    lsh_hits = {}
    for qi, qid in enumerate(q_ids):
        cand = np.zeros(len(ids), dtype=bool)
        for t in range(lsh_tables):
            cand |= r_buckets[:, t] == q_buckets[qi, t]
        got = set(_topk_ids(q_mat[qi], ids[cand], mat[cand], k))
        lsh_hits[qid] = len(got & truth[qid])

    # ---- IVF ----
    # training draw re-derived from the documented hash-slice spec: keep
    # rows with xxhash64(id) % P == 0 where P = N // sample (P == 1 keeps
    # everything), order by id, truncate to sample — xxh64 re-implemented
    # in tests/oracle/xxh64_pure.py from the public spec
    n = len(ids)
    p = max(1, n // ivf_sample)
    if p > 1:
        from .xxh64_pure import spark_xxhash64_longs

        keep = np.array(
            [spark_xxhash64_longs([int(i)]) % p == 0 for i in ids], dtype=bool
        )
        train = mat[keep][:ivf_sample]
    else:
        train = mat[:ivf_sample]
    cents = _ivf_centroids(train, ivf_lists, ivf_iters, ivf_seed)
    r_assign = np.argmax(_unit(mat) @ cents.T, axis=1)
    ivf_hits = {}
    for qi, qid in enumerate(q_ids):
        qdots = _unit(q_mat[qi : qi + 1])[0] @ cents.T
        probes = np.argsort(-qdots)[:ivf_nprobe]
        cand = np.isin(r_assign, probes)
        got = set(_topk_ids(q_mat[qi], ids[cand], mat[cand], k))
        ivf_hits[qid] = len(got & truth[qid])

    rows = []
    for method, hits in (("lsh", lsh_hits), ("ivf", ivf_hits)):
        for qid in q_ids:
            if hits[qid] == 0:
                continue  # engine's semi-join emits no row
            recall = hits[qid] / float(k)
            rows.append((method, int(qid), round(recall, round_digits), recall >= 0.9))
    return pd.DataFrame(rows, columns=["method", "query_id", "recall", "recall_ok"])


def oracle_lsh_recall(
    vecs: pd.DataFrame,
    id_col: str,
    vec_col: str,
    n_queries: int = 5,
    k: int = 20,
    lsh_bits: int = 8,
    lsh_tables: int = 4,
    lsh_seed: int = 23,
    method: str = "lsh_e2",
    round_digits: int = 6,
) -> pd.DataFrame:
    """Generic LSH-vs-brute recall over any (id, vector) table — string or
    int ids. Defaults pin the MATCHER-tier SLA: the E2 feature distribution
    at the matcher's k=20 and its ``lsh_topk`` defaults (8 bits, 4 tables,
    seed 23). Queries = the ``n_queries`` smallest ids (same deterministic
    pick as the contract query's ``orderBy(id).limit(n)``)."""
    vecs = vecs.sort_values(id_col).reset_index(drop=True)
    ids = vecs[id_col].to_numpy()
    mat = np.stack(vecs[vec_col].to_numpy()).astype(np.float64)
    dim = mat.shape[1]
    q_ids, q_mat = ids[:n_queries], mat[:n_queries]
    truth = {qid: set(_topk_ids(q, ids, mat, k)) for qid, q in zip(q_ids, q_mat)}
    planes = np.random.default_rng(lsh_seed).normal(size=(lsh_tables, lsh_bits, dim))
    r_buckets = _lsh_buckets(mat, planes)
    q_buckets = _lsh_buckets(q_mat, planes)
    rows = []
    for qi, qid in enumerate(q_ids):
        cand = np.zeros(len(ids), dtype=bool)
        for t in range(lsh_tables):
            cand |= r_buckets[:, t] == q_buckets[qi, t]
        got = set(_topk_ids(q_mat[qi], ids[cand], mat[cand], k))
        hits = len(got & truth[qid])
        if hits == 0:
            continue  # engine's semi-join emits no row
        recall = hits / float(k)
        rows.append((method, str(qid), round(recall, round_digits), recall >= 0.9))
    return pd.DataFrame(rows, columns=["method", "query_id", "recall", "recall_ok"])
