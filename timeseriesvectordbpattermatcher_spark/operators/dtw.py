"""Dynamic-time-warping pattern matching: banded DTW + LB_Keogh pruning.

The matcher family compares fixed-length segments in three geometries:
cosine over feature vectors (operators/matcher.py — the reference's
Pinecone probe, /root/reference/opkatsPatternMatcherUtil.py:223-253),
z-normalized Euclidean (operators/matrixprofile.py), and symbolic SAX
words (operators/sax.py). This adds the classic ELASTIC geometry: DTW
(Sakoe & Chiba 1978) under a Sakoe-Chiba band, with the UCR-suite
LB_Keogh lower bound (Keogh & Ratanamahatana 2005) pruning candidates
before any DP runs. Two patterns that cover both scale regimes:

- :func:`dtw_topk` / :func:`dtw_pairs` — broadcast path for a bounded
  reference set (the E2 matcher assumption): refs collect to a numpy
  matrix broadcast to every executor, queries stream through ONE
  ``mapInPandas`` with zero shuffle. Per query the envelope is built
  once, LB_Keogh against ALL refs is one vectorized O(m·n) pass, and
  the O(n·band) DP runs only on candidates the bound cannot dismiss —
  in LB-ascending order for top-k, stopping the moment the next bound
  meets the current k-th best (exact, the UCR early-abandon loop).
- :func:`dtw_verify_pairs` — candidate-verify path for UNbounded ref
  sets: take a candidate pair table from any bucketed generator (e.g.
  ``sax.sax_candidate_pairs`` — same-word buckets, never all-pairs),
  join the two vector sides in, and verify each pair with the banded
  DP. The same composition shape as the n-gram Jaccard verify stage.

Both are EXACT for what they claim: LB_Keogh <= DTW is the published
bound (equal lengths, symmetric band), so threshold pruning and the
sorted-bound top-k cutoff lose nothing — pinned against a brute-force
numpy oracle in tests/test_dtw.py.

Conventions: sequences are equal-length ``array<float/double>`` (the
64-point segment windows of operators/segmentation.py are the intended
input); ``znorm=True`` z-normalizes every sequence first (shape match,
not level match) with the flat-series clamp mapping constant windows to
zeros, matching the matrix-profile convention. Distances are
``sqrt(sum of squared steps)``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dtw_pairs", "dtw_topk", "dtw_verify_pairs"]

# refs collect to the driver for the broadcast path; same bounded-side
# assumption (and the same loud failure) as the IVF centroid trainer
MAX_BCAST_REFS = 500_000


def _znorm(x: np.ndarray) -> np.ndarray:
    mu = x.mean()
    sd = x.std()
    if not np.isfinite(sd) or sd <= 1e-12:
        return np.zeros_like(x)
    return (x - mu) / sd


def _envelope(q: np.ndarray, band: int) -> tuple[np.ndarray, np.ndarray]:
    """Sliding max/min of q over [i-band, i+band] (Sakoe-Chiba envelope)."""
    n = len(q)
    w = 2 * band + 1
    hi = np.lib.stride_tricks.sliding_window_view(
        np.pad(q, band, constant_values=-np.inf), w
    ).max(axis=1)
    lo = np.lib.stride_tricks.sliding_window_view(
        np.pad(q, band, constant_values=np.inf), w
    ).min(axis=1)
    return hi[:n], lo[:n]


def _lb_keogh_sq(upper: np.ndarray, lower: np.ndarray, refs: np.ndarray) -> np.ndarray:
    """Squared LB_Keogh of every row of ``refs`` against one query
    envelope — one vectorized pass, no python per-ref loop."""
    over = np.clip(refs - upper, 0.0, None)
    under = np.clip(lower - refs, 0.0, None)
    return (over * over + under * under).sum(axis=1)


def _dtw_sq(q: np.ndarray, r: np.ndarray, band: int,
            abandon_at: float = np.inf) -> float:
    """Squared banded DTW via the rolling two-row DP. ``abandon_at``
    early-abandons when every cell of a row exceeds it (the returned
    value is then only guaranteed > abandon_at). O(n * band) python
    steps per pair — the sequences here are segment windows (~64), and
    the LB gate keeps pair counts at candidate scale, so the loop is
    the verification tail, not the hot path."""
    n = len(q)
    prev = np.full(n + 1, np.inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(n + 1, np.inf)
        lo = max(1, i - band)
        hi = min(n, i + band)
        qi = q[i - 1]
        best = np.inf
        for j in range(lo, hi + 1):
            d = qi - r[j - 1]
            step = min(prev[j], prev[j - 1], cur[j - 1])
            cur[j] = d * d + step
            if cur[j] < best:
                best = cur[j]
        if best > abandon_at:
            return best
        prev = cur
    return prev[n]


def _check_band(band: int) -> None:
    if band < 0:
        raise ValueError(f"band must be >= 0, got {band}")


def _collect_refs(refs: DataFrame, ref_id: str, ref_vec: str):
    rows = (
        refs.select(ref_id, ref_vec)
        .filter(F.col(ref_vec).isNotNull())
        .limit(MAX_BCAST_REFS + 1)
        .collect()
    )
    if len(rows) > MAX_BCAST_REFS:
        raise ValueError(
            f"broadcast DTW path holds refs on every executor; got more than "
            f"{MAX_BCAST_REFS} — use dtw_verify_pairs over a bucketed "
            f"candidate generator (e.g. sax.sax_candidate_pairs) instead"
        )
    if not rows:
        return [], None
    ids = [r[0] for r in rows]
    mat = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    if mat.ndim != 2:
        raise ValueError("all reference vectors must share one length")
    return ids, mat


def _bcast_kernel(ids, mat, band: int, znorm: bool, threshold: float | None,
                  k: int | None):
    """mapInPandas kernel shared by dtw_pairs (threshold) and dtw_topk."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if znorm and len(ids):
            zmat = np.apply_along_axis(_znorm, 1, mat)
        else:
            zmat = mat
        for pdf in batches:
            out_q, out_r, out_d, out_rank = [], [], [], []
            for qid, vec in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                if vec is None or not len(ids):
                    continue
                q = np.asarray(vec, dtype=np.float64)
                if q.shape[0] != zmat.shape[1]:
                    continue  # length mismatch cannot DTW; excluded by contract
                if znorm:
                    q = _znorm(q)
                upper, lower = _envelope(q, band)
                lb = _lb_keogh_sq(upper, lower, zmat)
                if threshold is not None:
                    t2 = threshold * threshold
                    for ridx in np.flatnonzero(lb <= t2):
                        d2 = _dtw_sq(q, zmat[ridx], band, abandon_at=t2)
                        if d2 <= t2:
                            out_q.append(qid)
                            out_r.append(ids[ridx])
                            out_d.append(float(np.sqrt(d2)))
                else:
                    order = np.argsort(lb, kind="stable")
                    best: list[tuple[float, str, object]] = []
                    kth = np.inf
                    for ridx in order:
                        if len(best) == k and lb[ridx] > kth:
                            break  # LB ascending: nothing left can beat or tie k-th
                        d2 = _dtw_sq(q, zmat[ridx], band, abandon_at=kth)
                        cand = (d2, str(ids[ridx]), ids[ridx])
                        if len(best) < k or cand[:2] < best[-1][:2]:
                            best.append(cand)
                            best.sort(key=lambda t: t[:2])
                            best = best[:k]
                            if len(best) == k:
                                kth = best[-1][0]
                    for rank, (d2, _, rid) in enumerate(best, start=1):
                        out_q.append(qid)
                        out_r.append(rid)
                        out_d.append(float(np.sqrt(d2)))
                        out_rank.append(rank)
            cols = {"query_id": out_q, "ref_id": out_r, "dtw": out_d}
            if threshold is None:
                cols["rank"] = pd.Series(out_rank, dtype="int32")
            yield pd.DataFrame(cols)

    return op


def dtw_pairs(
    queries: DataFrame,
    refs: DataFrame,
    threshold: float,
    band: int = 8,
    znorm: bool = True,
    query_id: str = "query_id",
    query_vec: str = "vec",
    ref_id: str = "ref_id",
    ref_vec: str = "vec",
) -> DataFrame:
    """All (query, ref) pairs with banded DTW distance <= ``threshold``.
    Broadcast path: refs (bounded, loud failure past MAX_BCAST_REFS)
    ship to every executor; queries stream through one ``mapInPandas``
    — zero shuffle. LB_Keogh prunes losslessly (LB <= DTW), the DP
    early-abandons at the threshold. Columns: query_id, ref_id, dtw."""
    _check_band(band)
    if threshold < 0:
        raise ValueError(f"threshold must be >= 0, got {threshold}")
    ids, mat = _collect_refs(refs, ref_id, ref_vec)
    id_type = queries.schema[query_id].dataType.simpleString()
    rid_type = refs.schema[ref_id].dataType.simpleString()
    op = _bcast_kernel(ids, mat if mat is not None else np.zeros((0, 1)),
                       band, znorm, float(threshold), None)
    return queries.select(query_id, query_vec).mapInPandas(
        op, schema=f"query_id {id_type}, ref_id {rid_type}, dtw double"
    )


def dtw_topk(
    queries: DataFrame,
    refs: DataFrame,
    k: int = 20,
    band: int = 8,
    znorm: bool = True,
    query_id: str = "query_id",
    query_vec: str = "vec",
    ref_id: str = "ref_id",
    ref_vec: str = "vec",
) -> DataFrame:
    """Exact k nearest references per query under banded DTW, ranked by
    (distance, ref_id). Same broadcast/zero-shuffle shape as
    :func:`dtw_pairs`; per query the refs are visited in LB_Keogh order
    and the scan stops once the next lower bound reaches the current
    k-th best distance — exact by LB <= DTW. Columns: query_id, ref_id,
    dtw, rank."""
    _check_band(band)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ids, mat = _collect_refs(refs, ref_id, ref_vec)
    id_type = queries.schema[query_id].dataType.simpleString()
    rid_type = refs.schema[ref_id].dataType.simpleString()
    op = _bcast_kernel(ids, mat if mat is not None else np.zeros((0, 1)),
                       band, znorm, None, int(k))
    return queries.select(query_id, query_vec).mapInPandas(
        op, schema=f"query_id {id_type}, ref_id {rid_type}, dtw double, rank int"
    )


def dtw_verify_pairs(
    pairs: DataFrame,
    left: DataFrame,
    right: DataFrame,
    band: int = 8,
    znorm: bool = True,
    threshold: float | None = None,
    left_id: str = "query_id",
    right_id: str = "ref_id",
    left_vec: str = "vec",
    right_vec: str = "vec",
) -> DataFrame:
    """Verify a CANDIDATE pair table with exact banded DTW — the
    unbounded-ref-set path: generate candidates with any bucketed
    scheme (``sax.sax_candidate_pairs`` same-word buckets, LSH, time
    blocking), join the two vector sides in, DP only those pairs. Two
    equi joins (Catalyst broadcasts whichever side is small) plus one
    ``mapInPandas`` over the joined rows; nothing is ever all-pairs
    here unless the candidate generator was. ``threshold`` optionally
    filters the output (pairs are verified either way). Columns:
    left_id, right_id, dtw."""
    _check_band(band)
    lv = left.select(
        F.col(left_id).alias("_lid"), F.col(left_vec).alias("_lvec")
    )
    rv = right.select(
        F.col(right_id).alias("_rid"), F.col(right_vec).alias("_rvec")
    )
    joined = (
        pairs.select(F.col(left_id).alias("_lid"), F.col(right_id).alias("_rid"))
        .join(lv, "_lid")
        .join(rv, "_rid")
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_l, out_r, out_d = [], [], []
            for lid, rid, lvec, rvec in zip(
                pdf["_lid"], pdf["_rid"], pdf["_lvec"], pdf["_rvec"]
            ):
                if lvec is None or rvec is None or len(lvec) != len(rvec):
                    continue
                a = np.asarray(lvec, dtype=np.float64)
                b = np.asarray(rvec, dtype=np.float64)
                if znorm:
                    a, b = _znorm(a), _znorm(b)
                d = float(np.sqrt(_dtw_sq(a, b, band)))
                if threshold is None or d <= threshold:
                    out_l.append(lid)
                    out_r.append(rid)
                    out_d.append(d)
            yield pd.DataFrame(
                {left_id: out_l, right_id: out_r, "dtw": out_d}
            )

    lid_type = left.schema[left_id].dataType.simpleString()
    rid_type = right.schema[right_id].dataType.simpleString()
    return joined.mapInPandas(
        op, schema=f"{left_id} {lid_type}, {right_id} {rid_type}, dtw double"
    )
