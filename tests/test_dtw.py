"""Banded DTW + LB_Keogh matching (operators/dtw.py).

Oracle: a textbook full-matrix banded-DTW DP in pure numpy (no rolling
rows, no abandoning, no bounds) over all pairs. Pins:
- threshold search is LOSSLESS: engine pairs == brute-force all-pairs
  under the threshold, distances equal;
- top-k is exact: per query the engine's (ref, dist, rank) equals the
  brute-force (dist, ref_id) sort, including the LB-order early stop;
- LB_Keogh really lower-bounds DTW on fuzz pairs (the property both
  prunes rely on);
- band=0 degenerates to z-normalized Euclidean distance;
- verify-pairs computes exactly the given candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from timeseriesvectordbpattermatcher_spark.operators.dtw import (
    MAX_BCAST_REFS,
    dtw_pairs,
    dtw_topk,
    dtw_verify_pairs,
)

N = 64
BAND = 6


# ---------- engine-free numpy oracle ----------

def znorm_py(x):
    x = np.asarray(x, dtype=np.float64)
    sd = x.std()
    if not np.isfinite(sd) or sd <= 1e-12:
        return np.zeros_like(x)
    return (x - x.mean()) / sd


def dtw_py(q, r, band):
    """Full-matrix banded DP, squared costs, sqrt at the end."""
    n = len(q)
    D = np.full((n + 1, n + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(1, i - band), min(n, i + band) + 1):
            c = (q[i - 1] - r[j - 1]) ** 2
            D[i, j] = c + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return float(np.sqrt(D[n, n]))


def lb_keogh_py(q, r, band):
    n = len(q)
    tot = 0.0
    for i in range(n):
        seg = q[max(0, i - band): i + band + 1]
        u, l = seg.max(), seg.min()
        if r[i] > u:
            tot += (r[i] - u) ** 2
        elif r[i] < l:
            tot += (l - r[i]) ** 2
    return float(np.sqrt(tot))


def make_corpus(rng, n_q=12, n_r=40):
    """Random walks plus planted warped copies so true matches exist."""
    qs, rs = {}, {}
    for i in range(n_q):
        qs[f"q{i:02d}"] = np.cumsum(rng.standard_normal(N))
    for j in range(n_r):
        rs[f"r{j:02d}"] = np.cumsum(rng.standard_normal(N))
    # plant: refs r00..r03 are time-warped versions of q00/q01
    for j, src in enumerate(["q00", "q00", "q01", "q01"]):
        base = qs[src]
        idx = np.clip(
            np.round(np.linspace(0, N - 1, N) + rng.integers(-3, 4, N)), 0, N - 1
        ).astype(int)
        idx.sort()
        rs[f"r{j:02d}"] = base[idx] + 0.01 * rng.standard_normal(N)
    return qs, rs


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    qs, rs = make_corpus(rng)
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": list(qs), "vec": [v.tolist() for v in qs.values()]}
        ),
        "query_id string, vec array<double>",
    ).cache()
    rdf = spark.createDataFrame(
        pd.DataFrame({"ref_id": list(rs), "vec": [v.tolist() for v in rs.values()]}),
        "ref_id string, vec array<double>",
    ).cache()
    qdf.count(), rdf.count()
    yield qs, rs, qdf, rdf
    qdf.unpersist(), rdf.unpersist()


def brute_all(qs, rs, band):
    return {
        (qi, rj): dtw_py(znorm_py(qv), znorm_py(rv), band)
        for qi, qv in qs.items()
        for rj, rv in rs.items()
    }


def test_threshold_search_lossless(corpus):
    qs, rs, qdf, rdf = corpus
    thr = 4.0
    want = {
        pair: d for pair, d in brute_all(qs, rs, BAND).items() if d <= thr
    }
    assert want, "threshold too tight — test would be vacuous"
    got = {
        (r["query_id"], r["ref_id"]): r["dtw"]
        for r in dtw_pairs(qdf, rdf, threshold=thr, band=BAND).collect()
    }
    assert set(got) == set(want)
    for pair in want:
        assert got[pair] == pytest.approx(want[pair], abs=1e-9)


def test_topk_exact(corpus):
    qs, rs, qdf, rdf = corpus
    k = 5
    dists = brute_all(qs, rs, BAND)
    got = (
        dtw_topk(qdf, rdf, k=k, band=BAND)
        .orderBy("query_id", "rank")
        .collect()
    )
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["ref_id"], r["dtw"], r["rank"]))
    for qi in qs:
        want = sorted(((dists[(qi, rj)], rj) for rj in rs))[:k]
        assert [rj for _, rj in want] == [rj for rj, _, _ in by_q[qi]]
        for (wd, _), (_, gd, _) in zip(want, by_q[qi]):
            assert gd == pytest.approx(wd, abs=1e-9)
        assert [rk for _, _, rk in by_q[qi]] == list(range(1, k + 1))


def test_lb_keogh_lower_bounds_dtw():
    rng = np.random.default_rng(11)
    for _ in range(200):
        q = znorm_py(np.cumsum(rng.standard_normal(N)))
        r = znorm_py(np.cumsum(rng.standard_normal(N)))
        band = int(rng.integers(0, 12))
        assert lb_keogh_py(q, r, band) <= dtw_py(q, r, band) + 1e-9


def test_band_zero_is_euclidean(corpus):
    qs, rs, qdf, rdf = corpus
    got = {
        (r["query_id"], r["ref_id"]): r["dtw"]
        for r in dtw_topk(qdf, rdf, k=len(rs), band=0).collect()
    }
    for qi, qv in qs.items():
        for rj, rv in rs.items():
            want = float(np.linalg.norm(znorm_py(qv) - znorm_py(rv)))
            assert got[(qi, rj)] == pytest.approx(want, abs=1e-9)


def test_verify_pairs_exact_and_threshold(corpus, spark):
    qs, rs, qdf, rdf = corpus
    cand = [(qi, rj) for qi in list(qs)[:4] for rj in list(rs)[:7]]
    pairs = spark.createDataFrame(
        pd.DataFrame(cand, columns=["query_id", "ref_id"]),
        "query_id string, ref_id string",
    )
    got = {
        (r["query_id"], r["ref_id"]): r["dtw"]
        for r in dtw_verify_pairs(pairs, qdf, rdf, band=BAND).collect()
    }
    assert set(got) == set(cand)
    for qi, rj in cand:
        want = dtw_py(znorm_py(qs[qi]), znorm_py(rs[rj]), BAND)
        assert got[(qi, rj)] == pytest.approx(want, abs=1e-9)
    thr = 4.0
    filt = dtw_verify_pairs(pairs, qdf, rdf, band=BAND, threshold=thr).collect()
    assert {(r["query_id"], r["ref_id"]) for r in filt} == {
        p for p, d in got.items() if d <= thr
    }


def test_planted_warped_copies_found(corpus):
    qs, rs, qdf, rdf = corpus
    top1 = {
        r["query_id"]: r["ref_id"]
        for r in dtw_topk(qdf, rdf, k=1, band=BAND).collect()
    }
    assert top1["q00"] in {"r00", "r01"}
    assert top1["q01"] in {"r02", "r03"}


def test_flat_windows_znorm_to_zero(spark):
    pdf_q = pd.DataFrame({"query_id": ["flat"], "vec": [[5.0] * N]})
    pdf_r = pd.DataFrame({"ref_id": ["alsoflat"], "vec": [[-3.0] * N]})
    q = spark.createDataFrame(pdf_q, "query_id string, vec array<double>")
    r = spark.createDataFrame(pdf_r, "ref_id string, vec array<double>")
    row = dtw_topk(q, r, k=1, band=BAND).collect()[0]
    assert row["dtw"] == pytest.approx(0.0, abs=1e-12)


def test_empty_refs_and_length_mismatch(spark, corpus):
    qs, rs, qdf, rdf = corpus
    empty = spark.createDataFrame([], "ref_id string, vec array<double>")
    assert dtw_topk(qdf, empty, k=3, band=BAND).count() == 0
    shorty = spark.createDataFrame(
        pd.DataFrame({"query_id": ["s"], "vec": [[1.0, 2.0]]}),
        "query_id string, vec array<double>",
    )
    assert dtw_topk(shorty, rdf, k=3, band=BAND).count() == 0


def test_validation(corpus):
    _, _, qdf, rdf = corpus
    with pytest.raises(ValueError):
        dtw_topk(qdf, rdf, k=0)
    with pytest.raises(ValueError):
        dtw_pairs(qdf, rdf, threshold=-1.0)
    with pytest.raises(ValueError):
        dtw_pairs(qdf, rdf, threshold=1.0, band=-2)
    assert MAX_BCAST_REFS > 0


def test_no_shuffle_in_broadcast_plan(corpus):
    _, _, qdf, rdf = corpus
    plan = (
        dtw_topk(qdf, rdf, k=3, band=BAND)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan
