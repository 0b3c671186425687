"""CUSUM changepoint detector vs an independent recurrence-loop oracle.

The engine computes the CUSUM statistic in CLOSED FORM (prefix sum minus
running prefix minimum, pure window exprs); the oracle here runs the
textbook stateful recurrence ``C_t = max(0, C_{t-1} + z_t - kappa)`` row
by row in Python — a genuinely different algorithm, so agreement pins the
closed-form identity, not the implementation against itself.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from timeseriesvectordbpattermatcher_spark.operators.changepoints import (
    cusum_changepoints,
    cusum_stats,
)


def _oracle_series(xs, kappa, h, baseline_n, mu0=None, sigma=None):
    """Textbook recurrence CUSUM over one series. Returns per-row dicts."""
    est = mu0 is None or sigma is None
    base = xs[:baseline_n]
    if mu0 is None:
        mu0 = float(np.mean(base))
    if sigma is None:
        sigma = float(np.std(base, ddof=1)) if len(base) >= 2 else float("nan")
    rows = []
    if not (sigma and sigma > 0) or math.isnan(sigma):
        return [
            dict(cusum_pos=None, cusum_neg=None, alarm_pos=False, alarm_neg=False)
            for _ in xs
        ]
    cp = cn = 0.0
    # prefix-argmin tracking for the changepoint estimate
    sp = sn = 0.0
    min_sp = min_sn = 0.0
    arg_sp = arg_sn = None
    for i, x in enumerate(xs):
        z = (x - mu0) / sigma
        cp = max(0.0, cp + z - kappa)
        cn = max(0.0, cn - z - kappa)
        sp += z - kappa
        sn += -z - kappa
        # struct-min semantics: strictly-smaller S moves the argmin; ties
        # keep the earliest ts
        if sp < min_sp - 0.0:
            min_sp, arg_sp = sp, i
        if sn < min_sn - 0.0:
            min_sn, arg_sn = sn, i
        after_base = (i + 1) > baseline_n if est else True
        rows.append(
            dict(
                cusum_pos=cp,
                cusum_neg=cn,
                alarm_pos=bool(cp > h and after_base),
                alarm_neg=bool(cn > h and after_base),
                cp_idx_pos=arg_sp,
                cp_idx_neg=arg_sn,
            )
        )
    return rows


def _mk_df(spark, series):
    rows = [
        (sid, i, float(x))
        for sid, xs in series.items()
        for i, x in enumerate(xs)
    ]
    return spark.createDataFrame(rows, "series_id string, ts long, close double")


def _planted(seed=7, n=120, shift_at=60, shift=3.0):
    rng = np.random.default_rng(seed)
    xs = rng.normal(10.0, 1.0, n)
    xs[shift_at:] += shift
    return xs.tolist()


def test_cusum_stats_matches_recurrence_oracle(spark):
    rng = np.random.default_rng(11)
    series = {
        "up": _planted(1, shift=2.5),
        "down": [-x for x in _planted(2, shift=2.5)],
        "flat": rng.normal(0.0, 1.0, 80).tolist(),
        "const": [5.0] * 40,  # zero baseline stddev -> null stats
        "short": [1.0, 2.0],  # baseline shorter than baseline_n
    }
    kappa, h, bn = 0.5, 5.0, 30
    got = (
        cusum_stats(_mk_df(spark, series), kappa=kappa, h=h, baseline_n=bn)
        .orderBy("series_id", "ts")
        .collect()
    )
    by_series = {}
    for r in got:
        by_series.setdefault(r["series_id"], []).append(r)
    for sid, xs in series.items():
        exp = _oracle_series(xs, kappa, h, bn)
        assert len(by_series[sid]) == len(exp)
        for i, (g, e) in enumerate(zip(by_series[sid], exp)):
            if e["cusum_pos"] is None:
                assert g["cusum_pos"] is None and g["cusum_neg"] is None, (sid, i)
                assert not g["alarm_pos"] and not g["alarm_neg"], (sid, i)
                continue
            assert g["cusum_pos"] == pytest.approx(e["cusum_pos"], abs=1e-9), (sid, i)
            assert g["cusum_neg"] == pytest.approx(e["cusum_neg"], abs=1e-9), (sid, i)
            assert g["alarm_pos"] == e["alarm_pos"], (sid, i)
            assert g["alarm_neg"] == e["alarm_neg"], (sid, i)
            assert g["cp_ts_pos"] == e["cp_idx_pos"], (sid, i)
            assert g["cp_ts_neg"] == e["cp_idx_neg"], (sid, i)


def test_cusum_known_params_skip_baseline_gate(spark):
    xs = [0.0] * 5 + [4.0] * 10
    df = _mk_df(spark, {"s": xs})
    got = (
        cusum_stats(df, kappa=0.5, h=3.0, mu0=0.0, sigma=1.0, baseline_n=30)
        .orderBy("ts")
        .collect()
    )
    exp = _oracle_series(xs, 0.5, 3.0, baseline_n=30, mu0=0.0, sigma=1.0)
    assert [r["alarm_pos"] for r in got] == [e["alarm_pos"] for e in exp]
    assert any(r["alarm_pos"] for r in got)  # alarms despite only 15 rows


def test_cusum_changepoints_first_alarm_and_location(spark):
    xs = _planted(3, n=150, shift_at=90, shift=3.0)
    df = _mk_df(spark, {"s": xs, "quiet": _planted(4, shift=0.0)})
    rows = cusum_changepoints(df, kappa=0.5, h=5.0, baseline_n=30).collect()
    ups = [r for r in rows if r["series_id"] == "s" and r["direction"] == "up"]
    assert len(ups) == 1
    exp = _oracle_series(xs, 0.5, 5.0, 30)
    first = next(i for i, e in enumerate(exp) if e["alarm_pos"])
    assert ups[0]["alarm_ts"] == first
    assert ups[0]["cp_ts"] == exp[first]["cp_idx_pos"]
    # the estimated changepoint sits near the planted shift
    assert 80 <= ups[0]["cp_ts"] <= 95
    assert not [r for r in rows if r["series_id"] == "quiet"]


def test_cusum_validation(spark):
    df = _mk_df(spark, {"s": [1.0, 2.0, 3.0]})
    with pytest.raises(ValueError, match="baseline_n"):
        cusum_stats(df, baseline_n=1)


def _chunk_parity_frames(spark):
    """Series mix exercising every chunk-boundary path: planted shifts,
    flat, constant (null stats), short, scattered null values, an
    all-null chunk, and series/chunk sizes that don't divide evenly."""
    rng = np.random.default_rng(21)
    series = {
        "up": _planted(5, n=137, shift_at=71, shift=2.5),
        "down": [-x for x in _planted(6, n=90, shift_at=40, shift=2.2)],
        "flat": rng.normal(3.0, 1.0, 64).tolist(),
        "const": [2.0] * 45,
        "short": [1.0, 5.0, 2.0],
        "holey": [
            None if i % 17 == 0 else v
            for i, v in enumerate(_planted(7, n=80, shift_at=50, shift=3.0))
        ],
        "nullchunk": [1.0, 2.0] + [None] * 12 + [9.0] * 30,
    }
    rows = [
        (sid, i, None if x is None else float(x))
        for sid, xs in series.items()
        for i, x in enumerate(xs)
    ]
    return spark.createDataFrame(rows, "series_id string, ts long, close double")


@pytest.mark.parametrize("chunk_rows", [7, 10, 64, 1000])
def test_cusum_chunked_matches_single_partition(spark, chunk_rows):
    """The distributed prefix-scan form must reproduce the single-partition
    closed form at every row, for chunk sizes from smaller-than-baseline
    to larger-than-any-series (the 1000 case degenerates to one chunk)."""
    df = _chunk_parity_frames(spark)
    from pyspark.sql import functions as F

    kw = dict(kappa=0.5, h=4.0, baseline_n=20)
    want = cusum_stats(df, **kw).orderBy("series_id", "ts").collect()
    got = (
        cusum_stats(df, chunk_by=(F.col("ts") / chunk_rows).cast("int"), **kw)
        .orderBy("series_id", "ts")
        .collect()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        key = (w["series_id"], w["ts"])
        for c in ("cusum_pos", "cusum_neg"):
            if w[c] is None:
                assert g[c] is None, (key, c, g[c])
            else:
                assert g[c] == pytest.approx(w[c], rel=1e-9, abs=1e-9), (key, c)
        for c in ("alarm_pos", "alarm_neg", "cp_ts_pos", "cp_ts_neg"):
            assert g[c] == w[c], (key, c, g[c], w[c])


def test_cusum_chunked_known_params_and_first_alarm(spark):
    from pyspark.sql import functions as F

    xs = [0.0] * 40 + [3.0] * 40
    df = _mk_df(spark, {"s": xs, "q": [0.1 * (i % 7) for i in range(60)]})
    kw = dict(kappa=0.5, h=4.0, mu0=0.0, sigma=1.0)
    want = sorted(
        tuple(r) for r in cusum_changepoints(df, **kw).collect()
    )
    got = sorted(
        tuple(r)
        for r in cusum_changepoints(
            df, chunk_by=(F.col("ts") / 13).cast("int"), **kw
        ).collect()
    )
    assert got == want and len(got) >= 1


def test_cusum_chunked_no_store_sized_shuffle_of_series_key(spark):
    """The chunked plan's only data-sized Exchange is the (series, chunk)
    partitioning: the summary joins broadcast back (no SortMergeJoin), so
    a 70%-skewed series never lands in one task."""
    from pyspark.sql import functions as F

    df = _mk_df(spark, {"s": [float(i % 13) for i in range(400)]})
    plan = (
        cusum_stats(df, chunk_by=(F.col("ts") / 50).cast("int"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan[:2500]
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2500]


def test_cusum_single_exchange(spark):
    df = _mk_df(spark, {"s": [float(i) for i in range(40)]})
    plan = cusum_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange ") == 1, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan[:2000]


# ---------------- PELT (exact offline segmentation) ----------------

from timeseriesvectordbpattermatcher_spark.operators.changepoints import (  # noqa: E402
    pelt_changepoints,
)


def _op_dp(y, beta, min_size):
    """UNPRUNED optimal-partitioning DP — the exactness oracle for PELT
    (same objective, no candidate pruning, O(n^2))."""
    n = len(y)
    cs = np.concatenate(([0.0], np.cumsum(y)))
    cs2 = np.concatenate(([0.0], np.cumsum(np.asarray(y) ** 2)))

    def cost(a, b):
        m = b - a
        s = cs[b] - cs[a]
        return cs2[b] - cs2[a] - s * s / m

    F_arr = [math.inf] * (n + 1)
    F_arr[0] = -beta
    prev = [0] * (n + 1)
    for t in range(min_size, n + 1):
        for s in range(0, t - min_size + 1):
            v = F_arr[s] + cost(s, t) + beta
            if v < F_arr[t]:
                F_arr[t], prev[t] = v, s
    if not math.isfinite(F_arr[n]):
        return [(0, n)]
    bounds = [n]
    while bounds[0] != 0:
        bounds.insert(0, prev[bounds[0]])
    return list(zip(bounds[:-1], bounds[1:]))


def _pelt_df(spark, series: dict[str, np.ndarray]):
    rows = [
        (k, int(i), float(v))
        for k, y in series.items()
        for i, v in enumerate(y)
    ]
    return spark.createDataFrame(rows, "series_id string, ts long, close double")


def test_pelt_matches_unpruned_dp(spark):
    rng = np.random.default_rng(23)
    series = {
        # three planted mean shifts
        "shifts": np.concatenate([
            rng.normal(0, 0.5, 40), rng.normal(4, 0.5, 25),
            rng.normal(-2, 0.5, 35), rng.normal(1, 0.5, 30),
        ]),
        # no shift at all
        "flatish": rng.normal(3, 0.5, 90),
        # constant
        "const": np.full(50, 7.0),
    }
    beta = 8.0
    got = pelt_changepoints(
        _pelt_df(spark, series), penalty=beta, min_size=2
    ).toPandas()
    for key, y in series.items():
        want = _op_dp(y, beta, 2)
        sub = got[got["series_id"] == key].sort_values("seg")
        assert [(a, b - 1) for a, b in want] == list(
            zip(sub["start_ts"], sub["end_ts"])
        ), key
        means = [float(np.mean(y[a:b])) for a, b in want]
        np.testing.assert_allclose(sub["mean"].to_numpy(), means, atol=1e-9)
        assert (sub["n_pts"].to_numpy() == [b - a for a, b in want]).all()
    # the planted series recovers exactly 4 segments at this penalty
    assert len(got[got["series_id"] == "shifts"]) == 4
    assert len(got[got["series_id"] == "const"]) == 1


def test_pelt_exhaustive_tiny(spark):
    """Against ALL segmentations of tiny series (every subset of cut
    positions respecting min_size) — stronger than the DP oracle."""
    from itertools import combinations

    rng = np.random.default_rng(5)
    y = np.round(rng.normal(0, 1, 10), 3)
    y[5:] += 3.0
    beta = 2.0
    min_size = 2

    def seg_cost(a, b):
        s = y[a:b]
        return float(((s - s.mean()) ** 2).sum())

    best = (math.inf, None)
    n = len(y)
    for k in range(0, n):
        for cuts in combinations(range(1, n), k):
            bounds = [0, *cuts, n]
            if any(b - a < min_size for a, b in zip(bounds, bounds[1:])):
                continue
            tot = sum(seg_cost(a, b) for a, b in zip(bounds, bounds[1:]))
            tot += beta * (len(bounds) - 1)
            cand = (tot, tuple(bounds))
            if cand < best:
                best = cand
    got = pelt_changepoints(
        _pelt_df(spark, {"t": y}), penalty=beta, min_size=min_size
    ).toPandas().sort_values("seg")
    bounds = best[1]
    assert list(got["start_ts"]) == list(bounds[:-1])
    assert list(got["end_ts"]) == [b - 1 for b in bounds[1:]]


def test_pelt_default_penalty_deterministic_and_sane(spark):
    rng = np.random.default_rng(9)
    y = np.concatenate([rng.normal(0, 0.3, 60), rng.normal(5, 0.3, 60)])
    df = _pelt_df(spark, {"d": y})
    a = pelt_changepoints(df).toPandas().sort_values("seg")
    b = pelt_changepoints(df).toPandas().sort_values("seg")
    assert a.equals(b)
    # default BIC penalty finds the one obvious 5-sigma shift, nothing else
    assert len(a) == 2 and a["start_ts"].tolist() == [0, 60]
    # and the penalty it derived replays from the published formula
    d = np.diff(y)
    sig = np.median(np.abs(d - np.median(d))) / (0.6744897501960817 * np.sqrt(2))
    assert a["penalty"].iloc[0] == pytest.approx(2 * sig * sig * np.log(len(y)))


def test_pelt_edges(spark):
    # shorter than min_size -> one degenerate segment; nulls dropped
    rows = [("s", 0, 1.0), ("s", 1, None), ("s", 2, 2.0)]
    df = spark.createDataFrame(rows, "series_id string, ts long, close double")
    out = pelt_changepoints(df, penalty=1.0, min_size=5).toPandas()
    assert len(out) == 1 and out["n_pts"].iloc[0] == 2
    assert out["mean"].iloc[0] == pytest.approx(1.5)
    with pytest.raises(ValueError):
        pelt_changepoints(df, min_size=0)
    with pytest.raises(ValueError):
        pelt_changepoints(df, penalty=-1.0)
    with pytest.raises(Exception, match="max_points"):
        pelt_changepoints(df, penalty=1.0, max_points=1).collect()
