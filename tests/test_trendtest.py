"""Mann–Kendall + Theil–Sen (operators/trendtest.py).

Oracles:
- DuckDB recomputes S, the tie-corrected Var(S), and the Theil–Sen
  median with its own pairwise self-join — a different algorithm shape
  (join vs row sweep).
- A pure-python transcription of the published Z / p / tau-b formulas
  replays the derived statistics.
- Planted monotone / flat / noisy-trend series pin the verdicts.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.trendtest import mann_kendall

STEP = 3600


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    t = np.arange(200)
    series = {
        "up": 0.5 * t + rng.normal(0, 5.0, 200),           # noisy rise
        "down": -0.3 * t + rng.normal(0, 4.0, 200),        # noisy fall
        "flat": rng.normal(0, 1.0, 200),                   # no trend
        "steps": np.repeat(np.arange(20), 10).astype(float),  # heavy x-ties
        "tiny": np.array([1.0, 2.0]),                      # n < 3
    }
    frames = []
    for k, y in series.items():
        ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            np.arange(len(y)) * STEP, unit="s"
        )
        frames.append(pd.DataFrame({"source": k, "bucket_ts": ts,
                                    "val": np.round(y, 6)}))
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True)).cache()
    df.count()
    yield df
    df.unpersist()


def _duck_pairwise(duck, pdf):
    duck.register("mk_pts", pdf)
    return duck.sql("""
        WITH s AS (SELECT source, epoch(bucket_ts)::DOUBLE t, val::DOUBLE x
                   FROM mk_pts),
        pairs AS (
          SELECT a.source,
                 sign(b.x - a.x) AS sg,
                 CASE WHEN b.t != a.t THEN (b.x - a.x) / (b.t - a.t) END AS sl
          FROM s a JOIN s b
            ON b.source = a.source AND (b.t > a.t OR (b.t = a.t AND b.x > a.x)))
        SELECT source, sum(sg)::BIGINT AS s_stat,
               median(sl) AS sen_slope
        FROM pairs GROUP BY 1
    """).df()


def test_s_and_sen_match_duckdb(duck, corpus):
    got = mann_kendall(corpus).toPandas().set_index("source")
    want = _duck_pairwise(duck, corpus.toPandas()).set_index("source")
    for k in ("up", "down", "flat", "steps"):
        assert got.loc[k, "s_stat"] == want.loc[k, "s_stat"], k
        assert got.loc[k, "sen_slope"] == pytest.approx(
            want.loc[k, "sen_slope"], rel=1e-9
        ), k


def test_derived_stats_match_python_transcription(corpus):
    got = mann_kendall(corpus).toPandas().set_index("source")
    pdf = corpus.toPandas()
    for k, g in pdf.groupby("source"):
        if k == "tiny":
            continue
        g = g.sort_values(["bucket_ts", "val"])
        x = g["val"].to_numpy()
        t = g["bucket_ts"].astype("int64").to_numpy() / 1e9
        n = len(x)
        s = sum(
            int(np.sign(x[j] - x[i]))
            for i in range(n - 1)
            for j in range(i + 1, n)
        )
        def tie(v, f):
            _, c = np.unique(v, return_counts=True)
            c = c[c > 1].astype(float)
            return float(f(c).sum())
        var_s = (n * (n - 1) * (2 * n + 5)
                 - tie(x, lambda c: c * (c - 1) * (2 * c + 5))) / 18.0
        z = ((s - 1) / math.sqrt(var_s) if s > 0
             else (s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
        p = math.erfc(abs(z) / math.sqrt(2))
        d0 = n * (n - 1) / 2
        den = math.sqrt(
            (d0 - tie(x, lambda c: c * (c - 1) / 2))
            * (d0 - tie(t, lambda c: c * (c - 1) / 2))
        )
        assert got.loc[k, "s_stat"] == s
        assert got.loc[k, "var_s"] == pytest.approx(var_s, rel=1e-12)
        assert got.loc[k, "z"] == pytest.approx(z, rel=1e-12)
        assert got.loc[k, "p_value"] == pytest.approx(p, rel=1e-12)
        assert got.loc[k, "tau_b"] == pytest.approx(s / den, rel=1e-12)


def test_verdicts_and_slope_recovery(corpus):
    got = mann_kendall(corpus).toPandas().set_index("source")
    assert got.loc["up", "trend"] == "increasing"
    assert got.loc["down", "trend"] == "decreasing"
    assert got.loc["flat", "trend"] == "no_trend"
    assert got.loc["steps", "trend"] == "increasing"
    # Sen slope per second * step -> per-bucket slope near the plant
    assert got.loc["up", "sen_slope"] * STEP == pytest.approx(0.5, abs=0.1)
    assert got.loc["down", "sen_slope"] * STEP == pytest.approx(-0.3, abs=0.1)
    # n < 3: undefined, all NULL
    tiny = got.loc["tiny"]
    assert tiny["n"] == 2 and pd.isna(tiny["p_value"]) and tiny["trend"] is None


def test_guards(spark, corpus):
    with pytest.raises(ValueError, match="alpha"):
        mann_kendall(corpus, alpha=1.5)
    with pytest.raises(Exception, match="max_points"):
        mann_kendall(corpus, max_points=10).toPandas()


def test_seasonal_mk_matches_duckdb_and_beats_plain_on_seasonal_trend(spark, duck):
    from timeseriesvectordbpattermatcher_spark.operators.trendtest import (
        seasonal_mann_kendall,
    )

    rng = np.random.default_rng(3)
    t = np.arange(144)
    y = 0.05 * t + 8.0 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.8, 144)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(t * STEP, unit="s")
    df = spark.createDataFrame(
        pd.DataFrame({"source": "s", "bucket_ts": ts, "val": np.round(y, 6)})
    )
    P = 12
    got = seasonal_mann_kendall(df, P).toPandas().iloc[0]
    # DuckDB recomputes S' with its own within-season pairwise join
    duck.register("smk", df.toPandas())
    want_s = duck.sql(f"""
        WITH s AS (
          SELECT epoch(bucket_ts)::DOUBLE t, val::DOUBLE x,
                 (row_number() OVER (ORDER BY bucket_ts) - 1) % {P} AS g
          FROM smk)
        SELECT sum(sign(b.x - a.x))::BIGINT
        FROM s a JOIN s b ON b.g = a.g AND b.t > a.t
    """).df().iloc[0, 0]
    assert got["s_stat"] == want_s
    # python replay of Var' = sum of per-season tie-corrected variances
    var_tot = 0.0
    for g in range(P):
        xg = y[g::P]
        n = len(xg)
        _, c = np.unique(xg, return_counts=True)
        c = c[c > 1].astype(float)
        var_tot += (n * (n - 1) * (2 * n + 5)
                    - float((c * (c - 1) * (2 * c + 5)).sum())) / 18.0
    assert got["var_s"] == pytest.approx(var_tot, rel=1e-12)
    z = ((got["s_stat"] - 1) / math.sqrt(var_tot) if got["s_stat"] > 0
         else (got["s_stat"] + 1) / math.sqrt(var_tot) if got["s_stat"] < 0
         else 0.0)
    assert got["z"] == pytest.approx(z, rel=1e-12)
    assert got["trend"] == "increasing"
    # the within-season Sen slope recovers the planted trend despite the
    # 160x-larger seasonal swing
    assert got["sen_slope"] * STEP == pytest.approx(0.05, rel=0.35)
    with pytest.raises(ValueError, match="period"):
        seasonal_mann_kendall(df, 1)
