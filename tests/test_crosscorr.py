"""Cross-series correlation (operators/crosscorr.py).

Oracles:
- DuckDB recomputes the full CCF grid with its own lag join + corr()
  aggregate (different engine, same definition) — values match 1e-9;
- a planted lead-lag pair (k2 is k1 delayed 3 buckets) recovers
  best_lag == +3 with corr ~ 1;
- the mirror identity ccf(k1,k2,lag) == ccf(k2,k1,-lag) holds exactly;
- rolling_corr matches DuckDB's windowed corr() with the min_periods
  gate; constant windows and short overlaps yield NULL, never NaN.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from timeseriesvectordbpattermatcher_spark.operators.crosscorr import (
    best_lag,
    cross_correlation,
    rolling_corr,
)

STEP = 60
N = 120
LAG = 3


def _pdf():
    rng = np.random.default_rng(17)
    t = pd.date_range("2024-05-01", periods=N, freq="min")
    base = np.cumsum(rng.standard_normal(N)) + 10
    frames = [
        pd.DataFrame({"source": "a", "bucket_ts": t, "v": base}),
        # b is a delayed by LAG buckets (+ tiny noise): a LEADS b
        pd.DataFrame(
            {
                "source": "b",
                "bucket_ts": t,
                "v": np.roll(base, LAG) + 0.01 * rng.standard_normal(N),
            }
        ).iloc[LAG:],  # drop the wrapped head
        pd.DataFrame(
            {
                "source": "c",
                "bucket_ts": t,
                "v": np.cumsum(rng.standard_normal(N)) - 5,
            }
        ),
    ]
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def series(spark):
    df = spark.createDataFrame(
        _pdf(), "source string, bucket_ts timestamp, v double"
    ).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def ccf(series):
    out = cross_correlation(
        series, "v", max_lag=6, step_sec=STEP
    ).cache()
    out.count()
    yield out
    out.unpersist()


def test_ccf_matches_duckdb(ccf, duck):
    duck.register("raw_cc", _pdf())
    want = duck.sql(f"""
        WITH pts AS (
          SELECT source AS k, epoch(bucket_ts)::BIGINT AS u, v
          FROM raw_cc WHERE v IS NOT NULL
        ),
        lags AS (SELECT range AS lag FROM range(-6, 7)),
        j AS (
          SELECT a.k AS k1, b.k AS k2, l.lag, a.v AS x, b.v AS y
          FROM pts a CROSS JOIN lags l
          JOIN pts b ON b.u = a.u + l.lag * {STEP}
          WHERE a.k <> b.k
        )
        SELECT k1, k2, lag, count(*) AS n, corr(x, y) AS corr
        FROM j GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df()
    got = ccf.orderBy("k1", "k2", "lag").toPandas()
    assert len(got) == len(want)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    gn, wn = got["corr"].isna(), want["corr"].isna()
    assert (gn == wn).all()
    np.testing.assert_allclose(
        got.loc[~gn, "corr"], want.loc[~wn, "corr"], atol=1e-9
    )


def test_planted_lead_lag_recovered(ccf):
    top = {
        (r["k1"], r["k2"]): r for r in best_lag(ccf, min_n=30).collect()
    }
    ab = top[("a", "b")]
    assert ab["lag"] == LAG and ab["corr"] > 0.99
    ba = top[("b", "a")]
    assert ba["lag"] == -LAG and ba["corr"] > 0.99
    # unrelated walk should not beat the planted pair's correlation
    assert abs(top[("a", "c")]["corr"]) < ab["corr"]


def test_mirror_identity(ccf):
    rows = ccf.collect()
    idx = {(r["k1"], r["k2"], r["lag"]): r for r in rows}
    for (k1, k2, lag), r in idx.items():
        m = idx[(k2, k1, -lag)]
        assert m["n"] == r["n"]
        if r["corr"] is None:
            assert m["corr"] is None
        else:
            assert m["corr"] == pytest.approx(r["corr"], abs=1e-12)


def test_pairs_filter_and_validation(series):
    only = cross_correlation(
        series, "v", max_lag=2, step_sec=STEP, pairs=[("a", "b")]
    ).toPandas()
    assert set(zip(only["k1"], only["k2"])) == {("a", "b")}
    assert len(only) == 5  # lags -2..2
    with pytest.raises(ValueError):
        cross_correlation(series, "v", max_lag=-1)
    with pytest.raises(ValueError):
        cross_correlation(series, "v", step_sec=0)
    with pytest.raises(ValueError):
        rolling_corr(series, "v", "v", window=1)


def test_constant_and_short_overlap_null(spark):
    t = pd.date_range("2024-01-01", periods=10, freq="min")
    pdf = pd.concat([
        pd.DataFrame({"source": "x", "bucket_ts": t, "v": np.arange(10.0)}),
        pd.DataFrame({"source": "flat", "bucket_ts": t, "v": 5.0}),
        pd.DataFrame({"source": "one", "bucket_ts": t[:1], "v": 1.0}),
    ])
    df = spark.createDataFrame(pdf, "source string, bucket_ts timestamp, v double")
    out = cross_correlation(df, "v", max_lag=1, step_sec=STEP).toPandas()
    flat = out[(out["k1"] == "x") & (out["k2"] == "flat")]
    assert flat["corr"].isna().all()  # constant side -> NULL, not NaN
    one = out[(out["k1"] == "x") & (out["k2"] == "one")]
    assert one["corr"].isna().all()  # n == 1 -> NULL


def test_rolling_corr_matches_duckdb(series, duck):
    two = series.filter("source = 'a'").selectExpr(
        "source", "bucket_ts", "v as x", "v * v + 3 as y"
    )
    got = (
        rolling_corr(two, "x", "y", window=12, min_periods=12)
        .orderBy("bucket_ts")
        .toPandas()
    )
    duck.register("raw_rc", got[["source", "bucket_ts", "x", "y"]])
    want = duck.sql("""
        SELECT bucket_ts,
               CASE WHEN count(*) OVER w >= 12 THEN corr(x, y) OVER w END AS rc
        FROM raw_rc
        WINDOW w AS (PARTITION BY source ORDER BY bucket_ts
                     ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
        ORDER BY bucket_ts
    """).df()
    gn, wn = got["roll_corr"].isna(), want["rc"].isna()
    assert (gn.to_numpy() == wn.to_numpy()).all()
    np.testing.assert_allclose(
        got.loc[~gn, "roll_corr"], want.loc[~wn, "rc"], atol=1e-9
    )


def test_rolling_corr_null_pairs_excluded(spark):
    pdf = pd.DataFrame({
        "source": "s",
        "bucket_ts": pd.date_range("2024-01-01", periods=6, freq="min"),
        "x": [1.0, 2.0, None, 4.0, 5.0, 6.0],
        "y": [2.0, 4.0, 9.0, 8.0, None, 12.0],
    })
    df = spark.createDataFrame(pdf)
    out = (
        rolling_corr(df, "x", "y", window=3, min_periods=2)
        .orderBy("bucket_ts")
        .toPandas()
    )
    # window at row 3 (rows 1..3): pairs (2,4),(4,8) complete -> corr 1
    assert out["roll_corr"].iloc[3] == pytest.approx(1.0)
    # window at row 4 (rows 2..4): only (4,8) complete -> below min_periods
    assert pd.isna(out["roll_corr"].iloc[4])
