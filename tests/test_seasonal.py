"""Seasonal decomposition (operators/seasonal.py).

Oracles:
- full-column parity: DuckDB recomputes phase, trend (half-weight
  endpoint MA for even periods, plain centered MA for odd), centered
  phase means, and residuals with the same formulas via window SQL;
- structure: additive reconstruction, zero-sum seasonal, NULL-trend edge
  counts, planted spike flagged by residual_anomalies while the raw
  seasonal swing (much larger than the spike) is not.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from timeseriesvectordbpattermatcher_spark.operators.seasonal import (
    residual_anomalies,
    seasonal_decompose,
)

PERIOD = 12


def _pdf() -> pd.DataFrame:
    rng = np.random.default_rng(3)
    frames = []
    for k, key in enumerate(("a", "b")):
        n = 150
        t = np.arange(n)
        x = (
            10.0 + 0.05 * t                      # trend
            + 4.0 * np.sin(2 * np.pi * t / PERIOD + k)  # seasonal swing
            + rng.normal(0, 0.15, n)             # noise
        )
        x[77] += 5.0  # planted anomaly, far below the seasonal amplitude
        frames.append(pd.DataFrame({
            "source": key,
            "bucket_ts": pd.date_range("2024-05-01", periods=n, freq="h"),
            "avg_n_tok": x,
        }))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def series(spark):
    df = spark.createDataFrame(_pdf()).cache()
    df.count()
    yield df
    df.unpersist()


def _duck_decompose(duck, pdf: pd.DataFrame, period: int) -> pd.DataFrame:
    half = period // 2
    if period % 2 == 0:
        trend = f"""
          CASE WHEN count(value) OVER w_ma = {period + 1}
               THEN (sum(value) OVER w_ma
                     - (lag(value, {half}) OVER w_ord
                        + lead(value, {half}) OVER w_ord) / 2.0) / {period}
          END"""
    else:
        trend = f"""
          CASE WHEN count(value) OVER w_ma = {period}
               THEN sum(value) OVER w_ma / {period} END"""
    duck.register("seas_raw", pdf)
    return duck.sql(f"""
        WITH pts AS (
          SELECT source AS key, bucket_ts AS ts,
                 CAST(avg_n_tok AS DOUBLE) AS value,
                 row_number() OVER (PARTITION BY source ORDER BY bucket_ts) - 1 AS i
          FROM seas_raw
          WHERE bucket_ts IS NOT NULL AND avg_n_tok IS NOT NULL
        ), trended AS (
          SELECT key, ts, value, CAST(i % {period} AS INT) AS phase,
                 {trend} AS trend
          FROM pts
          WINDOW w_ord AS (PARTITION BY key ORDER BY i),
                 w_ma AS (PARTITION BY key ORDER BY i
                          ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)
        ), pm AS (
          SELECT key, phase, avg(value - trend) AS pmean
          FROM trended GROUP BY 1, 2
        ), seas AS (
          SELECT key, phase,
                 pmean - avg(pmean) OVER (PARTITION BY key) AS seasonal
          FROM pm
        )
        SELECT t.key AS source, t.ts AS bucket_ts, t.value, t.phase,
               t.trend, s.seasonal,
               t.value - t.trend - s.seasonal AS resid
        FROM trended t LEFT JOIN seas s USING (key, phase)
        ORDER BY 1, 2
    """).df()


@pytest.mark.parametrize("period", [PERIOD, 7])
def test_decompose_matches_duckdb(series, duck, period):
    got = (
        seasonal_decompose(series, period)
        .toPandas().sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    )
    want = _duck_decompose(duck, _pdf(), period)
    assert len(got) == len(want)
    got["phase"] = got["phase"].astype(want["phase"].dtype)
    pd.testing.assert_frame_equal(
        got, want, check_exact=False, rtol=1e-10, atol=1e-10
    )


def test_structure(series):
    d = seasonal_decompose(series, PERIOD).toPandas()
    # additive reconstruction wherever all parts exist
    full = d.dropna(subset=["trend", "seasonal", "resid"])
    np.testing.assert_allclose(
        full["value"], full["trend"] + full["seasonal"] + full["resid"],
        atol=1e-9,
    )
    # seasonal components sum to ~0 over one period per key
    for _, g in d.groupby("source"):
        season = g.drop_duplicates("phase")["seasonal"]
        assert abs(season.sum()) < 1e-9
        # even period: exactly period NULL-trend edge rows (half per side)
        assert g["trend"].isna().sum() == PERIOD


def test_planted_anomaly_flagged_seasonal_swing_not(series):
    d = seasonal_decompose(series, PERIOD)
    flagged = residual_anomalies(d, z=4.0).toPandas()
    assert len(flagged) > 0
    for _, r in flagged.iterrows():
        # only the planted spike (position 77 in each key's series)
        assert r["bucket_ts"] == pd.Timestamp("2024-05-01") + pd.Timedelta(hours=77)
    assert set(flagged["source"]) == {"a", "b"}
    # sanity: raw z-score would flag the whole seasonal swing instead
    raw = _pdf()
    for _, g in raw.groupby("source"):
        v = g["avg_n_tok"]
        assert ((v - v.mean()).abs() > 4.0 * v.std()).sum() == 0  # spike hidden


def test_short_series_gets_null_model(spark):
    pdf = pd.DataFrame({
        "source": "tiny",
        "bucket_ts": pd.date_range("2024-01-01", periods=PERIOD // 2, freq="h"),
        "avg_n_tok": np.arange(PERIOD // 2, dtype=float),
    })
    out = seasonal_decompose(spark.createDataFrame(pdf), PERIOD).toPandas()
    assert len(out) == PERIOD // 2
    assert out["trend"].isna().all()
    assert out["seasonal"].isna().all() and out["resid"].isna().all()


def test_guards(series):
    with pytest.raises(ValueError):
        seasonal_decompose(series, 1)
    with pytest.raises(ValueError):
        residual_anomalies(seasonal_decompose(series, PERIOD), z=0.0)


def test_plan_broadcasts_phase_table(series):
    plan = (
        seasonal_decompose(series, PERIOD)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
