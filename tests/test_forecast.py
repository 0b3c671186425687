"""Holt-Winters (operators/forecast.py).

Oracles:
- recursion parity: an engine-free pure-python transcription of the
  published additive Holt-Winters equations (classical two-cycle
  initialization) reproduces every fit row and every forecast row;
- behavior: on a clean trend+seasonal signal the h-step forecasts land
  near truth, residuals are centered; short series produce no rows;
  parameter guards raise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from timeseriesvectordbpattermatcher_spark.operators.forecast import (
    holt_winters,
    holt_winters_fit,
)

P = 12
A, B, G = 0.4, 0.15, 0.25


def _pure_hw(y, period, alpha, beta, gamma, horizon):
    level = float(np.mean(y[:period]))
    trend = float((np.mean(y[period: 2 * period]) - np.mean(y[:period])) / period)
    season = list(np.asarray(y[:period], dtype=float) - np.mean(y[:period]))
    fits = []
    for t in range(period, len(y)):
        s = t % period
        fitted = level + trend + season[s]
        new_level = alpha * (y[t] - season[s]) + (1 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1 - beta) * trend
        season[s] = gamma * (y[t] - new_level) + (1 - gamma) * season[s]
        level = new_level
        fits.append((y[t], fitted, y[t] - fitted, level, trend, season[s]))
    fcs = [
        level + h * trend + season[(len(y) - 1 + h) % period]
        for h in range(1, horizon + 1)
    ]
    return fits, fcs


def _pdf():
    rng = np.random.default_rng(11)
    frames = []
    for k, key in enumerate(("x", "y")):
        n = 120
        t = np.arange(n)
        vals = 20 + 0.3 * t + 5 * np.sin(2 * np.pi * t / P + k) \
            + rng.normal(0, 0.2, n)
        frames.append(pd.DataFrame({
            "source": key,
            "bucket_ts": pd.date_range("2024-06-01", periods=n, freq="h"),
            "avg_n_tok": vals,
        }))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def series(spark):
    df = spark.createDataFrame(_pdf()).cache()
    df.count()
    yield df
    df.unpersist()


def test_fit_and_forecast_match_pure_python(series):
    H = 18
    out = (
        holt_winters(series, P, A, B, G, horizon=H)
        .toPandas().sort_values(["source", "kind", "ts"])
    )
    raw = _pdf()
    for key, g in raw.groupby("source"):
        y = g["avg_n_tok"].to_numpy()
        fits, fcs = _pure_hw(y, P, A, B, G, H)
        got_fit = out[(out["source"] == key) & (out["kind"] == "fit")]
        assert len(got_fit) == len(fits) == len(y) - P
        want = np.array(fits)
        np.testing.assert_allclose(got_fit["y"].to_numpy(), want[:, 0], atol=1e-10)
        np.testing.assert_allclose(got_fit["yhat"].to_numpy(), want[:, 1], atol=1e-10)
        np.testing.assert_allclose(got_fit["resid"].to_numpy(), want[:, 2], atol=1e-10)
        np.testing.assert_allclose(got_fit["level"].to_numpy(), want[:, 3], atol=1e-10)
        np.testing.assert_allclose(got_fit["trend"].to_numpy(), want[:, 4], atol=1e-10)
        np.testing.assert_allclose(got_fit["season"].to_numpy(), want[:, 5], atol=1e-10)
        got_fc = out[(out["source"] == key) & (out["kind"] == "forecast")]
        assert len(got_fc) == H
        np.testing.assert_allclose(got_fc["yhat"].to_numpy(), fcs, atol=1e-10)
        # forecast timestamps continue at the hourly step
        assert (got_fc["ts"].diff().dropna() == pd.Timedelta(hours=1)).all()
        assert got_fc["ts"].iloc[0] == g["bucket_ts"].iloc[-1] + pd.Timedelta(hours=1)


def test_forecast_tracks_clean_signal(series):
    H = P
    out = holt_winters(series, P, A, B, G, horizon=H).toPandas()
    raw = _pdf()
    for key, g in raw.groupby("source"):
        # extrapolate the clean generator past the end and compare
        n = len(g)
        t = np.arange(n, n + H)
        k = 0 if key == "x" else 1
        truth = 20 + 0.3 * t + 5 * np.sin(2 * np.pi * t / P + k)
        fc = out[(out["source"] == key) & (out["kind"] == "forecast")]
        err = np.abs(fc.sort_values("ts")["yhat"].to_numpy() - truth)
        # fixed (unoptimized) params: ~1.0 mean error vs a 5-amplitude
        # swing + growing trend — the model tracks, it doesn't interpolate
        assert err.mean() < 1.5, (key, err.mean())
    fit = out[out["kind"] == "fit"]
    assert abs(fit["resid"].mean()) < 0.2


def test_short_series_no_rows(spark):
    pdf = pd.DataFrame({
        "source": "t",
        "bucket_ts": pd.date_range("2024-01-01", periods=2 * P - 1, freq="h"),
        "avg_n_tok": np.arange(2 * P - 1, dtype=float),
    })
    assert holt_winters(spark.createDataFrame(pdf), P).count() == 0


def test_guards(series):
    with pytest.raises(ValueError):
        holt_winters(series, 1)
    with pytest.raises(ValueError):
        holt_winters(series, P, alpha=0.0)
    with pytest.raises(ValueError):
        holt_winters(series, P, gamma=1.5)
    with pytest.raises(ValueError):
        holt_winters(series, P, horizon=-1)
    with pytest.raises(ValueError):
        holt_winters_fit(series, P, alphas=())
    with pytest.raises(ValueError):
        holt_winters_fit(series, P, betas=(0.0,))


GRID_A, GRID_B, GRID_G = (0.2, 0.4, 0.8), (0.1, 0.3), (0.1, 0.3)


def _python_grid_argmin(y):
    best = None
    for a in GRID_A:
        for b in GRID_B:
            for g in GRID_G:
                fits, _ = _pure_hw(y, P, a, b, g, 0)
                sse = float(sum(r[2] ** 2 for r in fits))
                cand = (sse, a, b, g)
                if best is None or cand < best:
                    best = cand
    return best


def test_grid_fit_matches_python_argmin(series):
    got = {
        r["source"]: r
        for r in holt_winters_fit(
            series, P, alphas=GRID_A, betas=GRID_B, gammas=GRID_G
        ).collect()
    }
    raw = _pdf()
    assert set(got) == set(raw["source"].unique())
    for key, g in raw.groupby("source"):
        sse, a, b, gm = _python_grid_argmin(g["avg_n_tok"].to_numpy())
        r = got[key]
        assert (r["alpha"], r["beta"], r["gamma"]) == (a, b, gm)
        assert r["sse"] == pytest.approx(sse, rel=1e-10)
        assert r["n_fit"] == len(g) - P


def test_fit_params_feed_back_per_key(series, spark):
    """holt_winters(params=fit) runs each key under ITS OWN winning
    parameters — fitted rows equal the pure-python recursion with that
    key's argmin combo, and a key missing from params drops out."""
    fit = holt_winters_fit(series, P, alphas=GRID_A, betas=GRID_B, gammas=GRID_G)
    out = holt_winters(series, P, params=fit).toPandas()
    raw = _pdf()
    for key, g in raw.groupby("source"):
        _, a, b, gm = _python_grid_argmin(g["avg_n_tok"].to_numpy())
        fits, _ = _pure_hw(g["avg_n_tok"].to_numpy(), P, a, b, gm, 0)
        got = out[out["source"] == key].sort_values("ts")
        np.testing.assert_allclose(
            got["yhat"].to_numpy(), np.array(fits)[:, 1], atol=1e-10
        )
    only_x = fit.filter(fit["source"] == "x")
    sub = holt_winters(series, P, params=only_x).toPandas()
    assert set(sub["source"].unique()) == {"x"}


def test_fit_skips_short_series(spark):
    pdf = pd.DataFrame({
        "source": "t",
        "bucket_ts": pd.date_range("2024-01-01", periods=2 * P - 1, freq="h"),
        "avg_n_tok": np.arange(2 * P - 1, dtype=float),
    })
    assert holt_winters_fit(spark.createDataFrame(pdf), P).count() == 0
