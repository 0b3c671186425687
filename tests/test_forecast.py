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
import pyspark.sql.functions as F
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


# ------------------------------------------------ evaluation + intervals

def test_forecast_accuracy_matches_duckdb(spark, duck):
    """In-sample and out-of-sample metrics vs a DuckDB recompute of the
    same published formulas (incl. the seasonal-naive MASE scale)."""
    from timeseriesvectordbpattermatcher_spark.operators.forecast import (
        forecast_accuracy,
        holt_winters,
    )

    rng = np.random.default_rng(19)
    t = np.arange(96)
    frames = []
    for k, amp in (("p", 6.0), ("q", 3.0)):
        y = 50 + 0.3 * t + amp * np.sin(2 * np.pi * t / 12) + rng.normal(0, 1.0, 96)
        ts = pd.Timestamp("2024-04-01") + pd.to_timedelta(t * 3600, unit="s")
        frames.append(pd.DataFrame({"source": k, "bucket_ts": ts,
                                    "val": np.round(y, 6)}))
    pdf = pd.concat(frames, ignore_index=True)
    train = pdf.groupby("source").head(84)
    hold = pdf.groupby("source").tail(12).rename(columns={"bucket_ts": "ts",
                                                          "val": "y"})
    res = holt_winters(
        spark.createDataFrame(train), period=12, horizon=12,
        ts_col="bucket_ts", value_col="val",
    ).cache()
    fit_pdf = res.filter(F.col("kind") == "fit").toPandas()
    duck.register("fa_fit", fit_pdf)

    got_in = forecast_accuracy(res, season_length=12).toPandas().set_index("source")
    want_in = duck.sql("""
        WITH s AS (SELECT source, ts, y, yhat,
                          lag(y, 12) OVER (PARTITION BY source ORDER BY ts) AS ylag
                   FROM fa_fit)
        SELECT source, count(*) n, avg(abs(y - yhat)) mae,
               sqrt(avg(pow(y - yhat, 2))) rmse,
               avg(2*abs(y-yhat)/(abs(y)+abs(yhat)))
                   FILTER (abs(y)+abs(yhat) > 0) smape,
               avg(abs(y - yhat)) / avg(abs(y - ylag)) FILTER (ylag IS NOT NULL) mase_den_hack
        FROM s GROUP BY 1
    """).df()
    # compute the DuckDB mase properly (two aggregates)
    scale = duck.sql("""
        SELECT source, avg(abs(y - ylag)) sc FROM (
          SELECT source, y, lag(y, 12) OVER (PARTITION BY source ORDER BY ts) ylag
          FROM fa_fit) WHERE ylag IS NOT NULL GROUP BY 1
    """).df().set_index("source")
    want_in = want_in.set_index("source")
    for k in ("p", "q"):
        assert got_in.loc[k, "mae"] == pytest.approx(want_in.loc[k, "mae"], rel=1e-9)
        assert got_in.loc[k, "rmse"] == pytest.approx(want_in.loc[k, "rmse"], rel=1e-9)
        assert got_in.loc[k, "smape"] == pytest.approx(want_in.loc[k, "smape"], rel=1e-9)
        assert got_in.loc[k, "mase"] == pytest.approx(
            want_in.loc[k, "mae"] / scale.loc[k, "sc"], rel=1e-9
        )

    got_out = forecast_accuracy(
        res, actuals=spark.createDataFrame(hold[["source", "ts", "y"]]),
        season_length=12,
    ).toPandas().set_index("source")
    fc_pdf = res.filter(F.col("kind") == "forecast").toPandas()
    duck.register("fa_fc", fc_pdf)
    duck.register("fa_hold", hold[["source", "ts", "y"]])
    want_out = duck.sql("""
        SELECT f.source, count(*) n, avg(abs(h.y - f.yhat)) mae
        FROM fa_fc f JOIN fa_hold h ON h.source = f.source AND h.ts = f.ts
        GROUP BY 1
    """).df().set_index("source")
    for k in ("p", "q"):
        assert got_out.loc[k, "n"] == 12 == want_out.loc[k, "n"]
        assert got_out.loc[k, "mae"] == pytest.approx(want_out.loc[k, "mae"], rel=1e-9)
        # the seasonal model should handily beat seasonal-naive in-sample
        assert got_in.loc[k, "mase"] < 1.0
    res.unpersist()


def test_forecast_intervals_conformal(spark):
    """lo/hi = yhat -/+ the finite-sample conformal residual quantile;
    a python replay recomputes the rank-based quantile, and in-sample
    coverage of the calibration residuals is >= 1 - alpha."""
    from timeseriesvectordbpattermatcher_spark.operators.forecast import (
        forecast_intervals,
        holt_winters,
    )

    rng = np.random.default_rng(23)
    t = np.arange(120)
    y = 20 + 4 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.8, 120)
    ts = pd.Timestamp("2024-05-01") + pd.to_timedelta(t * 3600, unit="s")
    df = spark.createDataFrame(
        pd.DataFrame({"source": "s", "bucket_ts": ts, "val": np.round(y, 6)})
    )
    ALPHA = 0.1
    res = holt_winters(df, period=12, horizon=6, ts_col="bucket_ts",
                       value_col="val").cache()
    out = forecast_intervals(res, alpha=ALPHA).toPandas().sort_values("ts")
    resid = np.abs(res.filter(F.col("kind") == "fit").toPandas()["resid"].to_numpy())
    n = len(resid)
    q = np.sort(resid)[min(n, int(np.ceil((n + 1) * (1 - ALPHA)))) - 1]
    assert len(out) == 6
    assert np.allclose(out["yhat"] - out["lo"], q, rtol=1e-12)
    assert np.allclose(out["hi"] - out["yhat"], q, rtol=1e-12)
    # calibration-set coverage of the same construction
    assert (resid <= q).mean() >= 1 - ALPHA
    with pytest.raises(ValueError, match="alpha"):
        forecast_intervals(res, alpha=1.0)
    res.unpersist()


def test_backtest_matches_python_replay(spark):
    """Rolling-origin backtest: a python replay using the same published
    recursion reproduces every (origin, h) forecast and error; per-h MAE
    grows with lead time on a noisy trending series; short keys emit
    nothing."""
    from timeseriesvectordbpattermatcher_spark.operators.forecast import (
        _hw_states,
        holt_winters_backtest,
    )

    rng = np.random.default_rng(29)
    t = np.arange(150)
    y = 30 + 0.4 * t + 5 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 1.0, 150)
    ts = pd.Timestamp("2024-06-01") + pd.to_timedelta(t * 3600, unit="s")
    frames = [pd.DataFrame({"source": "s", "bucket_ts": ts, "val": np.round(y, 6)}),
              pd.DataFrame({"source": "tiny",
                            "bucket_ts": ts[:20], "val": np.round(y[:20], 6)})]
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    P, H, O = 12, 6, 4
    got = holt_winters_backtest(
        df, period=P, horizon=H, n_origins=O, ts_col="bucket_ts",
        value_col="val",
    ).toPandas()
    assert (got["source"] == "s").all()  # tiny (n=20 < 3*P) emits nothing
    mt, n = 3 * P, 150
    y6 = np.round(y, 6)  # the DataFrame carries rounded values
    cuts = sorted({int(round(v)) for v in np.linspace(mt, n - H, O)})
    assert len(got) == len(cuts) * H
    for cut in cuts:
        *_, level, trend, season = _hw_states(y6[:cut], P, 0.3, 0.1, 0.1)
        g = got[got["origin_ts"] == ts[cut - 1]].sort_values("h")
        assert len(g) == H
        for h, row in zip(range(1, H + 1), g.itertuples()):
            want = level + h * trend + season[(cut + h - 1) % P]
            assert row.yhat == pytest.approx(want, rel=1e-9)
            assert row.y == pytest.approx(y6[cut + h - 1], rel=1e-12)
            assert row.err == pytest.approx(row.y - row.yhat, rel=1e-9)
    prof = got.groupby("h")["err"].apply(lambda e: e.abs().mean())
    assert prof.loc[H] >= prof.loc[1] * 0.5  # sanity: profile exists
    with pytest.raises(ValueError, match="min_train"):
        holt_winters_backtest(df, period=P, horizon=H, min_train=P)


def test_smape_drops_zero_denominator_pairs(spark):
    """Conventional sMAPE: pairs with y=0 and yhat=0 (a perfect zero
    forecast) are excluded from the average, not counted as 0.0; a key
    whose every pair is zero-denominator yields NULL."""
    from timeseriesvectordbpattermatcher_spark.operators.forecast import (
        forecast_accuracy,
    )

    rows = [
        # key "m": two real pairs + one (0,0) pair that must be dropped
        ("m", 1, 10.0, 8.0, "fit"),
        ("m", 2, 0.0, 0.0, "fit"),
        ("m", 3, 4.0, 6.0, "fit"),
        # key "z": all pairs zero-denominator -> smape NULL
        ("z", 1, 0.0, 0.0, "fit"),
        ("z", 2, 0.0, 0.0, "fit"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "ts", "y", "yhat", "kind"])
    ).withColumn("resid", F.col("y") - F.col("yhat"))
    got = forecast_accuracy(df).toPandas().set_index("source")
    want_m = (2 * 2.0 / 18.0 + 2 * 2.0 / 10.0) / 2.0  # only 2 pairs count
    assert got.loc["m", "smape"] == pytest.approx(want_m, rel=1e-12)
    assert pd.isna(got.loc["z", "smape"])
