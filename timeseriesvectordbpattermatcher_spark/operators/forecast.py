"""Holt-Winters exponential smoothing: in-sample fit + h-step forecasts.

The engine's only forward-looking read so far is the box forecast
(operators/boxes.py — the reference's geometric box projection). This
adds the standard statistical baseline: additive Holt-Winters (triple
exponential smoothing, Winters 1960; the additive-seasonal form in
Hyndman & Athanasopoulos, "Forecasting: Principles and Practice"):

    level_t  = alpha * (y_t - season_{t-p}) + (1-alpha) * (level_{t-1} + trend_{t-1})
    trend_t  = beta * (level_t - level_{t-1}) + (1-beta) * trend_{t-1}
    season_t = gamma * (y_t - level_t) + (1-gamma) * season_{t-p}
    fitted_t = level_{t-1} + trend_{t-1} + season_{t-p}   (one-step-ahead)
    yhat_{T+h} = level_T + h * trend_T + season_{T+h-p*ceil(h/p)}

Initialization is the classical convention: level_0 = mean of the first
period, trend_0 = mean slope between the first two periods, seasonal_0
= first-period values minus their mean. Parameters are EXPLICIT inputs
(``alpha``/``beta``/``gamma``): parameter search is an estimation
problem callers own; given parameters, the transform is deterministic
and exactly reproducible by the engine-free oracle.

The recursion is inherently sequential per key, so this is a grouped
``applyInPandas`` kernel — the distribution axis is the KEY count (one
task per series), same contract as the matrix profile. Series length is
rollup-tier scale (minutes), and the recursion is O(n) with a numpy
inner state, so a million-point series is milliseconds; no max_points
guard needed.

``holt_winters(..., horizon=h)`` emits BOTH row kinds in one frame:
``kind='fit'`` rows (ts, y, fitted, resid, level, trend, season) for
every in-sample point from the second period on, and ``kind='forecast'``
rows (ts extrapolated at the series' median step, yhat) for h steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["holt_winters"]


def _hw_kernel(period: int, alpha: float, beta: float, gamma: float,
               horizon: int):
    def run(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("ts").reset_index(drop=True)
        key = pdf["key"].iloc[0] if len(pdf) else None
        y = pdf["val"].to_numpy(dtype=np.float64)
        n = len(y)
        empty = pd.DataFrame({
            "key": pd.Series([], dtype=pdf["key"].dtype),
            "kind": pd.Series([], dtype="object"),
            "ts": pd.Series([], dtype=pdf["ts"].dtype),
            "y": pd.Series([], dtype="float64"),
            "yhat": pd.Series([], dtype="float64"),
            "resid": pd.Series([], dtype="float64"),
            "level": pd.Series([], dtype="float64"),
            "trend": pd.Series([], dtype="float64"),
            "season": pd.Series([], dtype="float64"),
        })
        if n < 2 * period:  # need two full cycles to initialize
            return empty
        level = float(y[:period].mean())
        trend = float((y[period: 2 * period].mean() - y[:period].mean()) / period)
        season = (y[:period] - y[:period].mean()).astype(np.float64)
        rows_ts, rows_y, rows_hat = [], [], []
        rows_res, rows_l, rows_b, rows_s = [], [], [], []
        for t in range(period, n):
            s_idx = t % period
            prev_l, prev_b = level, trend
            fitted = prev_l + prev_b + season[s_idx]
            level = alpha * (y[t] - season[s_idx]) + (1 - alpha) * (prev_l + prev_b)
            trend = beta * (level - prev_l) + (1 - beta) * prev_b
            season[s_idx] = gamma * (y[t] - level) + (1 - gamma) * season[s_idx]
            rows_ts.append(pdf["ts"].iloc[t])
            rows_y.append(y[t])
            rows_hat.append(fitted)
            rows_res.append(y[t] - fitted)
            rows_l.append(level)
            rows_b.append(trend)
            rows_s.append(season[s_idx])
        fit = pd.DataFrame({
            "key": key, "kind": "fit", "ts": rows_ts, "y": rows_y,
            "yhat": rows_hat, "resid": rows_res, "level": rows_l,
            "trend": rows_b, "season": rows_s,
        })
        if horizon <= 0:
            return fit
        ts = pd.to_datetime(pdf["ts"])
        step = ts.diff().dropna().median()
        last_ts = ts.iloc[-1]
        f_ts, f_hat, f_season = [], [], []
        for h in range(1, horizon + 1):
            s_idx = (n - 1 + h) % period
            f_ts.append(last_ts + h * step)
            f_hat.append(level + h * trend + season[s_idx])
            f_season.append(season[s_idx])
        fc = pd.DataFrame({
            "key": key, "kind": "forecast", "ts": f_ts,
            "y": np.nan, "yhat": f_hat, "resid": np.nan,
            "level": level, "trend": trend, "season": f_season,
        })
        return pd.concat([fit, fc], ignore_index=True)

    return run


def holt_winters(
    series: DataFrame,
    period: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    horizon: int = 0,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    value_col: str = "avg_n_tok",
) -> DataFrame:
    """Additive Holt-Winters per key. Returns ``kind='fit'`` rows (from
    the second period on: y, one-step-ahead yhat, resid, and the level/
    trend/season states AFTER absorbing that point) plus, when
    ``horizon > 0``, ``kind='forecast'`` rows at the series' median time
    step. Keys with fewer than ``2 * period`` points yield no rows (the
    classical initialization needs two full cycles). NULL values/
    timestamps are excluded before fitting — the recursion is positional,
    so gap-fill upstream if cycles must stay wall-clock aligned."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    for name, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not (0.0 < v <= 1.0):
            raise ValueError(f"{name} must be in (0, 1], got {v}")
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    pts = series.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("val"),
    )
    out_schema = (
        f"key {series.schema[key_col].dataType.simpleString()}, "
        f"kind string, ts {series.schema[ts_col].dataType.simpleString()}, "
        "y double, yhat double, resid double, "
        "level double, trend double, season double"
    )
    out = pts.groupBy("key").applyInPandas(
        _hw_kernel(period, float(alpha), float(beta), float(gamma), horizon),
        out_schema,
    )
    return out.withColumnRenamed("key", key_col)
