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
(``alpha``/``beta``/``gamma``) so the transform is deterministic and
exactly reproducible by the engine-free oracle; when the caller wants
them chosen, :func:`holt_winters_fit` runs the standard grid search as
a DISTRIBUTED job — the (alpha, beta, gamma) grid broadcast-crossJoins
onto the series so every (key, combo) SSE evaluation is its own task,
and the per-key argmin is a struct-min aggregate — then feeds back in
via ``holt_winters(..., params=...)`` (per-key parameters joined onto
the series, read by the same kernel).

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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["holt_winters", "holt_winters_fit", "forecast_accuracy", "forecast_intervals", "holt_winters_backtest"]


def _hw_states(y, period: int, alpha: float, beta: float, gamma: float):
    """Run the recursion over ``y`` (numpy, len >= 2*period). Returns
    (fitted[period:], levels, trends, seasons_after, level_T, trend_T,
    season_state) — the single source of truth both the emit kernel and
    the SSE grid kernel call, so fit and search can never disagree."""
    import numpy as np

    level = float(y[:period].mean())
    trend = float((y[period: 2 * period].mean() - y[:period].mean()) / period)
    season = (y[:period] - y[:period].mean()).astype(np.float64)
    n = len(y)
    m = n - period
    fitted = np.empty(m)
    levels = np.empty(m)
    trends = np.empty(m)
    seasons = np.empty(m)
    for t in range(period, n):
        s_idx = t % period
        prev_l, prev_b = level, trend
        fitted[t - period] = prev_l + prev_b + season[s_idx]
        level = alpha * (y[t] - season[s_idx]) + (1 - alpha) * (prev_l + prev_b)
        trend = beta * (level - prev_l) + (1 - beta) * prev_b
        season[s_idx] = gamma * (y[t] - level) + (1 - gamma) * season[s_idx]
        levels[t - period] = level
        trends[t - period] = trend
        seasons[t - period] = season[s_idx]
    return fitted, levels, trends, seasons, level, trend, season


def _hw_kernel(period: int, alpha: float | None, beta: float | None,
               gamma: float | None, horizon: int, from_cols: bool = False):
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
        if from_cols:
            a = float(pdf["alpha"].iloc[0])
            b = float(pdf["beta"].iloc[0])
            g = float(pdf["gamma"].iloc[0])
        else:
            a, b, g = alpha, beta, gamma
        fitted, levels, trends, seasons, level, trend, season = _hw_states(
            y, period, a, b, g
        )
        fit = pd.DataFrame({
            "key": key, "kind": "fit", "ts": pdf["ts"].iloc[period:].to_numpy(),
            "y": y[period:], "yhat": fitted, "resid": y[period:] - fitted,
            "level": levels, "trend": trends, "season": seasons,
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
    params: DataFrame | None = None,
) -> DataFrame:
    """Additive Holt-Winters per key. Returns ``kind='fit'`` rows (from
    the second period on: y, one-step-ahead yhat, resid, and the level/
    trend/season states AFTER absorbing that point) plus, when
    ``horizon > 0``, ``kind='forecast'`` rows at the series' median time
    step. Keys with fewer than ``2 * period`` points yield no rows (the
    classical initialization needs two full cycles). NULL values/
    timestamps are excluded before fitting — the recursion is positional,
    so gap-fill upstream if cycles must stay wall-clock aligned.

    ``params`` optionally supplies PER-KEY smoothing parameters — a frame
    with (``key_col``, alpha, beta, gamma), e.g. the output of
    :func:`holt_winters_fit` — replacing the scalar arguments; keys
    absent from ``params`` are dropped (inner join: no silent fallback to
    the scalars)."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if params is None:
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
    if params is not None:
        p = params.select(
            F.col(key_col).alias("key"),
            F.col("alpha").cast("double").alias("alpha"),
            F.col("beta").cast("double").alias("beta"),
            F.col("gamma").cast("double").alias("gamma"),
        )
        pts = pts.join(F.broadcast(p), "key")
        kern = _hw_kernel(period, None, None, None, horizon, from_cols=True)
    else:
        kern = _hw_kernel(period, float(alpha), float(beta), float(gamma), horizon)
    out = pts.groupBy("key").applyInPandas(kern, out_schema)
    return out.withColumnRenamed("key", key_col)


def _hw_sse_kernel(period: int):
    def run(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("ts").reset_index(drop=True)
        cols = {
            "key": pd.Series([], dtype=pdf["key"].dtype),
            "alpha": pd.Series([], dtype="float64"),
            "beta": pd.Series([], dtype="float64"),
            "gamma": pd.Series([], dtype="float64"),
            "sse": pd.Series([], dtype="float64"),
            "n_fit": pd.Series([], dtype="int64"),
        }
        y = pdf["val"].to_numpy(dtype=np.float64)
        if len(y) < 2 * period:
            return pd.DataFrame(cols)
        a = float(pdf["alpha"].iloc[0])
        b = float(pdf["beta"].iloc[0])
        g = float(pdf["gamma"].iloc[0])
        fitted, *_ = _hw_states(y, period, a, b, g)
        resid = y[period:] - fitted
        return pd.DataFrame({
            "key": [pdf["key"].iloc[0]],
            "alpha": [a], "beta": [b], "gamma": [g],
            "sse": [float(resid @ resid)],
            "n_fit": [len(resid)],
        })

    return run


def holt_winters_fit(
    series: DataFrame,
    period: int,
    alphas: tuple[float, ...] = (0.1, 0.3, 0.5, 0.7, 0.9),
    betas: tuple[float, ...] = (0.05, 0.1, 0.3),
    gammas: tuple[float, ...] = (0.05, 0.2, 0.4),
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    value_col: str = "avg_n_tok",
) -> DataFrame:
    """Distributed grid search for per-key Holt-Winters parameters:
    minimize one-step-ahead SSE over the (alpha, beta, gamma) grid.
    Output: one row per key with the winning alpha/beta/gamma, its
    ``sse`` and ``n_fit`` — feed it straight back as
    ``holt_winters(..., params=fit)``.

    Physical shape: the grid (a tuple cross product, tens of rows)
    broadcast-crossJoins onto the series, so each (key, combo) cell is
    its own task-parallel group — a 3-key corpus with a 45-point grid
    spreads across 135 tasks instead of 3 serial per-key loops. Data
    replication is series x |grid| rows; the series here are rollup-tier
    summaries (minutes per key), which is exactly the regime where that
    trade is right. The argmin is a lexicographic struct-min on
    (sse, alpha, beta, gamma) — deterministic under SSE ties. Keys
    shorter than ``2 * period`` points produce no row."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    grid = [
        (float(a), float(b), float(g))
        for a in alphas for b in betas for g in gammas
    ]
    if not grid:
        raise ValueError("parameter grid is empty")
    for a, b, g in grid:
        for name, v in (("alpha", a), ("beta", b), ("gamma", g)):
            if not (0.0 < v <= 1.0):
                raise ValueError(f"{name} must be in (0, 1], got {v}")
    spark = series.sparkSession
    grid_df = spark.createDataFrame(grid, "alpha double, beta double, gamma double")
    pts = series.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("val"),
    )
    cells = pts.crossJoin(F.broadcast(grid_df))
    key_type = series.schema[key_col].dataType.simpleString()
    sse = cells.groupBy("key", "alpha", "beta", "gamma").applyInPandas(
        _hw_sse_kernel(period),
        f"key {key_type}, alpha double, beta double, gamma double, "
        "sse double, n_fit bigint",
    )
    best = (
        sse.groupBy("key")
        .agg(
            F.min(F.struct("sse", "alpha", "beta", "gamma", "n_fit")).alias("_b")
        )
        .select(
            F.col("key").alias(key_col),
            F.col("_b.alpha").alias("alpha"),
            F.col("_b.beta").alias("beta"),
            F.col("_b.gamma").alias("gamma"),
            F.col("_b.sse").alias("sse"),
            F.col("_b.n_fit").alias("n_fit"),
        )
    )
    return best


def forecast_accuracy(
    results: DataFrame,
    actuals: DataFrame | None = None,
    key_col: str = "source",
    ts_col: str = "ts",
    season_length: int | None = None,
) -> DataFrame:
    """Per-key forecast accuracy (the standard Hyndman & Koehler 2006
    set) over :func:`holt_winters` output:

    - with ``actuals=None``: in-sample accuracy of the ``kind='fit'``
      rows (y vs one-step-ahead yhat).
    - with ``actuals`` (a ``(key, ts, y)`` frame of later
      observations): out-of-sample accuracy of the ``kind='forecast'``
      rows joined to actuals on (key, ts) — unmatched forecasts drop
      (reported as ``n`` vs the horizon).

    Metrics: ``mae``, ``rmse``, ``smape`` (the symmetric form
    ``mean(2|e| / (|y| + |yhat|))``; zero-denominator pairs — y and
    yhat both exactly 0, a perfect forecast of a zero — are DROPPED
    from the average, the conventional treatment; a key whose every
    pair is zero-denominator gets NULL),
    and ``mase`` — |e| scaled by the in-sample one-step NAIVE error
    (seasonal naive when ``season_length`` is given), the
    scale-free metric that makes keys comparable; NULL when the
    scaling series is degenerate (constant training data)."""
    fit = results.filter(F.col("kind") == "fit").select(
        key_col, ts_col, "y", "yhat"
    )
    if actuals is None:
        scored = fit
    else:
        fc = results.filter(F.col("kind") == "forecast").select(
            key_col, ts_col, F.col("yhat")
        )
        scored = fc.join(
            actuals.select(key_col, ts_col, "y"), [key_col, ts_col]
        )
    err = F.col("y") - F.col("yhat")
    sden = F.abs("y") + F.abs("yhat")
    # MASE scale: mean |y_t - y_{t-m}| over the FIT span (m = 1 or season)
    m = 1 if season_length is None else int(season_length)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    scale = (
        fit.withColumn("_lag", F.lag("y", m).over(w))
        .filter(F.col("_lag").isNotNull())
        .groupBy(key_col)
        .agg(F.avg(F.abs(F.col("y") - F.col("_lag"))).alias("_scale"))
    )
    per = scored.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.abs(err)).alias("mae"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.avg(
            F.when(sden > 0, 2.0 * F.abs(err) / sden)
        ).alias("smape"),
    )
    return per.join(scale, key_col, "left").withColumn(
        "mase", F.try_divide(F.col("mae"), F.nullif(F.col("_scale"), F.lit(0.0)))
    ).drop("_scale")


def forecast_intervals(
    results: DataFrame,
    alpha: float = 0.05,
    key_col: str = "source",
) -> DataFrame:
    """Split-conformal prediction intervals for the ``kind='forecast'``
    rows: the per-key ``(1 - alpha)`` empirical quantile of the
    in-sample |residual| (the fit rows are the calibration set) widens
    each forecast symmetrically — ``lo = yhat - q``, ``hi = yhat + q``.
    The standard distribution-free construction (split conformal,
    Vovk et al.; finite-sample rank ``ceil((n+1)(1-alpha))`` so
    coverage >= 1 - alpha under exchangeability of residuals —
    h-step-ahead residuals grow with h, so these are honest for short
    horizons and conservative-or-not for long ones; documented, not
    hidden). NULL bounds when a key has no fit rows."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    fit = results.filter(
        (F.col("kind") == "fit") & F.col("resid").isNotNull()
    ).select(key_col, F.abs("resid").alias("_ar"))
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy("_ar")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(key_col)
    ranked = (
        fit.withColumn("_rn", F.sum(F.lit(1)).over(w_cum))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
    )
    target = F.least(
        F.col("_n"),
        F.ceil((F.col("_n") + 1) * F.lit(1.0 - alpha)).cast("long"),
    )
    q = (
        ranked.filter(F.col("_rn") >= target)
        .groupBy(key_col)
        .agg(F.min("_ar").alias("_q"))
    )
    fc = results.filter(F.col("kind") == "forecast")
    return (
        fc.join(q, key_col, "left")
        .withColumn("lo", F.col("yhat") - F.col("_q"))
        .withColumn("hi", F.col("yhat") + F.col("_q"))
        .drop("_q")
    )


def holt_winters_backtest(
    series: DataFrame,
    period: int,
    horizon: int,
    n_origins: int = 5,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.1,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    value_col: str = "val",
    min_train: int | None = None,
) -> DataFrame:
    """Rolling-origin (expanding-window) backtest — Hyndman's time-series
    cross-validation protocol: for each of ``n_origins`` cut points per
    key (evenly spaced over the eligible range, each leaving >= horizon
    points after it and >= ``min_train`` (default ``3 * period``) before
    it), refit the Holt-Winters recursion on the data up to the cut and
    score the next ``horizon`` actuals. Output one row per
    (key, origin_ts, h): ``(key, origin_ts, h, ts, y, yhat, err)`` —
    aggregate over origins per h for the per-lead-time error profile
    the single-split ``forecast_accuracy`` cannot give.

    Per-key grouped kernel re-running the O(n) recursion per origin
    (O(origins * n) per key; the distribution axis is the key count).
    Keys too short for even one origin emit nothing. Uses the SAME
    recursion (:func:`_hw_states`) as the fit/search paths, so the
    backtest can never disagree with deployment."""
    if period < 2 or horizon < 1 or n_origins < 1:
        raise ValueError("need period >= 2, horizon >= 1, n_origins >= 1")
    mt = 3 * period if min_train is None else int(min_train)
    if mt < 2 * period:
        raise ValueError(f"min_train must be >= 2*period, got {mt}")
    pts = series.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("x"),
    )
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("origin_ts", pts.schema["ts"].dataType),
            T.StructField("h", T.IntegerType()),
            T.StructField("ts", pts.schema["ts"].dataType),
            T.StructField("y", T.DoubleType()),
            T.StructField("yhat", T.DoubleType()),
            T.StructField("err", T.DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "x"], kind="mergesort").reset_index(drop=True)
        y = pdf["x"].to_numpy()
        n = len(y)
        lo, hi = mt, n - horizon  # train size t in [lo, hi]
        if hi < lo:
            return pd.DataFrame(
                {c.name: pd.Series([], dtype="object") for c in schema}
            )
        cuts = sorted({int(round(v)) for v in np.linspace(lo, hi, min(n_origins, hi - lo + 1))})
        rows = []
        for cut in cuts:
            _, _, _, _, level, trend, season = _hw_states(
                y[:cut], period, alpha, beta, gamma
            )
            for h in range(1, horizon + 1):
                s = season[(cut + h - 1) % period]
                yhat = level + h * trend + s
                rows.append(
                    {
                        "key": pdf["key"].iloc[0],
                        "origin_ts": pdf["ts"].iloc[cut - 1],
                        "h": h,
                        "ts": pdf["ts"].iloc[cut + h - 1],
                        "y": float(y[cut + h - 1]),
                        "yhat": float(yhat),
                        "err": float(y[cut + h - 1] - yhat),
                    }
                )
        return pd.DataFrame(rows)

    return pts.groupBy("key").applyInPandas(run, schema=schema).withColumnRenamed(
        "key", key_col
    )
