"""Mann–Kendall monotone-trend test + Theil–Sen robust slope per series.

The changepoint family (CUSUM, PELT) finds WHERE a series shifts; the
seasonal module removes structure; nothing answered the prior question a
tier consumer asks first: "is this metric trending at all, and how
fast?" robustly, without assuming normal errors the way the OLS slope
(operators/stats2d.py) does. The published standard pair:

- **Mann–Kendall** (Mann 1945, Kendall 1975): S = sum over i<j of
  sign(x_j - x_i) with time-ordered samples; under H0 (no trend) S is
  asymptotically normal with Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)]
  / 18 (the standard tie correction over tie-group sizes t), and the
  continuity-corrected Z = (S -/+ 1)/sqrt(Var) gives a two-sided
  p-value. Kendall's tau-b is reported alongside
  (S / sqrt((D - T_x)(D - T_t)), D = n(n-1)/2, tie terms on both axes).
- **Theil–Sen** (Theil 1950, Sen 1968): the median of all pairwise
  slopes (x_j - x_i)/(t_j - t_i), i<j, t_i != t_j — the robust slope
  estimate conventionally paired with the MK test.

Execution shape: one grouped kernel per key (``applyInPandas``), numpy
pairwise math inside — the distribution axis is the KEY COUNT, exactly
like operators/matrixprofile.py, with the same loud ``max_points``
guard because the pairwise work is O(n^2) per SERIES. The intended
input is a TIER table (1h/1d buckets — calendar-bounded n), not raw
events; feed ``rollup_1m``/cascade output or downsample first.

Oracles (tests/test_trendtest.py): DuckDB recomputes S, the tie-corrected
variance, AND the Theil–Sen median via its own pairwise self-join; a
pure-python transcription replays Z/p/tau-b; planted monotone /
flat / noisy series pin the verdicts.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["mann_kendall", "seasonal_mann_kendall"]


def _mk_kernel(t: np.ndarray, x: np.ndarray, alpha: float) -> dict:
    n = len(x)
    if n < 3:
        return dict(n=n, s_stat=None, var_s=None, z=None, p_value=None,
                    tau_b=None, sen_slope=None, trend=None)
    # pairwise pass: O(n) numpy-vectorized rows, O(n^2) total work but
    # only O(n) peak memory per row
    s = 0
    slopes: list[np.ndarray] = []
    for i in range(n - 1):
        d = x[i + 1:] - x[i]
        s += int(np.sign(d).sum())
        dt = t[i + 1:] - t[i]
        ok = dt != 0
        if ok.any():
            slopes.append(d[ok] / dt[ok])
    # tie correction over x tie groups (and t groups for tau-b)
    def _tie_term(v: np.ndarray) -> float:
        _, counts = np.unique(v, return_counts=True)
        c = counts[counts > 1].astype(float)
        return float((c * (c - 1) * (2 * c + 5)).sum())

    def _tie_pairs(v: np.ndarray) -> float:
        _, counts = np.unique(v, return_counts=True)
        c = counts[counts > 1].astype(float)
        return float((c * (c - 1) / 2.0).sum())

    var_s = (n * (n - 1) * (2 * n + 5) - _tie_term(x)) / 18.0
    if var_s > 0:
        if s > 0:
            z = (s - 1) / math.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        p = math.erfc(abs(z) / math.sqrt(2.0))  # two-sided normal
    else:
        z, p = None, None
    d0 = n * (n - 1) / 2.0
    den = math.sqrt((d0 - _tie_pairs(x)) * (d0 - _tie_pairs(t)))
    tau_b = s / den if den > 0 else None
    all_slopes = np.concatenate(slopes) if slopes else np.array([])
    sen = float(np.median(all_slopes)) if len(all_slopes) else None
    if p is None:
        trend = None
    elif p < alpha:
        trend = "increasing" if s > 0 else "decreasing"
    else:
        trend = "no_trend"
    return dict(n=n, s_stat=int(s), var_s=var_s, z=z, p_value=p,
                tau_b=tau_b, sen_slope=sen, trend=trend)


def mann_kendall(
    points: DataFrame,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    val_col: str = "val",
    alpha: float = 0.05,
    max_points: int = 5000,
) -> DataFrame:
    """Per-key Mann–Kendall test + Theil–Sen slope. Output one row per
    key: ``(key, n, s_stat, var_s, z, p_value, tau_b, sen_slope,
    trend)`` — ``trend`` is 'increasing'/'decreasing' when the
    two-sided p-value beats ``alpha``, else 'no_trend'; all-NULL stats
    for n < 3 (the test is undefined). ``sen_slope`` is per SECOND of
    the ts axis (multiply by the tier step for per-bucket units).

    ``max_points`` guards the O(n^2) per-key pairwise work the exact
    statistics require — raise it deliberately or pre-aggregate to a
    coarser tier; the guard fails LOUDLY rather than sampling silently
    (no-silent-caps convention)."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    pts = points.filter(
        F.col(ts_col).isNotNull() & F.col(val_col).isNotNull()
    ).select(
        F.col(key_col).cast("string").alias("key"),
        (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000.0)).alias("t"),
        F.col(val_col).cast("double").alias("x"),
    )
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("s_stat", T.LongType()),
            T.StructField("var_s", T.DoubleType()),
            T.StructField("z", T.DoubleType()),
            T.StructField("p_value", T.DoubleType()),
            T.StructField("tau_b", T.DoubleType()),
            T.StructField("sen_slope", T.DoubleType()),
            T.StructField("trend", T.StringType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_points:
            raise ValueError(
                f"mann_kendall: key {pdf['key'].iloc[0]!r} has {len(pdf)} "
                f"points > max_points={max_points}; the exact statistics "
                "are O(n^2) per key — aggregate to a coarser tier or "
                "raise max_points deliberately"
            )
        pdf = pdf.sort_values(["t", "x"], kind="mergesort")
        out = _mk_kernel(pdf["t"].to_numpy(), pdf["x"].to_numpy(), alpha)
        return pd.DataFrame([{"key": pdf["key"].iloc[0], **out}])

    return pts.groupBy("key").applyInPandas(run, schema=schema).withColumnRenamed(
        "key", key_col
    )


def seasonal_mann_kendall(
    points: DataFrame,
    period: int,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    val_col: str = "val",
    alpha: float = 0.05,
    max_points: int = 5000,
) -> DataFrame:
    """Seasonal Mann–Kendall (Hirsch & Slack 1984): the MK statistic
    computed WITHIN each of ``period`` seasons (sample i belongs to
    season ``i mod period`` in time order) and summed — so a strong
    seasonal cycle no longer masks (or fakes) a monotone trend.
    S' = sum_g S_g, Var' = sum_g Var_g (independent-seasons form; the
    serial-correlation covariance correction is out of scope and
    documented), Z/p as in :func:`mann_kendall`; the Sen slope is the
    median of WITHIN-season pairwise slopes. Same per-key grouped
    kernel, guard, and output schema (plus ``period``)."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    pts = points.filter(
        F.col(ts_col).isNotNull() & F.col(val_col).isNotNull()
    ).select(
        F.col(key_col).cast("string").alias("key"),
        (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000.0)).alias("t"),
        F.col(val_col).cast("double").alias("x"),
    )
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("period", T.IntegerType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("s_stat", T.LongType()),
            T.StructField("var_s", T.DoubleType()),
            T.StructField("z", T.DoubleType()),
            T.StructField("p_value", T.DoubleType()),
            T.StructField("sen_slope", T.DoubleType()),
            T.StructField("trend", T.StringType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_points:
            raise ValueError(
                f"seasonal_mann_kendall: key {pdf['key'].iloc[0]!r} has "
                f"{len(pdf)} points > max_points={max_points}"
            )
        pdf = pdf.sort_values(["t", "x"], kind="mergesort")
        t = pdf["t"].to_numpy()
        x = pdf["x"].to_numpy()
        n = len(x)
        s_tot, var_tot = 0, 0.0
        slopes: list[np.ndarray] = []
        any_season = False
        for g in range(period):
            xg, tg = x[g::period], t[g::period]
            if len(xg) < 3:
                continue
            r = _mk_kernel(tg, xg, alpha)
            if r["s_stat"] is None or r["var_s"] is None:
                continue
            any_season = True
            s_tot += r["s_stat"]
            var_tot += r["var_s"]
            for i in range(len(xg) - 1):
                d = xg[i + 1:] - xg[i]
                dt = tg[i + 1:] - tg[i]
                ok = dt != 0
                if ok.any():
                    slopes.append(d[ok] / dt[ok])
        if not any_season or var_tot <= 0:
            out = dict(n=n, s_stat=None, var_s=None, z=None, p_value=None,
                       sen_slope=None, trend=None)
        else:
            if s_tot > 0:
                z = (s_tot - 1) / math.sqrt(var_tot)
            elif s_tot < 0:
                z = (s_tot + 1) / math.sqrt(var_tot)
            else:
                z = 0.0
            p = math.erfc(abs(z) / math.sqrt(2.0))
            all_slopes = np.concatenate(slopes) if slopes else np.array([])
            sen = float(np.median(all_slopes)) if len(all_slopes) else None
            trend = ("increasing" if s_tot > 0 else "decreasing") if p < alpha else "no_trend"
            out = dict(n=n, s_stat=int(s_tot), var_s=var_tot, z=z, p_value=p,
                       sen_slope=sen, trend=trend)
        return pd.DataFrame([{"key": pdf["key"].iloc[0], "period": period, **out}])

    return pts.groupBy("key").applyInPandas(run, schema=schema).withColumnRenamed(
        "key", key_col
    )
