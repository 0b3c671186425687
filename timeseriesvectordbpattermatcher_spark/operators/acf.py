"""Autocorrelation (ACF), partial autocorrelation (PACF), and seasonal
period estimation per series.

The seasonal/forecast family needs a PERIOD (``seasonal_decompose``'s
``period``, Holt-Winters' ``season_length``) and the ASAP smoother's
window choice is driven by the same structure — but nothing in the
engine measured it. This module adds the classic reads:

- :func:`acf` — the Box–Jenkins sample autocorrelation estimator
  (the one statsmodels/R ``acf`` compute for a complete series):

      r_k = sum_t (x_t - mean)(x_{t+k} - mean) / sum_t (x_t - mean)^2

  with the FULL-series mean and denominator. On a gappy grid only the
  available (t, t+k) pairs contribute to the numerator (reported as
  ``n_pairs``) while the denominator stays the full sum — the standard
  "conservative missing" convention, equal to the complete-series
  estimator when there are no gaps.
- :func:`pacf` — partial autocorrelations via the Durbin–Levinson
  recursion on the ACF values (the published definition; exact when
  the ACF is). The recursion is sequential in the lag, so it runs as a
  per-key grouped kernel over the L+1 ACF rows — O(L^2) work on L
  values per key, never on raw rows.
- :func:`estimate_period` — the dominant seasonal period: the lag
  ``>= min_lag`` that is a local ACF peak with the largest r_k (ties
  to the smallest lag). Feeds ``seasonal_decompose(period=...)`` /
  ``holt_winters(season_length=...)``.

Alignment contract matches operators/crosscorr.py: rows pair by exact
epoch seconds plus ``lag * step_sec`` — built for the engine's rollup
tiers where ``bucket_ts`` sits on a fixed grid; gap-fill or bucket
irregular series first.

Scale shape: the stats pass is one tiny per-key aggregate (broadcast
back); the numerator pass explodes each row into L lag targets and
joins on the shifted epoch — B*L rows through ONE shuffle keyed on
(key, epoch), aggregate output K*(L+1) rows. PACF and period read run
on that K*(L+1) table, not on raw. Zero Python in the row path; the
only kernel is the O(L^2) Durbin–Levinson over per-key ACF arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["acf", "pacf", "estimate_period"]


def acf(
    points: DataFrame,
    max_lag: int,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    val_col: str = "val",
    step_sec: int = 60,
) -> DataFrame:
    """Per-key sample ACF at lags ``0..max_lag``. Output:
    ``(key, lag, n_pairs, acf)`` — ``acf`` NULL for a constant or
    sub-2-point series (denominator zero; never NaN), lag 0 is 1 by
    definition whenever defined. ``step_sec`` is the grid step that one
    lag represents (60 for a 1m tier, 3600 for 1h, ...)."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    pts = points.filter(
        F.col(ts_col).isNotNull() & F.col(val_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000)).cast("long").alias("t"),
        F.col(val_col).cast("double").alias("x"),
    )
    stats = pts.groupBy("key").agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("x").alias("_mu"),
        (F.sum(F.col("x") * F.col("x")) - F.pow(F.sum("x"), F.lit(2)) / F.count(F.lit(1))).alias("_ssd"),
    )
    demeaned = pts.join(F.broadcast(stats), "key").select(
        "key", "t", (F.col("x") - F.col("_mu")).alias("xc")
    )
    lags = F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    left = demeaned.select("key", "t", "xc", lags).select(
        "key",
        "lag",
        F.col("xc").alias("xc_l"),
        (F.col("t") + F.col("lag") * F.lit(step_sec)).alias("t_join"),
    )
    right = demeaned.select(
        "key", F.col("t").alias("t_join"), F.col("xc").alias("xc_r")
    )
    nums = (
        left.join(right, ["key", "t_join"])
        .groupBy("key", "lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("xc_l") * F.col("xc_r")).alias("_num"),
        )
    )
    base = stats.select(
        "key",
        F.lit(0).alias("lag"),
        F.col("_n").alias("n_pairs"),
        F.when((F.col("_ssd") > 0) & (F.col("_n") >= 2), F.lit(1.0)).alias("acf"),
    )
    out = (
        nums.join(F.broadcast(stats), "key")
        .select(
            "key",
            "lag",
            "n_pairs",
            F.when(
                (F.col("_ssd") > 0) & (F.col("_n") >= 2),
                F.col("_num") / F.col("_ssd"),
            ).alias("acf"),
        )
        .unionByName(base)
        .withColumnRenamed("key", key_col)
    )
    return out


def pacf(acf_df: DataFrame, key_col: str = "source") -> DataFrame:
    """Partial autocorrelations from an :func:`acf` table via the
    Durbin–Levinson recursion (Box–Jenkins): ``pacf[k]`` is phi_kk of
    the order-k AR fit implied by the ACF. Adds a ``pacf`` column
    (lag 0 -> 1.0); keys whose ACF is NULL (constant series) or whose
    recursion hits a degenerate denominator emit NULL from that lag on.
    Runs as one grouped kernel over each key's L+1 ACF rows."""
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("lag", T.IntegerType()),
            T.StructField("pacf", T.DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("lag")
        lags = pdf["lag"].to_numpy()
        r = pdf["acf"].to_numpy(dtype=float)
        out = np.full(len(r), np.nan)
        # Durbin-Levinson indexes r positionally as r[lag]; acf() emits no
        # row for a lag with zero aligned pairs (gappy grids), so only the
        # contiguous prefix lags[k] == k is usable — NULL from the first gap
        # instead of silently shifting every later PACF to the wrong lag.
        n_contig = len(r)
        for k in range(len(lags)):
            if lags[k] != k:
                n_contig = k
                break
        if n_contig and lags[0] == 0 and np.isfinite(r[0]):
            out[0] = 1.0
            # Durbin-Levinson: phi[k][j]; r is indexed by lag
            phi_prev: np.ndarray = np.zeros(0)
            v = 1.0  # innovation variance ratio
            for k in range(1, n_contig):
                if not np.isfinite(r[k]) or v <= 0:
                    break
                num = r[k] - float(phi_prev @ r[k - 1:0:-1]) if k > 1 else r[1]
                phi_kk = num / v
                out[k] = phi_kk
                phi = np.empty(k)
                phi[:k - 1] = phi_prev - phi_kk * phi_prev[::-1]
                phi[k - 1] = phi_kk
                phi_prev = phi
                v = v * (1.0 - phi_kk * phi_kk)
        res = pd.DataFrame({"key": pdf["key"].iloc[0], "lag": lags, "pacf": out})
        res["pacf"] = res["pacf"].where(np.isfinite(res["pacf"].to_numpy()))
        return res

    keyed = acf_df.select(
        F.col(key_col).cast("string").alias("key"), "lag", "acf"
    )
    p = keyed.groupBy("key").applyInPandas(run, schema=schema)
    return (
        acf_df.withColumn("_k", F.col(key_col).cast("string"))
        .join(
            p.withColumnRenamed("key", "_k"),
            ["_k", "lag"],
            "left",
        )
        .drop("_k")
    )


def estimate_period(
    acf_df: DataFrame,
    key_col: str = "source",
    min_lag: int = 2,
    min_acf: float = 0.0,
) -> DataFrame:
    """Dominant seasonal period per key: among lags ``>= min_lag`` that
    are LOCAL PEAKS of the ACF (strictly above the previous lag, at or
    above the next — interior maxima, so the trivial lag-0/1 decay and
    the table edge never win) with ``acf > min_acf``, pick the lag with
    the largest ACF; ties to the smallest lag. Output:
    ``(key, period, period_acf)`` — NULL period when no qualifying peak
    exists (aperiodic or constant series), which callers should treat
    as "don't fit a seasonal model"."""
    w = Window.partitionBy(key_col).orderBy("lag")
    cand = (
        acf_df.withColumn("_prev", F.lag("acf").over(w))
        .withColumn("_next", F.lead("acf").over(w))
        .filter(
            (F.col("lag") >= min_lag)
            & F.col("acf").isNotNull()
            & (F.col("acf") > F.lit(min_acf))
            & (F.col("acf") > F.col("_prev"))
            & (F.col("_next").isNull() | (F.col("acf") >= F.col("_next")))
            & F.col("_prev").isNotNull()
        )
    )
    pick = Window.partitionBy(key_col).orderBy(F.col("acf").desc(), F.col("lag"))
    best = (
        cand.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(key_col, F.col("lag").alias("period"), F.col("acf").alias("period_acf"))
    )
    keys = acf_df.select(key_col).distinct()
    return keys.join(best, key_col, "left")
