"""Classical seasonal-trend decomposition + residual anomaly flags.

The engine detects level shifts (operators/changepoints.py CUSUM) and
unique shapes (operators/matrixprofile.py discords), but a metric with a
strong daily/weekly cycle fools both: every cycle looks like a shift or
a repeated shape. Classical additive decomposition (the `decompose`
moving-average method of Macaulay lineage, as in statsmodels
``seasonal_decompose``) separates

    value = trend + seasonal + residual

so anomaly logic runs on the RESIDUAL, where the cycle is gone:

- trend: centered moving average over one period — for even periods the
  classic half-weight endpoint form ``(0.5*x[t-p/2] + sum + 0.5*x[t+p/2])/p``,
  for odd periods the plain centered mean; only COMPLETE windows get a
  trend (edges are NULL, never a shortened average),
- seasonal: per-phase mean of the detrended series, re-centered to sum
  to zero over the period (the additive identity convention),
- residual: detrended minus seasonal, NULL wherever trend is.

Everything is window/groupBy expressions — the per-key ordered window
for the MA (one Exchange on the key), one aggregation on (key, phase)
joined back broadcast-style (phase table is ``keys x period`` rows,
tiny), zero UDFs. At 10^12 scale the input is a rollup tier, the
per-key window is the only ordered scan, and the phase table stays
broadcastable by construction (period is config, not data).

``residual_anomalies`` flags |resid| > k * stddev_pop(resid) per key —
the seasonal-aware complement to the CUSUM/discord reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["seasonal_decompose", "residual_anomalies"]


def seasonal_decompose(
    series: DataFrame,
    period: int,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    value_col: str = "avg_n_tok",
) -> DataFrame:
    """(key, ts, value, phase, trend, seasonal, resid) per input point.

    ``phase`` is the position in the cycle (row position mod period over
    the per-key ts order — positional, so gap-fill upstream if wall-clock
    phase alignment matters across gaps). NULL values/timestamps are
    excluded. Seasonal components are computed from phase means of the
    detrended points (complete-trend rows only) and re-centered to sum
    to 0 across the period; keys with NO complete trend window (series
    shorter than period+1) get NULL seasonal/resid rather than a
    degenerate zero model."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    half = period // 2
    pts = series.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    order = Window.partitionBy("key").orderBy("ts")
    win = order.rowsBetween(-half, half)
    pos = pts.withColumn("_i", F.row_number().over(order) - F.lit(1))
    pos = pos.withColumn("phase", F.pmod(F.col("_i"), F.lit(period)).cast("int"))
    if period % 2 == 0:
        # half-weight endpoints: (sum over +/-half) - (x[-half]+x[+half])/2,
        # all over period; lag/lead give exact NULLs at incomplete edges
        full_sum = F.sum("value").over(win)
        cnt = F.count("value").over(win)
        ends = F.lag("value", half).over(order) + F.lead("value", half).over(order)
        trend = F.when(
            cnt == F.lit(period + 1),
            (full_sum - ends / F.lit(2.0)) / F.lit(period),
        )
    else:
        full_sum = F.sum("value").over(win)
        cnt = F.count("value").over(win)
        trend = F.when(cnt == F.lit(period), full_sum / F.lit(period))
    base = pos.withColumn("trend", trend).withColumn(
        "_detr", F.col("value") - F.col("trend")
    )
    phase_means = base.groupBy("key", "phase").agg(
        F.avg("_detr").alias("_pm")  # avg skips NULL detrended edges
    )
    centered = phase_means.withColumn(
        "seasonal",
        F.col("_pm") - F.avg("_pm").over(Window.partitionBy("key")),
    ).select("key", "phase", "seasonal")
    out = base.join(F.broadcast(centered), on=["key", "phase"], how="left")
    return out.select(
        F.col("key").alias(key_col),
        F.col("ts").alias(ts_col),
        "value",
        "phase",
        "trend",
        "seasonal",
        (F.col("_detr") - F.col("seasonal")).alias("resid"),
    )


def residual_anomalies(
    decomposed: DataFrame,
    z: float = 3.0,
    key_col: str = "source",
) -> DataFrame:
    """Rows whose residual exceeds ``z`` population standard deviations of
    the key's residuals — with the residual z-score attached. One
    aggregation + one broadcast join; keys whose residuals are all equal
    (stddev 0) flag nothing."""
    if z <= 0:
        raise ValueError(f"z must be > 0, got {z}")
    stats = decomposed.filter(F.col("resid").isNotNull()).groupBy(key_col).agg(
        F.stddev_pop("resid").alias("_sd")
    )
    joined = decomposed.join(F.broadcast(stats), on=key_col, how="inner")
    return (
        joined.filter(
            (F.col("_sd") > F.lit(0.0))
            & (F.abs(F.col("resid")) > F.lit(z) * F.col("_sd"))
        )
        .withColumn("resid_z", F.col("resid") / F.col("_sd"))
        .drop("_sd")
    )
