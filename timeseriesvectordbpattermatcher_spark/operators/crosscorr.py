"""Cross-series correlation: pairwise lagged CCF + rolling correlation.

The engine's per-series family (windows, CUSUM, matrix profile, SAX,
Holt-Winters) analyzes each key alone; the divergence screener
(operators/patterns.py) compares two INDICATORS of one key. This module
adds the classic cross-SERIES reads a rollup-tier consumer asks next:

- :func:`cross_correlation` — the sample cross-correlation function
  (CCF) between series pairs at lags ``-max_lag..max_lag``: which
  source's token rate LEADS another's, and by how many buckets. One
  bounded lag-explode + one equi-join on shifted epoch seconds + one
  Pearson aggregate — fully declarative, zero UDFs.
- :func:`best_lag` — per pair, the lag maximizing |corr| (the lead-lag
  estimate), ties broken toward the smallest |lag| then signed lag.
- :func:`rolling_corr` — rolling Pearson between two columns of one
  keyed frame (e.g. avg_n_tok vs cnt) as pure window expressions, the
  same shape as every operators/windows.py kernel.

Alignment contract: rows pair by EXACT timestamp (epoch seconds plus
``lag * step_sec``) — the natural fit for the engine's rollup tiers
where ``bucket_ts`` is already truncated to a fixed grid. Gaps simply
reduce the overlap count ``n`` (reported per row); irregular series
should be gap-filled or bucketed first (operators/gapfill.py,
operators/rollup.py). Pearson is computed in the numerically standard
sums form with NULL (not NaN/div0) for degenerate windows, matching the
DuckDB oracle bit-for-bit on integer-valued inputs.

Scale shape: with K series, B buckets and L lags the exploded left side
carries B*K*(2L+1) rows into ONE shuffle keyed on the join timestamp;
the aggregate output is K^2 * (2L+1) pair rows. ``pairs`` restricts to
an explicit pair list (broadcast semi join) when K^2 would blow up —
at web scale you screen candidate pairs first (e.g. same category) and
CCF only those.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cross_correlation", "best_lag", "rolling_corr"]


def _pearson_from_sums(n, sx, sy, sxx, syy, sxy) -> Column:
    num = n * sxy - sx * sy
    den = F.sqrt(
        F.nullif(n * sxx - sx * sx, F.lit(0.0))
    ) * F.sqrt(F.nullif(n * syy - sy * sy, F.lit(0.0)))
    return num / den  # NULL when either side is constant (den NULL)


def cross_correlation(
    df: DataFrame,
    value_col: str,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    max_lag: int = 10,
    step_sec: int = 60,
    pairs: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Sample CCF between every ordered key pair (k1 != k2) at lags
    ``-max_lag..max_lag``: row (k1, k2, lag, n, corr) correlates
    ``x = value(k1, t)`` against ``y = value(k2, t + lag*step_sec)`` —
    a POSITIVE lag with high corr means k1 leads k2 by that many steps.
    ``n`` is the overlap count (pairs with n < 2 or a constant side
    yield NULL corr, never NaN). ``pairs`` restricts the output to the
    given (k1, k2) tuples; both orientations of a pair carry the same
    information mirrored (ccf(k1,k2,lag) == ccf(k2,k1,-lag)), so
    screening usually passes ordered pairs once."""
    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0, got {max_lag}")
    if step_sec <= 0:
        raise ValueError(f"step_sec must be > 0, got {step_sec}")
    pts = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.unix_timestamp(ts_col).alias("_u"),
        F.col(value_col).cast("double").alias("_v"),
    )
    lags = F.array([F.lit(l) for l in range(-max_lag, max_lag + 1)])
    left = pts.select(
        F.col("_k").alias("k1"),
        F.col("_v").alias("_x"),
        F.explode(lags).alias("lag"),
        F.col("_u").alias("_u0"),
    ).withColumn("_uj", F.col("_u0") + F.col("lag") * F.lit(step_sec))
    right = pts.select(
        F.col("_k").alias("k2"),
        F.col("_u").alias("_uj"),
        F.col("_v").alias("_y"),
    )
    joined = left.join(right, "_uj").filter(F.col("k1") != F.col("k2"))
    if pairs is not None:
        spark = df.sparkSession
        pdf = spark.createDataFrame(
            [(a, b) for a, b in pairs], ["k1", "k2"]
        )
        joined = joined.join(F.broadcast(pdf), ["k1", "k2"], "left_semi")
    agg = joined.groupBy("k1", "k2", "lag").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    return agg.select(
        "k1",
        "k2",
        "lag",
        F.col("_n").cast("bigint").alias("n"),
        _pearson_from_sums(
            F.col("_n"), F.col("_sx"), F.col("_sy"),
            F.col("_sxx"), F.col("_syy"), F.col("_sxy"),
        ).alias("corr"),
    )


def best_lag(ccf: DataFrame, min_n: int = 2) -> DataFrame:
    """Per (k1, k2): the lag with the largest |corr| among rows with
    ``n >= min_n`` and non-NULL corr — the lead-lag estimate. Ties
    break toward the smallest |lag|, then the signed lag (deterministic).
    One window over the (2*max_lag+1)-row groups."""
    w = Window.partitionBy("k1", "k2").orderBy(
        F.abs(F.col("corr")).desc(), F.abs(F.col("lag")).asc(), F.col("lag").asc()
    )
    return (
        ccf.filter(F.col("corr").isNotNull() & (F.col("n") >= min_n))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def rolling_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    window: int = 20,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    out_col: str = "roll_corr",
    min_periods: int | None = None,
) -> DataFrame:
    """Rolling Pearson correlation of two columns over the trailing
    ``window`` rows per key — pure ordered-window sums, one Exchange on
    the key like every other rolling kernel. Rows with fewer than
    ``min_periods`` (default: ``window``) non-NULL pairs, or a constant
    side in the window, get NULL. NULL in either column excludes the
    PAIR (pairwise-complete, the pandas/DuckDB convention)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    mp = window if min_periods is None else min_periods
    both = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    x = F.when(both, F.col(x_col).cast("double"))
    y = F.when(both, F.col(y_col).cast("double"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(-(window - 1), 0)
    )
    n = F.count(x).over(w).cast("double")
    sx, sy = F.sum(x).over(w), F.sum(y).over(w)
    sxx, syy = F.sum(x * x).over(w), F.sum(y * y).over(w)
    sxy = F.sum(x * y).over(w)
    corr = _pearson_from_sums(n, sx, sy, sxx, syy, sxy)
    return df.withColumn(
        out_col, F.when(n >= F.lit(float(mp)), corr)
    )
