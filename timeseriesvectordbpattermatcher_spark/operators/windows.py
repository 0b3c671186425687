"""Per-series ordered window operators — the reference's dominant op class.

Each function maps one SURVEY.md §2.5/2.6/2.7 operator id to a Spark
Window / expression form. All ordered computations partition by the series
key and order by the time column; rolling frames are ``rowsBetween`` row
frames matching pandas ``rolling(n)`` (current row + n-1 preceding).

pandas ``min_periods`` semantics: pandas yields NaN until the window is
full (min_periods defaults to n); Spark computes partial frames. We expose
``strict=True`` to reproduce pandas (null until n rows seen) — reference
call sites rely on the NaN warm-up (e.g. ma_normalized drops it,
/root/reference/katslib/opkatsDataUtil.py:147-155).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _w(series_col: str, ts_col: str):
    return Window.partitionBy(series_col).orderBy(ts_col)


def _frame(series_col: str, ts_col: str, n: int, shift: int = 0):
    return _w(series_col, ts_col).rowsBetween(-(n - 1) - shift, -shift)


def rolling(
    df: DataFrame,
    col: str,
    n: int,
    fn: str = "avg",
    out: str | None = None,
    series_col: str = "series_id",
    ts_col: str = "ts",
    strict: bool = True,
    shift: int = 0,
) -> DataFrame:
    """W1/W2/W4/W13: rolling avg/min/max/sum/stddev over n rows.

    Reference sites: ma250 (/root/reference/katslib/opkatsDataUtil.py:148-149),
    band max/min with .shift(1) (/root/reference/datalib/patternTraderUtil.py:63,78,
    /root/reference/datalib/extremaPlotter.py:568-573 — ``shift=1`` maps the
    frame back one row), flag debounce rolling(k).max() (:63).
    """
    agg = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
           "stddev": F.stddev_samp}[fn](F.col(col))
    w = _frame(series_col, ts_col, n, shift)
    expr = agg.over(w)
    if strict:
        expr = F.when(F.count(col).over(w) >= n, expr)
    return df.withColumn(out or f"{col}_{fn}{n}", expr)


def rolling_quantile_exact(
    df: DataFrame,
    col: str,
    n: int,
    q: float,
    out: str | None = None,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """W3 exact (pandas ``rolling(n).quantile(q)``, linear interpolation) via
    grouped-map — exactness needed for fixture equality
    (/root/reference/datalib/patternTraderUtil.py:54,59)."""
    out = out or f"{col}_q{int(q * 100)}_{n}"
    schema = T.StructType(df.schema.fields + [T.StructField(out, T.DoubleType())])
    cols = list(df.columns)

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        pdf[out] = pdf[col].rolling(n).quantile(q, interpolation="linear")
        return pdf[cols + [out]]

    return df.groupBy(series_col).applyInPandas(per_series, schema=schema)


def pct_change(
    df: DataFrame, col: str, n: int = 1, out: str | None = None,
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W5: x / lag(x, n) - 1 (/root/reference/datalib/extremaPatternUtil.py:141).

    try_divide: a zero base yields NULL (pandas gives inf; the reference
    drops those rows downstream) instead of an ANSI DIVIDE_BY_ZERO crash —
    the sf0.1 sweep found real value=0 rows, and PySpark 4 is ANSI by
    default."""
    return df.withColumn(
        out or f"{col}_pct{n}",
        F.try_divide(F.col(col), F.lag(col, n).over(_w(series_col, ts_col))) - 1,
    )


def forward_return(
    df: DataFrame, col: str, n: int = 10, out: str | None = None,
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W5 look-ahead label: lead(x, n)/x - 1 — the reference's
    ``pct_change(n).shift(-n)`` (/root/reference/katslib/opkatsDataUtil.py:89).
    try_divide: see pct_change."""
    return df.withColumn(
        out or f"fw_ret_{n}",
        F.try_divide(F.lead(col, n).over(_w(series_col, ts_col)), F.col(col)) - 1,
    )


def signal_cross(
    df: DataFrame, a: str, b: str, out: str = "sig_cross",
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W6: +1 where a crosses above b, -1 where below, else 0
    (/root/reference/datalib/patternTraderUtil.py:16-23)."""
    d = F.col(a) - F.col(b)
    d_prev = F.lag(d).over(_w(series_col, ts_col))
    return df.withColumn(
        out,
        F.when(d * d_prev < 0, F.signum(d)).otherwise(F.lit(0.0)),
    )


def rolling_slope(
    df: DataFrame, col: str, n: int, out: str | None = None,
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W7: rolling least-squares slope against 0..n-1, closed form
    (n·Σiy − Σi·Σy) / (n·Σi² − (Σi)²) — replaces the reference's
    rolling.apply(linregress) (/root/reference/datalib/patternTraderUtil.py:214-218)
    with pure window sums (no Python).
    """
    w = _frame(series_col, ts_col, n)
    rn = F.row_number().over(_w(series_col, ts_col))
    # i runs 0..n-1 inside each frame: i = rn - rn_frame_start; use rn directly —
    # slope is shift-invariant in i, so Σ uses rn as the regressor.
    y = F.col(col)
    sum_y = F.sum(y).over(w)
    sum_i = F.sum(rn).over(w)
    sum_iy = F.sum(rn * y).over(w)
    sum_i2 = F.sum(rn * rn).over(w)
    cnt = F.count(y).over(w)
    slope = (cnt * sum_iy - sum_i * sum_y) / (cnt * sum_i2 - sum_i * sum_i)
    return df.withColumn(out or f"{col}_slope{n}", F.when(cnt >= n, slope))


def rolling_count_where(
    df: DataFrame, predicate: Column, n: int, out: str,
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W8: rolling count of rows matching a predicate (the reference counts
    non-positive signs over 50 rows, /root/reference/datalib/patternTraderUtil.py:250-262)."""
    return df.withColumn(
        out,
        F.sum(F.when(predicate, 1).otherwise(0)).over(_frame(series_col, ts_col, n)),
    )


def local_extrema(
    df: DataFrame,
    col_high: str = "high",
    col_low: str = "low",
    order: int = 5,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """W9/W10: argrelextrema(greater_equal/less_equal, order) + merge + tag
    (/root/reference/datalib/extremaPatternUtil.py:14-68): a row is a local
    max if its high equals the max over ±order rows (ties included —
    np.greater_equal semantics), min likewise on low; maxima win ties in the
    merged tag (reference concatenates maxima last wins via duplicate drop —
    here: explicit precedence max > min, one row per ts)."""
    w = _w(series_col, ts_col).rowsBetween(-order, order)
    is_max = F.col(col_high) == F.max(col_high).over(w)
    is_min = F.col(col_low) == F.min(col_low).over(w)
    tag = (
        F.when(is_max, F.lit("max")).when(is_min, F.lit("min")).otherwise(F.lit("na"))
    )
    return df.withColumn("minmax_type", tag)


def rank_across_keys(
    df: DataFrame, col: str, partition_col: str = "ts",
    out: str = "rs_rank", pct: bool = True, reverse: bool = False,
) -> DataFrame:
    """W14: per-date cross-sectional rank of each series
    (/root/reference/datalib/patternTraderUtil.py:106-136); invalid -> -2.

    Matches the reference formula exactly: validity is ``value > 0`` (the
    reference masks ``row > 0`` before ranking — zero/negative/NaN all get
    -2), the rank is pandas' default AVERAGE-tie rank over valid rows only
    (a tie group spanning 1-based positions [rmin, rmax] gets (rmin+rmax)/2
    = rank() + (ties-1)/2), and ``pct=True`` (``get_relative_rank``)
    divides by the valid count — range (1/cnt, 1], single valid row -> 1.0.
    ``pct=False`` mirrors ``get_absolute_rank``: the raw average rank, or
    ``cnt - rank + 1`` with ``reverse=True`` (reference default there).
    A null/invalid value on one series never shifts the others' ranks."""
    is_valid = F.col(col) > 0  # null-safe: NULL > 0 is NULL -> invalid
    w = Window.partitionBy(partition_col, "_valid").orderBy(F.asc(col))
    ties = F.count(F.lit(1)).over(
        Window.partitionBy(partition_col, "_valid", col)
    )
    avg_rank = F.rank().over(w) + (ties - F.lit(1)) / F.lit(2.0)
    cnt = F.sum(F.when(F.col("_valid"), 1).otherwise(0)).over(
        Window.partitionBy(partition_col)
    )
    if reverse:
        avg_rank = cnt - avg_rank + 1
    r = avg_rank / cnt if pct else avg_rank
    return (
        df.withColumn("_valid", F.coalesce(is_valid, F.lit(False)))
        .withColumn(out, F.when(F.col("_valid"), r).otherwise(F.lit(-2.0)))
        .drop("_valid")
    )


def resample_ohlcv(
    df: DataFrame, rule: str = "3 days",
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W16: downsample OHLCV — open=first, high=max, low=min, close=last,
    volume=sum per bucket (the missing vcplib ``resample_df``'s semantics as
    fixed by consumers, /root/reference/datalib/extremaPatternUtil.py:186-188)."""
    return (
        df.groupBy(series_col, F.window(ts_col, rule).getField("start").alias("bucket_ts"))
        .agg(
            F.min_by("open", ts_col).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", ts_col).alias("close"),
            F.sum("volume").alias("volume"),
        )
    )


def obv(
    df: DataFrame, out: str = "obv",
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W17 OBV: running sum of sign(Δclose)·volume — window expr, no UDF."""
    w = _w(series_col, ts_col)
    step = F.signum(F.col("close") - F.lag("close").over(w)) * F.col("volume")
    return df.withColumn(
        out, F.sum(F.coalesce(step, F.lit(0.0))).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def true_range(df: DataFrame, series_col: str = "series_id", ts_col: str = "ts") -> DataFrame:
    prev_close = F.lag("close").over(_w(series_col, ts_col))
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - prev_close),
        F.abs(F.col("low") - prev_close),
    )
    return df.withColumn("tr", F.coalesce(tr, F.col("high") - F.col("low")))


def ema(
    df: DataFrame, col: str, span: int, out: str | None = None,
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W17 EMA (recursive -> grouped-map; pandas ewm(adjust=False) semantics,
    matching pandas_ta). Sequential within a series, parallel across series
    (/root/reference/datalib/taStopEstimater.py:93-103 consumers)."""
    out = out or f"ema{span}_{col}"
    schema = T.StructType(df.schema.fields + [T.StructField(out, T.DoubleType())])
    cols = list(df.columns)

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        pdf[out] = pdf[col].ewm(span=span, adjust=False).mean()
        return pdf[cols + [out]]

    return df.groupBy(series_col).applyInPandas(per_series, schema=schema)


def atr(
    df: DataFrame, n: int = 14, out: str = "atr",
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W17 ATR: RMA (Wilder) of true range — ewm(alpha=1/n) recursive kernel."""
    df = true_range(df, series_col, ts_col)
    schema = T.StructType(df.schema.fields + [T.StructField(out, T.DoubleType())])
    cols = list(df.columns)

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        pdf[out] = pdf["tr"].ewm(alpha=1.0 / n, adjust=False).mean()
        return pdf[cols + [out]]

    return df.groupBy(series_col).applyInPandas(per_series, schema=schema)


def bollinger(
    df: DataFrame, n: int = 20, k: float = 2.0,
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W17 Bollinger bands — pure window exprs."""
    w = _frame(series_col, ts_col, n)
    mid = F.avg("close").over(w)
    sd = F.stddev_samp("close").over(w)
    full = F.count("close").over(w) >= n
    return (
        df.withColumn("bb_mid", F.when(full, mid))
        .withColumn("bb_up", F.when(full, mid + k * sd))
        .withColumn("bb_dn", F.when(full, mid - k * sd))
    )


def sessionize(
    df: DataFrame, gap: str = "interval 10 days", out: str = "session_id",
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """X16 flag-period grouping: consecutive runs separated by gaps > thresh
    get distinct session ids (/root/reference/datalib/patternReviewUtil.py:309-355)."""
    w = _w(series_col, ts_col)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + F.expr(gap)), 1
    ).otherwise(0)
    return df.withColumn(
        out, F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def remove_overlapping_intervals(
    df: DataFrame, start_col: str = "start_ts", end_col: str = "end_ts",
    series_col: str | list[str] = "series_id",
) -> DataFrame:
    """U4: scan intervals in start order, keep those starting at/after the
    end of the last KEPT interval — the reference's sequential overlap prune
    (/root/reference/datalib/extremaPatternUtil.py:340-366).

    The frontier depends on which intervals were kept, so this is NOT a
    plain running max over preceding rows: for A=[1,11], B=[6,13], C=[12,15]
    the reference keeps A and C (B is dropped, so its end never blocks C),
    while a preceding-rows running max would wrongly drop C. Sequential
    scan per series via grouped map — pattern interval tables are tiny
    relative to raw data (a few rows per series), parallel across series.
    The DuckDB oracle form is a recursive CTE walking rn with a kept
    frontier (see __spark_entry__.SQL_INTERVAL_OVERLAP).

    ``series_col`` may be a list for composite keys (e.g. (series, pattern)
    in the screener) — avoids lossy string-packed keys."""
    cols = list(df.columns)
    schema = df.schema
    keys = [series_col] if isinstance(series_col, str) else list(series_col)

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([start_col, end_col]).reset_index(drop=True)
        keep, frontier = [], None
        for i, row in pdf.iterrows():
            if frontier is None or row[start_col] >= frontier:
                keep.append(i)
                frontier = row[end_col]
        return pdf.loc[keep, cols]

    return df.groupBy(*keys).applyInPandas(per_series, schema=schema)


def min_spacing_dedupe(
    df: DataFrame, min_gap: str = "interval 4 days",
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """U5: drop signals closer than min_gap to the PREVIOUS ROW (the
    reference's quirk: it compares to the previous row, not the previous
    *kept* row — /root/reference/datalib/extremaPlotter.py:523-531; fixtures
    pin this documented behavior)."""
    prev_ts = F.lag(ts_col).over(_w(series_col, ts_col))
    return (
        df.withColumn("_keep", prev_ts.isNull() | (F.col(ts_col) >= prev_ts + F.expr(min_gap)))
        .filter("_keep")
        .drop("_keep")
    )


def asof_match_exit(
    entries: DataFrame, exits: DataFrame,
    series_col: str = "series_id", entry_ts: str = "entry_ts", exit_ts: str = "exit_ts",
) -> DataFrame:
    """J3: for each entry, the first exit at/after it (the missing
    sig_matrix ``match_exit``'s call-site semantics,
    /root/reference/datalib/patternTraderUtil.py:556-566).

    Merge-as-of as ONE window pass over the unioned event stream: tag
    entries 0 / exits 1, scan each series in DESCENDING (ts, tag) order —
    an exit at the same ts scans before its entry so ``>=`` matching
    holds — and take the running ``min(exit ts)`` over the rows seen so
    far. A RUNNING frame is O(n) per partition; the equivalent
    ``[current row, unbounded following]`` min (the first version of this
    rewrite) makes Spark's WindowExec rescan the partition remainder per
    row — O(n^2), the same trap gapfill.py documents and
    tests/test_plans.py pins against. No per-series entries x exits
    product ever materializes (the round-1 unbounded range join was
    O(E·X) per series); cost is one shuffle of E+X rows. Plan tests pin
    both the no-cross-product shape and the running-frame-only rule."""
    e = entries.select(
        F.col(series_col), F.col(entry_ts).alias("_ts"), F.lit(0).alias("_is_exit")
    )
    x = exits.select(
        F.col(series_col), F.col(exit_ts).alias("_ts"), F.lit(1).alias("_is_exit")
    )
    both = e.unionByName(x)
    w = (
        Window.partitionBy(series_col)
        .orderBy(F.desc("_ts"), F.desc("_is_exit"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.min(F.when(F.col("_is_exit") == 1, F.col("_ts"))).over(w)
    return (
        both.withColumn("matched_exit_ts", nxt)
        .filter(F.col("_is_exit") == 0)
        .select(series_col, F.col("_ts").alias(entry_ts), "matched_exit_ts")
    )


def time_travel_last_n(
    df: DataFrame, as_of: str, n: int = 64,
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """P3: rows <= as_of, last n per series — the reference's
    ``df.loc[:end_date].iloc[-64:]`` (/root/reference/opkatsPatternMatcherUtil.py:29-30)."""
    w = Window.partitionBy(series_col).orderBy(F.desc(ts_col))
    return (
        df.filter(F.col(ts_col) <= F.lit(as_of))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def price_by_volume(
    df: DataFrame, bin_cnt: int = 20,
    series_col: str = "series_id",
) -> DataFrame:
    """A3: bin close into bin_cnt price bins, sum volume per bin, argmax bin
    -> support/resistance level (missing vcplib ``get_price_by_volume_df``,
    semantics fixed by consumers /root/reference/datalib/patternTraderUtil.py:161-203)."""
    bounds = df.groupBy(series_col).agg(
        F.min("close").alias("_lo"), F.max("close").alias("_hi")
    )
    binned = (
        df.join(bounds, series_col)
        .withColumn(
            "bin",
            F.when(F.col("_hi") > F.col("_lo"),  # constant series -> single bin 0
                   F.least(
                       F.floor((F.col("close") - F.col("_lo"))
                               / ((F.col("_hi") - F.col("_lo")) / bin_cnt)),
                       F.lit(bin_cnt - 1),
                   )).otherwise(F.lit(0)).cast("int"),
        )
        .groupBy(series_col, "bin")
        .agg(F.sum("volume").alias("vol"), F.avg("close").alias("bin_px"))
    )
    top = binned.groupBy(series_col).agg(
        F.max_by("bin_px", "vol").alias("snr_level"), F.max("vol").alias("snr_vol")
    )
    return top


def price_by_volume_obv(
    df: DataFrame, bin_cnt: int = 20,
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """A3 OBV variant: per price bin, total volume PLUS the up-move volume
    split — ``volume_by_price``, ``pbv_up``, ``pbv_down``,
    ``pbv_up_ratio_at_price`` (missing vcplib ``get_price_by_volume_obv_df``;
    column set fixed by consumers /root/reference/datalib/patternTraderUtil.py:310-404
    and /root/reference/datalib/extremaPlotter.py:1261-1290). A bar's volume
    counts as "up" when close > previous close (OBV sign); the first bar of
    a series counts as down (sign 0 -> not up), matching OBV's seed."""
    w = _w(series_col, ts_col)
    up = F.col("close") > F.lag("close").over(w)
    tagged = df.withColumn("_up", F.coalesce(up, F.lit(False)))
    bounds = tagged.groupBy(series_col).agg(
        F.min("close").alias("_lo"), F.max("close").alias("_hi")
    )
    binned = (
        tagged.join(bounds, series_col)
        .withColumn(
            "bin",
            F.when(F.col("_hi") > F.col("_lo"),
                   F.least(
                       F.floor((F.col("close") - F.col("_lo"))
                               / ((F.col("_hi") - F.col("_lo")) / bin_cnt)),
                       F.lit(bin_cnt - 1),
                   )).otherwise(F.lit(0)).cast("int"),
        )
        .groupBy(series_col, "bin")
        .agg(
            F.sum("volume").alias("volume_by_price"),
            F.sum(F.when(F.col("_up"), F.col("volume")).otherwise(F.lit(0.0))).alias("pbv_up"),
            F.avg("close").alias("bin_px"),
        )
        .withColumn("pbv_down", F.col("volume_by_price") - F.col("pbv_up"))
        .withColumn(
            "pbv_up_ratio_at_price",
            F.when(F.col("volume_by_price") > 0,
                   F.col("pbv_up") / F.col("volume_by_price")).otherwise(F.lit(0.5)),
        )
    )
    return binned


def perf_by_year_rollup(
    results: DataFrame, ret_col: str = "fw_ret", year_col: str = "year",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """A1: per-year perf aggregation + an 'all' total row via GROUPING SETS
    (/root/reference/datalib/extremaPatternUtil.py:826-883 builds the same
    dict-keyed rows incl. year='all'). The input view name is uniqued so
    concurrent callers on one SparkSession don't collide."""
    import uuid

    group_cols = group_cols or []
    gcols = ", ".join(group_cols + [year_col])
    base_cols = ", ".join(group_cols) if group_cols else ""
    view = f"_perf_in_{uuid.uuid4().hex[:12]}"
    results.createOrReplaceTempView(view)
    # grouping() (not coalesce) labels the grand-total row: a genuine
    # null-year group in the data must not collide with 'all'. winrate's
    # denominator is the NON-NULL return count (reference drops NaN before
    # winner/len(r), extremaPatternUtil.py:866-868) — counting null rets
    # as losses would disagree with tcnt in the same output row.
    sql = f"""
        SELECT {base_cols + ', ' if base_cols else ''}
               CASE WHEN grouping({year_col}) = 1 THEN 'all'
                    ELSE cast({year_col} as string) END AS year,
               avg({ret_col})  AS ret,
               count({ret_col}) AS tcnt,
               sum({ret_col})  AS total_ret,
               avg(CASE WHEN {ret_col} > 0 THEN cast(1 as double)
                        WHEN {ret_col} IS NOT NULL THEN cast(0 as double)
                        END) AS winrate
        FROM {view}
        GROUP BY GROUPING SETS (({gcols}), ({base_cols}))
    """
    try:
        # sql() resolves the view during analysis, so the returned plan no
        # longer needs the catalog entry — drop it immediately instead of
        # leaking one uuid view per call in long-lived sessions
        out = results.sparkSession.sql(sql)
    finally:
        results.sparkSession.catalog.dropTempView(view)
    return out
