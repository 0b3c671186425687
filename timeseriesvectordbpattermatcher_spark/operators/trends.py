"""X15 trend-range search (reference: datalib/patternReviewUtil.py:388-463).

``find_trend_range``: around each anchor date, locate the trend's start/end
as the pre-anchor price extreme and post-anchor opposite extreme within
±span_days (the reference's ``idxmin``/``idxmax`` over the two slices).

``find_trend_range_extended``: the reference grows the span by 7 days until
``pct_chg`` stops improving (:442-463) — a sequential driver loop. Here the
whole span grid is evaluated in ONE plan (anchors × spans range-join) and a
window scan picks each anchor's last still-improving span: the iterative
search becomes a declarative cross-grid + cumulative-flag filter, which is
how a 10^6-anchor batch would actually run on a cluster.

Tie-breaking pinned to pandas ``idxmin``/``idxmax`` (first occurrence):
``min_by``/``max_by`` keys include the timestamp ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def find_trend_range(
    ohlcv: DataFrame,
    anchors: DataFrame,
    span_days: int = 120,
    trend: str = "up",
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """anchors(series_id, anchor_ts [, span_days col]) -> one row per anchor
    with trendstart/trendend/startprice/endprice/pct_chg/trend."""
    if "span_days" not in anchors.columns:
        anchors = anchors.withColumn("span_days", F.lit(span_days))
    a = anchors.alias("a")
    r = ohlcv.alias("r")
    span = F.col("a.span_days") * F.expr("interval 1 day")
    j = a.join(
        r,
        (F.col(f"a.{series_col}") == F.col(f"r.{series_col}"))
        & (F.col(f"r.{ts_col}") >= F.col("a.anchor_ts") - span)
        & (F.col(f"r.{ts_col}") <= F.col("a.anchor_ts") + span),
    )
    pre = F.col(f"r.{ts_col}") <= F.col("a.anchor_ts")
    post = F.col(f"r.{ts_col}") >= F.col("a.anchor_ts")
    close = F.col("r.close")
    ts = F.col(f"r.{ts_col}")
    # pandas idxmin/idxmax keep the FIRST occurrence -> tie-break on ts asc
    if trend == "up":
        lo_key, lo_side = F.struct(close, ts), pre
        hi_key, hi_side = F.struct(-close, ts), post
    else:
        hi_key, hi_side = F.struct(-close, ts), pre
        lo_key, lo_side = F.struct(close, ts), post
    agg = j.groupBy(
        F.col(f"a.{series_col}").alias(series_col),
        F.col("a.anchor_ts").alias("anchor_ts"),
        F.col("a.span_days").alias("span_days"),
    ).agg(
        F.min_by(F.struct(ts.alias("t"), close.alias("p")), F.when(lo_side, lo_key)).alias("_lo"),
        F.min_by(F.struct(ts.alias("t"), close.alias("p")), F.when(hi_side, hi_key)).alias("_hi"),
    )
    idmin_ts, price_min = F.col("_lo.t"), F.col("_lo.p")
    idmax_ts, price_max = F.col("_hi.t"), F.col("_hi.p")
    is_up = idmax_ts > idmin_ts
    return agg.select(
        series_col,
        "anchor_ts",
        "span_days",
        F.when(is_up, F.lit("up")).otherwise(F.lit("down")).alias("trend"),
        F.when(is_up, idmin_ts).otherwise(idmax_ts).alias("trendstart"),
        F.when(is_up, idmax_ts).otherwise(idmin_ts).alias("trendend"),
        F.when(is_up, price_min).otherwise(price_max).alias("startprice"),
        F.when(is_up, price_max).otherwise(price_min).alias("endprice"),
        F.when(is_up, price_max / price_min - 1).otherwise(price_min / price_max - 1).alias("pct_chg"),
    )


def find_trend_range_extended(
    ohlcv: DataFrame,
    anchors: DataFrame,
    start_days: int = 20,
    max_days: int = 150,
    step: int = 7,
    trend: str = "up",
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Grow the span until pct_chg stops improving; return each anchor's
    best range — the whole grid in one plan.

    Documented deviation from the reference (patternReviewUtil.py:443-455):
    the reference's first loop iteration re-evaluates span=start_days and
    compares the range to ITSELF, so its 'stopped improving' break always
    fires immediately and it returns the start_days range every time —
    the walk is dead code there. This operator performs the walk the
    reference's code shape clearly intends (same break rule, evaluated
    against the PREVIOUS span); callers wanting the reference's literal
    behavior can call find_trend_range with span_days=start_days."""
    spans = list(range(start_days, max_days, step))
    spark = ohlcv.sparkSession
    # broadcast the tiny span list: otherwise the cartesian product runs
    # |anchors.partitions| x |spans.partitions| tasks (32x32 = 1024 on the
    # default parallelism) for a few dozen rows
    spans_df = spark.createDataFrame([(s,) for s in spans], "span_days int").coalesce(1)
    # the walk owns the span grid: a caller-supplied span_days column would
    # make the crossJoin ambiguous (find_trend_range supports that shape
    # directly — use it for explicit spans)
    grid = anchors.drop("span_days").crossJoin(F.broadcast(spans_df))
    ranges = find_trend_range(ohlcv, grid, trend=trend,
                              series_col=series_col, ts_col=ts_col)
    w = Window.partitionBy(series_col, "anchor_ts").orderBy("span_days")
    prev_pct = F.lag("pct_chg").over(w)
    prev_trend = F.lag("trend").over(w)
    worse = F.when(
        prev_pct.isNull(), F.lit(False)
    ).otherwise(
        F.when(prev_trend == "up", prev_pct >= F.col("pct_chg"))
        .otherwise(prev_pct <= F.col("pct_chg"))
    )
    # first non-improving span ends the walk (reference breaks there)
    flagged = ranges.withColumn(
        "_stopped",
        F.max(worse.cast("int")).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    alive = flagged.filter(F.col("_stopped") == 0)
    w2 = Window.partitionBy(series_col, "anchor_ts").orderBy(F.desc("span_days"))
    return (
        alive.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_stopped")
    )


def fib_levels(
    df: DataFrame,
    col: str = "close",
    minmax_bars: int = 5,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Fibonacci retracement/extension levels off rolling local extrema
    (reference: datalib/patternReviewUtil.py:25-46).

    The reference marks local extrema with ``argrelextrema(np.less_equal /
    np.greater_equal, order=n)`` (value <= / >= every neighbour within +/-n,
    clipped at the edges) and forward-fills each extremum's value; here that
    is value == min/max over a +/-n row frame plus locf. Levels follow the
    reference exactly: retracements ``l1..l4 = max - diff*{0.236, 0.382,
    0.5, 0.618}``, upward extensions ``ul1..ul4 = max + diff*...``, downward
    extensions ``dl1..dl3 = min - diff*{0.236, 0.382, 0.5}`` where
    ``diff = max - min`` of the forward-filled extrema. Pure window exprs,
    one partition pass."""
    w = Window.partitionBy(series_col).orderBy(ts_col)
    we = w.rowsBetween(-minmax_bars, minmax_bars)
    is_min = F.col(col) == F.min(col).over(we)
    is_max = F.col(col) == F.max(col).over(we)
    wl = w.rowsBetween(Window.unboundedPreceding, 0)
    min_px = F.last(F.when(is_min, F.col(col)), ignorenulls=True).over(wl)
    max_px = F.last(F.when(is_max, F.col(col)), ignorenulls=True).over(wl)
    out = (
        df.withColumn("fib_min", min_px)
        .withColumn("fib_max", max_px)
        .withColumn("fib_diff", F.col("fib_max") - F.col("fib_min"))
    )
    d = F.col("fib_diff")
    for i, ratio in enumerate([0.236, 0.382, 0.5, 0.618], start=1):
        out = out.withColumn(f"l{i}", F.col("fib_max") - d * ratio)
    for i, ratio in enumerate([0.236, 0.382, 0.5, 0.618], start=1):
        out = out.withColumn(f"ul{i}", F.col("fib_max") + d * ratio)
    for i, ratio in enumerate([0.236, 0.382, 0.5], start=1):
        out = out.withColumn(f"dl{i}", F.col("fib_min") - d * ratio)
    return out
