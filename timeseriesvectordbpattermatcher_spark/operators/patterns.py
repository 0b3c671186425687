"""Pattern state machines over extrema tables (SURVEY.md §2.8).

The reference scans an ordered extrema table with fixed lookback tuples and
boolean predicates, emitting (pattern, start_ts, end_ts) intervals
(/root/reference/datalib/extremaPatternLooper.py). Each becomes one Window
pass: ``lag(value, k)`` / ``lag(minmax_type, k)`` columns + a single boolean
expression + a time-span guard ``ts - lag(ts, k-1) <= interval`` — one
shuffle on the series key for the whole pattern family, no Python.

Value column convention: patterns read the extrema price ``px``; callers
build it to match each reference family's column choice (ihs/hs and the
high-patterns read Close, the low-patterns read Low — e.g.
``px = when(minmax_type == 'max', close).otherwise(low)`` for mixed scans).

Documented deviation: the reference's loop ``for i in range(k, len)`` never
evaluates the window ending at the final extremum (its windows end at
``i-1`` <= len-2). We include that last window — strictly more complete;
fixtures pin our semantics and note the reference quirk.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# X11 bull/bear label map (/root/reference/datalib/extremaPatternUtil.py:324-337)
BULL_BEAR = {
    "ihs": 1, "higher_high_low": 1, "higher_low": 1, "higher_high": 1, "vcp_up": 1,
    "hs": -1, "lower_high": -1, "lower_low": -1,
}


def _lags(k: int, px: str = "px", type_col: str = "minmax_type",
          series_col: str = "series_id", ts_col: str = "ts"):
    """Columns a..(k letters) = px lagged k-1..0 (a oldest), same for types/ts."""
    w = Window.partitionBy(series_col).orderBy(ts_col)
    vals = [F.lag(px, k - 1 - i).over(w) for i in range(k)]
    typs = [F.lag(type_col, k - 1 - i).over(w) for i in range(k)]
    t0 = F.lag(ts_col, k - 1).over(w)
    return vals, typs, t0


def _emit(df: DataFrame, k: int, name: str, cond: Column, span_days: int,
          series_col: str = "series_id", ts_col: str = "ts") -> DataFrame:
    vals, typs, t0 = _lags(k, series_col=series_col, ts_col=ts_col)
    span_ok = F.col(ts_col) <= t0 + F.expr(f"interval {span_days} days")
    # materialize the window exprs BEFORE filtering — a select after the
    # filter would re-evaluate lag() over the matched rows only
    return (
        df.withColumn("_start", t0)
        .withColumn("_c", cond & span_ok & t0.isNotNull())
        .filter(F.col("_c"))
        .select(
            F.col(series_col),
            F.lit(name).alias("pattern"),
            F.col("_start").alias("start_ts"),
            F.col(ts_col).alias("end_ts"),
            F.lit(BULL_BEAR.get(name, 0)).alias("bullbear"),
        )
    )


def _pct_close(a: Column, b: Column, tol: float) -> Column:
    return F.abs(a - b) <= tol * (a + b) / 2


def find_ihs_patterns(df: DataFrame, tol_shoulder: float = 0.02,
                      min_depth: float = 0.03, span_days: int = 150,
                      series_col: str = "series_id", ts_col: str = "ts") -> DataFrame:
    """X1 inverse head & shoulders, 5-tuple a,b,c,d,e
    (/root/reference/datalib/extremaPatternLooper.py:137-165):
    a<b, c<a, c<e, c<d, e<d, |b-d| <= 2%·mean(b,d), |b-c| >= 3%, type(c)='min'."""
    (a, b, c, d, e), typs, t0 = _lags(5, series_col=series_col, ts_col=ts_col)
    cond = (
        (a < b) & (c < a) & (c < e) & (c < d) & (e < d)
        & _pct_close(b, d, tol_shoulder)
        & (F.abs(b - c) >= min_depth * (b + c) / 2)
        & (typs[2] == "min")
    )
    return _emit(df, 5, "ihs", cond, span_days, series_col, ts_col)


def find_hs_patterns(df: DataFrame, tol_shoulder: float = 0.02,
                     min_depth: float = 0.03, span_days: int = 150,
                     series_col: str = "series_id", ts_col: str = "ts") -> DataFrame:
    """X2 head & shoulders (/root/reference/datalib/extremaPatternLooper.py:169-201):
    a>b, c>a, c>e, c>d, e>d, d<b, type(c)='max', |b-c| >= 3%, with anti-flat
    guards rejecting |a-b| <= 2%·mean(b,d) and |d-e| <= 2%·mean(e,e)."""
    (a, b, c, d, e), typs, t0 = _lags(5, series_col=series_col, ts_col=ts_col)
    cond = (
        (a > b) & (c > a) & (c > e) & (c > d) & (e > d) & (d < b)
        & (typs[2] == "max")
        & (F.abs(b - c) >= min_depth * (b + c) / 2)
        & ~(F.abs(a - b) <= tol_shoulder * (b + d) / 2)  # anti-flat guard 1
        & ~(F.abs(d - e) <= tol_shoulder * e)  # guard 2 (mean(e,e) == e in ref)
    )
    return _emit(df, 5, "hs", cond, span_days, series_col, ts_col)


def find_higher_low_patterns(df: DataFrame, span_days: int = 100,
                             series_col: str = "series_id", ts_col: str = "ts") -> DataFrame:
    """X4: 4 successive minima strictly ascending
    (/root/reference/datalib/extremaPatternLooper.py:65-79)."""
    # input is pre-filtered to minima, so lagged-type conjuncts are
    # tautological (NULL lags already excluded by _emit's t0 guard)
    vals, _typs, t0 = _lags(4, series_col=series_col, ts_col=ts_col)
    cond = (vals[0] < vals[1]) & (vals[1] < vals[2]) & (vals[2] < vals[3])
    return _emit(df.filter(F.col("minmax_type") == "min"), 4, "higher_low",
                 cond, span_days, series_col, ts_col)


def find_higher_high_patterns(df: DataFrame, span_days: int = 100,
                              series_col: str = "series_id", ts_col: str = "ts") -> DataFrame:
    """X5: 4 successive maxima strictly ascending (:81-97)."""
    vals, _typs, t0 = _lags(4, series_col=series_col, ts_col=ts_col)
    cond = (vals[0] < vals[1]) & (vals[1] < vals[2]) & (vals[2] < vals[3])
    return _emit(df.filter(F.col("minmax_type") == "max"), 4, "higher_high",
                 cond, span_days, series_col, ts_col)


def find_lower_high_patterns(df: DataFrame, tol: float = 0.02, span_days: int = 100,
                             series_col: str = "series_id", ts_col: str = "ts") -> DataFrame:
    """X6: 4 maxima strictly descending with |b-c| <= 2% (:99-115)."""
    (a, b, c, d), _typs, t0 = _lags(4, series_col=series_col, ts_col=ts_col)
    cond = (a > b) & (b > c) & (c > d) & _pct_close(b, c, tol)
    return _emit(df.filter(F.col("minmax_type") == "max"), 4, "lower_high",
                 cond, span_days, series_col, ts_col)


def find_lower_low_patterns(df: DataFrame, tol: float = 0.02, span_days: int = 100,
                            series_col: str = "series_id", ts_col: str = "ts") -> DataFrame:
    """X7: 4 minima strictly descending with |b-c| <= 2% (:118-134)."""
    (a, b, c, d), _typs, t0 = _lags(4, series_col=series_col, ts_col=ts_col)
    cond = (a > b) & (b > c) & (c > d) & _pct_close(b, c, tol)
    return _emit(df.filter(F.col("minmax_type") == "min"), 4, "lower_low",
                 cond, span_days, series_col, ts_col)


def find_higher_high_low_patterns(df: DataFrame, max_step: float = 0.10,
                                  span_days: int = 100,
                                  series_col: str = "series_id", ts_col: str = "ts") -> DataFrame:
    """X3: 7-window split by type — highs strictly ascending (step <= +10%),
    lows strictly ascending (step <= +10%), |#hi - #lo| <= 2, last is 'min'
    (/root/reference/datalib/extremaPatternLooper.py:9-62). The per-type
    split inside a positional window needs collect -> filter, done with
    window collect_lists (arrays stay tiny: 7 elements)."""
    w = (
        Window.partitionBy(series_col)
        .orderBy(ts_col)
        .rowsBetween(-6, 0)
    )
    vals = F.collect_list(F.struct(F.col("minmax_type").alias("t"), F.col("px").alias("v"))).over(w)
    t0 = F.min(ts_col).over(w)
    cnt = F.count("*").over(w)
    highs = F.filter(vals, lambda s: s.getField("t") == F.lit("max"))
    lows = F.filter(vals, lambda s: s.getField("t") == F.lit("min"))
    hv = F.transform(highs, lambda s: s.getField("v"))
    lv = F.transform(lows, lambda s: s.getField("v"))

    def _arr_ascending(arr):
        pairs = F.zip_with(arr, F.slice(F.concat(arr, F.array(F.lit(None).cast("double"))), 2, 100),
                           lambda x, y: F.when(y.isNull(), True)
                           .otherwise((x < y) & (y <= x * (1 + max_step))))
        return F.forall(pairs, lambda b: b)

    cond = (
        (cnt == 7)
        & (F.size(hv) >= 3) & (F.size(lv) >= 3)
        & (F.abs(F.size(hv) - F.size(lv)) <= 2)
        & _arr_ascending(hv)
        & _arr_ascending(lv)
        & (F.col("minmax_type") == "min")
        & (F.col(ts_col) <= t0 + F.expr(f"interval {span_days} days"))
    )
    return (
        df.withColumn("_t0", t0).withColumn("_c", cond)
        .filter("_c")
        .select(
            F.col(series_col),
            F.lit("higher_high_low").alias("pattern"),
            F.col("_t0").alias("start_ts"),
            F.col(ts_col).alias("end_ts"),
            F.lit(BULL_BEAR["higher_high_low"]).alias("bullbear"),
        )
    )


def all_patterns(extrema: DataFrame, series_col: str = "series_id",
                 ts_col: str = "ts") -> DataFrame:
    """X12 screener core: union of every pattern family over one extrema
    table (/root/reference/datalib/extremaPatternUtil.py:171-322 loops the
    same families per ticker; here one plan covers all series)."""
    parts = [
        find_ihs_patterns(extrema, series_col=series_col, ts_col=ts_col),
        find_hs_patterns(extrema, series_col=series_col, ts_col=ts_col),
        find_higher_low_patterns(extrema, series_col=series_col, ts_col=ts_col),
        find_higher_high_patterns(extrema, series_col=series_col, ts_col=ts_col),
        find_lower_high_patterns(extrema, series_col=series_col, ts_col=ts_col),
        find_lower_low_patterns(extrema, series_col=series_col, ts_col=ts_col),
        find_higher_high_low_patterns(extrema, series_col=series_col, ts_col=ts_col),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# X8: VCP (volatility-contraction) breakout — sequential running-max check
# ---------------------------------------------------------------------------

def _pattern_schema(df: "DataFrame", series_col: str) -> str:
    """Output schema for the grouped-map pattern finders: the series column
    keeps the CALLER'S name and type (hardcoding 'series_id string' broke
    series_col='ticker' and integer ids — review finding)."""
    sid_type = df.schema[series_col].dataType.simpleString()
    return (
        f"{series_col} {sid_type}, pattern string, "
        "start_ts timestamp, end_ts timestamp, bullbear int"
    )


def find_vcp_up_patterns(
    extrema: "DataFrame",
    span_min_days: int = 50,
    max_cap: int | None = None,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> "DataFrame":
    """X8 (/root/reference/datalib/extremaPatternLooper.py:247-272 +
    check_low_vol_breakup :205-245): scan 8-windows of maxima; within
    [start, end] need >=4 maxima and >=3 minima; walking max->next-min
    ranges (high-low)/low must never exceed 1.1x the running max range
    (seeded 0.04); the final maximum's close must break above all previous
    maxima's highs.

    Sequential running-max per window -> grouped-map per series (extrema
    tables are ~5% of raw rows; parallel across series). ``max_cap``
    reproduces the reference's early-exit after >5 patterns (T4,
    order-dependent — off by default, fixtures pin the uncapped set).

    Preserved reference quirk (unlike the divergence family, which fixed
    it): the loop never evaluates the window ENDING at the final maximum
    (``range(size, len)`` not ``len+1`` — extremaPatternLooper.py:249), so
    the freshest possible signal is structurally unreachable; goldens and
    the pandas oracle pin this loop shape."""
    import pandas as pd

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        sid = pdf[series_col].iloc[0]
        maxp = pdf[pdf["minmax_type"] == "max"].reset_index(drop=True)
        minp = pdf[pdf["minmax_type"] == "min"].reset_index(drop=True)
        rows = []
        size = 8
        for i in range(size, len(maxp)):
            win = maxp.iloc[i - size : i]
            sd, ed = win[ts_col].iloc[0], win[ts_col].iloc[-1]
            if (ed - sd).days < span_min_days:
                continue
            sub_max = maxp[(maxp[ts_col] >= sd) & (maxp[ts_col] <= ed)]
            sub_min = minp[(minp[ts_col] >= sd) & (minp[ts_col] <= ed)]
            if len(sub_max) < 4 or len(sub_min) < 3:
                continue
            diffs = [0.04]
            ok = True
            for _, mp in sub_max.iloc[:-1].iterrows():
                nxt = sub_min[sub_min[ts_col] >= mp[ts_col]]
                if len(nxt) == 0:
                    ok = False
                    break
                d = (mp["high"] - nxt["low"].iloc[0]) / nxt["low"].iloc[0]
                # non-finite ratio (zero/negative-price bar) must REJECT
                # the window: NaN > x is False, so it would otherwise slip
                # into diffs and count as a contraction
                if not np.isfinite(d) or d > max(diffs) * 1.1:
                    ok = False
                    break
                diffs.append(d)
            if not ok:
                continue
            if sub_max["close"].iloc[-1] > sub_max["high"].iloc[:-1].max():
                rows.append((sid, "vcp_up", sd, ed, 1))
                if max_cap is not None and len(rows) > max_cap:
                    break
        return pd.DataFrame(rows, columns=[series_col, "pattern", "start_ts", "end_ts", "bullbear"])

    return extrema.groupBy(series_col).applyInPandas(
        per_series, schema=_pattern_schema(extrema, series_col)
    )


# ---------------------------------------------------------------------------
# X9/X10: divergence — main extrema monotone one way, aux indicator extrema
# inside the same interval monotone the other way (cogrouped map, J4 join)
# ---------------------------------------------------------------------------




def _monotone(vals, direction: str) -> bool:
    prev = vals[0]
    for v in vals[1:]:
        if direction == "up":
            if v <= prev:
                return False
        else:
            if v >= prev:
                return False
        prev = v
    return True


def divergence_scan_pdf(
    main_pdf, aux_pdf, name,
    main_col="px", aux_col="px", ex_cond="down,up",
    main_size=5, span_days=100, series_col="series_id", ts_col="ts",
) -> list[tuple]:
    """The containment scan kernel (pure pandas, shared by
    find_divergence_patterns and divergence_screener's single-cogroup
    kernel): slide main_size windows over the main extrema; main monotone
    per ex_cond[0], contained aux extrema monotone per ex_cond[1]."""
    if main_pdf.empty or aux_pdf.empty:
        return []
    up_ex, down_ex = ex_cond.split(",")
    bull = 1 if ex_cond == "down,up" else -1
    main_pdf = main_pdf.sort_values(ts_col).reset_index(drop=True)
    aux_pdf = aux_pdf.sort_values(ts_col).reset_index(drop=True)
    sid = main_pdf[series_col].iloc[0]
    rows = []
    for i in range(main_size, len(main_pdf) + 1):  # includes final window
        win = main_pdf.iloc[i - main_size : i]
        sd, ed = win[ts_col].iloc[0], win[ts_col].iloc[-1]
        if (ed - sd).days > span_days:
            continue
        main_vals = win[main_col].tolist()
        aux_win = aux_pdf[(aux_pdf[ts_col] >= sd) & (aux_pdf[ts_col] <= ed)]
        aux_vals = aux_win[aux_col].tolist()
        if len(main_vals) < 3 or len(aux_vals) < 3:
            continue
        if _monotone(main_vals, up_ex) and _monotone(aux_vals, down_ex):
            rows.append((sid, name, sd, ed, bull))
    return rows


def find_divergence_patterns(
    main_extrema: "DataFrame",
    aux_extrema: "DataFrame",
    main_col: str = "px",
    aux_col: str = "px",
    ex_cond: str = "down,up",
    main_size: int = 5,
    span_days: int = 100,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> "DataFrame":
    """X9 (/root/reference/datalib/extremaPatternLooper.py:275-355): slide
    ``main_size`` windows over the main extrema; the main values must be
    strictly monotone per ``ex_cond[0]`` and the aux extrema falling inside
    [start, end] (interval-containment join J4) strictly monotone per
    ``ex_cond[1]``; both windows need >=3 points; span <= span_days. The
    reference's loop here runs ``range(size, len+1)`` — the final window IS
    included (:280), unlike its other pattern loops.

    Cogrouped map: main and aux extrema are co-partitioned by series and
    processed together — the Spark-native form of the reference's
    ``aux_max_min.loc[w0:w1]`` lookup."""
    import pandas as pd

    name = f"divergence_{ex_cond.replace(',', '_')}"

    def per_series(main_pdf: pd.DataFrame, aux_pdf: pd.DataFrame) -> pd.DataFrame:
        rows = divergence_scan_pdf(
            main_pdf, aux_pdf, name, main_col=main_col, aux_col=aux_col,
            ex_cond=ex_cond, main_size=main_size, span_days=span_days,
            series_col=series_col, ts_col=ts_col,
        )
        return pd.DataFrame(rows, columns=[series_col, "pattern", "start_ts", "end_ts", "bullbear"])

    # re-alias every column on both sides: when main and aux derive from the
    # SAME parent plan (the screener builds both from one ta_indicators
    # frame), cogroup's analysis dedups the shared attribute ids and the aux
    # side silently loses its ts column — fresh exprIds prevent that
    def _rewrap(d: "DataFrame") -> "DataFrame":
        return d.select(*[F.col(c).alias(c) for c in d.columns])

    return (
        _rewrap(main_extrema).groupBy(series_col)
        .cogroup(_rewrap(aux_extrema).groupBy(series_col))
        .applyInPandas(
            lambda m, a: per_series(m, a),
            schema=_pattern_schema(main_extrema, series_col),
        )
    )


def column_extrema(
    df: DataFrame, col: str, smoothing: int = 3, order: int = 3,
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """Local extrema of a SMOOTHED single column — the reference's
    ``get_max_min_dateidx`` (/root/reference/datalib/extremaPatternUtil.py:32-44:
    rolling(smoothing).mean() then argrelextrema over ±order). Emits one row
    per extremum with ``minmax_type`` and ``px`` = the original column value
    at that row. Pure window exprs; rows whose smoothing window is not yet
    full are excluded (pandas rolling-mean NaN warm-up)."""
    w = Window.partitionBy(series_col).orderBy(ts_col)
    fs = w.rowsBetween(-(smoothing - 1), 0)
    sm = F.when(F.count(col).over(fs) >= smoothing, F.avg(col).over(fs))
    out = df.withColumn("_sm", sm)
    we = w.rowsBetween(-order, order)
    is_max = F.col("_sm") == F.max("_sm").over(we)
    is_min = F.col("_sm") == F.min("_sm").over(we)
    tag = (
        F.when(F.col("_sm").isNull(), F.lit("na"))
        .when(is_max, F.lit("max"))
        .when(is_min, F.lit("min"))
        .otherwise(F.lit("na"))
    )
    return (
        out.withColumn("minmax_type", tag)
        .filter("minmax_type != 'na'")
        .select(series_col, ts_col, "minmax_type", F.col(col).alias("px"))
    )


def divergence_screener(
    ohlcv: DataFrame,
    indicators: tuple[str, ...] = ("obv", "macd", "rsi", "ad", "adosc", "mfi"),
    sides: tuple[str, ...] = ("bull", "bear"),
    smoothing: int = 3,
    order: int = 3,
    main_size: int = 5,
    span_days: int = 100,
    series_col: str = "series_id",
    ts_col: str = "ts",
    materialize: bool = True,
) -> DataFrame:
    """X9/X10 end-to-end over the reference's screener grid
    (/root/reference/datalib/extremaPatternUtil.py:400-470): append the six
    aux indicator series (ta_indicators), build the price extrema table and
    one smoothed-extrema table PER indicator, then run the general
    divergence containment scan per (indicator, side):

    - bull: price minima strictly falling while the aux minima inside the
      same window strictly rise  (ex_cond 'down,up')
    - bear: price maxima strictly rising while the aux maxima fall
      (ex_cond 'up,down')

    DOCUMENTED DEVIATION from the reference (unlike the quirks preserved
    elsewhere, e.g. stops.py's atr_minus adding 0.9*ATR): the reference
    passes a single ``ex_cond`` (default 'up,down') to BOTH sides and its
    mfi_bull branch scans price MAXIMA (``max_subset``,
    extremaPatternUtil.py:430-444) — so its "bullish" legs actually test
    rising-price/falling-indicator windows. We treat that as a bug and fix
    the per-side semantics: bull scans price minima with 'down,up', bear
    scans price maxima with 'up,down', uniformly across all six indicators.

    ONE cogroup for the whole grid: the six aux extrema tables (pure
    window exprs over one shared, optionally-materialized indicator frame)
    union into a single ``ind``-tagged frame, price extrema cogroup with it
    per series, and the (indicator, side) loop runs inside the pandas
    kernel — a 12-leg union of cogroups would pay 12x the stage/shuffle
    fixed costs for the same answer. Patterns are named '<col>_<side>_div'
    (the reference's signame convention). ``materialize=True`` (default)
    localCheckpoints the shared indicator frame (Catalyst does not share
    the ta_indicators subtree across the six aux branches); pass False on
    fault-tolerance-sensitive clusters and persist to a table instead."""
    import pandas as pd

    from .dedup import _materialize
    from .indicators import ta_indicators

    ind = ta_indicators(ohlcv, series_col=series_col, ts_col=ts_col)
    if materialize:
        ind = _materialize(ind)
    price_ex = column_extrema(
        ind, "close", smoothing=smoothing, order=order,
        series_col=series_col, ts_col=ts_col,
    )
    aux_parts = []
    for col in indicators:
        aux_parts.append(
            column_extrema(
                ind.filter(F.col(col).isNotNull()), col,
                smoothing=smoothing, order=order,
                series_col=series_col, ts_col=ts_col,
            ).withColumn("ind", F.lit(col))
        )
    aux_all = aux_parts[0]
    for p in aux_parts[1:]:
        aux_all = aux_all.unionByName(p)

    inds = list(indicators)
    side_list = list(sides)

    def per_series(main_pdf: pd.DataFrame, aux_pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if not main_pdf.empty and not aux_pdf.empty:
            main_min = main_pdf[main_pdf["minmax_type"] == "min"]
            main_max = main_pdf[main_pdf["minmax_type"] == "max"]
            for col in inds:
                aux_c = aux_pdf[aux_pdf["ind"] == col]
                if "bull" in side_list:
                    rows += divergence_scan_pdf(
                        main_min, aux_c[aux_c["minmax_type"] == "min"],
                        f"{col}_bull_div", ex_cond="down,up",
                        main_size=main_size, span_days=span_days,
                        series_col=series_col, ts_col=ts_col,
                    )
                if "bear" in side_list:
                    rows += divergence_scan_pdf(
                        main_max, aux_c[aux_c["minmax_type"] == "max"],
                        f"{col}_bear_div", ex_cond="up,down",
                        main_size=main_size, span_days=span_days,
                        series_col=series_col, ts_col=ts_col,
                    )
        return pd.DataFrame(
            rows, columns=[series_col, "pattern", "start_ts", "end_ts", "bullbear"]
        )

    def _rewrap(d: DataFrame) -> DataFrame:
        return d.select(*[F.col(c).alias(c) for c in d.columns])

    return (
        _rewrap(price_ex).groupBy(series_col)
        .cogroup(_rewrap(aux_all).groupBy(series_col))
        .applyInPandas(per_series, schema=_pattern_schema(price_ex, series_col))
    )
