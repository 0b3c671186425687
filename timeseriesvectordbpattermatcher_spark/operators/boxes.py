"""X13 box detection + breakout signals (reference: datalib/extremaPlotter.py).

Faithful Spark restatement of the reference's multi-horizon band-agreement
box detector:

- bands (/root/reference/datalib/extremaPlotter.py:560-574): for n in the
  day list, ``ub{n} = Low.rolling(n).max()``, ``lb{n} = Low.rolling(n).min()``
  and 1-shifted variants ``u1b{n}/l1b{n}``; ``atr = ATR(25)``.
- detection (:10-120): at a date x, count (n2, n1>n2) combos where the short
  band sits at/beyond the shifted long band within 3%; box_score adds 0.1001
  per upper hit and 0.1000001 per lower hit; tightness guard rejects
  ``atr > band_width`` or ``band_width/price > 10%``.
- reference quirk preserved: ``ub_near_cnt``/``lb_near_cnt`` are RESET at
  each outer n2 iteration (:36,:59), so the final counts only reflect the
  last n2 (=15); ``recent_max``/``recent_min`` are the band values of the
  last matching combo in loop order.
- breakout signal (:576-604): Close crossing yesterday's nbars-high (long)
  / nbars-low (short).

Everything is pure window expressions — one pass, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tradesim import psar  # noqa: F401  (re-export convenience)
from .windows import _frame

DAY_LIST = [10, 15, 20, 25, 30]
UB_N2 = [10, 15]
UB_N1 = [15, 20, 25, 30]
LB_N1 = [10, 15, 20, 25, 30]
DELTA_TH = 0.03


def add_box_bands(
    df: DataFrame,
    day_list: list[int] = DAY_LIST,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    out = df
    for n in day_list:
        w0 = _frame(series_col, ts_col, n)
        w1 = _frame(series_col, ts_col, n, shift=1)
        # pandas min_periods semantics: null until the window is full
        full0 = F.count("low").over(w0) >= n
        full1 = F.count("low").over(w1) >= n
        out = (
            out.withColumn(f"ub{n}", F.when(full0, F.max("low").over(w0)))
            .withColumn(f"lb{n}", F.when(full0, F.min("low").over(w0)))
            .withColumn(f"u1b{n}", F.when(full1, F.max("low").over(w1)))
            .withColumn(f"l1b{n}", F.when(full1, F.min("low").over(w1)))
        )
    # ATR(25), RMA — reuse the grouped-map kernel
    from .windows import atr as _atr

    out = _atr(out, 25, out="atr", series_col=series_col, ts_col=ts_col)
    return out


def _band_signals(banded: DataFrame, delta_th: float):
    """The band-agreement scoring spec, shared by :func:`detect_boxes` and
    :func:`detect_boxes_forecast` (which must stay bit-identical — the
    0.1001/0.1000001 constants and combo loop order are load-bearing for the
    committed goldens). Returns (score, ub_near, lb_near, recent_max,
    recent_min) column expressions over an ``add_box_bands`` frame."""
    ub_combos = [(n2, n1) for n2 in UB_N2 for n1 in UB_N1 if n1 > n2]
    lb_combos = [(n2, n1) for n2 in UB_N2 for n1 in LB_N1 if n1 > n2]

    def near(cond_col, short_b, long_b):
        # try_divide: a zero band (price floor 0 in the bars) gives NULL,
        # and NULL < delta_th is False — exactly the reference's pandas
        # behavior, where x/0 -> inf and 0/0 -> nan both fail the < test
        return cond_col & (F.try_divide(F.abs(short_b - long_b), long_b) < delta_th)

    # score accumulates over ALL combos; near counts only over the last n2
    score = F.lit(0.0)
    for n2, n1 in ub_combos:
        hit = banded[f"ub{n2}"] >= banded[f"u1b{n1}"]
        score = score + F.when(near(hit, banded[f"ub{n2}"], banded[f"u1b{n1}"]), 0.1001).otherwise(0.0)
    for n2, n1 in lb_combos:
        hit = banded[f"lb{n2}"] <= banded[f"l1b{n1}"]
        score = score + F.when(near(hit, banded[f"lb{n2}"], banded[f"l1b{n1}"]), 0.1000001).otherwise(0.0)

    last_n2 = UB_N2[-1]
    ub_near = sum(
        (
            F.when(
                near(banded[f"ub{last_n2}"] >= banded[f"u1b{n1}"], banded[f"ub{last_n2}"], banded[f"u1b{n1}"]),
                1,
            ).otherwise(0)
            for n1 in UB_N1
            if n1 > last_n2
        ),
        F.lit(0),
    )
    lb_near = sum(
        (
            F.when(
                near(banded[f"lb{last_n2}"] <= banded[f"l1b{n1}"], banded[f"lb{last_n2}"], banded[f"l1b{n1}"]),
                1,
            ).otherwise(0)
            for n1 in LB_N1
            if n1 > last_n2
        ),
        F.lit(0),
    )

    # recent_max/min: band value of the LAST matching combo in loop order
    recent_max = F.lit(None).cast("double")
    for n2, n1 in ub_combos:  # later combos override -> build forward
        recent_max = F.when(
            banded[f"ub{n2}"] >= banded[f"u1b{n1}"], banded[f"ub{n2}"]
        ).otherwise(recent_max)
    recent_min = F.lit(None).cast("double")
    for n2, n1 in lb_combos:
        recent_min = F.when(
            banded[f"lb{n2}"] <= banded[f"l1b{n1}"], banded[f"lb{n2}"]
        ).otherwise(recent_min)
    return score, ub_near, lb_near, recent_max, recent_min


def detect_boxes(
    df: DataFrame,
    delta_th: float = DELTA_TH,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per (series, ts) where a tight box is detected."""
    banded = add_box_bands(df, series_col=series_col, ts_col=ts_col)
    score, ub_near, lb_near, recent_max, recent_min = _band_signals(banded, delta_th)

    band_width = recent_max - recent_min
    tight = (F.col("atr") <= band_width) & (band_width / F.col("close") <= 0.1)

    out = (
        banded.withColumn("box_score", score)
        .withColumn("ub_near_cnt", ub_near)
        .withColumn("lb_near_cnt", lb_near)
        .withColumn("box_ub", recent_max)
        .withColumn("box_lb", recent_min)
        .withColumn(
            "is_box",
            (F.col("ub_near_cnt") > 0)
            & (F.col("lb_near_cnt") > 0)
            & recent_max.isNotNull()
            & recent_min.isNotNull()
            & tight,
        )
    )
    return out.filter("is_box").select(
        series_col, ts_col, "box_ub", "box_lb", "box_score", "ub_near_cnt", "lb_near_cnt", "atr"
    )


def box_breakout_signals(
    df: DataFrame,
    nbars: int = 30,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Breakout entries (/root/reference/datalib/extremaPlotter.py:576-593):
    long when Close > yesterday's nbars-high, short when Close < yesterday's
    nbars-low. pandas min_periods semantics: the reference's
    ``rolling(nbars).max().shift(1)`` is NaN through the warm-up, so no
    signal can fire before ``nbars`` full bars (an unguarded partial window
    fired on nearly every rising bar of the warm-up)."""
    wsh = _frame(series_col, ts_col, nbars, shift=1)
    full = F.count("high").over(wsh) >= nbars
    ub = F.when(full, F.max("high").over(wsh))
    lb = F.when(full, F.min("low").over(wsh))
    return (
        df.withColumn("sig_long", (F.col("close") > ub).cast("int"))
        .withColumn("sig_short", (F.col("close") < lb).cast("int"))
        .filter((F.col("sig_long") == 1) | (F.col("sig_short") == 1))
        .select(series_col, ts_col, "close", "sig_long", "sig_short")
    )


def detect_boxes_forecast(
    df: DataFrame,
    delta_th: float = DELTA_TH,
    def_win_size: int = 10,
    series_col: str = "series_id",
    ts_col: str = "ts",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """X13 forecast mode (/root/reference/datalib/extremaPlotter.py:85-120
    ``find_box_on_plot_by_date(is_forecast=True)``): rows where the band
    detector finds no box fall back to the last ``def_win_size``-bar
    high-max/low-min window as the box, tagged ``signame='forecast'`` with
    ``box_score - 3`` (:87,:91-97); detected rows keep ``'box_breakout'``.
    The reference's "not 3pt" -1 penalty does NOT apply here: :102 guards
    it with ``and not is_forecast`` (a review caught this operator paying
    it anyway). The forecast path likewise skips the tightness guard
    (:112 ``and not is_forecast``) — every row yields a box.
    Same single window pass as :func:`detect_boxes`."""
    # fallback window FIRST: add_box_bands ends in the ATR grouped map,
    # whose unknown output partitioning would force a second Exchange for
    # any window computed after it (pinned by
    # tests/test_plans.py::test_box_forecast_single_exchange)
    wf = _frame(series_col, ts_col, def_win_size)
    pre = df.withColumn("_fb_ub", F.max("high").over(wf)).withColumn(
        "_fb_lb", F.min("low").over(wf)
    )
    banded = add_box_bands(pre, series_col=series_col, ts_col=ts_col)
    score, ub_near, lb_near, recent_max, recent_min = _band_signals(banded, delta_th)

    # forecast fallback: last def_win_size bars ending at this row
    # (computed pre-bands, see above)
    fb_ub = banded["_fb_ub"]
    fb_lb = banded["_fb_lb"]

    found = recent_max.isNotNull() & recent_min.isNotNull()
    box_ub = F.when(found, recent_max).otherwise(fb_ub)
    box_lb = F.when(found, recent_min).otherwise(fb_lb)
    box_score = F.when(~found, score - 3.0).otherwise(score)
    signame = F.when(found, F.lit("box_breakout")).otherwise(F.lit("forecast"))

    return (
        banded.withColumn("signame", signame)
        .withColumn("box_ub", box_ub)
        .withColumn("box_lb", box_lb)
        .withColumn("box_score", box_score)
        .withColumn("ub_near_cnt", ub_near)
        .withColumn("lb_near_cnt", lb_near)
        .select(
            series_col, ts_col, "signame", "box_ub", "box_lb", "box_score",
            "ub_near_cnt", "lb_near_cnt", "atr", *extra_cols,
        )
    )


def box_buy_sell_signals(box_details: DataFrame) -> DataFrame:
    """Buy/sell rule evaluation over a box-details table
    (/root/reference/datalib/extremaPlotter.py:353-402 ``suggest_buy`` /
    ``strong_buy`` / ``suggest_sell`` / ``strong_sell``).

    Input columns (the reference's box_details dict fields):
    ``recent_vol_bias_plus`` (double), ``score`` (double), ``rs_plus``
    (boolean), ``snr_mid_plus`` (boolean), ``duration`` (days, numeric).

    Reference quirks preserved: the strong rules compute an ``f5`` duration
    flag but never test it (:366-373 strong_buy ignores duration>39, :394-401
    strong_sell ignores duration>28); the suggest rules sum their first three
    flags and threshold the sum (>2 buy, >1 sell) while f4/f5 gate
    separately. Pure codegen'd expressions, no shuffle."""
    vol = F.col("recent_vol_bias_plus")
    score = F.col("score")
    rs = F.col("rs_plus")
    snr = F.col("snr_mid_plus")
    dur = F.col("duration")
    i = lambda c: c.cast("int")  # noqa: E731

    buy_overall = i(vol >= 0) + i(score > 2) + i(rs)
    sell_overall = i(vol < 0) + i(score < 3) + i(~rs)
    return (
        box_details.withColumn(
            "suggest_buy", (buy_overall > 2) & snr & (dur > 25)
        )
        .withColumn(
            "strong_buy", (vol >= 0) & (score > 4) & rs & snr  # f5 unused (quirk)
        )
        .withColumn(
            "suggest_sell", (sell_overall > 1) & ~snr & (dur > 15)
        )
        .withColumn(
            "strong_sell", (vol < 0) & (score < 3) & ~rs & ~snr  # f5 unused (quirk)
        )
    )
