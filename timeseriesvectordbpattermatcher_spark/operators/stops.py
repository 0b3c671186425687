"""W19 composite trailing-stop frame — the reference's
``taStopEstimater.get_multi_stop_df`` (/root/reference/datalib/taStopEstimater.py:233-280)
re-expressed as codegen'd window expressions + ONE grouped recursive pass.

Reference semantics preserved (including the naming quirks):

- ``bb`` block (:188-230): 30-bar close mean/std -> bbu1/bbu2/bbl1/bbl2
  (±1σ, ±2.2σ), hold flags close><±1σ, ``bb_ma_exit`` = the mean.
- ``sar_exit`` (:90-103): PSAR − 0.5·ATR(14).
- ``atr_minus_exit`` (:161-172): rolling-50 close mean **+ 0.9·ATR** —
  the reference's "minus" helper actually ADDS 0.9 ATR (its eval string is
  ``mid_ma+ATR*0.9``); quirk preserved.
- ``atr_plus_exit`` (:174-186): rolling-20 close mean + 3·ATR (climax).
- ``nday_low_exit`` (:240): rolling(nbars, min_periods=5) close min,
  shifted 1.
- ``chand_exit`` (:242): chandelier long exit from the external (missing)
  ``chandelierExitBacktester`` — call-site-fixed semantics: rolling-nbars
  high max − retrace_atr_multiple·ATR(nbars), smoothed by a 3-bar mean.
- ``trail_long_exit`` (:253-254): greatest(chand, sar, atr_minus).
- exit signals (:255-257): profit = close crossing atr_plus_exit,
  trail = trail_long_exit crossing close (W6 signal_cross semantics).

Plan shape (pinned in tests/test_plans.py): the rolling means / stddev /
min / max run as Window exprs BEFORE the grouped map, so the whole frame
costs ONE Exchange on the series key — the applyInPandas reuses the
window's hash partitioning, and everything downstream of the recursive
kernels (PSAR + the two ATR folds) is vectorized pandas inside the same
pass. (Grouped-map-first would force a second Exchange: Spark cannot see
FlatMapGroupsInPandas output partitioning.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _w(series_col: str, ts_col: str):
    return Window.partitionBy(series_col).orderBy(ts_col)


def _atr_fold(tr: np.ndarray, n: int) -> list[float]:
    out, acc, a = [], None, 1.0 / n
    for v in tr:
        acc = float(v) if acc is None else acc + a * (float(v) - acc)
        out.append(acc)
    return out


def multi_stop_frame(
    df: DataFrame,
    nbars: int = 30,
    atr_bars: int = 14,
    retrace_atr_multiple: float = 1.0,
    smooth_bars: int = 3,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """OHLCV -> per-row stop/exit frame with the reference's column set."""
    from .tradesim import psar_walk

    w = _w(series_col, ts_col)
    # the bb block is ALWAYS 30 bars: the reference's helper reassigns
    # nbars=30 inside its body (taStopEstimater.py:191), so the parameter
    # only drives the chandelier/nday windows it is actually passed to
    bb_n = 30
    f30 = w.rowsBetween(-(bb_n - 1), 0)
    f50 = w.rowsBetween(-49, 0)
    f20 = w.rowsBetween(-19, 0)
    c = F.col("close")

    ma30 = F.when(F.count("close").over(f30) >= bb_n, F.avg("close").over(f30))
    sd30 = F.when(F.count("close").over(f30) >= bb_n, F.stddev_samp("close").over(f30))
    ma50 = F.when(F.count("close").over(f50) >= 10, F.avg("close").over(f50))
    ma20 = F.when(F.count("close").over(f20) >= 10, F.avg("close").over(f20))
    fmin = w.rowsBetween(-nbars, -1)
    nlow = F.when(F.count("close").over(fmin) >= 5, F.min("close").over(fmin))
    chand_max = F.max("high").over(f30)

    pre = (
        df.withColumn("bbu1", ma30 + sd30)
        .withColumn("bbu2", ma30 + sd30 * 2.2)
        .withColumn("bbl1", ma30 - sd30)
        .withColumn("bbl2", ma30 - sd30 * 2.2)
        .withColumn("bb_ma_exit", ma30)
        .withColumn(
            "bb_hold_long_flag",
            F.when((c > F.col("bbu1")).isNull(), F.lit(0.0))
            .otherwise((c > F.col("bbu1")).cast("double")),
        )
        .withColumn(
            "bb_hold_short_flag",
            F.when((c < F.col("bbl1")).isNull(), F.lit(0.0))
            .otherwise((c < F.col("bbl1")).cast("double")),
        )
        .withColumn("_ma50", ma50)
        .withColumn("_ma20", ma20)
        .withColumn("nday_low_exit", nlow)
        .withColumn("_chand_max", chand_max)
    )

    out_cols = [
        "psar", "atr", "sar_exit", "atr_minus_exit", "atr_plus_exit",
        "chand_exit", "trail_long_exit", "profit_exit_sig", "trail_exit_sig",
    ]
    schema = T.StructType(
        [f for f in pre.schema.fields if not f.name.startswith("_")]
        + [T.StructField(cn, T.DoubleType()) for cn in out_cols]
    )
    keep = [f.name for f in pre.schema.fields if not f.name.startswith("_")]

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        high, low = pdf["high"].to_numpy(), pdf["low"].to_numpy()
        pc = pdf["close"].shift()
        tr = pd.concat(
            [pdf["high"] - pdf["low"], (pdf["high"] - pc).abs(), (pdf["low"] - pc).abs()],
            axis=1,
        ).max(axis=1)
        if len(tr):
            tr.iloc[0] = high[0] - low[0]
        atr = pd.Series(_atr_fold(tr.to_numpy(), atr_bars), index=pdf.index)
        atr_ch = pd.Series(_atr_fold(tr.to_numpy(), nbars), index=pdf.index)
        # LONG-leg-only PSAR (pandas_ta PSARl): the reference takes
        # _['PSARl_0.02_0.2'] (taStopEstimater.py:97-98), which is NaN
        # during downtrends — there sar_exit drops out of the skipna trail
        # max instead of hijacking it with the short-side SAR above price
        sar_vals, up = psar_walk(high, low, return_trend=True)
        psarl = np.where(up, sar_vals, np.nan)
        pdf["psar"] = psarl
        pdf["atr"] = atr
        pdf["sar_exit"] = pdf["psar"] - 0.5 * atr
        pdf["atr_minus_exit"] = pdf["_ma50"] + 0.9 * atr
        pdf["atr_plus_exit"] = pdf["_ma20"] + 3.0 * atr
        chand_raw = pdf["_chand_max"] - retrace_atr_multiple * atr_ch
        pdf["chand_exit"] = chand_raw.rolling(smooth_bars, min_periods=1).mean()
        pdf["trail_long_exit"] = pdf[
            ["chand_exit", "sar_exit", "atr_minus_exit"]
        ].max(axis=1)  # skipna max == F.greatest null semantics

        def cross(a: pd.Series, b: pd.Series) -> pd.Series:
            d = a - b
            dp = d.shift()
            sig = pd.Series(0.0, index=pdf.index)
            m = (d * dp) < 0  # NaN comparisons -> False, matching F.when
            sig[m] = np.sign(d[m])
            return sig

        pdf["profit_exit_sig"] = cross(pdf["close"], pdf["atr_plus_exit"])
        pdf["trail_exit_sig"] = cross(pdf["trail_long_exit"], pdf["close"])
        return pdf[keep + out_cols]

    return pre.groupBy(series_col).applyInPandas(per_series, schema=schema)
