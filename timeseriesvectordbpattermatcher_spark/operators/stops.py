"""W19 composite trailing-stop frame — the reference's
``taStopEstimater.get_multi_stop_df`` (/root/reference/datalib/taStopEstimater.py:233-280)
re-expressed as window expressions over one PSAR+ATR grouped pass.

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
  trail = trail_long_exit crossing close (both via W6 signal_cross).

Everything except PSAR/ATR (recursive, one applyInPandas pass in
tradesim.psar / windows.atr sharing the series partitioning) is a pure
window expression — whole-stage codegen, single Exchange on the series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(series_col: str, ts_col: str):
    return Window.partitionBy(series_col).orderBy(ts_col)


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
    from pyspark.sql import types as T
    import pandas as pd

    from .tradesim import psar_walk
    from .windows import signal_cross

    # one grouped pass for every recursive kernel: PSAR + ATR(atr_bars) +
    # ATR(nbars) (chandelier uses the nbars ATR, matching the reference's
    # atr_bars=nbars call) — a single series shuffle that the window exprs
    # below reuse
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("psar", T.DoubleType()),
            T.StructField("atr", T.DoubleType()),
            T.StructField("_atr_chand", T.DoubleType()),
        ]
    )
    cols = list(df.columns)

    def _atr_fold(tr, n):
        out, acc, a = [], None, 1.0 / n
        for v in tr:
            acc = v if acc is None else acc + a * (v - acc)
            out.append(acc)
        return out

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
        pdf["psar"] = psar_walk(high, low)
        pdf["atr"] = _atr_fold(tr.to_numpy(), atr_bars)
        pdf["_atr_chand"] = _atr_fold(tr.to_numpy(), nbars)
        return pdf[cols + ["psar", "atr", "_atr_chand"]]

    out = df.groupBy(series_col).applyInPandas(per_series, schema=schema)

    w = _w(series_col, ts_col)
    f30 = w.rowsBetween(-(nbars - 1), 0)
    f50 = w.rowsBetween(-49, 0)
    f20 = w.rowsBetween(-19, 0)
    c = F.col("close")

    ma30 = F.when(F.count("close").over(f30) >= nbars, F.avg("close").over(f30))
    sd30 = F.when(F.count("close").over(f30) >= nbars, F.stddev_samp("close").over(f30))
    out = (
        out.withColumn("bbu1", ma30 + sd30)
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
    )

    # sar / atr-band exits
    out = out.withColumn("sar_exit", F.col("psar") - 0.5 * F.col("atr"))
    ma50 = F.when(F.count("close").over(f50) >= 10, F.avg("close").over(f50))
    ma20 = F.when(F.count("close").over(f20) >= 10, F.avg("close").over(f20))
    out = out.withColumn("atr_minus_exit", ma50 + 0.9 * F.col("atr"))
    out = out.withColumn("atr_plus_exit", ma20 + 3.0 * F.col("atr"))

    # n-day low (min_periods=5), shifted one row back
    fmin = w.rowsBetween(-nbars, -1)
    nlow = F.when(F.count("close").over(fmin) >= 5, F.min("close").over(fmin))
    out = out.withColumn("nday_low_exit", nlow)

    # chandelier: rolling high max − k·ATR(nbars), then 3-bar smooth
    fch = w.rowsBetween(-(nbars - 1), 0)
    chand_raw = F.max("high").over(fch) - retrace_atr_multiple * F.col("_atr_chand")
    out = out.withColumn("_chand_raw", chand_raw)
    fsm = w.rowsBetween(-(smooth_bars - 1), 0)
    out = (
        out.withColumn("chand_exit", F.avg("_chand_raw").over(fsm))
        .drop("_chand_raw", "_atr_chand")
    )

    out = out.withColumn(
        "trail_long_exit",
        F.greatest("chand_exit", "sar_exit", "atr_minus_exit"),
    )
    out = signal_cross(out, "close", "atr_plus_exit", out="profit_exit_sig",
                       series_col=series_col, ts_col=ts_col)
    out = signal_cross(out, "trail_long_exit", "close", out="trail_exit_sig",
                       series_col=series_col, ts_col=ts_col)
    return out
