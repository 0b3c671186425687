"""W17 TA indicators: RSI, MACD, MFI, AD, ADOSC (+ the existing OBV/ATR/
Bollinger in windows.py) — the six aux series the reference's divergence
screener builds per ticker (/root/reference/datalib/extremaPatternUtil.py:400-421:
``pdf.ta.macd() / obv() / rsi(14) / ad() / adosc() / mfi()``).

Design split:

- **AD and MFI are pure window expressions** (cumulative sum / rolling sums)
  — whole-stage codegen, no Python.
- **RSI / MACD / ADOSC are EMA-recursive**, so they run in ONE grouped
  ``applyInPandas`` pass per series (``ema_family``): sequential within a
  series, embarrassingly parallel across series. The three indicators share
  the pass so the series shuffle happens once.

EMA semantics (documented, both sides of the oracle): left fold
``acc = acc + alpha * (x - acc)`` seeded with the first observation —
the ewm(adjust=False) recursion written so a DuckDB
``list_reduce(list(x) OVER w, (acc, v) -> acc + a*(v-acc))`` oracle
reproduces it bit-for-bit (same IEEE-754 ops in the same order). Warm-up:
RSI is null until ``length`` price changes exist; MACD/ADOSC emit from the
first row (fold from x0), signal folds over the MACD series itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _w(series_col: str, ts_col: str):
    return Window.partitionBy(series_col).orderBy(ts_col)


def _cum(w):
    return w.rowsBetween(Window.unboundedPreceding, 0)


def accum_dist(
    df: DataFrame, out: str = "ad",
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W17 AD line: cumsum of money-flow volume; mfm = ((c-l)-(h-c))/(h-l),
    0 on a degenerate bar (h == l) — pure window expr."""
    w = _w(series_col, ts_col)
    c, h, l = F.col("close"), F.col("high"), F.col("low")
    mfm = F.when(h > l, ((c - l) - (h - c)) / (h - l)).otherwise(F.lit(0.0))
    return df.withColumn(out, F.sum(mfm * F.col("volume")).over(_cum(w)))


def mfi(
    df: DataFrame, n: int = 14, out: str = "mfi",
    series_col: str = "series_id", ts_col: str = "ts",
) -> DataFrame:
    """W17 MFI(n): typical price tp=(h+l+c)/3, raw flow tp*volume split by
    sign(Δtp), mfi = 100 * pos_sum / (pos_sum + neg_sum) over n rows —
    pure window sums. Null until n changes observed; 50 when both sums
    are 0 (flat window, talib convention)."""
    w = _w(series_col, ts_col)
    tp = (F.col("high") + F.col("low") + F.col("close")) / 3.0
    dtp = tp - F.lag(tp).over(w)
    flow = tp * F.col("volume")
    pos = F.when(dtp > 0, flow).otherwise(F.lit(0.0))
    neg = F.when(dtp < 0, flow).otherwise(F.lit(0.0))
    frame = w.rowsBetween(-(n - 1), 0)
    pos_s = F.sum(pos).over(frame)
    neg_s = F.sum(neg).over(frame)
    cnt = F.count(dtp).over(frame)  # counts non-null Δtp rows in frame
    val = F.when(pos_s + neg_s > 0, 100.0 * pos_s / (pos_s + neg_s)).otherwise(F.lit(50.0))
    return df.withColumn(out, F.when(cnt >= n, val))


# ---------------------------------------------------------------------------
# EMA-recursive family: RSI, MACD(+signal/hist), ADOSC — one grouped pass
# ---------------------------------------------------------------------------


def _ema_fold(x: np.ndarray, alpha: float) -> np.ndarray:
    """Left fold acc = acc + alpha*(x - acc), seeded x[0]; NaN-prefix aware
    (leading NaNs stay NaN, fold starts at the first finite value)."""
    out = np.full(len(x), np.nan)
    acc = None
    for i, v in enumerate(x):
        if np.isnan(v):
            if acc is not None:
                out[i] = acc
            continue
        acc = float(v) if acc is None else acc + alpha * (float(v) - acc)
        out[i] = acc
    return out


def rsi_kernel(close: np.ndarray, length: int = 14) -> np.ndarray:
    """Wilder RSI via the documented fold (alpha=1/length) over gains and
    losses; null until ``length`` changes exist; 100*g/(g+l) form (handles
    zero-loss windows without a division guard)."""
    n = len(close)
    out = np.full(n, np.nan)
    if n < 2:
        return out
    diff = np.diff(close)
    gains = np.where(diff > 0, diff, 0.0)
    losses = np.where(diff < 0, -diff, 0.0)
    a = 1.0 / length
    g = _ema_fold(gains, a)
    l = _ema_fold(losses, a)
    for i in range(length, n):  # i-th row has i changes
        denom = g[i - 1] + l[i - 1]
        out[i] = 100.0 * g[i - 1] / denom if denom > 0 else 50.0
    return out


def ema_family(
    df: DataFrame,
    rsi_length: int = 14,
    macd_fast: int = 12,
    macd_slow: int = 26,
    macd_signal: int = 9,
    adosc_fast: int = 3,
    adosc_slow: int = 10,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """RSI + MACD/signal/hist + ADOSC in one applyInPandas pass (needs an
    ``ad`` column — call :func:`accum_dist` first). One series shuffle for
    all three indicators; the later Window exprs on the same key reuse the
    exchange."""
    out_cols = ["rsi", "macd", "macd_signal", "macd_hist", "adosc"]
    schema = T.StructType(
        df.schema.fields + [T.StructField(c, T.DoubleType()) for c in out_cols]
    )
    cols = list(df.columns)
    a_fast, a_slow = 2.0 / (macd_fast + 1), 2.0 / (macd_slow + 1)
    a_sig = 2.0 / (macd_signal + 1)
    a_afast, a_aslow = 2.0 / (adosc_fast + 1), 2.0 / (adosc_slow + 1)

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        close = pdf["close"].to_numpy(dtype=np.float64)
        ad = pdf["ad"].to_numpy(dtype=np.float64)
        pdf["rsi"] = rsi_kernel(close, rsi_length)
        macd = _ema_fold(close, a_fast) - _ema_fold(close, a_slow)
        pdf["macd"] = macd
        sig = _ema_fold(macd, a_sig)
        pdf["macd_signal"] = sig
        pdf["macd_hist"] = macd - sig
        pdf["adosc"] = _ema_fold(ad, a_afast) - _ema_fold(ad, a_aslow)
        return pdf[cols + out_cols]

    return df.groupBy(series_col).applyInPandas(per_series, schema=schema)


def ta_indicators(
    df: DataFrame, series_col: str = "series_id", ts_col: str = "ts"
) -> DataFrame:
    """The reference's six-indicator block in one call
    (/root/reference/datalib/extremaPatternUtil.py:400-421): obv, macd
    (+signal/hist), rsi, ad, adosc, mfi appended to an OHLCV frame.

    Plan shape: one Exchange on the series key — OBV/AD/MFI are window
    exprs, the EMA family is one grouped map; all share the partitioning.
    """
    from .windows import obv

    out = obv(df, series_col=series_col, ts_col=ts_col)
    out = accum_dist(out, series_col=series_col, ts_col=ts_col)
    out = mfi(out, series_col=series_col, ts_col=ts_col)
    return ema_family(out, series_col=series_col, ts_col=ts_col)
