"""Stateful trade simulator (X14) + PSAR (W19) — sequential-within-group ops.

Re-expresses the reference's ``get_sell_into_strength_return``
(/root/reference/datalib/patternTraderUtil.py:737-836) as an
``applyInPandas`` grouped map: inherently sequential per (series, entry) —
staged profit-taking ladder, trailing stop, loss stop — but embarrassingly
parallel across groups, which is where the reference's per-ticker Python
loop became the bottleneck.

Semantics preserved from the reference (quirks and all):
- 4 stages; each time return exceeds the ``wstop`` ladder (step 0.1) and
  stages remain, sell ``share_cnt/4`` and raise the ladder (:823-830);
- retrace from peak beyond ``trail_stop`` sells the whole remaining
  position (:832-837);
- return below ``-trail_stop`` is a full stop-loss and ends the trade
  (:816-821);
- per-trade commission recorded as ``price * 0.0001`` independent of size
  (:803 — reference quirk), ``gain`` is per-share (:808-809).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRADES_SCHEMA = (
    "series_id string, entry_ts timestamp, exit_ts timestamp, entry_price double, "
    "exit_price double, trade_stage int, trade_size double, stop_type string, "
    "pct_gain_from_entry double, gain double, peak_ret double, peak_drawdown double, "
    "after_pos double, commission double, days_in_trade int"
)


def simulate_trades_pdf(
    pdf: pd.DataFrame,
    entry_ts,
    share_cnt: float = 100.0,
    wstop_step: float = 0.1,
    trail_stop: float = 0.05,
    longshort: str = "long",
) -> list[dict]:
    """Pure-pandas kernel (also the test oracle's reference implementation —
    both run the same documented semantics)."""
    sub = pdf[pdf["ts"] >= entry_ts].sort_values("ts")
    if sub.empty:
        return []
    entry_price = float(sub["close"].iloc[0])
    ilong = -1.0 if longshort == "short" else 1.0
    pos = share_cnt * ilong
    q = (share_cnt / 4) * ilong
    wstop = wstop_step
    loss_stop = -trail_stop
    stage = 0
    peak_ret = 0.0
    peak_dd = 0.0
    realized = 0.0
    trades: list[dict] = []

    def emit(ts, price, ret, size, stop_type, pos_now):
        return {
            "entry_ts": entry_ts,
            "exit_ts": ts,
            "entry_price": entry_price,
            "exit_price": float(price),
            "trade_stage": stage,
            "trade_size": float(size),
            "stop_type": stop_type,
            "pct_gain_from_entry": float(ret),
            "gain": float(price - entry_price),
            "peak_ret": peak_ret,
            "peak_drawdown": peak_dd,
            "after_pos": float(pos_now - size),
            "commission": float(price) * 0.0001,
            "days_in_trade": int((ts - entry_ts).days),
        }

    for _, row in sub.iterrows():
        price = float(row["close"])
        ret = ilong * (price - entry_price) / entry_price
        peak_ret = max(ret, peak_ret)
        retrace = peak_ret - ret
        peak_dd = max(peak_dd, retrace)
        if ret < loss_stop:
            trades.append(emit(row["ts"], price, ret, pos, "stop_loss", pos))
            pos = 0.0
            break
        if ret > wstop and stage < 3:
            stage += 1
            wstop += wstop_step
            trades.append(emit(row["ts"], price, ret, q, "win", pos))
            realized += q * (price - entry_price)
            pos -= q
        elif retrace > trail_stop:
            trades.append(emit(row["ts"], price, ret, pos, "trail_stop", pos))
            pos = 0.0
        if pos == 0:
            break
    return trades


def trade_simulator(
    ohlcv: DataFrame,
    entries: DataFrame,
    share_cnt: float = 100.0,
    wstop_step: float = 0.1,
    trail_stop: float = 0.05,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """entries(series_id, entry_ts) × ohlcv -> one row per executed trade.

    Grouped by (series, entry): each group gets the series' rows from its
    entry forward (range-join semantics done inside the kernel after a
    single co-partitioning join on the series key)."""
    joined = ohlcv.select(series_col, ts_col, "close").join(
        entries.select(series_col, "entry_ts"), series_col
    )

    def per_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sid, entry_ts = key
        trades = simulate_trades_pdf(
            pdf.rename(columns={ts_col: "ts"}),
            entry_ts,
            share_cnt=share_cnt,
            wstop_step=wstop_step,
            trail_stop=trail_stop,
        )
        out = pd.DataFrame(trades)
        if out.empty:
            return pd.DataFrame(
                columns=[f.split(" ")[0] for f in TRADES_SCHEMA.split(", ")]
            )
        out.insert(0, "series_id", sid)
        return out

    return joined.groupBy(series_col, "entry_ts").applyInPandas(
        per_group, schema=TRADES_SCHEMA
    )


def psar_walk(
    high, low,
    af_start: float = 0.02,
    af_step: float = 0.02,
    af_max: float = 0.2,
) -> list[float]:
    """Pure PSAR recursion over numpy high/low arrays (Wilder) — shared by
    :func:`psar` and stops.multi_stop_frame's combined grouped pass."""
    n = len(high)
    out = [float("nan")] * n
    if n >= 2:
        uptrend = high[1] + low[1] >= high[0] + low[0]
        sar = low[0] if uptrend else high[0]
        ep = high[0] if uptrend else low[0]
        af = af_start
        for i in range(1, n):
            sar = sar + af * (ep - sar)
            if uptrend:
                sar = min(sar, low[i - 1], low[i - 2] if i >= 2 else low[i - 1])
                if low[i] < sar:  # reversal
                    uptrend, sar, ep, af = False, ep, low[i], af_start
                elif high[i] > ep:
                    ep, af = high[i], min(af + af_step, af_max)
            else:
                sar = max(sar, high[i - 1], high[i - 2] if i >= 2 else high[i - 1])
                if high[i] > sar:
                    uptrend, sar, ep, af = True, ep, high[i], af_start
                elif low[i] < ep:
                    ep, af = low[i], min(af + af_step, af_max)
            out[i] = sar
    return out


def psar(
    df: DataFrame,
    af_start: float = 0.02,
    af_step: float = 0.02,
    af_max: float = 0.2,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """W19 Parabolic SAR (Wilder) — recursive, so grouped-map per series
    (/root/reference/datalib/taStopEstimater.py:93-103 uses pandas_ta's)."""
    from pyspark.sql import types as T

    schema = T.StructType(df.schema.fields + [T.StructField("psar", T.DoubleType())])
    cols = list(df.columns)

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        pdf["psar"] = psar_walk(
            pdf["high"].to_numpy(), pdf["low"].to_numpy(),
            af_start=af_start, af_step=af_step, af_max=af_max,
        )
        return pdf[cols + ["psar"]]

    return df.groupBy(series_col).applyInPandas(per_series, schema=schema)
