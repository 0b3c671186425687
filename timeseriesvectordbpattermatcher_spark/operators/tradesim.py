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


def simulate_trades_equity_pdf(
    pdf: pd.DataFrame,
    entry_ts,
    share_cnt: float = 100.0,
    wstop_step: float = 0.1,
    trail_stop: float = 0.05,
    longshort: str = "long",
) -> tuple[list[dict], list[dict]]:
    """Pure-pandas kernel (also the test oracle's reference implementation —
    both run the same documented semantics). Returns (trades, equity_curve).

    The equity curve mirrors the reference's per-bar snapshot dict
    (/root/reference/datalib/patternTraderUtil.py:761-775): one row per bar
    from entry until the trade closes, recorded at the TOP of the loop —
    i.e. pos/wstop/trade_stage/realized_gain reflect state ENTERING the bar,
    before that bar's sells execute (reference quirk preserved). pos_cost
    for total_gain_pct is share_cnt * entry_price (:745).

    Short-path sign quirk (preserved verbatim from the reference, :768):
    ``unrealized_gain = ret * pos * entry_price`` — for ``longshort='short'``
    both ``ret`` and ``pos`` carry the -1 factor, so a WINNING short reports
    NEGATIVE unrealized/total gain while ``realized_gain`` (``q * (price -
    entry)``, q<0) reports it positive. The conventions disagree only on the
    short path; we reproduce the reference bit-for-bit rather than fix it."""
    sub = pdf[pdf["ts"] >= entry_ts].sort_values("ts")
    if sub.empty:
        return [], []
    entry_price = float(sub["close"].iloc[0])
    ilong = -1.0 if longshort == "short" else 1.0
    pos = share_cnt * ilong
    pos_cost = entry_price * share_cnt
    q = (share_cnt / 4) * ilong
    wstop = wstop_step
    loss_stop = -trail_stop
    stage = 0
    peak_ret = 0.0
    peak_dd = 0.0
    realized = 0.0
    trades: list[dict] = []
    equity: list[dict] = []

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
        unrealized = ret * pos * entry_price
        total_gain = unrealized + realized
        equity.append(
            {
                "entry_ts": entry_ts,
                "ts": row["ts"],
                "unit_ret": float(ret),
                "wstop": float(wstop),
                "peak_ret": float(peak_ret),
                "retrace": float(retrace),
                "pos": float(pos),
                "remain_pos_value": float(pos * price),
                "trail_stop": float(trail_stop),
                "trade_stage": int(stage),
                "unrealized_gain": float(unrealized),
                "realized_gain": float(realized),
                "total_gain": float(total_gain),
                "total_gain_pct": float(total_gain / pos_cost),
            }
        )
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
    return trades, equity


def simulate_trades_pdf(
    pdf: pd.DataFrame,
    entry_ts,
    share_cnt: float = 100.0,
    wstop_step: float = 0.1,
    trail_stop: float = 0.05,
    longshort: str = "long",
) -> list[dict]:
    """Trades-only view of :func:`simulate_trades_equity_pdf`."""
    trades, _ = simulate_trades_equity_pdf(
        pdf, entry_ts, share_cnt=share_cnt, wstop_step=wstop_step,
        trail_stop=trail_stop, longshort=longshort,
    )
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


EQUITY_SCHEMA = (
    "series_id string, entry_ts timestamp, ts timestamp, unit_ret double, "
    "wstop double, peak_ret double, retrace double, pos double, "
    "remain_pos_value double, trail_stop double, trade_stage int, "
    "unrealized_gain double, realized_gain double, total_gain double, "
    "total_gain_pct double"
)


def trade_equity_curve(
    ohlcv: DataFrame,
    entries: DataFrame,
    share_cnt: float = 100.0,
    wstop_step: float = 0.1,
    trail_stop: float = 0.05,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """D12 equity curve (/root/reference/datalib/patternTraderUtil.py:761-836
    ``equity_curve_dict`` -> ``equity_df``): one row per bar per (series,
    entry) from entry until the trade closes — the per-bar position/
    unrealized/realized/total-gain series a backtest consumer plots.
    Same grouped pass shape as :func:`trade_simulator` (sequential within a
    group, parallel across groups)."""
    joined = ohlcv.select(series_col, ts_col, "close").join(
        entries.select(series_col, "entry_ts"), series_col
    )

    def per_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sid, entry_ts = key
        _, equity = simulate_trades_equity_pdf(
            pdf.rename(columns={ts_col: "ts"}),
            entry_ts,
            share_cnt=share_cnt,
            wstop_step=wstop_step,
            trail_stop=trail_stop,
        )
        out = pd.DataFrame(equity)
        if out.empty:
            return pd.DataFrame(
                columns=[f.split(" ")[0] for f in EQUITY_SCHEMA.split(", ")]
            )
        out.insert(0, "series_id", sid)
        return out

    return joined.groupBy(series_col, "entry_ts").applyInPandas(
        per_group, schema=EQUITY_SCHEMA
    )


def trades_performance(trades: DataFrame, series_col: str = "series_id") -> DataFrame:
    """A2 per-entry trades summary
    (/root/reference/datalib/patternTraderUtil.py:838-872
    ``get_trades_performance``): sums of gain*size / commission / days over
    one entry's trades + derived pct_gain. Pure grouped aggregation.

    Reference quirk preserved AND corrected side-by-side: the reference
    initializes ``pos_cost = 0.01`` and its ``if pos_cost == 0`` rebase can
    never fire (:843-849), so its ``pct_gain`` divides by the 0.01 sentinel.
    ``pct_gain_ref`` reproduces that; ``pct_gain`` uses the real position
    cost (first trade's before_pos x entry_price, what the code plainly
    intended)."""
    first_key = F.struct("exit_ts", "trade_stage")
    agg = trades.groupBy(series_col, "entry_ts").agg(
        F.sum(F.col("gain") * F.col("trade_size")).alias("total_gain"),
        F.sum("commission").alias("total_commission"),
        F.sum("days_in_trade").alias("total_days_in_trade"),
        F.count("*").alias("trade_cnt"),
        F.max("exit_ts").alias("exit_date"),
        F.min_by(F.col("trade_size") + F.col("after_pos"), first_key).alias("_start_pos"),
        F.min("entry_price").alias("_entry_price"),
    )
    net = F.col("total_gain") - F.col("total_commission")
    return (
        agg.withColumn(
            "average_exposure_days", F.col("total_days_in_trade") / F.col("trade_cnt")
        )
        .withColumn("pct_gain_ref", net / F.lit(0.01))
        .withColumn(
            "pct_gain",
            F.when(
                F.col("_start_pos") * F.col("_entry_price") != 0,
                net / (F.col("_start_pos") * F.col("_entry_price")),
            ),
        )
        .drop("_start_pos", "_entry_price")
    )


def psar_walk(
    high, low,
    af_start: float = 0.02,
    af_step: float = 0.02,
    af_max: float = 0.2,
    return_trend: bool = False,
):
    """Pure PSAR recursion over numpy high/low arrays (Wilder) — shared by
    :func:`psar` and stops.multi_stop_frame's grouped pass.

    ``return_trend=True`` additionally returns the per-bar trend flags
    (after processing the bar, reversals included), which lets callers
    derive the LONG-leg-only series (pandas_ta's ``PSARl``: NaN during
    downtrends) that the reference's stop estimator consumes."""
    n = len(high)
    out = [float("nan")] * n
    trend = [False] * n
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
            trend[i] = uptrend
    if return_trend:
        return out, trend
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
