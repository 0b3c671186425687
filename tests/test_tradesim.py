from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.tradesim import (
    psar,
    simulate_trades_pdf,
    trade_simulator,
)
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv


def _series(vals, start="2024-01-01"):
    ts = pd.date_range(start, periods=len(vals), freq="D")
    return pd.DataFrame({"ts": ts, "close": [float(v) for v in vals]})


def test_stop_loss_path():
    pdf = _series([100, 98, 94])  # -6% on day 3 < -5% stop
    trades = simulate_trades_pdf(pdf, pdf["ts"].iloc[0])
    assert len(trades) == 1
    t = trades[0]
    assert t["stop_type"] == "stop_loss" and t["after_pos"] == 0.0
    assert t["exit_price"] == 94.0 and t["days_in_trade"] == 2


def test_staged_profit_ladder():
    # climbs through 10%/20%/30% ladders then trail-stops the rest
    pdf = _series([100, 111, 122, 133, 133 * 0.94])
    trades = simulate_trades_pdf(pdf, pdf["ts"].iloc[0])
    stop_types = [t["stop_type"] for t in trades]
    assert stop_types == ["win", "win", "win", "trail_stop"]
    assert [t["trade_stage"] for t in trades] == [1, 2, 3, 3]
    assert trades[0]["trade_size"] == 25.0
    assert trades[-1]["after_pos"] == 0.0
    # peak tracking: the final retrace exceeded trail_stop
    assert trades[-1]["peak_drawdown"] > 0.05


def test_full_ladder_exhausts_position():
    pdf = _series([100, 111, 122, 133, 145])
    trades = simulate_trades_pdf(pdf, pdf["ts"].iloc[0])
    # 3 staged sells (stage cap = stage_cnt-1 per reference), then the 4th
    # quarter exits only via a stop — price keeps rising so position remains
    assert [t["stop_type"] for t in trades] == ["win", "win", "win"]
    assert trades[-1]["after_pos"] == 25.0


def test_spark_matches_kernel(spark):
    ohlcv = synth_ohlcv(spark, n_tickers=3, n_days=300)
    entries = spark.createDataFrame(
        [("TK00", dt.datetime(2018, 3, 1)), ("TK01", dt.datetime(2018, 6, 1))],
        "series_id string, entry_ts timestamp",
    )
    got = trade_simulator(ohlcv, entries).orderBy("series_id", "exit_ts").toPandas()
    for sid, ets in [("TK00", dt.datetime(2018, 3, 1)), ("TK01", dt.datetime(2018, 6, 1))]:
        pdf = ohlcv.filter(F.col("series_id") == sid).orderBy("ts").toPandas()
        want = simulate_trades_pdf(pdf[["ts", "close"]], pd.Timestamp(ets))
        g = got[got.series_id == sid].reset_index(drop=True)
        assert len(g) == len(want)
        for i, w in enumerate(want):
            assert g["exit_ts"].iloc[i] == w["exit_ts"]
            assert g["stop_type"].iloc[i] == w["stop_type"]
            assert g["gain"].iloc[i] == pytest.approx(w["gain"])


def test_psar_basic_properties(spark):
    ohlcv = synth_ohlcv(spark, n_tickers=2, n_days=200)
    out = psar(ohlcv).filter("series_id='TK00'").orderBy("ts").toPandas()
    assert out["psar"].iloc[1:].notna().all()
    # SAR never sits inside the current bar's range when trending
    # (it trails the move) — sanity: values stay within the series envelope
    assert out["psar"].iloc[1:].between(out["low"].min() * 0.8, out["high"].max() * 1.2).all()


def _reference_equity_loop(pdf, entry_ts, share_cnt=100.0, wstop_step=0.1,
                           trail_stop=0.05):
    """Literal transcription of the reference's get_sell_into_strength_return
    equity/trade loop (/root/reference/datalib/patternTraderUtil.py:737-836),
    kept independent of the engine kernel: snapshot at loop top, stage<3 win
    ladder, elif trailing stop, break on stop-loss/flat."""
    sub = pdf[pdf["ts"] >= entry_ts].sort_values("ts")
    entry_price = float(sub["close"].iloc[0])
    pos = share_cnt
    pos_cost = entry_price * pos
    q = share_cnt / 4
    wstop = wstop_step
    loss_stop = -trail_stop
    stage = 0
    peak_ret = 0.0
    realized = 0.0
    curve = []
    for _, row in sub.iterrows():
        price = float(row["close"])
        ret = (price - entry_price) / entry_price
        peak_ret = max(ret, peak_ret)
        retrace = peak_ret - ret
        unrealized = ret * pos * entry_price
        curve.append(
            dict(ts=row["ts"], unit_ret=ret, wstop=wstop, peak_ret=peak_ret,
                 retrace=retrace, pos=pos, remain_pos_value=pos * price,
                 trade_stage=stage, unrealized_gain=unrealized,
                 realized_gain=realized,
                 total_gain=unrealized + realized,
                 total_gain_pct=(unrealized + realized) / pos_cost)
        )
        if ret < loss_stop:
            pos = 0.0
            break
        if ret > wstop and stage < 3:
            stage += 1
            wstop += wstop_step
            realized += q * (price - entry_price)
            pos -= q
        elif retrace > trail_stop:
            pos = 0.0
        if pos == 0:
            break
    return pd.DataFrame(curve)


def test_equity_curve_matches_reference_loop(spark):
    from timeseriesvectordbpattermatcher_spark.operators.tradesim import (
        trade_equity_curve,
    )

    ohlcv = synth_ohlcv(spark, n_tickers=4, n_days=400)
    entry = dt.datetime(2019, 3, 4)
    entries = spark.createDataFrame(
        [("TK00", entry), ("TK01", entry)], "series_id string, entry_ts timestamp"
    )
    got_all = trade_equity_curve(ohlcv, entries).toPandas()
    assert len(got_all) > 0
    for sid in ["TK00", "TK01"]:
        got = (
            got_all[got_all["series_id"] == sid]
            .sort_values("ts")
            .reset_index(drop=True)
        )
        pdf = ohlcv.filter(f"series_id='{sid}'").orderBy("ts").toPandas()
        want = _reference_equity_loop(pdf, pd.Timestamp(entry))
        assert len(got) == len(want), sid
        for col in ["unit_ret", "wstop", "peak_ret", "retrace", "pos",
                    "remain_pos_value", "trade_stage", "unrealized_gain",
                    "realized_gain", "total_gain", "total_gain_pct"]:
            pd.testing.assert_series_equal(
                got[col].astype(float), want[col].astype(float),
                check_names=False, rtol=1e-12,
            )


def test_trades_performance_summary_and_quirk(spark):
    """A2 roll-up: sums match a pandas fold over the emitted trades, and the
    reference's dead pos_cost rebase (pct_gain_ref = net/0.01) is preserved
    alongside the corrected pct_gain."""
    from timeseriesvectordbpattermatcher_spark.operators.tradesim import (
        trade_simulator,
        trades_performance,
    )

    ohlcv = synth_ohlcv(spark, n_tickers=4, n_days=400)
    entry = dt.datetime(2019, 3, 4)
    entries = spark.createDataFrame(
        [("TK00", entry), ("TK01", entry)], "series_id string, entry_ts timestamp"
    )
    trades = trade_simulator(ohlcv, entries)
    tp = trades_performance(trades).toPandas().set_index("series_id")
    tr = trades.toPandas()
    for sid, grp in tr.groupby("series_id"):
        total_gain = (grp["gain"] * grp["trade_size"]).sum()
        commission = grp["commission"].sum()
        row = tp.loc[sid]
        assert row["total_gain"] == pytest.approx(total_gain, rel=1e-12)
        assert row["total_commission"] == pytest.approx(commission, rel=1e-12)
        assert row["trade_cnt"] == len(grp)
        assert row["pct_gain_ref"] == pytest.approx(
            (total_gain - commission) / 0.01, rel=1e-12
        )
        first = grp.sort_values(["exit_ts", "trade_stage"]).iloc[0]
        start_pos = first["trade_size"] + first["after_pos"]
        assert row["pct_gain"] == pytest.approx(
            (total_gain - commission) / (start_pos * first["entry_price"]), rel=1e-12
        )
