from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.boxes import (
    add_box_bands,
    box_breakout_signals,
    detect_boxes,
)
from timeseriesvectordbpattermatcher_spark.operators.patterns import (
    find_divergence_patterns,
    find_vcp_up_patterns,
)
from timeseriesvectordbpattermatcher_spark.operators.windows import local_extrema
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv


@pytest.fixture(scope="module")
def ohlcv(spark):
    df = synth_ohlcv(spark, n_tickers=4, n_days=700).cache()
    df.count()
    yield df
    df.unpersist()


def test_box_bands_match_pandas(spark, ohlcv):
    got = (
        add_box_bands(ohlcv.filter("series_id='TK00'"))
        .orderBy("ts")
        .select("ts", "ub10", "lb15", "u1b20")
        .toPandas()
    )
    pdf = ohlcv.filter("series_id='TK00'").orderBy("ts").toPandas()
    pd.testing.assert_series_equal(
        got["ub10"], pdf["low"].rolling(10).max(), check_names=False
    )
    pd.testing.assert_series_equal(
        got["lb15"], pdf["low"].rolling(15).min(), check_names=False
    )
    pd.testing.assert_series_equal(
        got["u1b20"], pdf["low"].rolling(20).max().shift(1), check_names=False
    )


def test_detect_boxes_emits_tight_ranges(spark, ohlcv):
    boxes = detect_boxes(ohlcv).cache()
    pdf = boxes.toPandas()
    if len(pdf):  # random walks usually form some boxes over 700 days
        assert (pdf["box_ub"] >= pdf["box_lb"]).all()
        assert (pdf["ub_near_cnt"] > 0).all() and (pdf["lb_near_cnt"] > 0).all()
        assert (pdf["box_score"] > 0).all()
    # tightness guard: band width never exceeds 10% of price by construction
    boxes.unpersist()


def test_box_breakout_signals(spark):
    # flat range then a breakout bar
    vals = [50.0] * 40 + [60.0]
    ts = pd.date_range("2024-01-01", periods=41, freq="D")
    pdf = pd.DataFrame(
        {"series_id": "s", "ts": ts, "open": vals, "high": [v * 1.01 for v in vals],
         "low": [v * 0.99 for v in vals], "close": vals, "volume": 1e6}
    )
    df = spark.createDataFrame(pdf)
    sig = box_breakout_signals(df, nbars=30).collect()
    assert len(sig) == 1 and sig[0]["sig_long"] == 1
    assert sig[0]["ts"] == ts[-1]


def _vcp_oracle(pdf: pd.DataFrame) -> set:
    """Independent pandas re-implementation of the reference's VCP loop."""
    maxp = pdf[pdf["minmax_type"] == "max"].reset_index(drop=True)
    minp = pdf[pdf["minmax_type"] == "min"].reset_index(drop=True)
    found = set()
    for i in range(8, len(maxp)):
        win = maxp.iloc[i - 8 : i]
        sd, ed = win["ts"].iloc[0], win["ts"].iloc[-1]
        if (ed - sd).days < 50:
            continue
        sm = maxp[(maxp["ts"] >= sd) & (maxp["ts"] <= ed)]
        sn = minp[(minp["ts"] >= sd) & (minp["ts"] <= ed)]
        if len(sm) < 4 or len(sn) < 3:
            continue
        diffs, ok = [0.04], True
        for _, mp in sm.iloc[:-1].iterrows():
            nxt = sn[sn["ts"] >= mp["ts"]]
            if len(nxt) == 0:
                ok = False
                break
            d = (mp["high"] - nxt["low"].iloc[0]) / nxt["low"].iloc[0]
            if d > max(diffs) * 1.1:
                ok = False
                break
            diffs.append(d)
        if ok and sm["close"].iloc[-1] > sm["high"].iloc[:-1].max():
            found.add((sd, ed))
    return found


def test_vcp_matches_oracle(spark, ohlcv):
    extrema = local_extrema(ohlcv, order=3).filter("minmax_type != 'na'")
    got = {
        (r["start_ts"], r["end_ts"])
        for r in find_vcp_up_patterns(extrema.filter("series_id='TK00'")).collect()
    }
    pdf = extrema.filter("series_id='TK00'").orderBy("ts").toPandas()
    assert got == _vcp_oracle(pdf)


def test_divergence_synthetic(spark):
    # main extrema strictly falling, aux extrema strictly rising -> bullish div
    ts = pd.date_range("2024-01-01", periods=6, freq="7D")
    main = pd.DataFrame({"series_id": "s", "ts": ts, "px": [10, 9, 8, 7, 6, 5.0]})
    aux = pd.DataFrame({"series_id": "s", "ts": ts, "px": [1, 2, 3, 4, 5, 6.0]})
    out = find_divergence_patterns(
        spark.createDataFrame(main), spark.createDataFrame(aux), ex_cond="down,up"
    ).collect()
    assert len(out) == 2  # windows [0..4] and [1..5] both qualify
    assert all(r["bullbear"] == 1 for r in out)
    # flipping the condition finds nothing
    none = find_divergence_patterns(
        spark.createDataFrame(main), spark.createDataFrame(aux), ex_cond="up,down"
    ).count()
    assert none == 0


def test_divergence_aux_interval_containment(spark):
    # aux has extra points outside the main window interval -> ignored (J4)
    ts = pd.date_range("2024-01-01", periods=5, freq="7D")
    main = pd.DataFrame({"series_id": "s", "ts": ts, "px": [10, 9, 8, 7, 6.0]})
    aux_ts = list(pd.date_range("2023-12-01", periods=2, freq="D")) + list(ts) + [
        pd.Timestamp("2024-06-01")
    ]
    aux = pd.DataFrame(
        {"series_id": "s", "ts": aux_ts, "px": [99, 98] + [1, 2, 3, 4, 5.0] + [0]}
    )
    out = find_divergence_patterns(
        spark.createDataFrame(main), spark.createDataFrame(aux), ex_cond="down,up"
    ).collect()
    assert len(out) == 1


def test_detect_boxes_forecast_fallback(spark, ohlcv):
    """Forecast mode: every row yields a box; rows without a band match fall
    back to the 10-bar high/low window, signame='forecast', score - 3
    (extremaPlotter.py:85-120); detected rows keep 'box_breakout'."""
    from timeseriesvectordbpattermatcher_spark.operators.boxes import (
        detect_boxes_forecast,
    )

    sub = ohlcv.filter("series_id='TK00'")
    out = detect_boxes_forecast(sub).orderBy("ts").toPandas()
    pdf = sub.orderBy("ts").toPandas()
    assert len(out) == len(pdf), "forecast mode emits one box per row"
    assert set(out["signame"]) <= {"forecast", "box_breakout"}
    fc = out[out["signame"] == "forecast"]
    assert len(fc) > 0
    # fallback bounds = rolling 10-bar high max / low min (min_periods=1)
    ub_roll = pdf["high"].rolling(10, min_periods=1).max()
    lb_roll = pdf["low"].rolling(10, min_periods=1).min()
    idx = fc.index
    assert np.allclose(fc["box_ub"], ub_roll.iloc[idx]), "fallback ub"
    assert np.allclose(fc["box_lb"], lb_roll.iloc[idx]), "fallback lb"
    assert (fc["box_score"] <= -3.0 + 1e-9 + 2.0).all()  # score - 3 (score <= ~2)
    # detected rows agree with detect_boxes on bounds where both exist
    det = detect_boxes(sub).toPandas().set_index("ts")
    bb = out[out["signame"] == "box_breakout"].set_index("ts")
    common = det.index.intersection(bb.index)
    if len(common):
        assert np.allclose(det.loc[common, "box_ub"], bb.loc[common, "box_ub"])


def test_box_buy_sell_rule_truth_table(spark):
    """Pin the reference's rule quirks (extremaPlotter.py:353-402): strong
    rules ignore their duration flag; suggest rules threshold the 3-flag sum."""
    from timeseriesvectordbpattermatcher_spark.operators.boxes import (
        box_buy_sell_signals,
    )

    rows = [
        # (vol_bias, score, rs_plus, snr_mid, duration)
        (1.0, 3.0, True, True, 30.0),    # buy: overall 3>2, snr, dur>25
        (1.0, 3.0, True, True, 20.0),    # dur<=25 -> no suggest_buy
        (1.0, 5.0, True, True, 10.0),    # strong_buy despite short duration (quirk)
        (-1.0, 2.0, False, False, 20.0), # suggest_sell: overall 3>1, !snr, dur>15
        (-1.0, 2.0, False, False, 10.0), # dur<=15 -> strong_sell only (quirk)
        (1.0, 5.0, True, False, 40.0),   # snr False -> no buys
    ]
    df = spark.createDataFrame(
        rows,
        "recent_vol_bias_plus double, score double, rs_plus boolean, "
        "snr_mid_plus boolean, duration double",
    )
    out = box_buy_sell_signals(df).collect()
    got = [
        (r["suggest_buy"], r["strong_buy"], r["suggest_sell"], r["strong_sell"])
        for r in out
    ]
    assert got[0] == (True, False, False, False)
    assert got[1] == (False, False, False, False)
    assert got[2] == (True if 10 > 25 else False, True, False, False)
    assert got[3] == (False, False, True, True)
    assert got[4] == (False, False, False, True)
    assert got[5] == (False, False, False, False)


def test_detect_boxes_forecast_short_series_all_fallback(spark):
    """A series shorter than the smallest band window (10) can never detect
    a box: every row must take the forecast fallback, box_ub/lb spanning
    the partial high/low window, score = -3 penalty throughout."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.boxes import (
        detect_boxes_forecast,
    )

    rows = [
        ("S", dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
         10.0 + i, 11.0 + i, 9.0 + i, 10.5 + i, 100.0)
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "series_id string, ts timestamp, open double, high double, "
        "low double, close double, volume double"
    )
    out = detect_boxes_forecast(df).orderBy("ts").collect()
    assert len(out) == 6
    assert all(r.signame == "forecast" for r in out)
    # fallback window is a running 10-bar high-max / low-min
    assert out[0].box_ub == 11.0 and out[0].box_lb == 9.0
    assert out[5].box_ub == 16.0 and out[5].box_lb == 9.0
    assert all(abs(r.box_score - (-3.0)) < 1e-9 for r in out)


def test_detect_boxes_forecast_single_row(spark):
    """One-row series: bands null, fallback = the row itself."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.boxes import (
        detect_boxes_forecast,
    )

    df = spark.createDataFrame(
        [("S", dt.datetime(2024, 1, 1), 10.0, 12.0, 8.0, 11.0, 1.0)],
        "series_id string, ts timestamp, open double, high double, "
        "low double, close double, volume double",
    )
    r = detect_boxes_forecast(df).collect()[0]
    assert r.signame == "forecast" and r.box_ub == 12.0 and r.box_lb == 8.0


def test_detect_boxes_zero_price_bars(spark):
    """A price floor of 0 (zero low/close bars exist in the sf0.1 event
    bars) must not raise ANSI DIVIDE_BY_ZERO in the band-nearness test —
    the reference's pandas x/0 -> inf / 0/0 -> nan both fail `< delta`,
    i.e. near is simply False at a zero band (review of the sf0.1 sweep)."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.boxes import (
        detect_boxes_forecast,
    )

    rows = []
    for i in range(40):
        px = 0.0 if i < 25 else 5.0 + 0.01 * i
        rows.append(
            ("Z", dt.datetime(2020, 1, 1) + dt.timedelta(days=i),
             px, px * 1.01 if px else 0.0, px * 0.99 if px else 0.0, px, 100.0)
        )
    df = spark.createDataFrame(
        rows, "series_id string, ts timestamp, open double, high double, "
              "low double, close double, volume double")
    out = detect_boxes_forecast(df).toPandas()  # full materialization
    assert len(out) == 40
