from __future__ import annotations

import pandas as pd
import pytest

from timeseriesvectordbpattermatcher_spark.operators.candles import (
    candle_patterns,
    candle_score_by_rule,
)
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv


def _bars(spark, rows):
    ts = pd.date_range("2024-01-01", periods=len(rows), freq="D")
    pdf = pd.DataFrame(rows, columns=["open", "high", "low", "close"])
    pdf.insert(0, "ts", ts)
    pdf.insert(0, "series_id", "s")
    pdf["volume"] = 1e6
    return spark.createDataFrame(pdf)


def test_doji_and_marubozu(spark):
    df = _bars(spark, [
        (100.0, 105.0, 95.0, 100.2),   # tiny body vs range -> doji
        (100.0, 110.1, 99.9, 110.0),   # nearly shadowless bull -> marubozu
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[0]["CDLDOJI"] == 100 and out[0]["CDLMARUBOZU"] == 0
    assert out[1]["CDLMARUBOZU"] == 100
    # the wide-shadow doji now also matches the round-2 doji-family kernels;
    # rank resolution picks the lowest reference rank among them
    # (LONGLEGGEDDOJI 37 < HIGHWAVE 67 < SPINNINGTOP 69 < DOJI 104)
    assert "CDLDOJI_Bull" in out[0]["candlestick_pattern"]
    assert out[0]["best_pattern"] == "CDLLONGLEGGEDDOJI_Bull"


def test_engulfing(spark):
    df = _bars(spark, [
        (105.0, 106.0, 99.0, 100.0),   # bear bar
        (99.0, 108.0, 98.0, 107.0),    # bull bar engulfing it
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[1]["CDLENGULFING"] == 100
    assert "CDLENGULFING_Bull" in out[1]["candlestick_pattern"]


def test_three_white_soldiers_and_rank_resolution(spark):
    df = _bars(spark, [
        (100.0, 103.0, 99.5, 102.5),
        (101.0, 105.0, 100.5, 104.5),
        (103.0, 108.0, 102.5, 107.0),
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    last = out[2]
    assert last["CDL3WHITESOLDIERS"] == 100
    assert last["candlestick_match_count"] >= 1
    # if multiple matched, best_pattern is the min-rank one
    if last["candlestick_match_count"] > 1:
        assert last["best_pattern"] is not None


def test_no_pattern_row(spark):
    df = _bars(spark, [(100.0, 104.0, 98.0, 102.0)])  # plain bull bar, shadows both sides
    out = candle_patterns(df).collect()[0]
    assert out["candlestick_pattern"] == "NO_PATTERN"
    assert out["candlestick_match_count"] == 0
    assert out["candlestick_pattern_score"] == 0


def test_morning_star(spark):
    df = _bars(spark, [
        (110.0, 111.0, 99.0, 100.0),   # big bear
        (99.0, 100.0, 97.0, 99.5),     # small body below
        (100.0, 109.0, 99.5, 108.0),   # bull closing above midpoint (105)
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[2]["CDLMORNINGSTAR"] == 100


def test_candle_score_by_rule(spark):
    ohlcv = synth_ohlcv(spark, n_tickers=3, n_days=120)
    out = candle_score_by_rule(ohlcv).collect()
    got = {r["series_id"]: r for r in out}
    assert all(r["n_rules"] == 3 for r in out)
    assert set(got) == {"TK00", "TK01", "TK02"}


def _bars2(spark, rows):
    """(open, high, low, close) tuples -> daily bars."""
    import datetime as dt

    data = [
        ("s", dt.datetime(2024, 1, 1 + i), o, h, l, c, 1000.0)
        for i, (o, h, l, c) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "series_id string, ts timestamp, open double, high double, "
        "low double, close double, volume double"
    )


def test_piercing_and_dark_cloud(spark):
    from timeseriesvectordbpattermatcher_spark.operators.candles import candle_patterns

    df = _bars2(spark, [
        (106.0, 107.0, 99.0, 100.0),   # bear
        (98.0, 104.5, 97.5, 104.0),    # opens below prior low, closes > midpoint
        (100.0, 106.5, 99.5, 106.0),   # bull
        (107.0, 107.5, 102.0, 102.5),  # opens above prior high, closes < midpoint
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[1]["CDLPIERCING"] == 100
    assert out[3]["CDLDARKCLOUDCOVER"] == -100


def test_three_line_strike(spark):
    from timeseriesvectordbpattermatcher_spark.operators.candles import candle_patterns

    df = _bars2(spark, [
        (110.0, 110.5, 104.5, 105.0),  # bear 1
        (105.0, 105.5, 101.5, 102.0),  # bear 2 (lower close)
        (102.0, 102.5, 99.0, 99.5),    # bear 3
        (99.0, 111.0, 98.5, 110.5),    # bull engulfing the run -> +100
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[3]["CDL3LINESTRIKE"] == 100
    # rank 1 = the single best-ranked bull pattern in the reference table
    assert out[3]["best_pattern"] == "CDL3LINESTRIKE_Bull"


def test_doji_geometry_variants(spark):
    from timeseriesvectordbpattermatcher_spark.operators.candles import candle_patterns

    df = _bars2(spark, [
        (100.0, 100.5, 92.0, 100.1),   # dragonfly/takuri: long lower shadow
        (100.0, 108.0, 99.6, 99.9),    # gravestone: long upper shadow
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[0]["CDLDRAGONFLYDOJI"] == 100 and out[0]["CDLTAKURI"] == 100
    assert out[1]["CDLGRAVESTONEDOJI"] == -100


def test_long_short_line_vs_mean_body(spark):
    from timeseriesvectordbpattermatcher_spark.operators.candles import candle_patterns

    rows = [(100.0, 101.2, 99.8, 101.0)] * 11          # steady 1.0 bodies
    rows.append((100.0, 103.5, 99.9, 103.0))           # 3.0 body -> long line
    rows.append((100.0, 100.6, 99.9, 100.4))           # 0.4 body -> short line
    df = _bars2(spark, rows)
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[11]["CDLLONGLINE"] == 100
    assert out[12]["CDLSHORTLINE"] == 100
