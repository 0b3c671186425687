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
    assert out[0]["candlestick_pattern"] == "CDLDOJI_Bull"


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
