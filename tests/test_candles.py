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
    # the wide-shadow doji matches the whole doji family; rank resolution
    # picks the lowest reference rank among them (RICKSHAWMAN 35 <
    # LONGLEGGEDDOJI 37 < HIGHWAVE 67 < SPINNINGTOP 69 < DOJI 104 — the
    # round-3 full set adds RICKSHAWMAN, whose body sits mid-range here)
    assert "CDLDOJI_Bull" in out[0]["candlestick_pattern"]
    assert out[0]["best_pattern"] == "CDLRICKSHAWMAN_Bull"


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


def test_every_rank_table_name_has_a_kernel():
    """W18 completeness (VERDICT r2 item 3): a match on an unimplemented
    pattern could never be found, so the rank resolver requires every base
    name in the reference's table to have a kernel."""
    from timeseriesvectordbpattermatcher_spark.operators.candles import (
        CANDLE_RANKINGS,
        KERNELS,
    )

    bases = {k.rsplit("_", 1)[0] for k in CANDLE_RANKINGS}
    assert bases <= set(KERNELS), sorted(bases - set(KERNELS))
    # and every kernel is rankable (explicitly listed or default-ranked)
    assert len(KERNELS) == len(bases)


def test_tasukigap_and_xsidegap(spark):
    df = _bars2(spark, [
        (100.0, 103.2, 99.8, 103.0),   # white
        (105.0, 108.2, 104.8, 108.0),  # white gapping above 1st body
        (107.0, 107.4, 104.0, 104.2),  # black retracing into the gap, not closing it
        (106.0, 109.6, 105.8, 109.4),  # white
        (111.0, 114.2, 110.8, 114.0),  # white gapping up again
        (113.0, 113.4, 106.5, 107.0),  # black closing the gap inside 4th body
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[2]["CDLTASUKIGAP"] == 100
    assert out[5]["CDLXSIDEGAP3METHODS"] == 100


def test_abandoned_baby_and_tristar(spark):
    df = _bars2(spark, [
        (110.0, 110.5, 99.5, 100.0),   # long black
        (97.0, 98.0, 96.0, 97.1),      # doji island gapping below the low
        (99.0, 110.0, 98.5, 109.0),    # white gapping back above doji high
        # tristar bottom: three dojis, middle body below both neighbours
        (105.0, 106.0, 104.0, 105.05),
        (101.0, 102.0, 100.0, 101.05),
        (105.0, 106.0, 104.0, 105.05),
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[2]["CDLABANDONEDBABY"] == 100
    assert out[5]["CDLTRISTAR"] == 100


def test_kicking_and_bylength(spark):
    df = _bars2(spark, [
        (108.0, 108.1, 100.0, 100.05),  # black marubozu
        (112.0, 124.0, 111.9, 123.9),   # white marubozu gapping above, longer
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[1]["CDLKICKING"] == 100
    assert out[1]["CDLKICKINGBYLENGTH"] == 100  # second body is longer


def test_rise_fall_three_methods_and_mat_hold(spark):
    df = _bars2(spark, [
        (100.0, 112.0, 99.5, 111.0),   # long white
        (110.0, 110.5, 107.0, 107.5),  # small black inside range, above o4
        (108.0, 108.5, 105.0, 105.5),  # falling
        (105.0, 105.8, 103.0, 103.5),  # falling
        (104.0, 115.0, 103.8, 114.0),  # white closing above 1st close + highs
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[4]["CDLRISEFALL3METHODS"] == 100
    assert out[4]["CDLMATHOLD"] == 100  # lows hold above the first open too


def test_identical3crows_and_onneck(spark):
    df = _bars2(spark, [
        (100.0, 112.0, 99.0, 100.5),
        (112.0, 112.5, 104.0, 104.5),  # black
        (104.5, 104.9, 98.0, 98.5),    # black opening at prior close
        (98.5, 98.9, 92.0, 92.5),      # black opening at prior close
        (90.0, 92.3, 89.5, 92.0),      # white closing at prior low -> on-neck
    ])
    out = candle_patterns(df).orderBy("ts").collect()
    assert out[3]["CDLIDENTICAL3CROWS"] == -100
    assert out[4]["CDLONNECK"] == -100


def test_oracle_sql_matches_spark_on_synth(spark, duck):
    """The rendered ANSI-SQL oracle (candle_oracle_sql) evaluated by DuckDB
    must reproduce the Spark plan bit-for-bit on a synthetic corpus — the
    independent-engine check for the whole 61-kernel spec + resolver."""
    import pandas as pd

    from timeseriesvectordbpattermatcher_spark.operators.candles import (
        KERNELS,
        candle_oracle_sql,
        candle_patterns,
    )

    ohlcv = synth_ohlcv(spark, n_tickers=2, n_days=300)
    cols = ["series_id", "ts", *KERNELS, "candlestick_match_count",
            "candlestick_pattern_score", "candlestick_pattern", "best_pattern"]
    got = (
        candle_patterns(ohlcv).select(*cols)
        .toPandas().sort_values(["series_id", "ts"]).reset_index(drop=True)
    )
    duck.register("bars_syn", ohlcv.toPandas())
    want = (
        duck.sql(candle_oracle_sql("SELECT * FROM bars_syn"))
        .df()[cols].sort_values(["series_id", "ts"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
