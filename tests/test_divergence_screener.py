"""X9/X10 end-to-end divergence screener — builds the reference's six aux
indicator extrema tables (/root/reference/datalib/extremaPatternUtil.py:400-470)
and scans price-vs-indicator divergence."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from timeseriesvectordbpattermatcher_spark.operators.patterns import (
    column_extrema,
    divergence_screener,
)
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv


def test_column_extrema_matches_pandas(spark):
    import pandas as pd

    rng = np.random.default_rng(6)
    base = dt.datetime(2024, 1, 1)
    vals = np.cumsum(rng.normal(size=80)) + 50
    rows = [
        ("s", base + dt.timedelta(days=i), float(v), float(v), float(v), float(v), 1.0)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "series_id string, ts timestamp, open double, high double, "
        "low double, close double, volume double"
    )
    got = {
        (r["ts"].day, r["ts"].month, r["minmax_type"])
        for r in column_extrema(df, "close", smoothing=3, order=3).collect()
    }
    sm = pd.Series(vals).rolling(3).mean()
    want = set()
    for i in range(len(sm)):
        if np.isnan(sm.iloc[i]):
            continue
        lo, hi = max(0, i - 3), min(len(sm), i + 4)
        win = sm.iloc[lo:hi]
        t = base + dt.timedelta(days=i)
        if sm.iloc[i] == win.max():
            want.add((t.day, t.month, "max"))
        elif sm.iloc[i] == win.min():
            want.add((t.day, t.month, "min"))
    # pandas window at the edges includes NaN positions; spark's row frame
    # only counts existing rows — compare on the interior
    interior = {w for w in want if not (w[0] <= 6 and w[1] == 1)}
    got_interior = {g for g in got if not (g[0] <= 6 and g[1] == 1)}
    assert got_interior == interior


def _planted_ad_divergence(spark):
    """Close zigzags DOWN (falling lows) while AD zigzags UP: high/low
    placement around the close controls mfm = ((c-l)-(h-c))/(h-l)
    independently of the close path, so AD gains +~v on even bars and loses
    a fraction on odd bars while close trends down."""
    rows, base = [], dt.datetime(2024, 1, 1)
    for i in range(70):
        cyc, pos = divmod(i, 10)
        tri = abs(pos - 5)  # 5..0..4 triangle, 10-day price cycle
        close = 100.0 - 3.0 * cyc + 1.5 * tri  # lows fall cycle over cycle
        # AD rides a SEPARATE 7-day cycle: 4 strong up-bars (close near the
        # high, mfm ~ +1, heavy volume) then 3 weak down-bars — smoothed AD
        # zigzags upward with one rising local minimum per 7 days
        if i % 7 < 4:
            h, l, v = close + 0.1, close - 10.0, 1000.0
        else:
            h, l, v = close + 10.0, close - 0.1, 300.0
        rows.append(("s", base + dt.timedelta(days=i), close, h, l, close, v))
    return spark.createDataFrame(
        rows, "series_id string, ts timestamp, open double, high double, "
        "low double, close double, volume double"
    )


def test_screener_finds_planted_ad_bull_divergence(spark):
    df = _planted_ad_divergence(spark)
    out = divergence_screener(
        df, indicators=("ad",), sides=("bull",),
        smoothing=3, order=2, main_size=3, span_days=100,
    ).collect()
    pats = {r["pattern"] for r in out}
    assert "ad_bull_div" in pats, out
    assert all(r["bullbear"] == 1 for r in out)


def test_screener_builds_all_six_aux_tables(spark):
    """The full reference grid: six indicators x both sides over a real
    OHLCV fixture — 12 legs in one plan, all pattern names from the
    reference's signame convention, schema stable."""
    ohlcv = synth_ohlcv(spark, n_tickers=3, n_days=250, seed=13)
    out = divergence_screener(ohlcv)
    expected = {
        f"{c}_{s}_div"
        for c in ("obv", "macd", "rsi", "ad", "adosc", "mfi")
        for s in ("bull", "bear")
    }
    rows = out.collect()
    assert set(out.columns) == {"series_id", "pattern", "start_ts", "end_ts", "bullbear"}
    assert {r["pattern"] for r in rows} <= expected
    for r in rows:
        assert r["bullbear"] == (1 if r["pattern"].endswith("bull_div") else -1)
        assert r["start_ts"] < r["end_ts"]
