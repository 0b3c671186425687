from __future__ import annotations

import pandas as pd
import pytest

from timeseriesvectordbpattermatcher_spark.operators.trends import (
    find_trend_range,
    find_trend_range_extended,
)
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv


def _pandas_trend_range(pdf, anchor, span_days, trend="up"):
    """Oracle mirroring the reference's slice + idxmin/idxmax logic."""
    ts = pd.Timestamp(anchor)
    td = pd.Timedelta(days=span_days)
    sub = pdf[(pdf["ts"] >= ts - td) & (pdf["ts"] <= ts + td)]
    pre = sub[sub["ts"] <= ts]
    post = sub[sub["ts"] >= ts]
    if trend == "up":
        idmin = pre.loc[pre["close"].idxmin(), "ts"]
        idmax = post.loc[post["close"].idxmax(), "ts"]
    else:
        idmax = pre.loc[pre["close"].idxmax(), "ts"]
        idmin = post.loc[post["close"].idxmin(), "ts"]
    pmin = float(pdf.loc[pdf["ts"] == idmin, "close"].iloc[0])
    pmax = float(pdf.loc[pdf["ts"] == idmax, "close"].iloc[0])
    if idmax > idmin:
        return ("up", idmin, idmax, pmax / pmin - 1)
    return ("down", idmax, idmin, pmin / pmax - 1)


@pytest.fixture(scope="module")
def ohlcv(spark):
    df = synth_ohlcv(spark, n_tickers=3, n_days=600).cache()
    df.count()
    yield df
    df.unpersist()


def test_trend_range_matches_oracle(spark, ohlcv):
    anchors = spark.createDataFrame(
        [("TK00", pd.Timestamp("2019-06-03").to_pydatetime()), ("TK01", pd.Timestamp("2019-09-02").to_pydatetime())],
        "series_id string, anchor_ts timestamp",
    )
    got = {r["series_id"]: r for r in find_trend_range(ohlcv, anchors, span_days=120).collect()}
    for sid, anchor in [("TK00", "2019-06-03"), ("TK01", "2019-09-02")]:
        pdf = ohlcv.filter(f"series_id='{sid}'").orderBy("ts").toPandas()
        trend, start, end, pct = _pandas_trend_range(pdf, anchor, 120)
        g = got[sid]
        assert g["trend"] == trend
        assert g["trendstart"] == start and g["trendend"] == end
        assert g["pct_chg"] == pytest.approx(pct)


def test_trend_range_extended_improves_or_stops(spark, ohlcv):
    anchors = spark.createDataFrame(
        [("TK00", pd.Timestamp("2019-06-03").to_pydatetime())], "series_id string, anchor_ts timestamp"
    )
    best = find_trend_range_extended(ohlcv, anchors).collect()
    assert len(best) == 1
    b = best[0]
    # the chosen span must beat the starting span (or be it)
    base = find_trend_range(ohlcv, anchors, span_days=20).collect()[0]
    if b["span_days"] > 20 and b["trend"] == base["trend"] == "up":
        assert b["pct_chg"] >= base["pct_chg"]


def test_fib_levels_match_pandas_oracle(spark, ohlcv):
    """fib_levels vs a pure-pandas oracle implementing the reference's
    argrelextrema(less_equal/greater_equal, order=n) + ffill + level math
    (datalib/patternReviewUtil.py:25-46)."""
    import numpy as np

    from timeseriesvectordbpattermatcher_spark.operators.trends import fib_levels

    def argrel(data, cmp, order):
        """scipy.signal.argrelextrema(cmp, order, mode='clip') re-derived in
        numpy (scipy is not in this sandbox): i is an extremum iff
        cmp(data[i], data[j]) for every j != i within i +/- order, clipped."""
        idx = []
        for i in range(len(data)):
            lo, hi = max(0, i - order), min(len(data), i + order + 1)
            neigh = np.r_[data[lo:i], data[i + 1:hi]]
            if neigh.size and np.all(cmp(data[i], neigh)):
                idx.append(i)
        return np.array(idx, dtype=int)

    n = 5
    got = (
        fib_levels(ohlcv, minmax_bars=n)
        .filter("series_id='TK00'")
        .orderBy("ts")
        .toPandas()
    )
    pdf = ohlcv.filter("series_id='TK00'").orderBy("ts").toPandas()
    data = pdf["close"].to_numpy()
    mins = argrel(data, np.less_equal, order=n)
    maxs = argrel(data, np.greater_equal, order=n)
    mn = pd.Series(np.nan, index=pdf.index)
    mn.iloc[mins] = data[mins]
    mx = pd.Series(np.nan, index=pdf.index)
    mx.iloc[maxs] = data[maxs]
    mn, mx = mn.ffill(), mx.ffill()
    diff = mx - mn
    pd.testing.assert_series_equal(
        got["fib_min"], mn, check_names=False, rtol=1e-12
    )
    pd.testing.assert_series_equal(
        got["fib_max"], mx, check_names=False, rtol=1e-12
    )
    for name, exp in [
        ("l1", mx - diff * 0.236),
        ("l4", mx - diff * 0.618),
        ("ul3", mx + diff * 0.5),
        ("dl2", mn - diff * 0.382),
    ]:
        pd.testing.assert_series_equal(got[name], exp, check_names=False, rtol=1e-12)


def test_fib_levels_single_row_and_constant(spark):
    """One row: the row is its own extremum both ways -> min=max=close,
    diff 0, every level collapses onto the price. Constant series: same."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.trends import fib_levels

    rows = [("S", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 5.0)
            for i in range(4)]
    df = spark.createDataFrame(rows, "series_id string, ts timestamp, close double")
    out = fib_levels(df).orderBy("ts").collect()
    for r in out:
        assert r.fib_min == 5.0 and r.fib_max == 5.0 and r.fib_diff == 0.0
        assert r.l1 == 5.0 and r.ul4 == 5.0 and r.dl3 == 5.0
