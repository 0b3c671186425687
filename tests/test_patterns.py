from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators import patterns as P
from timeseriesvectordbpattermatcher_spark.operators.windows import local_extrema
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv


@pytest.fixture(scope="module")
def extrema(spark):
    ohlcv = synth_ohlcv(spark, n_tickers=4, n_days=600)
    ex = (
        local_extrema(ohlcv, order=5)
        .filter("minmax_type != 'na'")
        .withColumn(
            "px",
            F.when(F.col("minmax_type") == "max", F.col("close")).otherwise(F.col("low")),
        )
        .cache()
    )
    ex.count()
    yield ex
    ex.unpersist()


def _oracle_tuples(pdf: pd.DataFrame, k: int):
    """Yield (window of k rows ending at i) for i in k-1..len-1 (our semantics:
    includes the final window, unlike the reference's range(k, len) loop)."""
    for i in range(k - 1, len(pdf)):
        yield pdf.iloc[i - k + 1 : i + 1]


def test_ihs_matches_oracle(extrema):
    got = {
        (r["start_ts"], r["end_ts"])
        for r in P.find_ihs_patterns(extrema.filter("series_id='TK00'")).collect()
    }
    pdf = extrema.filter("series_id='TK00'").orderBy("ts").toPandas()
    want = set()
    for w in _oracle_tuples(pdf, 5):
        if (w["ts"].iloc[-1] - w["ts"].iloc[0]) > pd.Timedelta("150 days"):
            continue
        a, b, c, d, e = w["px"]
        types = list(w["minmax_type"])
        if (
            a < b and c < a and c < e and c < d and e < d
            and abs(b - d) <= np.mean([b, d]) * 0.02
            and abs(b - c) >= np.mean([b, c]) * 0.03
            and types[2] == "min"
        ):
            want.add((w["ts"].iloc[0], w["ts"].iloc[-1]))
    assert got == want


def test_hs_matches_oracle(extrema):
    got = {
        (r["start_ts"], r["end_ts"])
        for r in P.find_hs_patterns(extrema.filter("series_id='TK01'")).collect()
    }
    pdf = extrema.filter("series_id='TK01'").orderBy("ts").toPandas()
    want = set()
    for w in _oracle_tuples(pdf, 5):
        if (w["ts"].iloc[-1] - w["ts"].iloc[0]) > pd.Timedelta("150 days"):
            continue
        a, b, c, d, e = w["px"]
        types = list(w["minmax_type"])
        if (
            a > b and c > a and c > e and c > d and e > d and d < b
            and types[2] == "max"
            and abs(b - c) >= np.mean([b, c]) * 0.03
            and not abs(a - b) <= np.mean([b, d]) * 0.02
            and not abs(d - e) <= np.mean([e, e]) * 0.02
        ):
            want.add((w["ts"].iloc[0], w["ts"].iloc[-1]))
    assert got == want


def test_higher_low_matches_oracle(extrema):
    got = {
        (r["start_ts"], r["end_ts"])
        for r in P.find_higher_low_patterns(extrema.filter("series_id='TK00'")).collect()
    }
    pdf = (
        extrema.filter("series_id='TK00' and minmax_type='min'").orderBy("ts").toPandas()
    )
    want = set()
    for w in _oracle_tuples(pdf, 4):
        if (w["ts"].iloc[-1] - w["ts"].iloc[0]) > pd.Timedelta("100 days"):
            continue
        a, b, c, d = w["px"]
        if a < b < c < d:
            want.add((w["ts"].iloc[0], w["ts"].iloc[-1]))
    assert got == want


def test_lower_high_matches_oracle(extrema):
    got = {
        (r["start_ts"], r["end_ts"])
        for r in P.find_lower_high_patterns(extrema.filter("series_id='TK02'")).collect()
    }
    pdf = (
        extrema.filter("series_id='TK02' and minmax_type='max'").orderBy("ts").toPandas()
    )
    want = set()
    for w in _oracle_tuples(pdf, 4):
        if (w["ts"].iloc[-1] - w["ts"].iloc[0]) > pd.Timedelta("100 days"):
            continue
        a, b, c, d = w["px"]
        if a > b > c > d and abs(b - c) <= np.mean([b, c]) * 0.02:
            want.add((w["ts"].iloc[0], w["ts"].iloc[-1]))
    assert got == want


def test_all_patterns_union(extrema):
    out = P.all_patterns(extrema).cache()
    names = {r["pattern"] for r in out.select("pattern").distinct().collect()}
    assert names <= {
        "ihs", "hs", "higher_low", "higher_high", "lower_high", "lower_low",
        "higher_high_low",
    }
    # bull/bear labels follow the X11 map
    bulls = out.filter("pattern in ('ihs','higher_low','higher_high','higher_high_low')")
    assert bulls.filter("bullbear != 1").count() == 0
    bears = out.filter("pattern in ('hs','lower_high','lower_low')")
    assert bears.filter("bullbear != -1").count() == 0
    # intervals are well-formed
    assert out.filter("start_ts > end_ts").count() == 0
    out.unpersist()


def test_vcp_respects_series_col_name_and_type(spark):
    """The grouped-map pattern finders must emit the CALLER's series column
    name and type (the schema used to hardcode 'series_id string')."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.patterns import (
        find_vcp_up_patterns,
    )

    rows = [
        (7, dt.datetime(2020, 1, 1), 1.0, 2.0, 0.5, 1.5, "max"),
        (7, dt.datetime(2020, 2, 1), 1.0, 2.0, 0.5, 1.5, "min"),
    ]
    df = spark.createDataFrame(
        rows, "ticker long, ts timestamp, open double, high double, low double, close double, minmax_type string"
    )
    out = find_vcp_up_patterns(df, series_col="ticker")
    assert out.schema["ticker"].dataType.simpleString() == "bigint"
    assert out.count() == 0  # too few extrema — but the schema resolves


def test_vcp_rejects_nonfinite_range_ratio(spark):
    """A zero-price bar's (high-low)/low = NaN must REJECT the window, not
    slip past the contraction test (NaN > x is False)."""
    import datetime as dt

    import pandas as pd

    from timeseriesvectordbpattermatcher_spark.operators.patterns import (
        find_vcp_up_patterns,
    )

    # 9 maxima interleaved with minima, tight contractions, breakout close;
    # one degenerate min bar (low=0) inside the window
    rows = []
    base = dt.datetime(2020, 1, 1)
    for i in range(9):
        t = base + dt.timedelta(days=14 * i)
        rows.append(("S", t, 10.0, 10.0 + 0.2, 9.9, 10.0 + (2.0 if i == 8 else 0.0), "max"))
        lo = 0.0 if i == 3 else 9.8  # degenerate bar
        rows.append(("S", t + dt.timedelta(days=7), 9.9, 10.0, lo, 9.9, "min"))
    df = spark.createDataFrame(
        rows, "series_id string, ts timestamp, open double, high double, low double, close double, minmax_type string"
    )
    assert find_vcp_up_patterns(df, span_min_days=10).count() == 0
