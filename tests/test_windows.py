from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators import windows as W
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv


@pytest.fixture(scope="module")
def ohlcv(spark):
    df = synth_ohlcv(spark, n_tickers=4, n_days=400).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def one_pdf(ohlcv):
    return ohlcv.filter("series_id='TK00'").orderBy("ts").toPandas()


def _col(df, name, series="TK00"):
    return (
        df.filter(f"series_id='{series}'").orderBy("ts").select(name).toPandas()[name]
    )


def test_rolling_matches_pandas(ohlcv, one_pdf):
    got = _col(W.rolling(ohlcv, "close", 20, "avg", out="x"), "x")
    want = one_pdf["close"].rolling(20).mean()
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-12)
    got = _col(W.rolling(ohlcv, "high", 10, "max", out="x", shift=1), "x")
    want = one_pdf["high"].rolling(10).max().shift(1)
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-12)


def test_rolling_quantile_exact(ohlcv, one_pdf):
    got = _col(W.rolling_quantile_exact(ohlcv, "close", 15, 0.25, out="x"), "x")
    want = one_pdf["close"].rolling(15).quantile(0.25, interpolation="linear")
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-12)


def test_pct_change_and_forward_return(ohlcv, one_pdf):
    got = _col(W.pct_change(ohlcv, "close", 5, out="x"), "x")
    want = one_pdf["close"].pct_change(5)
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-12)
    got = _col(W.forward_return(ohlcv, "close", 10, out="x"), "x")
    want = one_pdf["close"].pct_change(10).shift(-10)
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-12)


def test_signal_cross(spark):
    rows = [("s", i, float(v), 5.0) for i, v in enumerate([3, 4, 6, 7, 5, 4, 6])]
    df = spark.createDataFrame(rows, "series_id string, ts long, a double, b double")
    got = W.signal_cross(df, "a", "b").orderBy("ts").select("sig_cross").toPandas()["sig_cross"]
    # d=[-2,-1,1,2,0,-1,1]: crossing onto exactly b (d=0) emits no signal,
    # matching the reference's (d*d.shift(1) < 0) formula
    assert got.tolist() == [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]


def test_rolling_slope(ohlcv, one_pdf):
    got = _col(W.rolling_slope(ohlcv, "close", 50, out="x"), "x")
    want = one_pdf["close"].rolling(50).apply(
        lambda x: np.polyfit(np.arange(len(x)), x, 1)[0]
    )
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-9)


def test_local_extrema(ohlcv, one_pdf):
    got = W.local_extrema(ohlcv, order=5)
    gmax = set(
        r["ts"] for r in got.filter("series_id='TK00' and minmax_type='max'").collect()
    )
    # numpy re-implementation of argrelextrema(greater_equal, order, mode='clip')
    x = one_pdf["high"].to_numpy()
    idx = [i for i in range(len(x))
           if all(x[i] >= x[j] for j in range(max(0, i - 5), min(len(x), i + 6)))]
    want = set(one_pdf["ts"].iloc[idx])
    # our tag gives max precedence; scipy greater_equal on plateaus marks all
    assert want == gmax


def test_obv(ohlcv, one_pdf):
    got = _col(W.obv(ohlcv), "obv")
    sign = np.sign(one_pdf["close"].diff().fillna(0.0))
    want = (sign * one_pdf["volume"]).cumsum()
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-9)


def test_ema_and_atr(ohlcv, one_pdf):
    got = _col(W.ema(ohlcv, "close", 12, out="x"), "x")
    want = one_pdf["close"].ewm(span=12, adjust=False).mean()
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-12)
    got = _col(W.atr(ohlcv, 14), "atr")
    prev_c = one_pdf["close"].shift(1)
    tr = pd.concat(
        [one_pdf["high"] - one_pdf["low"], (one_pdf["high"] - prev_c).abs(), (one_pdf["low"] - prev_c).abs()],
        axis=1,
    ).max(axis=1)
    tr.iloc[0] = one_pdf["high"].iloc[0] - one_pdf["low"].iloc[0]
    want = tr.ewm(alpha=1 / 14, adjust=False).mean()
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-12)


def test_rank_across_keys(ohlcv):
    ranked = W.rank_across_keys(ohlcv, "close")
    one_date = ranked.filter(F.col("ts") == ohlcv.agg(F.max("ts")).collect()[0][0])
    pdf = one_date.orderBy("rs_rank").toPandas()
    assert pdf["close"].is_monotonic_increasing
    # reference formula: rank/cnt over valid rows — range (1/cnt, 1]
    n = len(pdf)
    assert pdf["rs_rank"].iloc[0] == pytest.approx(1.0 / n)
    assert pdf["rs_rank"].iloc[-1] == 1.0
    # pin against pandas' own average-tie relative rank (the reference op)
    want = (pdf["close"].rank() / n).to_numpy()
    assert pdf["rs_rank"].to_numpy() == pytest.approx(want)


def test_resample_ohlcv(ohlcv, one_pdf):
    out = (
        W.resample_ohlcv(ohlcv, "7 days")
        .filter("series_id='TK00'")
        .orderBy("bucket_ts")
        .toPandas()
    )
    want = (
        one_pdf.set_index("ts")
        .resample("7D", origin="epoch")
        .agg({"open": "first", "high": "max", "low": "min", "close": "last", "volume": "sum"})
        .dropna()
    )
    assert len(out) == len(want)
    assert np.allclose(out["open"], want["open"]) and np.allclose(out["close"], want["close"])
    assert np.allclose(out["high"], want["high"]) and np.allclose(out["volume"], want["volume"])


def test_sessionize(spark):
    import datetime as dt

    rows = [("s", dt.datetime(2024, 1, d)) for d in [1, 2, 3, 20, 21, 25]]
    df = spark.createDataFrame(rows, "series_id string, ts timestamp")
    got = (
        W.sessionize(df, gap="interval 10 days").orderBy("ts").select("session_id").toPandas()
    )
    assert got["session_id"].tolist() == [1, 1, 1, 2, 2, 2]  # 25th is 4d after 21st


def test_remove_overlapping_intervals(spark):
    import datetime as dt

    rows = [
        ("s", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 10)),
        ("s", dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 8)),   # overlaps -> drop
        ("s", dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)), # starts at prev end -> keep
        ("s", dt.datetime(2024, 1, 15), dt.datetime(2024, 1, 16)), # overlaps -> drop
        ("s", dt.datetime(2024, 2, 1), dt.datetime(2024, 2, 5)),   # keep
    ]
    df = spark.createDataFrame(rows, "series_id string, start_ts timestamp, end_ts timestamp")
    got = sorted(r["start_ts"].day for r in W.remove_overlapping_intervals(df).collect())
    assert got == [1, 10, 1] or got == [1, 1, 10]


def test_min_spacing_dedupe(spark):
    import datetime as dt

    rows = [("s", dt.datetime(2024, 1, d)) for d in [1, 3, 8, 10, 20]]
    df = spark.createDataFrame(rows, "series_id string, ts timestamp")
    got = sorted(r["ts"].day for r in W.min_spacing_dedupe(df, "interval 4 days").collect())
    # vs previous ROW (reference quirk): 3 (gap2) drop; 8 (gap5 from 3) keep;
    # 10 (gap2 from 8) drop; 20 keep
    assert got == [1, 8, 20]


def test_asof_match_exit(spark):
    import datetime as dt

    entries = spark.createDataFrame(
        [("s", dt.datetime(2024, 1, 1)), ("s", dt.datetime(2024, 1, 7))],
        "series_id string, entry_ts timestamp",
    )
    exits = spark.createDataFrame(
        [("s", dt.datetime(2024, 1, 5)), ("s", dt.datetime(2024, 1, 9))],
        "series_id string, exit_ts timestamp",
    )
    got = {
        r["entry_ts"].day: (r["matched_exit_ts"].day if r["matched_exit_ts"] else None)
        for r in W.asof_match_exit(entries, exits).collect()
    }
    assert got == {1: 5, 7: 9}


def test_time_travel_last_n(ohlcv, one_pdf):
    got = (
        W.time_travel_last_n(ohlcv, "2019-01-01", n=64)
        .filter("series_id='TK00'")
        .orderBy("ts")
        .toPandas()
    )
    want = one_pdf[one_pdf["ts"] <= "2019-01-01"].iloc[-64:]
    assert list(got["ts"]) == list(want["ts"])


def test_price_by_volume(ohlcv, one_pdf):
    got = {r["series_id"]: r["snr_level"] for r in W.price_by_volume(ohlcv, 20).collect()}
    lo, hi = one_pdf["close"].min(), one_pdf["close"].max()
    bins = np.minimum(((one_pdf["close"] - lo) / ((hi - lo) / 20)).astype(int), 19)
    vol_by_bin = one_pdf.groupby(bins)["volume"].sum()
    px_by_bin = one_pdf.groupby(bins)["close"].mean()
    assert got["TK00"] == pytest.approx(px_by_bin[vol_by_bin.idxmax()])


def test_perf_by_year_rollup(spark, duck):
    rows = [("sigA", y, r) for y, r in [(2020, 0.1), (2020, -0.05), (2021, 0.2), (2021, 0.3)]]
    df = spark.createDataFrame(rows, "signame string, yr int, fw_ret double")
    got = W.perf_by_year_rollup(df, year_col="yr", group_cols=["signame"]).toPandas()
    duck.register("perf", df.toPandas())
    want = duck.sql("""
        SELECT signame, coalesce(cast(yr as varchar), 'all') AS "year", avg(fw_ret) ret,
               count(fw_ret) tcnt, sum(fw_ret) total_ret,
               avg(CASE WHEN fw_ret > 0 THEN 1.0 ELSE 0.0 END) winrate
        FROM perf GROUP BY GROUPING SETS ((signame, yr), (signame))
    """).df()
    g = got.sort_values(["signame", "year"]).reset_index(drop=True)
    w = want.sort_values(["signame", "year"]).reset_index(drop=True)
    assert np.allclose(g["ret"], w["ret"]) and (g["tcnt"] == w["tcnt"]).all()
    assert set(g["year"]) == {"2020", "2021", "all"}


def test_remove_overlapping_uses_last_kept_frontier(spark):
    """Reference keep-rule (extremaPatternUtil.py:340-366): the frontier is
    the end of the last KEPT interval — a dropped interval's end must not
    block later ones. A=[1,11] kept; B=[6,13] dropped; C=[12,15] must be
    KEPT (start 12 >= kept frontier 11) even though dropped B ends at 13."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.windows import (
        remove_overlapping_intervals,
    )

    d = lambda x: dt.datetime(2024, 1, x)  # noqa: E731
    df = spark.createDataFrame(
        [("s", d(1), d(11)), ("s", d(6), d(13)), ("s", d(12), d(15))],
        "series_id string, start_ts timestamp, end_ts timestamp",
    )
    got = {(r["start_ts"].day, r["end_ts"].day)
           for r in remove_overlapping_intervals(df).collect()}
    assert got == {(1, 11), (12, 15)}


def test_asof_match_exit_matches_merge_asof(spark):
    """Randomized parity vs pandas merge_asof(direction='forward') — the
    rewritten single-window-pass implementation must keep J3 semantics."""
    import datetime as dt

    import pandas as pd

    rng = np.random.default_rng(4)
    base = dt.datetime(2024, 1, 1)
    e_rows, x_rows = [], []
    for s in ["a", "b", "c"]:
        for d in sorted(rng.choice(300, size=40, replace=False)):
            e_rows.append((s, base + dt.timedelta(days=int(d))))
        for d in sorted(rng.choice(300, size=25, replace=False)):
            x_rows.append((s, base + dt.timedelta(days=int(d))))
    entries = spark.createDataFrame(e_rows, "series_id string, entry_ts timestamp")
    exits = spark.createDataFrame(x_rows, "series_id string, exit_ts timestamp")
    got = (
        W.asof_match_exit(entries, exits)
        .toPandas()
        .sort_values(["series_id", "entry_ts"])
        .reset_index(drop=True)
    )
    epd = pd.DataFrame(e_rows, columns=["series_id", "entry_ts"]).sort_values("entry_ts")
    xpd = pd.DataFrame(x_rows, columns=["series_id", "exit_ts"]).sort_values("exit_ts")
    want = (
        pd.merge_asof(
            epd, xpd, left_on="entry_ts", right_on="exit_ts",
            by="series_id", direction="forward", allow_exact_matches=True,
        )
        .sort_values(["series_id", "entry_ts"])
        .reset_index(drop=True)
    )
    assert list(got["entry_ts"]) == list(want["entry_ts"])
    assert got["matched_exit_ts"].fillna(pd.Timestamp(0)).tolist() == want[
        "exit_ts"
    ].fillna(pd.Timestamp(0)).tolist()


def test_asof_match_exit_no_cross_product_plan(spark):
    """Plan pin: the as-of match must be a window over a union — no join
    node (the round-1 range join exploded per-series entries x exits)."""
    import datetime as dt

    entries = spark.createDataFrame(
        [("s", dt.datetime(2024, 1, 1))], "series_id string, entry_ts timestamp"
    )
    exits = spark.createDataFrame(
        [("s", dt.datetime(2024, 1, 5))], "series_id string, exit_ts timestamp"
    )
    plan = W.asof_match_exit(entries, exits)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_price_by_volume_obv(ohlcv, one_pdf):
    got = (
        W.price_by_volume_obv(ohlcv, bin_cnt=6)
        .filter("series_id='TK00'")
        .toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    # totals must reconcile and the up-ratio must be pbv_up / total
    lo, hi = one_pdf["close"].min(), one_pdf["close"].max()
    bins = np.minimum(((one_pdf["close"] - lo) / ((hi - lo) / 6)).astype(int), 5)
    want_tot = one_pdf.groupby(bins)["volume"].sum()
    up = one_pdf["close"].diff() > 0
    want_up = one_pdf[up].groupby(bins[up])["volume"].sum()
    assert np.allclose(got["volume_by_price"], want_tot.values)
    assert np.allclose(got["pbv_up"], want_up.reindex(want_tot.index).fillna(0).values)
    assert np.allclose(
        got["pbv_up_ratio_at_price"], got["pbv_up"] / got["volume_by_price"]
    )
    assert np.allclose(got["pbv_down"], got["volume_by_price"] - got["pbv_up"])


def test_remove_overlapping_composite_key(spark):
    """Composite (series, pattern) keys prune independently per pair —
    no string-packed key (ADVICE round 1)."""
    import datetime as dt

    d = lambda x: dt.datetime(2024, 1, x)  # noqa: E731
    df = spark.createDataFrame(
        [
            ("s|weird", "hs", d(1), d(10)),
            ("s|weird", "hs", d(5), d(12)),   # overlaps -> dropped
            ("s|weird", "ihs", d(5), d(12)),  # other pattern -> kept
        ],
        "series_id string, pattern string, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r["series_id"], r["pattern"], r["start_ts"].day)
        for r in W.remove_overlapping_intervals(
            df, series_col=["series_id", "pattern"]
        ).collect()
    }
    assert got == {("s|weird", "hs", 1), ("s|weird", "ihs", 5)}


def test_rank_across_keys_excludes_nulls(spark):
    """A null value on one series must not shift the others' ranks — the
    reference ranks row[valid].rank()/cnt after dropping missing series."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import rank_across_keys

    df = spark.createDataFrame(
        [("d1", "A", None), ("d1", "B", 1.0), ("d1", "C", 2.0), ("d2", "D", 7.0)],
        "ts string, series_id string, rs double",
    )
    got = {r["series_id"]: r["rs_rank"] for r in rank_across_keys(df, "rs").collect()}
    assert got["A"] == -2.0          # missing -> -2 (reference quirk)
    assert got["B"] == 0.5           # rank 1 of 2 valid -> 1/2
    assert got["C"] == 1.0
    assert got["D"] == 1.0           # single valid row -> 1/1 (pandas rank/cnt)


def test_rank_across_keys_reference_formula(spark):
    """Exact parity with get_relative_rank/get_absolute_rank
    (/root/reference/datalib/patternTraderUtil.py:106-136): validity is
    value > 0, average-tie ranks, zero/negative -> -2, reverse flips."""
    import pandas as pd

    from timeseriesvectordbpattermatcher_spark.operators.windows import rank_across_keys

    vals = [3.0, 1.0, 3.0, 0.0, -5.0, 2.0, None]
    names = list("ABCDEFG")
    df = spark.createDataFrame(
        [("d1", s, v) for s, v in zip(names, vals)],
        "ts string, series_id string, rs double",
    )
    row = pd.Series(vals, index=names, dtype=float)
    valid = row[row > 0]
    want_rel = (valid.rank() / len(valid)).reindex(names).fillna(-2.0)
    got = {r["series_id"]: r["rs_rank"] for r in rank_across_keys(df, "rs").collect()}
    for s in names:
        assert got[s] == pytest.approx(want_rel[s]), s
    want_abs = (len(valid) - valid.rank() + 1).reindex(names).fillna(-2.0)
    got_abs = {
        r["series_id"]: r["rs_rank"]
        for r in rank_across_keys(df, "rs", pct=False, reverse=True).collect()
    }
    for s in names:
        assert got_abs[s] == pytest.approx(want_abs[s]), s


def test_perf_rollup_winrate_and_null_year(spark):
    """winrate's denominator is the non-null return count (reference drops
    NaN before winner/len), and a genuine null-year group must not collide
    with the GROUPING SETS 'all' row."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import perf_by_year_rollup

    rows = [
        (2020, 0.1), (2020, -0.1), (2020, 0.2), (2020, None), (2020, None),
        (None, 0.5),
    ]
    df = spark.createDataFrame(rows, "year int, fw_ret double")
    out = {r["year"]: r for r in perf_by_year_rollup(df).collect()}
    # null-year group stays a distinct NULL key, not merged into 'all'
    assert set(out) == {"2020", None, "all"}
    assert abs(out["2020"]["winrate"] - 2 / 3) < 1e-12  # nulls not losses
    assert out["2020"]["tcnt"] == 3
    assert out["all"]["tcnt"] == 4
    assert out[None]["tcnt"] == 1
