"""W17 indicator family vs independent pandas oracles (reference block:
/root/reference/datalib/extremaPatternUtil.py:400-421)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from timeseriesvectordbpattermatcher_spark.operators.indicators import (
    accum_dist,
    ema_family,
    mfi,
    ta_indicators,
)
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv


@pytest.fixture(scope="module")
def ohlcv_pdf(spark):
    df = synth_ohlcv(spark, n_tickers=3, n_days=150, seed=9)
    return df, df.toPandas().sort_values(["series_id", "ts"]).reset_index(drop=True)


def _oracle_one(g: pd.DataFrame) -> pd.DataFrame:
    """Independent pandas implementation (pandas ewm/rolling, not our folds)."""
    g = g.sort_values("ts").reset_index(drop=True)
    c, h, l, v = g["close"], g["high"], g["low"], g["volume"]
    # AD
    mfm = np.where(h > l, ((c - l) - (h - c)) / (h - l), 0.0)
    g["ad_o"] = (mfm * v).cumsum()
    # MFI(14)
    tp = (h + l + c) / 3
    dtp = tp.diff()
    flow = tp * v
    pos = flow.where(dtp > 0, 0.0)
    neg = flow.where(dtp < 0, 0.0)
    ps, ns = pos.rolling(14).sum(), neg.rolling(14).sum()
    # our frame counts non-null dtp rows; row 13 has 13 diffs -> null
    mfi_o = np.where(ps + ns > 0, 100.0 * ps / (ps + ns), 50.0)
    mfi_o[:14] = np.nan
    g["mfi_o"] = mfi_o
    # EMA family via pandas ewm(adjust=False) — different code path, same recursion
    g["macd_o"] = (
        c.ewm(span=12, adjust=False).mean() - c.ewm(span=26, adjust=False).mean()
    )
    g["sig_o"] = g["macd_o"].ewm(span=9, adjust=False).mean()
    ad = pd.Series(g["ad_o"])
    g["adosc_o"] = ad.ewm(span=3, adjust=False).mean() - ad.ewm(span=10, adjust=False).mean()
    # RSI(14): wilder fold as documented (ewm alpha=1/14 adjust=False over
    # gains/losses), 100*g/(g+l), null until 14 changes
    diff = c.diff()
    gains = diff.clip(lower=0.0).iloc[1:]
    losses = (-diff).clip(lower=0.0).iloc[1:]
    ag = gains.ewm(alpha=1 / 14, adjust=False).mean()
    al = losses.ewm(alpha=1 / 14, adjust=False).mean()
    rs = np.where(ag + al > 0, 100.0 * ag / (ag + al), 50.0)  # flat -> 50
    rs = pd.Series(rs, index=ag.index)
    rsi_o = pd.Series(np.nan, index=g.index)
    rsi_o.iloc[14:] = rs.iloc[13:].to_numpy()[: len(g) - 14]
    g["rsi_o"] = rsi_o
    return g


def test_indicators_vs_pandas(spark, ohlcv_pdf):
    df, pdf = ohlcv_pdf
    got = (
        ta_indicators(df)
        .select("series_id", "ts", "ad", "mfi", "rsi", "macd", "macd_signal",
                "macd_hist", "adosc")
        .toPandas()
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    want = (
        pdf.groupby("series_id", group_keys=False)
        .apply(_oracle_one)
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    for spark_col, want_col in [
        ("ad", "ad_o"), ("mfi", "mfi_o"), ("rsi", "rsi_o"),
        ("macd", "macd_o"), ("macd_signal", "sig_o"), ("adosc", "adosc_o"),
    ]:
        np.testing.assert_allclose(
            got[spark_col].to_numpy(), want[want_col].to_numpy(),
            rtol=1e-9, atol=1e-9, err_msg=spark_col,
        )
    np.testing.assert_allclose(
        got["macd_hist"].to_numpy(),
        (want["macd_o"] - want["sig_o"]).to_numpy(),
        rtol=1e-9, atol=1e-9,
    )


def test_mfi_flat_window_is_50(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("s", base + dt.timedelta(days=i), 100.0, 100.0, 100.0, 100.0, 10.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "series_id string, ts timestamp, open double, high double, "
        "low double, close double, volume double"
    )
    out = mfi(df).toPandas().sort_values("ts")
    assert (out["mfi"].iloc[14:] == 50.0).all()
    assert out["mfi"].iloc[:14].isna().all()


def test_ema_family_requires_ad(spark, ohlcv_pdf):
    df, _ = ohlcv_pdf
    out = ema_family(accum_dist(df)).limit(1).collect()
    assert out
