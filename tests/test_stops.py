"""W19 composite multi-stop frame vs an independent pandas oracle
(/root/reference/datalib/taStopEstimater.py:233-280 semantics)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from timeseriesvectordbpattermatcher_spark.operators.stops import multi_stop_frame
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv


@pytest.fixture(scope="module")
def frames(spark):
    df = synth_ohlcv(spark, n_tickers=2, n_days=200, seed=3)
    got = (
        multi_stop_frame(df)
        .toPandas()
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    pdf = df.toPandas().sort_values(["series_id", "ts"]).reset_index(drop=True)
    return got, pdf


def _atr_oracle(g: pd.DataFrame, n: int = 14) -> pd.Series:
    """ewm(alpha=1/n, adjust=False) over true range — independent of the
    engine's explicit fold."""
    pc = g["close"].shift()
    tr = pd.concat(
        [g["high"] - g["low"], (g["high"] - pc).abs(), (g["low"] - pc).abs()], axis=1
    ).max(axis=1)
    tr.iloc[0] = g["high"].iloc[0] - g["low"].iloc[0]
    return tr.ewm(alpha=1 / n, adjust=False).mean()


def test_bb_and_atr_band_exits(frames):
    got, pdf = frames
    for sid, g in pdf.groupby("series_id"):
        g = g.reset_index(drop=True)
        sub = got[got["series_id"] == sid].reset_index(drop=True)
        ma30 = g["close"].rolling(30).mean()
        sd30 = g["close"].rolling(30).std()
        atr = _atr_oracle(g)
        np.testing.assert_allclose(sub["bbu1"], ma30 + sd30, rtol=1e-9)
        np.testing.assert_allclose(sub["bbu2"], ma30 + 2.2 * sd30, rtol=1e-9)
        np.testing.assert_allclose(sub["bbl2"], ma30 - 2.2 * sd30, rtol=1e-9)
        # quirk preserved: "minus" helper ADDS 0.9 ATR to the 50-bar mean
        ma50 = g["close"].rolling(50, min_periods=10).mean()
        np.testing.assert_allclose(
            sub["atr_minus_exit"], ma50 + 0.9 * atr, rtol=1e-9
        )
        ma20 = g["close"].rolling(20, min_periods=10).mean()
        np.testing.assert_allclose(
            sub["atr_plus_exit"], ma20 + 3.0 * atr, rtol=1e-9
        )
        # nday low: rolling(30, min_periods=5).min().shift(1)
        nlow = g["close"].rolling(30, min_periods=5).min().shift(1)
        np.testing.assert_allclose(sub["nday_low_exit"], nlow, rtol=1e-9)
        # chandelier: rolling-30 high max − ATR(30), 3-bar smoothed
        atr30 = _atr_oracle(g, 30)
        chand = (g["high"].rolling(30, min_periods=1).max() - atr30).rolling(
            3, min_periods=1
        ).mean()
        np.testing.assert_allclose(sub["chand_exit"], chand, rtol=1e-9)


def test_trail_composite_is_greatest(frames):
    got, _ = frames
    comp = got[["chand_exit", "sar_exit", "atr_minus_exit"]].max(axis=1)
    mask = got["trail_long_exit"].notna()
    np.testing.assert_allclose(
        got.loc[mask, "trail_long_exit"], comp[mask], rtol=1e-12
    )


def test_exit_signals_are_crosses(frames):
    got, _ = frames
    # a nonzero profit signal requires close/atr_plus to change relative order
    for sid, sub in got.groupby("series_id"):
        sub = sub.reset_index(drop=True)
        d = sub["close"] - sub["atr_plus_exit"]
        sig = sub["profit_exit_sig"]
        nz = sig[sig.fillna(0) != 0]
        for i in nz.index:
            assert d.iloc[i] * d.iloc[i - 1] < 0
