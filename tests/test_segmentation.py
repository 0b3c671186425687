from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
    WINDOW_SIZE,
    ma_normalize,
    segment_series,
    segment_tokens,
)
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv, synth_seqs


@pytest.fixture(scope="module")
def ohlcv(spark):
    df = synth_ohlcv(spark).cache()
    df.count()
    yield df
    df.unpersist()


def _pandas_ma_normalize(pdf: pd.DataFrame, madays=250) -> pd.DataFrame:
    """Independent oracle for the reference's ma_normalized
    (/root/reference/katslib/opkatsDataUtil.py:147-155)."""
    pdf = pdf.sort_values("ts").reset_index(drop=True).copy()
    close_ma = pdf["close"].rolling(madays).mean()
    vol_ma = pdf["volume"].rolling(madays).mean()
    out = pdf.copy()
    out["open"] = pdf["open"] / close_ma
    out["close"] = pdf["close"] / close_ma
    out["volume"] = pdf["volume"] / vol_ma
    return out.dropna(subset=["open", "close", "volume"])


def test_ma_normalize_matches_pandas(ohlcv):
    got = (
        ma_normalize(ohlcv.filter("series_id = 'TK00'"))
        .orderBy("ts")
        .select("ts", "open", "close", "volume")
        .toPandas()
    )
    want = _pandas_ma_normalize(ohlcv.filter("series_id = 'TK00'").toPandas())[
        ["ts", "open", "close", "volume"]
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, rtol=1e-12)


def test_ma_normalize_drops_warmup(ohlcv):
    n_in = ohlcv.filter("series_id = 'TK00'").count()
    n_out = ma_normalize(ohlcv).filter("series_id = 'TK00'").count()
    assert n_out == n_in - 249


def test_segment_series_window_geometry(ohlcv):
    segs = segment_series(ma_normalize(ohlcv)).cache()
    one = segs.filter("series_id = 'TK00'").orderBy("start_ts").toPandas()
    # window ids carry the reference key format prefix_series_d0_d1
    assert one["segment_id"].str.match(r"^(dr|ri|av)_TK00_\d{8}_\d{8}$").all()
    # spacing between consecutive window starts is `step` business days:
    # starts come from range(0, n, 10) so start timestamps are strictly increasing
    assert one["start_ts"].is_monotonic_increasing
    assert set(one["label"].unique()) <= {"bigrise", "bigdrop", "avg"}
    segs.unpersist()


def test_segment_series_skips_constant_and_short(ohlcv):
    segs = segment_series(ma_normalize(ohlcv))
    present = {r[0] for r in segs.select("series_id").distinct().collect()}
    assert "TK07" not in present  # short ticker: <64 rows after warmup -> no windows
    assert "TK06" not in present  # constant ticker: features skipped


def test_segment_series_oracle_one_ticker(ohlcv):
    """Independent pandas re-implementation of the reference's oversampler
    loop (/root/reference/katslib/opkatsDataUtil.py:60-114) on one ticker —
    keys and labels must match exactly."""
    pdf = _pandas_ma_normalize(ohlcv.filter("series_id='TK01'").toPandas()).reset_index(
        drop=True
    )
    fw = pdf["close"].pct_change(10).shift(-10)
    want = []
    n_drop = n_avg = 0
    for s in range(0, len(pdf), 10):
        win = pdf.iloc[s : s + WINDOW_SIZE]
        if len(win) != WINDOW_SIZE:
            continue
        k = (
            win["ts"].iloc[0].strftime("%Y%m%d"),
            win["ts"].iloc[-1].strftime("%Y%m%d"),
        )
        f = fw.iloc[s + WINDOW_SIZE - 1]
        if not np.isnan(f) and f > 0.07:
            want.append((f"dr_TK01_{k[0]}_{k[1]}", "bigrise"))
        elif not np.isnan(f) and f < -0.05:
            want.append((f"ri_TK01_{k[0]}_{k[1]}", "bigdrop"))
            n_drop += 1
        else:
            if n_avg < 2 * n_drop:
                want.append((f"av_TK01_{k[0]}_{k[1]}", "avg"))
                n_avg += 1
    got = (
        segment_series(ma_normalize(ohlcv.filter("series_id='TK01'")))
        .orderBy("start_ts")
        .select("segment_id", "label")
        .collect()
    )
    assert [(r[0], r[1]) for r in got] == want


def test_segment_tokens_geometry(spark):
    seqs = synth_seqs(spark, 300, seed=5)
    segs = segment_tokens(seqs).cache()
    counts = {r["doc_id"]: r["cnt"] for r in segs.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    lens = {r["doc_id"]: r["n_tok"] for r in seqs.select("doc_id", "n_tok").collect()}
    for doc, n in lens.items():
        expect = 0 if n < 64 else (n - 64) // 10 + 1
        got = counts.get(doc, 0)
        # constant windows may be skipped; synthetic tokens are never constant
        assert got == expect, (doc, n, got, expect)
    assert segs.filter(F.size("features") != 40).count() == 0
    segs.unpersist()


def test_segment_tokens_no_shuffle(spark):
    seqs = synth_seqs(spark, 100, seed=5)
    plan = segment_tokens(seqs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # mapInPandas stays partition-local
