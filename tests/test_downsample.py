"""LTTB downsampling (operators/downsample.py).

Oracle: a pure-python point-by-point transcription of the published
algorithm (Steinarsson 2013, the canonical downsample.js formulation) —
nested loops, no numpy — must select the exact same rows as the engine's
vectorized grouped map.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from timeseriesvectordbpattermatcher_spark.operators.downsample import (
    _lttb_numpy,
    lttb,
)


def lttb_ref(xs, ys, n_out):
    """Engine-free reference: straight from the published pseudocode."""
    n = len(xs)
    if n_out >= n or n <= 2:
        return list(range(n))
    every = (n - 2) / (n_out - 2)
    sampled = [0]
    a = 0
    for i in range(n_out - 2):
        avg_start = int(math.floor((i + 1) * every)) + 1
        avg_end = min(int(math.floor((i + 2) * every)) + 1, n)
        if avg_end > avg_start:
            avg_x = sum(xs[avg_start:avg_end]) / (avg_end - avg_start)
            avg_y = sum(ys[avg_start:avg_end]) / (avg_end - avg_start)
        else:
            avg_x, avg_y = xs[n - 1], ys[n - 1]
        lo = int(math.floor(i * every)) + 1
        hi = int(math.floor((i + 1) * every)) + 1
        max_area, pick = -1.0, lo
        for j in range(lo, hi):
            area = (
                abs(
                    (xs[a] - avg_x) * (ys[j] - ys[a])
                    - (xs[a] - xs[j]) * (avg_y - ys[a])
                )
                * 0.5
            )
            if area > max_area:
                max_area, pick = area, j
        sampled.append(pick)
        a = pick
    sampled.append(n - 1)
    return sampled


def _series(seed, n):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        np.cumsum(rng.integers(1, 90, size=n)), unit="s"
    )
    val = np.cumsum(rng.normal(0, 1, size=n)).round(4)
    return ts, val


@pytest.fixture(scope="module")
def walk_df(spark):
    frames = []
    for k, seed, n in (("a", 1, 1000), ("b", 2, 777), ("c", 3, 5)):
        ts, val = _series(seed, n)
        frames.append(pd.DataFrame({"source": k, "event_ts": ts, "val": val}))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf).cache()
    df.count()
    yield pdf, df
    df.unpersist()


@pytest.mark.parametrize("n_out", [3, 17, 50])
def test_lttb_matches_pure_python_reference(walk_df, n_out):
    pdf, df = walk_df
    got = lttb(df, n_out).toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    wants = []
    for k, g in pdf.groupby("source"):
        g = g.sort_values("event_ts").reset_index(drop=True)
        ints = g["event_ts"].astype("int64").to_numpy()
        xs = list((ints - ints[0]).astype(float))
        ys = list(g["val"].astype(float))
        idx = lttb_ref(xs, ys, n_out)
        wants.append(
            pd.DataFrame(
                {
                    "key": k,
                    "ts": g["event_ts"].iloc[idx].to_numpy(),
                    "val": g["val"].iloc[idx].astype(float).to_numpy(),
                }
            )
        )
    want = (
        pd.concat(wants, ignore_index=True)
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_lttb_identity_when_budget_covers_series(walk_df):
    pdf, df = walk_df
    out = lttb(df.filter("source = 'c'"), 50).toPandas()
    assert len(out) == 5  # series shorter than budget passes through intact


def test_lttb_invariants(walk_df):
    pdf, df = walk_df
    out = lttb(df, 40).toPandas()
    for k, g in pdf.groupby("source"):
        o = out[out.key == k].sort_values("ts")
        n = len(g)
        assert len(o) == min(40, n)
        assert o["ts"].iloc[0] == g["event_ts"].min()
        assert o["ts"].iloc[-1] == g["event_ts"].max()


def test_lttb_strips_mode(walk_df):
    pdf, df = walk_df
    big = df.filter("source = 'a'")
    out = lttb(big, 48, strips=4).toPandas().sort_values("ts")
    g = pdf[pdf.source == "a"]
    # whole-series endpoints survive (first strip keeps the global first
    # point, last strip the global last) and the budget bounds the size
    assert out["ts"].iloc[0] == g["event_ts"].min()
    assert out["ts"].iloc[-1] == g["event_ts"].max()
    assert len(out) <= 4 * int(np.ceil(48 / 4))
    assert len(out) >= 12  # every nonempty strip keeps >= 3 points
    # each kept row is a real input row
    merged = out.merge(
        g.rename(columns={"event_ts": "ts"}), on=["ts", "val"], how="left",
        indicator=True,
    )
    assert (merged["_merge"] == "both").all()


def test_lttb_null_rows_dropped(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 4,
            "event_ts": [
                pd.Timestamp("2024-01-01 00:00:00"),
                pd.NaT,
                pd.Timestamp("2024-01-01 00:00:02"),
                pd.Timestamp("2024-01-01 00:00:03"),
            ],
            "val": [1.0, 2.0, None, 4.0],
        }
    )
    out = lttb(spark.createDataFrame(pdf), 3).toPandas().sort_values("ts")
    assert len(out) == 2  # only two clean rows survive the filter
    assert list(out["val"]) == [1.0, 4.0]


def test_lttb_guards():
    with pytest.raises(ValueError, match="n_out"):
        _lttb_numpy(np.arange(5.0), np.arange(5.0), 2)
