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


# ---------------------------------------------------------------- ASAP

from timeseriesvectordbpattermatcher_spark.operators.downsample import (  # noqa: E402
    _asap_sma,
    asap_smooth,
)


def _asap_oracle(ts, y, resolution):
    """Independent transcription of the published ASAP objective:
    preaggregate to <= 2*resolution block means, exhaustive SMA-window
    search minimizing std(diff) s.t. population kurtosis m4/m2^2 is
    preserved, emit the SMA series at window-start timestamps."""
    ts = np.asarray(ts)
    y = np.asarray(y, dtype=float)
    n = len(y)
    if n > 2 * resolution:
        block = math.ceil(n / (2.0 * resolution))
        yb, tb = [], []
        for i in range(0, n, block):
            yb.append(y[i:i + block].mean())
            tb.append(ts[i])
        y, ts = np.array(yb), np.array(tb)

    def metrics(s):
        d = np.diff(s)
        rough = d.std() if len(d) else 0.0
        mu, m2 = s.mean(), ((s - s.mean()) ** 2).mean()
        kurt = ((s - mu) ** 4).mean() / (m2 * m2) if m2 > 0 else float("nan")
        return rough, kurt

    rough0, kurt0 = metrics(y)
    best_w, best_rough = 1, rough0
    if math.isfinite(kurt0):
        for w in range(2, max(1, len(y) // 10) + 1):
            s = np.convolve(y, np.ones(w) / w, mode="valid")
            rough, kurt = metrics(s)
            if math.isfinite(kurt) and kurt >= kurt0 and rough < best_rough:
                best_w, best_rough = w, rough
    s = np.convolve(y, np.ones(best_w) / best_w, mode="valid") if best_w > 1 else y
    return ts[: len(s)], s, best_w


def _noisy_seasonal(seed, n, spike_at=None):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    y = 10 * np.sin(2 * np.pi * t / 48) + rng.normal(0, 2.0, n)
    if spike_at is not None:
        y[spike_at] += 80.0
    ts = pd.Timestamp("2024-05-01") + pd.to_timedelta(t * 60, unit="s")
    return ts, y.round(6)


@pytest.mark.parametrize("resolution", [50, 400])
def test_asap_matches_pure_python_reference(spark, resolution):
    frames = []
    for k, seed, n, spike in (("a", 11, 960, 500), ("b", 12, 2500, None), ("c", 13, 7, None)):
        ts, y = _noisy_seasonal(seed, n, spike)
        frames.append(pd.DataFrame({"source": k, "event_ts": ts, "val": y}))
    pdf = pd.concat(frames, ignore_index=True)
    out = (
        asap_smooth(spark.createDataFrame(pdf), resolution)
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    for k, seed, n, spike in (("a", 11, 960, 500), ("b", 12, 2500, None), ("c", 13, 7, None)):
        ts, y = _noisy_seasonal(seed, n, spike)
        ots, os_, ow = _asap_oracle(ts.to_numpy(), y, resolution)
        got = out[out["key"] == k]
        assert len(got) == len(os_), (k, len(got), len(os_))
        assert (got["w"] == ow).all()
        np.testing.assert_allclose(got["val"].to_numpy(), os_, rtol=1e-12, atol=1e-12)
        assert list(got["ts"].to_numpy()) == list(ots)


def test_asap_smooths_noise_but_kurtosis_guard_keeps_spikes(spark):
    # clean noisy seasonal: smoothing wins, roughness drops, kurtosis
    # constraint holds on the chosen window
    ts, y = _noisy_seasonal(21, 960, spike_at=None)
    pdf = pd.DataFrame({"source": "s", "event_ts": ts, "val": y})
    out = asap_smooth(spark.createDataFrame(pdf), 480).toPandas().sort_values("ts")
    w = int(out["w"].iloc[0])
    assert w > 1  # noise means smoothing wins
    # roughness strictly decreased vs the raw series
    assert np.diff(out["val"].to_numpy()).std() < np.diff(y).std()
    # kurtosis preserved per the paper's constraint
    def kurt(s):
        mu, m2 = s.mean(), ((s - s.mean()) ** 2).mean()
        return ((s - mu) ** 4).mean() / (m2 * m2)
    assert kurt(out["val"].to_numpy()) >= kurt(y)
    # a massive single spike pins kurtosis so high that EVERY smoothing
    # window would blur it below the original — the guard must refuse to
    # smooth (w=1) and the spike must pass through untouched
    ts2, y2 = _noisy_seasonal(21, 960, spike_at=480)
    pdf2 = pd.DataFrame({"source": "s", "event_ts": ts2, "val": y2})
    out2 = asap_smooth(spark.createDataFrame(pdf2), 480).toPandas().sort_values("ts")
    assert (out2["w"] == 1).all()
    assert out2["val"].max() == y2.max()


def test_asap_constant_and_tiny_series(spark):
    pdf = pd.DataFrame(
        {
            "source": ["c"] * 5 + ["t"] * 2,
            "event_ts": pd.to_datetime(
                [f"2024-01-01 00:00:0{i}" for i in range(5)]
                + ["2024-01-02 00:00:00", "2024-01-02 00:00:01"]
            ),
            "val": [7.0] * 5 + [1.0, 2.0],
        }
    )
    out = asap_smooth(spark.createDataFrame(pdf), 100).toPandas()
    c = out[out["key"] == "c"]
    assert (c["w"] == 1).all() and len(c) == 5 and (c["val"] == 7.0).all()
    t = out[out["key"] == "t"]
    assert (t["w"] == 1).all() and len(t) == 2


def test_asap_guards(spark, walk_df):
    _, df = walk_df
    with pytest.raises(ValueError, match="resolution"):
        asap_smooth(df, 2)
    assert (_asap_sma(np.array([1.0, 2.0, 3.0, 4.0]), 2) == np.array([1.5, 2.5, 3.5])).all()
