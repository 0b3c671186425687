"""Generalized ESD anomaly test (operators/esd.py).

Oracles:
- t quantiles: pinned against STANDARD-TABLE critical values (an
  independent published source, not a re-derivation).
- the full procedure: a pure-python transcription of Rosner's published
  steps replays every R_j / lambda_j / flagged point.
- Rosner's own 1983 worked example (n=54, k=10, alpha=0.05 -> exactly
  3 outliers) — the canonical cross-check the paper publishes.
- S-H-ESD composition: seasonal_decompose residuals + ESD find planted
  spikes in a strongly seasonal series that raw-value ESD misses.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.esd import (
    generalized_esd,
    t_ppf,
)

# Rosner (1983) Table 1 data — the paper's published worked example
ROSNER = [
    -0.25, 0.68, 0.94, 1.15, 1.20, 1.26, 1.26, 1.34, 1.38, 1.43, 1.49,
    1.49, 1.55, 1.56, 1.58, 1.65, 1.69, 1.70, 1.76, 1.77, 1.81, 1.91,
    1.94, 1.96, 1.99, 2.06, 2.09, 2.10, 2.14, 2.15, 2.23, 2.24, 2.26,
    2.35, 2.37, 2.40, 2.47, 2.54, 2.62, 2.64, 2.90, 2.92, 2.92, 2.93,
    3.21, 3.26, 3.30, 3.59, 3.68, 4.30, 4.64, 5.34, 5.42, 6.01,
]


def test_t_ppf_matches_standard_tables():
    # classic two-sided 5% critical values (df, t_{0.975, df})
    table = {1: 12.7062, 2: 4.3027, 5: 2.5706, 10: 2.2281, 30: 2.0423,
             120: 1.9799}
    for df, want in table.items():
        assert t_ppf(0.975, df) == pytest.approx(want, abs=2e-4), df
    assert t_ppf(0.995, 10) == pytest.approx(3.1693, abs=2e-4)
    assert t_ppf(0.5, 7) == pytest.approx(0.0, abs=1e-6)
    assert t_ppf(0.025, 10) == pytest.approx(-2.2281, abs=2e-4)
    with pytest.raises(ValueError, match="p must be"):
        t_ppf(0.0, 5)


def test_rosner_published_example(spark):
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.arange(len(ROSNER)) * 3600, unit="s"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"source": "r", "bucket_ts": ts, "val": ROSNER})
    )
    out = generalized_esd(df, max_anomalies=10, alpha=0.05).toPandas()
    # the paper's result: exactly the three largest values are outliers
    assert len(out) == 3
    assert sorted(out["val"]) == [5.34, 5.42, 6.01]
    assert list(out.sort_values("rank")["val"]) == [6.01, 5.42, 5.34]


def _python_esd(x, k, alpha, robust=False):
    x = np.array(x, dtype=float)
    alive = np.ones(len(x), dtype=bool)
    rows = []
    for j in range(1, min(k, len(x) - 2) + 1):
        vals = x[alive]
        m = len(vals)
        if robust:
            c = np.median(vals)
            s = 1.4826 * np.median(np.abs(vals - c))
        else:
            c, s = vals.mean(), vals.std(ddof=1)
        if s <= 0:
            break
        dev = np.where(alive, np.abs(x - c), -np.inf)
        i = int(np.argmax(dev))
        r = dev[i] / s
        tv = t_ppf(1 - alpha / (2 * m), m - 2)
        lam = (m - 1) * tv / math.sqrt((m - 2 + tv * tv) * m)
        rows.append((i, r, lam))
        alive[i] = False
    n_anom = 0
    for j, (_, r, lam) in enumerate(rows, 1):
        if r > lam:
            n_anom = j
    return rows[:n_anom]


@pytest.mark.parametrize("robust", [False, True])
def test_matches_python_replay_multi_key(spark, robust):
    rng = np.random.default_rng(5)
    frames = []
    plants = {"a": [7, 80], "b": [33], "clean": []}
    for key, idxs in plants.items():
        y = rng.normal(10, 1.5, 120)
        for where in idxs:
            y[where] += 14.0
        ts = pd.Timestamp("2024-02-01") + pd.to_timedelta(
            np.arange(120) * 60, unit="s"
        )
        frames.append(pd.DataFrame({"source": key, "bucket_ts": ts,
                                    "val": np.round(y, 6)}))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)
    out = generalized_esd(df, max_anomalies=5, alpha=0.05, robust=robust).toPandas()
    for key, idxs in plants.items():
        g = pdf[pdf["source"] == key].reset_index(drop=True)
        want = _python_esd(g["val"].to_numpy(), 5, 0.05, robust)
        got = out[out["source"] == key].sort_values("rank")
        assert len(got) == len(want), key
        for (i, r, lam), row in zip(want, got.itertuples()):
            assert row.val == g["val"].iloc[i]
            assert row.r_stat == pytest.approx(r, rel=1e-9)
            assert row.lambda_crit == pytest.approx(lam, rel=1e-9)
        # every planted spike recovered
        flagged = set(got["val"])
        for where in idxs:
            assert g["val"].iloc[where] in flagged, (key, where)
    assert (out["source"] != "clean").all()


def test_shesd_composition_beats_raw_esd(spark):
    """The published S-H-ESD point: on a strongly seasonal series a
    moderate spike hides inside the seasonal swing for raw ESD but is
    obvious in the decomposition residuals."""
    from timeseriesvectordbpattermatcher_spark.operators.seasonal import (
        seasonal_decompose,
    )

    rng = np.random.default_rng(11)
    t = np.arange(240)
    y = 20.0 * np.sin(2 * np.pi * t / 24) + rng.normal(0, 0.5, 240)
    y[100] += 6.0  # well inside the +-20 swing
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(t * 3600, unit="s")
    pdf = pd.DataFrame({"source": "s", "bucket_ts": ts, "val": np.round(y, 6)})
    df = spark.createDataFrame(pdf)
    raw_hits = generalized_esd(df, max_anomalies=5, alpha=0.05).toPandas()
    spike_ts = pdf["bucket_ts"].iloc[100]
    assert spike_ts not in set(raw_hits["ts"])  # masked by the season
    dec = seasonal_decompose(df, period=24, ts_col="bucket_ts", value_col="val")
    resid = dec.filter(F.col("resid").isNotNull()).select(
        "source", "bucket_ts", F.col("resid").alias("val")
    )
    sh = generalized_esd(resid, max_anomalies=5, alpha=0.05).toPandas()
    assert spike_ts in set(sh["ts"])  # found in the residuals


def test_guards(spark):
    df = spark.createDataFrame(
        [("s", "2024-01-01 00:00:00", 1.0)],
        "source string, ts string, x double",
    ).select("source", F.col("ts").cast("timestamp").alias("bucket_ts"),
             F.col("x").alias("val"))
    with pytest.raises(ValueError, match="alpha"):
        generalized_esd(df, alpha=0.0)
    with pytest.raises(ValueError, match="max_anomalies"):
        generalized_esd(df, max_anomalies=0)
    assert generalized_esd(df).count() == 0  # n < 3 -> nothing
    const = spark.createDataFrame(
        [("c", f"2024-01-01 00:00:{i:02d}", 5.0) for i in range(20)],
        "source string, ts string, val double",
    ).select("source", F.col("ts").cast("timestamp").alias("bucket_ts"), "val")
    assert generalized_esd(const).count() == 0  # zero scale -> no flags
