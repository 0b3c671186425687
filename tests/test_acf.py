"""ACF / PACF / period estimation (operators/acf.py).

Oracles:
- ACF: DuckDB recomputes the Box–Jenkins estimator with its own
  self-join (numerator over available (t, t+k) pairs, full-series mean
  and denominator) — exact to 1e-9.
- PACF: a pure-python Durbin–Levinson transcription replays every
  value from the ACF table.
- period: planted sines with different periods per key are recovered
  exactly; an aperiodic random walk yields NULL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.acf import (
    acf,
    estimate_period,
    pacf,
)

L = 30
STEP = 60


def _mk(spark, series: dict[str, np.ndarray], drop_every: int | None = None):
    frames = []
    for k, y in series.items():
        ts = pd.Timestamp("2024-02-01") + pd.to_timedelta(np.arange(len(y)) * STEP, unit="s")
        df = pd.DataFrame({"source": k, "bucket_ts": ts, "val": y})
        if drop_every:
            df = df[df.index % drop_every != 3]
        frames.append(df)
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(42)
    t = np.arange(600)
    series = {
        "sin12": 5 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.5, 600),
        "sin24": 3 * np.sin(2 * np.pi * t / 24) + rng.normal(0, 0.4, 600),
        "ar1": None,
        "walk": np.cumsum(rng.normal(0, 1, 600)),
        "const": np.full(600, 7.0),
    }
    ar = np.zeros(600)
    for i in range(1, 600):
        ar[i] = 0.7 * ar[i - 1] + rng.normal()
    series["ar1"] = ar
    df = _mk(spark, {k: np.round(v, 6) for k, v in series.items()}).cache()
    df.count()
    yield df
    df.unpersist()


def _duck_acf(duck, pdf, max_lag, step):
    duck.register("acf_pts", pdf)
    return duck.sql(f"""
        WITH s AS (
          SELECT source, epoch(bucket_ts)::BIGINT AS t, val::DOUBLE AS x FROM acf_pts),
        st AS (
          SELECT source, count(*) n, avg(x) mu,
                 sum(x*x) - sum(x)*sum(x)/count(*) AS ssd
          FROM s GROUP BY 1),
        lags AS (SELECT unnest(range(1, {max_lag + 1})) AS lag),
        num AS (
          SELECT a.source, lags.lag, count(*) AS n_pairs,
                 sum((a.x - st.mu) * (b.x - st.mu)) AS num
          FROM s a CROSS JOIN lags
          JOIN s b ON b.source = a.source AND b.t = a.t + lags.lag * {step}
          JOIN st ON st.source = a.source
          GROUP BY 1, 2)
        SELECT num.source, num.lag, num.n_pairs,
               CASE WHEN st.ssd > 0 AND st.n >= 2 THEN num.num / st.ssd END AS acf
        FROM num JOIN st ON st.source = num.source
        UNION ALL
        SELECT source, 0, n, CASE WHEN ssd > 0 AND n >= 2 THEN 1.0 END FROM st
        ORDER BY 1, 2
    """).df()


@pytest.mark.parametrize("drop_every", [None, 7])
def test_acf_matches_duckdb(spark, duck, corpus, drop_every):
    df = corpus if drop_every is None else corpus.filter(
        (F.unix_micros("bucket_ts") / 1_000_000 / STEP % drop_every) != 3
    )
    got = (
        acf(df, L, ts_col="bucket_ts", step_sec=STEP)
        .toPandas()
        .sort_values(["source", "lag"])
        .reset_index(drop=True)
    )
    want = _duck_acf(duck, df.toPandas(), L, STEP).reset_index(drop=True)
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols], want[cols], check_dtype=False, rtol=1e-9, atol=1e-12
    )
    const = got[got["source"] == "const"]
    assert const["acf"].isna().all()


def _dl_pacf(r):
    out = np.full(len(r), np.nan)
    out[0] = 1.0
    phi_prev = np.zeros(0)
    v = 1.0
    for k in range(1, len(r)):
        if not np.isfinite(r[k]) or v <= 0:
            break
        num = r[k] - float(phi_prev @ r[k - 1:0:-1]) if k > 1 else r[1]
        pkk = num / v
        out[k] = pkk
        phi = np.empty(k)
        phi[:k - 1] = phi_prev - pkk * phi_prev[::-1]
        phi[k - 1] = pkk
        phi_prev = phi
        v *= 1.0 - pkk * pkk
    return out


def test_pacf_matches_durbin_levinson_and_ar1_cutoff(spark, corpus):
    a = acf(corpus, L, ts_col="bucket_ts", step_sec=STEP)
    got = pacf(a).toPandas().sort_values(["source", "lag"]).reset_index(drop=True)
    for k, g in got.groupby("source"):
        r = g.sort_values("lag")["acf"].to_numpy(dtype=float)
        want = _dl_pacf(r) if np.isfinite(r[0]) else np.full(len(r), np.nan)
        if k == "const":
            assert g["pacf"].isna().all()
            continue
        np.testing.assert_allclose(
            g.sort_values("lag")["pacf"].to_numpy(dtype=float), want,
            rtol=1e-9, atol=1e-12, equal_nan=True,
        )
    # AR(1) signature: pacf cuts off after lag 1
    ar = got[got["source"] == "ar1"].sort_values("lag")
    assert abs(ar["pacf"].iloc[1]) > 0.6
    assert (ar["pacf"].iloc[2:].abs() < 0.12).all()


def test_period_recovered_and_null_when_aperiodic(spark, corpus):
    a = acf(corpus, L, ts_col="bucket_ts", step_sec=STEP)
    p = {r["source"]: r for r in estimate_period(a).collect()}
    assert p["sin12"]["period"] == 12
    assert p["sin24"]["period"] == 24
    assert p["const"]["period"] is None
    # a random walk's ACF decays monotonically-ish; if a spurious local
    # peak exists it must be far weaker than the genuine seasonal ones
    if p["walk"]["period"] is not None:
        assert p["walk"]["period_acf"] < p["sin12"]["period_acf"]


def test_acf_guards(spark, corpus):
    with pytest.raises(ValueError, match="max_lag"):
        acf(corpus, 0)
    two = corpus.filter(F.col("source") == "sin12").limit(1)
    out = acf(two, 3, ts_col="bucket_ts", step_sec=STEP).toPandas()
    assert out[out["lag"] == 0]["acf"].isna().all()  # n < 2 -> undefined


def test_pacf_nulls_from_first_lag_gap(spark):
    """A grid whose points sit 2*STEP apart but is read at step_sec=STEP
    has zero aligned pairs at every odd lag, so acf() emits no row for
    them. pacf's Durbin-Levinson kernel indexes the ACF positionally;
    it must detect the non-contiguous lag axis and emit NULL from the
    first gap instead of silently shifting r[2] into the lag-1 slot."""
    rng = np.random.default_rng(7)
    y = np.round(np.sin(2 * np.pi * np.arange(100) / 10)
                 + rng.normal(0, 0.1, 100), 6)
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        np.arange(100) * 2 * STEP, unit="s"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"source": "gappy", "bucket_ts": ts, "val": y})
    )
    a = acf(df, 8, ts_col="bucket_ts", step_sec=STEP)
    got = pacf(a).toPandas().sort_values("lag")
    assert got["lag"].tolist() == [0, 2, 4, 6, 8]  # odd lags absent
    assert got[got["lag"] == 0]["pacf"].iloc[0] == pytest.approx(1.0)
    assert got[got["lag"] > 0]["pacf"].isna().all()

    # control: the same data read at its TRUE step (2*STEP) is
    # contiguous and every pacf value is finite
    a2 = acf(df, 8, ts_col="bucket_ts", step_sec=2 * STEP)
    got2 = pacf(a2).toPandas().sort_values("lag")
    assert got2["lag"].tolist() == list(range(9))
    assert got2["pacf"].notna().all()
