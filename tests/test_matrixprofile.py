"""Matrix profile (operators/matrixprofile.py).

Oracles:
- brute force: an O(n^2 m) engine-free numpy recompute of every pairwise
  z-normalized distance (explicit window z-scores — a different formula
  path than the kernel's streamed dot-product recurrence) must match the
  profile within float tolerance, and every reported mp_idx must be
  admissible and achieve its reported distance;
- planted structure: two identical noise-buried patterns are each
  other's nearest neighbors at distance ~0; a planted anomaly is the top
  discord;
- tiled == per-series: the SCAMP-style block-pair merge reproduces the
  single-task profile for several block sizes, including blocks smaller
  than the pattern spacing and a block covering the whole series.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from timeseriesvectordbpattermatcher_spark.operators.matrixprofile import (
    matrix_profile,
    matrix_profile_tiled,
    profile_discords,
    profile_motifs,
)

M = 16


def _brute(x: np.ndarray, m: int, excl: int):
    n = len(x) - m + 1
    W = np.stack([x[i: i + m] for i in range(n)])
    mu, sig = W.mean(1), W.std(1)
    mp = np.full(n, np.nan)
    mpi = np.full(n, -1, dtype=int)
    for i in range(n):
        best, bi = np.inf, -1
        for j in range(n):
            if abs(i - j) < max(excl, 1):
                continue
            if sig[i] == 0 and sig[j] == 0:
                d = 0.0
            elif (sig[i] == 0) != (sig[j] == 0):
                d = math.sqrt(m)
            else:
                zi = (W[i] - mu[i]) / sig[i]
                zj = (W[j] - mu[j]) / sig[j]
                c = max(-1.0, min(1.0, float(np.dot(zi, zj)) / m))
                d = math.sqrt(2 * m * (1 - c))
            if d < best:
                best, bi = d, j
        if np.isfinite(best):
            mp[i], mpi[i] = best, bi
    return mp, mpi


def _series_pdf() -> pd.DataFrame:
    """Two keys, 260 points each: noisy sines with a planted repeated
    pattern (motif) and a planted spike run (discord) per key."""
    rng = np.random.default_rng(7)
    frames = []
    pat = np.sin(np.linspace(0, 3 * np.pi, M)) * 4.0
    for k, key in enumerate(("alpha", "beta")):
        x = np.sin(np.arange(260) / 9.0 + k) + rng.normal(0, 0.08, 260)
        x[40: 40 + M] = pat + rng.normal(0, 0.01, M)
        x[180: 180 + M] = pat + rng.normal(0, 0.01, M)
        # discord: a unique SHAPE (z-normalization erases level shifts,
        # so a flat spike would not read as anomalous — shape must differ)
        x[120: 120 + M] = np.linspace(-3, 3, M) * np.cos(np.arange(M) * 2.2)
        frames.append(pd.DataFrame({
            "source": key,
            "bucket_ts": pd.date_range("2024-03-01", periods=260, freq="min"),
            "avg_n_tok": x,
        }))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def series(spark):
    df = spark.createDataFrame(_series_pdf()).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def profile(series):
    p = matrix_profile(series, M).cache()
    p.count()
    yield p
    p.unpersist()


def test_profile_matches_brute_force(profile):
    got = profile.toPandas().sort_values(["source", "idx"])
    pdf = _series_pdf()
    for key, g in got.groupby("source"):
        x = pdf[pdf["source"] == key]["avg_n_tok"].to_numpy()
        mp, _ = _brute(x, M, M // 2)
        assert len(g) == len(mp)
        np.testing.assert_allclose(g["mp"].to_numpy(), mp, atol=1e-7)
        # every reported neighbor is admissible and achieves its distance
        for _, r in g.iterrows():
            i, j = int(r["idx"]), int(r["mp_idx"])
            assert abs(i - j) >= max(M // 2, 1)
            wi, wj = x[i: i + M], x[j: j + M]
            zi = (wi - wi.mean()) / wi.std()
            zj = (wj - wj.mean()) / wj.std()
            c = max(-1.0, min(1.0, float(np.dot(zi, zj)) / M))
            assert abs(math.sqrt(2 * M * (1 - c)) - r["mp"]) < 1e-7


def test_planted_motif_pair_found(profile):
    top = profile_motifs(profile, top_k=2).toPandas()
    for key, g in top.groupby("source"):
        idxs = sorted(int(i) for i in g["idx"])
        assert any(abs(i - 40) <= 1 for i in idxs), (key, idxs)
        assert any(abs(i - 180) <= 1 for i in idxs), (key, idxs)
        assert (g["mp"] < 0.35).all()
        # the pair points at itself
        m = {int(r["idx"]): int(r["mp_idx"]) for _, r in g.iterrows()}
        for i, j in m.items():
            assert abs(m.get(j, i) - i) <= 1 or j in m


def test_planted_discord_found(profile):
    top = profile_discords(profile, top_k=1).toPandas()
    for _, r in top.iterrows():
        # the spike run starts at 120; any window overlapping it wins
        assert 120 - M < int(r["idx"]) < 120 + M, r


@pytest.mark.parametrize("block", [64, 100, 512])
def test_tiled_matches_per_series(series, profile, block):
    got = (
        matrix_profile_tiled(series, M, block=block)
        .toPandas().sort_values(["source", "idx"]).reset_index(drop=True)
    )
    want = (
        profile.toPandas().dropna(subset=["mp"])
        .sort_values(["source", "idx"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["idx"].to_numpy() == want["idx"].to_numpy()).all()
    np.testing.assert_allclose(
        got["mp"].to_numpy(), want["mp"].to_numpy(), atol=1e-7
    )
    pd.testing.assert_series_equal(got["ts"], want["ts"], check_names=False)


def test_flat_window_conventions(spark):
    # 3 flat segments of the same value separated far apart, then a sine
    vals = np.concatenate([
        np.full(M, 5.0), np.sin(np.arange(M)) + 1,
        np.full(M, 5.0), np.sin(np.arange(M) / 2.0),
    ])
    pdf = pd.DataFrame({
        "source": "s",
        "bucket_ts": pd.date_range("2024-01-01", periods=len(vals), freq="min"),
        "avg_n_tok": vals,
    })
    got = matrix_profile(spark.createDataFrame(pdf), M).toPandas()
    x = vals
    mp, _ = _brute(x, M, M // 2)
    np.testing.assert_allclose(
        got.sort_values("idx")["mp"].to_numpy(), mp, atol=1e-7
    )
    # the two exactly-flat windows (starts 0 and 2M) match at distance 0
    flat = got[got["idx"] == 0]["mp"].iloc[0]
    assert flat == pytest.approx(0.0, abs=1e-12)


def test_short_series_paths(spark):
    base = pd.date_range("2024-01-01", periods=M + 2, freq="min")
    pdf = pd.DataFrame({
        "source": ["tiny"] * (M - 1) + ["shorty"] * 3,
        "bucket_ts": list(base[: M - 1]) + list(base[:3]),
        "avg_n_tok": [float(i) for i in range(M - 1)] + [1.0, 2.0, 3.0],
    })
    out = matrix_profile(spark.createDataFrame(pdf), M).toPandas()
    assert out.empty  # <2 windows per key -> no rows

    # enough windows but all inside the exclusion zone -> NaN profile
    pdf2 = pd.DataFrame({
        "source": "s",
        "bucket_ts": pd.date_range("2024-01-01", periods=M + 3, freq="min"),
        "avg_n_tok": np.sin(np.arange(M + 3, dtype=float)),
    })
    out2 = matrix_profile(spark.createDataFrame(pdf2), M).toPandas()
    assert len(out2) == 4 and out2["mp"].isna().all()


def test_guards(series):
    with pytest.raises(ValueError):
        matrix_profile(series, 1)
    with pytest.raises(ValueError):
        matrix_profile(series, M, exclusion=-1)
    with pytest.raises(ValueError):
        matrix_profile_tiled(series, M, block=M - 1)
    with pytest.raises(Exception, match="max_points"):
        matrix_profile(series, M, max_points=100).collect()


def test_discord_excludes_nan_and_ranks(profile):
    d = profile_discords(profile, top_k=3).toPandas()
    assert d.groupby("source")["rank"].apply(
        lambda s: sorted(s) == [1, 2, 3]).all()
    assert d["mp"].notna().all()


def test_ab_join_matches_brute_force(spark):
    from timeseriesvectordbpattermatcher_spark.operators.matrixprofile import (
        matrix_profile_ab,
    )

    rng = np.random.default_rng(19)
    pat = np.cos(np.linspace(0, 2 * np.pi, M)) * 3.0
    ref_x = np.sin(np.arange(200) / 7.0) + rng.normal(0, 0.2, 200)
    ref_x[150: 150 + M] = pat  # the pattern lives in history at 150
    q_x = np.sin(np.arange(60) / 5.0) + rng.normal(0, 0.2, 60)
    q_x[20: 20 + M] = pat + rng.normal(0, 0.01, M)  # query carries it too

    def df_of(x, key="s"):
        return spark.createDataFrame(pd.DataFrame({
            "source": key,
            "bucket_ts": pd.date_range("2024-01-01", periods=len(x), freq="min"),
            "avg_n_tok": x,
        }))

    got = (
        matrix_profile_ab(df_of(q_x), df_of(ref_x), M)
        .toPandas().sort_values("idx").reset_index(drop=True)
    )
    nq, nr = len(q_x) - M + 1, len(ref_x) - M + 1
    assert len(got) == nq
    # brute force every query window against every ref window
    for _, r in got.iterrows():
        i = int(r["idx"])
        wi = q_x[i: i + M]
        best, bi = np.inf, -1
        for j in range(nr):
            wj = ref_x[j: j + M]
            si, sj = wi.std(), wj.std()
            if si == 0 and sj == 0:
                d = 0.0
            elif (si == 0) != (sj == 0):
                d = math.sqrt(M)
            else:
                c = max(-1.0, min(1.0, float(
                    np.dot((wi - wi.mean()) / si, (wj - wj.mean()) / sj)) / M))
                d = math.sqrt(2 * M * (1 - c))
            if d < best:
                best, bi = d, j
        assert abs(best - r["mp"]) < 1e-7, (i, best, r["mp"])
    # the planted query pattern finds its historical twin
    hit = got[got["idx"] == 20].iloc[0]
    assert hit["mp"] < 0.2 and int(hit["mp_idx"]) == 150

    # key present on one side only -> no rows
    other = matrix_profile_ab(df_of(q_x, "only_q"), df_of(ref_x, "only_r"), M)
    assert other.count() == 0
