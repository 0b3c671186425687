"""Deterministic 40-dim feature kernel for window embeddings.

Replaces Kats ``TsFeatures().transform`` (used by the reference at
/root/reference/katslib/opkatsDataUtil.py:210-212; Kats is not available in
this sandbox and would not be Arrow-vectorizable anyway) with a documented,
fully-deterministic numpy spec that preserves the reference's *contract*
(/root/reference/katslib/opkatsDataUtil.py:205-216):

- exactly 40 float features per window (Pinecone index ``dimension=40``,
  /root/reference/katslib/opkatsDataUtil.py:284);
- constant (or empty) windows are skipped — caller gets a NaN row it must
  filter (reference returns None at :208-209);
- NaN features are mapped to 0.0 (:212);
- windows whose features contain ±inf are rejected (:213-215).

The kernel is batch-vectorized: input is a (n_windows, window_len) float64
matrix, output (n_windows, 40) float32 — one numpy pass per Arrow batch, no
per-row Python, which is what makes it usable inside ``mapInPandas`` at
100 TB scale.

Feature layout (fixed order, do not reorder — golden fixtures depend on it):
  0 mean, 1 std, 2 min, 3 max, 4 median, 5 q25, 6 q75, 7 range,
  8 first, 9 last, 10 last-first, 11 skew, 12 kurtosis, 13 rms,
  14 mean_abs, 15 mean_diff, 16 std_diff, 17 mean_abs_diff,
  18 max_abs_diff, 19 diff_sign_change_frac, 20 mean_crossing_frac,
  21 above_mean_frac, 22 slope, 23 intercept, 24 corr_with_time,
  25-32 autocorr lags 1..8, 33-39 normalized 7-bin histogram
"""

from __future__ import annotations

import numpy as np

FEATURE_DIM = 40
_HIST_BINS = 7
_ACF_LAGS = 8


def features_40(mat: np.ndarray) -> np.ndarray:
    """(n_windows, window_len) -> (n_windows, 40) float32.

    Constant windows yield all-NaN rows (caller must drop them — the skip
    contract). Non-finite inputs propagate to NaN rows likewise.
    """
    x = np.asarray(mat, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    n, m = x.shape
    out = np.full((n, FEATURE_DIM), np.nan, dtype=np.float64)
    if m < 2:
        return out.astype(np.float32)

    finite = np.isfinite(x).all(axis=1)
    mean = x.mean(axis=1)
    std = x.std(axis=1)  # population std, ddof=0
    ok = finite & (std > 0)
    if not ok.any():
        return out.astype(np.float32)

    x = x[ok]
    mean = mean[ok]
    std = std[ok]
    k = x.shape[0]
    f = np.empty((k, FEATURE_DIM), dtype=np.float64)

    mn = x.min(axis=1)
    mx = x.max(axis=1)
    f[:, 0] = mean
    f[:, 1] = std
    f[:, 2] = mn
    f[:, 3] = mx
    f[:, 4] = np.median(x, axis=1)
    f[:, 5] = np.quantile(x, 0.25, axis=1)
    f[:, 6] = np.quantile(x, 0.75, axis=1)
    f[:, 7] = mx - mn
    f[:, 8] = x[:, 0]
    f[:, 9] = x[:, -1]
    f[:, 10] = x[:, -1] - x[:, 0]

    z = (x - mean[:, None]) / std[:, None]
    f[:, 11] = (z**3).mean(axis=1)  # skew (population)
    f[:, 12] = (z**4).mean(axis=1) - 3.0  # excess kurtosis
    f[:, 13] = np.sqrt((x**2).mean(axis=1))  # rms
    f[:, 14] = np.abs(x).mean(axis=1)

    d = np.diff(x, axis=1)
    f[:, 15] = d.mean(axis=1)
    f[:, 16] = d.std(axis=1)
    f[:, 17] = np.abs(d).mean(axis=1)
    f[:, 18] = np.abs(d).max(axis=1)
    ds = np.sign(d)
    f[:, 19] = (ds[:, 1:] * ds[:, :-1] < 0).mean(axis=1)
    zs = np.sign(x - mean[:, None])
    f[:, 20] = (zs[:, 1:] * zs[:, :-1] < 0).mean(axis=1)
    f[:, 21] = (x > mean[:, None]).mean(axis=1)

    # least-squares line against t = 0..m-1 (closed form)
    t = np.arange(m, dtype=np.float64)
    t_mean = t.mean()
    t_var = ((t - t_mean) ** 2).sum()
    cov = ((x - mean[:, None]) * (t - t_mean)).sum(axis=1)
    slope = cov / t_var
    f[:, 22] = slope
    f[:, 23] = mean - slope * t_mean
    f[:, 24] = cov / (np.sqrt(t_var) * std * np.sqrt(m))  # pearson r

    # autocorrelation, lags 1..8 (biased estimator, like statsmodels acf)
    xc = x - mean[:, None]
    denom = (xc**2).sum(axis=1)
    for lag in range(1, _ACF_LAGS + 1):
        if m > lag:
            f[:, 24 + lag] = (xc[:, lag:] * xc[:, :-lag]).sum(axis=1) / denom
        else:
            f[:, 24 + lag] = 0.0

    # normalized histogram over each window's own [min, max] range
    span = np.where(mx - mn > 0, mx - mn, 1.0)
    idx = np.clip(
        ((x - mn[:, None]) / span[:, None] * _HIST_BINS).astype(np.int64), 0, _HIST_BINS - 1
    )
    hist = np.zeros((k, _HIST_BINS), dtype=np.float64)
    rows = np.repeat(np.arange(k), m)
    np.add.at(hist, (rows, idx.ravel()), 1.0)
    f[:, 33:40] = hist / m

    # contract: NaN -> 0.0; rows with ±inf are rejected (all-NaN row)
    bad = ~np.isfinite(f).all(axis=1) & np.isinf(f).any(axis=1)
    f = np.where(np.isnan(f), 0.0, f)
    f[bad] = np.nan
    out[np.where(ok)[0]] = f
    return out.astype(np.float32)


def cosine_topk_scores(query: np.ndarray, refs: np.ndarray) -> np.ndarray:
    """Cosine similarity of one query (d,) against refs (n, d) -> (n,)."""
    q = np.asarray(query, dtype=np.float64)
    r = np.asarray(refs, dtype=np.float64)
    qn = np.linalg.norm(q)
    rn = np.linalg.norm(r, axis=1)
    denom = np.where((qn * rn) > 0, qn * rn, 1.0)
    return (r @ q) / denom
