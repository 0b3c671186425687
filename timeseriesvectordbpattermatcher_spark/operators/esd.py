"""Generalized ESD (Extreme Studentized Deviate) anomaly test per series.

Rosner's generalized ESD (Technometrics 1983) answers "how many of the
up-to-k most extreme points are genuine outliers" with proper multiple-
testing control — the statistical core of the S-H-ESD pipeline
(Hochenbaum, Vallis & Kejariwal 2017): run :func:`~.seasonal.
seasonal_decompose` first and feed the RESIDUAL column here, and the
combination is the published seasonal-hybrid anomaly detector. The
residual z-flags the seasonal module already emits use a FIXED z
threshold; ESD instead tests each successive extreme against a
t-derived critical value that shrinks with the remaining sample, so it
neither under-reports when outliers mask each other nor over-reports on
long series.

Definitions (exactly the published ones):

- iteration j = 1..max_anomalies over the surviving sample of size
  m = n - j + 1: R_j = max_i |x_i - center| / scale, remove the argmax;
- critical value lambda_j = (m - 1) * t / sqrt((m - 2 + t^2) * m) with
  t = t-quantile(1 - alpha / (2 m), df = m - 2) (two-sided);
- the anomaly count is the LARGEST j with R_j > lambda_j (not the
  first failure — that is what controls masking); the removed points up
  to that j are the anomalies, ranked by removal order.
- ``robust=True`` replaces mean/stddev with median/MAD (scaled by
  1.4826 for normal consistency) — the S-H-ESD variant; the critical
  values are unchanged (the published procedure keeps the t-based
  lambda as an approximation, which we document rather than hide).

The t-quantile is computed from first principles (no scipy in this
sandbox): Student's t CDF via the regularized incomplete beta function
(Lentz continued fraction, Numerical Recipes §6.4 — a public
algorithm), inverted by bisection. tests/test_esd.py pins it against
standard-table critical values (e.g. t_{0.975, 10} = 2.2281).

Execution shape: one grouped kernel per key (``applyInPandas``) — the
distribution axis is the key count, like every per-series exact test in
this repo (matrixprofile, trendtest), with the same loud ``max_points``
guard; intended input is a TIER table or a decomposition's residuals.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["generalized_esd", "t_ppf"]


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's method)."""
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def _t_cdf(t: float, df: float) -> float:
    x = df / (df + t * t)
    p = 0.5 * _betainc(df / 2.0, 0.5, x)
    return 1.0 - p if t > 0 else p


def t_ppf(p: float, df: float) -> float:
    """Student's t quantile by bisection on the CDF — public algorithm,
    pinned against standard-table critical values in tests."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    if df <= 0:
        raise ValueError(f"df must be > 0, got {df}")
    lo, hi = -1e6, 1e6
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if _t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-10 * max(1.0, abs(mid)):
            break
    return 0.5 * (lo + hi)


def _esd_kernel(
    t: np.ndarray, x: np.ndarray, max_anomalies: int, alpha: float, robust: bool
) -> list[dict]:
    n = len(x)
    if n < 3:
        return []
    k = min(max_anomalies, n - 2)
    work = x.astype(float).copy()
    alive = np.ones(n, dtype=bool)
    removed: list[tuple[int, float, float]] = []  # (idx, R_j, lambda_j)
    for j in range(1, k + 1):
        vals = work[alive]
        m = len(vals)
        if robust:
            center = float(np.median(vals))
            mad = float(np.median(np.abs(vals - center)))
            scale = 1.4826 * mad
        else:
            center = float(vals.mean())
            scale = float(vals.std(ddof=1))
        if scale <= 0:
            break
        dev = np.where(alive, np.abs(work - center), -np.inf)
        i = int(np.argmax(dev))
        r = dev[i] / scale
        pt = 1.0 - alpha / (2.0 * m)
        tv = t_ppf(pt, m - 2)
        lam = (m - 1) * tv / math.sqrt((m - 2 + tv * tv) * m)
        removed.append((i, float(r), float(lam)))
        alive[i] = False
    # largest j with R_j > lambda_j
    n_anom = 0
    for j, (_, r, lam) in enumerate(removed, start=1):
        if r > lam:
            n_anom = j
    return [
        {"ts_idx": int(idx), "r_stat": r, "lambda_crit": lam, "rank": j}
        for j, (idx, r, lam) in enumerate(removed[:n_anom], start=1)
    ]


def generalized_esd(
    points: DataFrame,
    max_anomalies: int = 10,
    alpha: float = 0.05,
    robust: bool = False,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    val_col: str = "val",
    max_points: int = 100_000,
) -> DataFrame:
    """Per-key generalized ESD: emits ONE ROW PER DETECTED ANOMALY —
    ``(key, ts, val, rank, r_stat, lambda_crit)`` where ``rank`` is the
    removal order (1 = most extreme). Keys with no anomalies emit
    nothing. Feed a residual column (``seasonal_decompose(...)``'s
    ``resid``) for the S-H-ESD pipeline; feeding raw values of a
    trending/seasonal series will flag the trend, as the published test
    assumes approximately i.i.d. normal inliers.

    ``max_anomalies`` caps the tested extremes (the published procedure
    requires an upper bound; <= 2 + that many points must exist);
    ``robust`` switches to median/MAD centering (S-H-ESD variant).
    ``max_points`` guards the O(k*n) kernel per key, loudly."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if max_anomalies < 1:
        raise ValueError(f"max_anomalies must be >= 1, got {max_anomalies}")
    pts = points.filter(
        F.col(ts_col).isNotNull() & F.col(val_col).isNotNull()
    ).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(val_col).cast("double").alias("x"),
    )
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", pts.schema["ts"].dataType),
            T.StructField("val", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("r_stat", T.DoubleType()),
            T.StructField("lambda_crit", T.DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_points:
            raise ValueError(
                f"generalized_esd: key {pdf['key'].iloc[0]!r} has "
                f"{len(pdf)} points > max_points={max_points}; aggregate "
                "to a coarser tier or raise max_points deliberately"
            )
        pdf = pdf.sort_values(["ts", "x"], kind="mergesort").reset_index(drop=True)
        hits = _esd_kernel(
            pdf["ts"].to_numpy(), pdf["x"].to_numpy(), max_anomalies, alpha, robust
        )
        if not hits:
            return pd.DataFrame(
                columns=["key", "ts", "val", "rank", "r_stat", "lambda_crit"]
            ).astype({"rank": "int32"}, errors="ignore")
        return pd.DataFrame(
            {
                "key": pdf["key"].iloc[0],
                "ts": [pdf["ts"].iloc[h["ts_idx"]] for h in hits],
                "val": [pdf["x"].iloc[h["ts_idx"]] for h in hits],
                "rank": [h["rank"] for h in hits],
                "r_stat": [h["r_stat"] for h in hits],
                "lambda_crit": [h["lambda_crit"] for h in hits],
            }
        )

    return pts.groupBy("key").applyInPandas(run, schema=schema).withColumnRenamed(
        "key", key_col
    )
