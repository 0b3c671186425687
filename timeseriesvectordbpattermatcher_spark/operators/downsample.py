"""LTTB (Largest-Triangle-Three-Buckets) visual downsampling.

Public algorithm: Steinarsson, "Downsampling Time Series for Visual
Representation" (U. Iceland MSc thesis, 2013). The reference plots raw or
stride-sampled frames (/root/reference/patternTraderUtil.py:365-371 samples
every k-th row before an expensive op; extremaPlotter.py draws full frames) —
stride sampling misses spikes by construction. LTTB keeps the visually
dominant point of every bucket, so a 10^9-point series downsamples to a
4k-point plot that still shows every spike.

Execution shape:
- **Across series**: plain ``applyInPandas`` grouped map — each key's series
  downsamples independently in one task; the shuffle is one Exchange on the
  key. This is the 100 TB path when there are many series (the north-star
  corpus has one series per source x metric).
- **Within one giant series**: LTTB is inherently sequential (each bucket's
  selection anchors the next bucket's triangle), so a single 10^12-point key
  cannot be exact-parallelized. ``strips=`` is the standard escape hatch:
  split the series into S contiguous TIME-range strips (bounds from one
  cheap broadcast agg — no per-key total order anywhere), LTTB each strip
  to ~n_out/S points in parallel, concatenate. Strip boundaries anchor on
  the strip's own first point instead of the previous strip's last
  *selected* point — a documented approximation (identical for strips=1;
  size and endpoint invariants pinned for strips>1). The grouped map then
  keys on (series, strip): bounded partitions, no hot-key serialization.

The per-bucket selection itself is numpy-vectorized (one Python iteration
per OUTPUT bucket, each doing O(bucket) vector math) — n_out is a plot
width (hundreds to thousands), so driver-visible Python work is O(n_out),
not O(n).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _lttb_numpy(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices LTTB keeps for a series already sorted by x. Exact
    implementation of the published algorithm: first and last points always
    kept; interior points bucketed into n_out-2 equal index ranges; each
    bucket keeps the point forming the largest triangle with the previously
    SELECTED point and the NEXT bucket's average point."""
    n = len(x)
    if n_out >= n or n <= 2:
        return np.arange(n)
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3 to keep both endpoints, got {n_out}")
    # bucket boundaries over the n-2 interior points, per the thesis:
    # floor-spaced so every interior point lands in exactly one bucket
    bounds = (np.arange(n_out - 1) * (n - 2) / (n_out - 2) + 1).astype(np.int64)
    bounds[-1] = n - 1
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    out[-1] = n - 1
    a = 0  # previously selected index
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = bounds[i + 1], (n - 1 if i + 2 == n_out - 1 else bounds[i + 2])
        # next bucket's centroid; the LAST bucket's "next" is the final point
        if nhi > nlo:
            cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        else:
            cx, cy = x[n - 1], y[n - 1]
        # triangle area with apex at each candidate, base (a) -> (centroid)
        area = np.abs(
            (x[a] - cx) * (y[lo:hi] - y[a]) - (x[a] - x[lo:hi]) * (cy - y[a])
        )
        a = lo + int(np.argmax(area))
        out[i + 1] = a
    return out


def lttb(
    points: DataFrame,
    n_out: int,
    key_col: str = "source",
    ts_col: str = "event_ts",
    val_col: str = "val",
    strips: int = 1,
) -> DataFrame:
    """Downsample each key's series to ``n_out`` points (fewer only if the
    series is already shorter). Null ts / null val rows are dropped — they
    have no plot position. ``strips > 1`` parallelizes a single giant series
    at the cost of the documented strip-boundary approximation; n_out is
    split across strips proportionally to strip length, min 3 each.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    if strips < 1:
        raise ValueError(f"strips must be >= 1, got {strips}")
    pts = points.filter(F.col(ts_col).isNotNull() & F.col(val_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(val_col).cast("double").alias("val"),
    )
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", pts.schema["ts"].dataType),
            T.StructField("val", T.DoubleType()),
        ]
    )
    if strips > 1:
        # time-range strips from broadcast per-key bounds — a narrow map, no
        # per-key total order (a row_number() strip split would serialize the
        # giant key into one sort partition, the exact thing strips avoid)
        bounds = pts.groupBy("key").agg(
            F.min("ts").alias("_lo"), F.max("ts").alias("_hi")
        )
        frac = F.try_divide(
            (F.unix_micros("ts") - F.unix_micros("_lo")).cast("double"),
            (F.unix_micros("_hi") - F.unix_micros("_lo")).cast("double"),
        )
        pts = pts.join(F.broadcast(bounds), "key").withColumn(
            "_strip",
            F.least(F.lit(strips - 1), F.coalesce(frac * strips, F.lit(0.0)).cast("int")),
        )
        # each strip keeps an equal share of the budget (time-even strips,
        # so row counts per strip may differ — documented approximation)
        per_strip = max(3, int(np.ceil(n_out / strips)))
    else:
        pts = pts.withColumn("_strip", F.lit(0))
        per_strip = n_out
    group_cols = ["key", "_strip"]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "val"], kind="mergesort")
        # rebase before the float conversion: raw ns epochs (~1.7e18) exceed
        # float64's 2^53 integer range and would quantize the x axis
        ints = pdf["ts"].astype("int64").to_numpy()
        x = (ints - ints[0]).astype(np.float64)
        y = pdf["val"].to_numpy()
        idx = _lttb_numpy(x, y, per_strip)
        return pdf.iloc[idx][["key", "ts", "val"]]

    return pts.groupBy(*group_cols).applyInPandas(run, schema=schema)


def _asap_metrics(y: np.ndarray) -> tuple[float, float]:
    """(roughness, kurtosis) per the ASAP paper (Rong & Bailis, VLDB'17):
    roughness = stddev of first differences; kurtosis = population
    m4/m2^2 (non-excess)."""
    d = np.diff(y)
    rough = float(d.std()) if len(d) else 0.0
    mu = y.mean()
    m2 = float(((y - mu) ** 2).mean())
    kurt = float(((y - mu) ** 4).mean() / (m2 * m2)) if m2 > 0 else float("nan")
    return rough, kurt


def _asap_sma(y: np.ndarray, w: int) -> np.ndarray:
    c = np.concatenate(([0.0], np.cumsum(y)))
    return (c[w:] - c[:-w]) / w


def _asap_choose_window(y: np.ndarray) -> int:
    """Exact grid search of the ASAP objective: over SMA windows
    w in [1, n//10], minimize roughness subject to preserving kurtosis
    (kurt(SMA_w) >= kurt(original)). The paper prunes this search with
    autocorrelation peaks and a Pearson bound purely for speed; searching
    the full range returns the same optimum, and here the input is
    already preaggregated to plot width, so the exhaustive form is cheap
    and exactly reproducible. Ties keep the smaller window."""
    n = len(y)
    best_w, best_rough = 1, _asap_metrics(y)[0]
    _, kurt0 = _asap_metrics(y)
    if not np.isfinite(kurt0):  # constant series: nothing to smooth
        return 1
    for w in range(2, max(1, n // 10) + 1):
        s = _asap_sma(y, w)
        rough, kurt = _asap_metrics(s)
        if np.isfinite(kurt) and kurt >= kurt0 and rough < best_rough:
            best_w, best_rough = w, rough
    return best_w


def asap_smooth(
    points: DataFrame,
    resolution: int,
    key_col: str = "source",
    ts_col: str = "event_ts",
    val_col: str = "val",
) -> DataFrame:
    """ASAP smoothing (Rong & Bailis, "ASAP: Prioritizing Attention via
    Time Series Smoothing", VLDB 2017 — the algorithm behind
    TimescaleDB-toolkit's ``asap_smooth``): pick the moving-average
    window that minimizes roughness while PRESERVING kurtosis, so noise
    flattens but anomalous spikes stay visible — the smoothing
    complement to :func:`lttb` (which picks points, never averages).

    Pipeline per key (one ``applyInPandas`` task per key, same
    across-series execution shape as :func:`lttb`):

    1. drop null ts/val, sort by ts;
    2. if n > 2 * resolution, preaggregate to index-even blocks of
       means (block-start ts) so the search runs at plot width — the
       paper's own preaggregation step;
    3. choose w by the exact grid search (see
       :func:`_asap_choose_window`);
    4. emit the SMA_w series: ts = each window's START timestamp,
       ``val`` = window mean, ``w`` = the chosen window (constant per
       key, handy for captions/debugging).

    Output length is ``len(preaggregated) - w + 1`` (<= 2 * resolution).
    A single giant key runs in one task — for 10^9-point single series
    downsample with ``lttb(strips=...)`` first or feed a tier table
    (bucket averages) instead of raw; this operator's domain is
    plot-width series, where exactness and reproducibility win.
    """
    if resolution < 3:
        raise ValueError(f"resolution must be >= 3, got {resolution}")
    pts = points.filter(
        F.col(ts_col).isNotNull() & F.col(val_col).isNotNull()
    ).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(val_col).cast("double").alias("val"),
    )
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", pts.schema["ts"].dataType),
            T.StructField("val", T.DoubleType()),
            T.StructField("w", T.IntegerType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "val"], kind="mergesort")
        ts = pdf["ts"].to_numpy()
        y = pdf["val"].to_numpy()
        n = len(y)
        if n > 2 * resolution:
            block = int(np.ceil(n / (2.0 * resolution)))
            nb = int(np.ceil(n / block))
            pad = nb * block - n
            yp = np.concatenate([y, np.full(pad, np.nan)])
            y = np.nanmean(yp.reshape(nb, block), axis=1)
            ts = ts[::block][:nb]
        w = _asap_choose_window(y)
        s = _asap_sma(y, w) if w > 1 else y
        return pd.DataFrame(
            {
                "key": pdf["key"].iloc[0],
                "ts": ts[: len(s)],
                "val": s,
                "w": np.int32(w),
            }
        )

    return pts.groupBy("key").applyInPandas(run, schema=schema)
