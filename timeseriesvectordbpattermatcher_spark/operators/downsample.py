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
