"""Matrix profile: exact all-window nearest-neighbor distances per series.

The reference matches patterns two ways — geometric state machines
(extremaPatternLooper.py) and segment-embedding cosine top-k
(opkatsPatternMatcherUtil.py:223-253). Both need a caller to DEFINE the
shape first. The matrix profile (Yeh et al., ICDM 2016; STOMP, Zhu et
al., ICDM 2016) is the shape-free complement: for every length-``m``
window of a series, the z-normalized Euclidean distance to its nearest
OTHER window. Low profile values = recurring structure (motifs — the
exact counterpart of operators/sax.py's symbolic candidates), high
values = unique structure (discords/anomalies, complementing
operators/changepoints.py's CUSUM level shifts).

Distance: ``d(i,j) = sqrt(2m(1 - corr(x_i, x_j)))`` — the classic
z-normalized Euclidean identity. Flat windows (std == 0) make corr
undefined; we adopt the SCAMP/stumpy convention: flat-vs-flat -> 0,
flat-vs-nonflat -> sqrt(m). A symmetric exclusion zone |i-j| < m/2
(configurable) suppresses trivial self-matches.

Physical shape:

- one shuffle groups each key's points (``applyInPandas``); inside, the
  STOMP recurrence streams each diagonal of the distance matrix with an
  O(1) dot-product update — O(n^2) total but fully vectorized per
  diagonal, no FFT needed, exact to the brute-force oracle,
- n here is a SERIES length at rollup granularity (minutes per key),
  not corpus rows: 100k points/key ~= 69 days of minutes, well inside a
  task (``max_points`` guards the quadratic cost loudly; raise it
  deliberately). The corpus-scale axis is the KEY count, which
  parallelizes embarrassingly across executors.

For single series too long for one task, ``matrix_profile_tiled`` (same
module) computes the identical profile as a union of block-pair
sub-profiles merged by min — the SCAMP tiling scheme — trading one extra
shuffle for per-task work bounded by ``block`` instead of n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "matrix_profile",
    "matrix_profile_tiled",
    "matrix_profile_ab",
    "profile_discords",
    "profile_motifs",
]


def _stomp_kernel(m: int, excl: int, max_points: int):
    """applyInPandas kernel: one key's (ts, val) points -> (idx, ts, mp,
    mp_idx). Exact STOMP: per-diagonal O(1) sliding dot products over the
    ordered series."""

    def run(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("ts").reset_index(drop=True)
        x = pdf["val"].to_numpy(dtype=np.float64)
        n = len(x) - m + 1
        if n < 2:
            return pd.DataFrame(
                {"key": pdf["key"].iloc[:0], "idx": pd.Series([], dtype="int64"),
                 "ts": pdf["ts"].iloc[:0], "mp": pd.Series([], dtype="float64"),
                 "mp_idx": pd.Series([], dtype="int64")}
            )
        if len(x) > max_points:
            raise ValueError(
                f"series has {len(x)} points > max_points={max_points}: "
                "the per-series profile is O(n^2); raise max_points "
                "deliberately or use matrix_profile_tiled"
            )
        mp, mpi = _profile_arrays(x, m, excl)
        return pd.DataFrame(
            {
                "key": pdf["key"].iloc[: n].values,
                "idx": np.arange(n, dtype=np.int64),
                "ts": pdf["ts"].iloc[: n].values,
                "mp": mp,
                "mp_idx": mpi,
            }
        )

    return run


def _moments(x, m):
    """Per-window mean/std via cumulative sums (population std). The
    cumsum identity var = E[x^2] - E[x]^2 cancels catastrophically, so a
    flat window deep in a long series can read sig ~1e-8 instead of 0 and
    silently flip the flat-window convention; windows whose variance is
    below 1e-13 of their mean square (float64 cancellation noise is
    ~2e-16 of it) are clamped to exactly flat."""
    import numpy as np

    c = np.concatenate(([0.0], np.cumsum(x)))
    c2 = np.concatenate(([0.0], np.cumsum(x * x)))
    s = c[m:] - c[:-m]
    ss = c2[m:] - c2[:-m]
    mu = s / m
    meansq = ss / m
    var = meansq - mu * mu
    var = np.where(var <= 1e-13 * np.abs(meansq), 0.0, var)
    return mu, np.sqrt(np.maximum(var, 0.0))


def _pair_dist(qt, mu_a, sig_a, mu_b, sig_b, m):
    """z-normalized distances from sliding dot products ``qt`` between
    window sets a and b (elementwise aligned), with the flat-window
    convention: flat-flat -> 0, flat-nonflat -> sqrt(m)."""
    import numpy as np

    both = (sig_a > 0) & (sig_b > 0)
    corr = np.zeros_like(qt)
    np.divide(
        qt - m * mu_a * mu_b,
        m * sig_a * sig_b,
        out=corr,
        where=both,
    )
    corr = np.clip(corr, -1.0, 1.0)
    d = np.sqrt(2.0 * m * (1.0 - corr))
    one_flat = (sig_a > 0) != (sig_b > 0)
    d = np.where(one_flat, np.sqrt(m), d)
    d = np.where(~both & ~one_flat, 0.0, d)  # flat vs flat
    return d


def _profile_arrays(x, m, excl):
    """Exact profile for one in-memory series: stream diagonals d >= max(1,
    excl) of the symmetric window-distance matrix; each diagonal's dot
    products come from one vectorized cumulative sum."""
    import numpy as np

    n = len(x) - m + 1
    mu, sig = _moments(x, m)
    mp = np.full(n, np.inf)
    mpi = np.full(n, -1, dtype=np.int64)
    d0 = max(excl, 1)
    for d in range(d0, n):
        prod = x[d:] * x[: len(x) - d]
        c = np.concatenate(([0.0], np.cumsum(prod)))
        qt = c[m:] - c[:-m]  # qt[i] = dot(x[i+d : i+d+m], x[i : i+m])
        k = len(qt)
        dist = _pair_dist(qt, mu[d: d + k], sig[d: d + k], mu[:k], sig[:k], m)
        # windows j=i+d (left index) and i (right index) both see this pair
        upd = dist < mp[:k]
        mp[:k] = np.where(upd, dist, mp[:k])
        mpi[:k] = np.where(upd, np.arange(d, d + k), mpi[:k])
        upd = dist < mp[d: d + k]
        mp[d: d + k] = np.where(upd, dist, mp[d: d + k])
        mpi[d: d + k] = np.where(upd, np.arange(k), mpi[d: d + k])
    mp[~np.isfinite(mp)] = np.nan  # no admissible neighbor (tiny n)
    return mp, mpi


def matrix_profile(
    series: DataFrame,
    m: int,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    value_col: str = "avg_n_tok",
    exclusion: int | None = None,
    max_points: int = 200_000,
) -> DataFrame:
    """Per-key exact matrix profile: (key, idx, ts, mp, mp_idx) for every
    length-``m`` window start, ordered by ``ts_col``. ``mp`` is the
    z-normalized Euclidean distance to the nearest window at least
    ``exclusion`` (default m//2, min 1) starts away; ``mp_idx`` its
    start index. NULL values/timestamps are excluded before framing
    (gap-fill upstream if positional alignment matters). Series with
    fewer than m+exclusion points yield NaN profiles (no admissible
    neighbor) or no rows (< m points... fewer than 2 windows)."""
    if m < 2:
        raise ValueError(f"m must be >= 2, got {m}")
    excl = m // 2 if exclusion is None else exclusion
    if excl < 0:
        raise ValueError(f"exclusion must be >= 0, got {excl}")
    pts = series.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("val"),
    )
    out_schema = (
        f"key {series.schema[key_col].dataType.simpleString()}, "
        f"idx long, ts {series.schema[ts_col].dataType.simpleString()}, "
        "mp double, mp_idx long"
    )
    prof = pts.groupBy("key").applyInPandas(
        _stomp_kernel(m, excl, max_points), out_schema
    )
    return prof.withColumnRenamed("key", key_col)


def matrix_profile_tiled(
    series: DataFrame,
    m: int,
    block: int,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    value_col: str = "avg_n_tok",
    exclusion: int | None = None,
) -> DataFrame:
    """Identical output to :func:`matrix_profile`, computed as the
    min-merge of block-pair sub-profiles — the SCAMP tiling scheme — so
    one giant series parallelizes across tasks instead of living in one.

    Physical shape: number windows per key (row_number), assign each to
    a block of ``block`` starts; explode each ordered block PAIR (a <= b)
    into a work unit carrying both blocks' points (a block's points =
    block + m - 1 values via a ranged self-collect); a grouped kernel
    computes each unit's cross-distances (same diagonal-streamed exact
    recurrence); a final groupBy (key, idx) takes the min. Shuffle =
    O((n/block)^2) units x O(block) payload per key — choose
    ``block`` so a unit's O(block^2) flops fit a task; at 10^12 scale
    the unit count is the parallelism axis, exactly SCAMP's GPU tiling
    argument re-expressed as a shuffle."""
    if m < 2:
        raise ValueError(f"m must be >= 2, got {m}")
    if block < m:
        raise ValueError(f"block must be >= m, got block={block} m={m}")
    excl = m // 2 if exclusion is None else exclusion

    pts = (
        series.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("val"),
        )
        .withColumn(
            "_i",
            F.row_number().over(
                Window.partitionBy("key").orderBy("ts")
            ) - F.lit(1),
        )
    )
    # a point at _i feeds windows starting in [_i - m + 1, _i]; window w
    # lives in block w // block -> point joins blocks floor((_i-m+1)/block)
    # .. floor(_i/block), always a bounded span of ceil(m/block)+1 blocks
    b_lo = F.greatest(
        F.lit(0), F.floor((F.col("_i") - F.lit(m - 1)) / F.lit(block))
    ).cast("int")
    b_hi = F.floor(F.col("_i") / F.lit(block)).cast("int")
    members = pts.select(
        "key", "ts", "val", "_i",
        F.explode(F.sequence(b_lo, b_hi)).alias("_blk"),
    )
    blocks = members.groupBy("key", "_blk").agg(
        F.array_sort(F.collect_list(F.struct("_i", "ts", "val"))).alias("_pts")
    )
    a = blocks.select(
        "key", F.col("_blk").alias("_ba"), F.col("_pts").alias("_pa")
    )
    b = blocks.select(
        "key", F.col("_blk").alias("_bb"), F.col("_pts").alias("_pb")
    )
    units = a.join(b, on="key").filter(F.col("_ba") <= F.col("_bb"))

    def unit_kernel(pdf):
        import numpy as np
        import pandas as pd

        outs = []
        for _, r in pdf.iterrows():  # one row per (key, _ba, _bb) group
            pa = sorted(r["_pa"], key=lambda e: e["_i"])
            pb = sorted(r["_pb"], key=lambda e: e["_i"])
            ia0 = pa[0]["_i"]
            ib0 = pb[0]["_i"]
            xa = np.array([e["val"] for e in pa])
            xb = np.array([e["val"] for e in pb])
            na, nb = len(xa) - m + 1, len(xb) - m + 1
            if na < 1 or nb < 1:
                continue
            # global window-start ranges owned by each block
            wa_lo, wa_hi = r["_ba"] * block, min((r["_ba"] + 1) * block, ia0 + na)
            wb_lo, wb_hi = r["_bb"] * block, min((r["_bb"] + 1) * block, ib0 + nb)
            mua, siga = _moments(xa, m)
            mub, sigb = _moments(xb, m)
            best_a = np.full(na, np.inf)
            besti_a = np.full(na, -1, dtype=np.int64)
            best_b = np.full(nb, np.inf)
            besti_b = np.full(nb, -1, dtype=np.int64)
            # stream diagonals of the cross matrix: window (ia0+i) vs
            # (ib0+j) where j - i = d ranges over all alignments
            for d in range(-(na - 1), nb):
                i0 = max(0, -d)
                j0 = i0 + d
                k = min(na - i0, nb - j0)
                if k < 1:
                    continue
                prod = xa[i0: i0 + k + m - 1] * xb[j0: j0 + k + m - 1]
                c = np.concatenate(([0.0], np.cumsum(prod)))
                qt = c[m:] - c[:-m]
                gi = ia0 + i0 + np.arange(k)
                gj = ib0 + j0 + np.arange(k)
                dist = _pair_dist(
                    qt, mua[i0: i0 + k], siga[i0: i0 + k],
                    mub[j0: j0 + k], sigb[j0: j0 + k], m,
                )
                dist = np.where(np.abs(gi - gj) < max(excl, 1), np.inf, dist)
                upd = dist < best_a[i0: i0 + k]
                best_a[i0: i0 + k] = np.where(upd, dist, best_a[i0: i0 + k])
                besti_a[i0: i0 + k] = np.where(upd, gj, besti_a[i0: i0 + k])
                upd = dist < best_b[j0: j0 + k]
                best_b[j0: j0 + k] = np.where(upd, dist, best_b[j0: j0 + k])
                besti_b[j0: j0 + k] = np.where(upd, gi, besti_b[j0: j0 + k])
            rows = []
            for gidx in range(wa_lo, wa_hi):
                li = gidx - ia0
                if 0 <= li < na and np.isfinite(best_a[li]):
                    rows.append((r["key"], gidx, pa[li]["ts"],
                                 float(best_a[li]), int(besti_a[li])))
            if r["_ba"] != r["_bb"]:
                for gidx in range(wb_lo, wb_hi):
                    lj = gidx - ib0
                    if 0 <= lj < nb and np.isfinite(best_b[lj]):
                        rows.append((r["key"], gidx, pb[lj]["ts"],
                                     float(best_b[lj]), int(besti_b[lj])))
            if rows:
                outs.append(pd.DataFrame(
                    rows, columns=["key", "idx", "ts", "mp", "mp_idx"]
                ))
        if not outs:
            return pd.DataFrame(
                {"key": pd.Series([], dtype="object"),
                 "idx": pd.Series([], dtype="int64"),
                 "ts": pd.Series([], dtype="datetime64[us]"),
                 "mp": pd.Series([], dtype="float64"),
                 "mp_idx": pd.Series([], dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    out_schema = (
        f"key {series.schema[key_col].dataType.simpleString()}, "
        f"idx long, ts {series.schema[ts_col].dataType.simpleString()}, "
        "mp double, mp_idx long"
    )
    sub = units.groupBy("key", "_ba", "_bb").applyInPandas(
        unit_kernel, out_schema
    )
    merged = sub.groupBy("key", "idx").agg(
        F.min(F.struct("mp", "mp_idx", "ts")).alias("_best")
    )
    return merged.select(
        F.col("key").alias(key_col),
        "idx",
        F.col("_best.ts").alias("ts"),
        F.col("_best.mp").alias("mp"),
        F.col("_best.mp_idx").alias("mp_idx"),
    )


def profile_discords(
    profile: DataFrame, top_k: int = 5, key_col: str = "source"
) -> DataFrame:
    """Top-``top_k`` HIGHEST-profile windows per key — the classic discord
    (anomaly) read. NaN profiles (no admissible neighbor) are excluded."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col("mp").desc(), F.col("idx"))
    return (
        profile.filter(F.col("mp").isNotNull() & ~F.isnan("mp"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(top_k))
    )


def profile_motifs(
    profile: DataFrame, top_k: int = 5, key_col: str = "source"
) -> DataFrame:
    """Top-``top_k`` LOWEST-profile windows per key — each row is one end
    of a motif pair (its partner is ``mp_idx``)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col("mp").asc(), F.col("idx"))
    return (
        profile.filter(F.col("mp").isNotNull() & ~F.isnan("mp"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(top_k))
    )


def matrix_profile_ab(
    query: DataFrame,
    ref: DataFrame,
    m: int,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    value_col: str = "avg_n_tok",
    max_points: int = 200_000,
) -> DataFrame:
    """AB-join profile: for every length-``m`` window of the QUERY
    series, the z-normalized distance to its nearest window in the
    REFERENCE series sharing the same key — "find this pattern in
    history", the reference engine's core matcher read re-expressed
    shape-free. No exclusion zone (the sides are different series by
    contract; self-joining the same frame belongs to
    :func:`matrix_profile`). Keys present on only one side yield no
    rows. Output: (key, idx, ts, mp, mp_idx) with ``idx`` indexing
    query windows and ``mp_idx`` reference windows.

    Physical shape: one cogroup on the key (both sides shuffle once),
    then the same diagonal-streamed cross-distance kernel the tiled
    variant uses. Per-task cost is O(n_q * n_r) per key — ``max_points``
    bounds each side loudly; split the REFERENCE by time range and
    min-merge downstream (exactly the tiled scheme) when history
    exceeds it."""
    if m < 2:
        raise ValueError(f"m must be >= 2, got {m}")

    def prep(df):
        return df.filter(
            F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
        ).select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("val"),
        )

    def kernel(qpdf, rpdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({
            "key": pd.Series([], dtype="object"),
            "idx": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "mp": pd.Series([], dtype="float64"),
            "mp_idx": pd.Series([], dtype="int64"),
        })
        if qpdf.empty or rpdf.empty:
            return empty
        qpdf = qpdf.sort_values("ts").reset_index(drop=True)
        rpdf = rpdf.sort_values("ts").reset_index(drop=True)
        xq = qpdf["val"].to_numpy(dtype=np.float64)
        xr = rpdf["val"].to_numpy(dtype=np.float64)
        if len(xq) > max_points or len(xr) > max_points:
            raise ValueError(
                f"side has {max(len(xq), len(xr))} points > "
                f"max_points={max_points}: AB profile is O(n_q*n_r); "
                "split the reference by time range and min-merge"
            )
        nq, nr = len(xq) - m + 1, len(xr) - m + 1
        if nq < 1 or nr < 1:
            return empty
        muq, sigq = _moments(xq, m)
        mur, sigr = _moments(xr, m)
        best = np.full(nq, np.inf)
        besti = np.full(nq, -1, dtype=np.int64)
        for d in range(-(nq - 1), nr):
            i0 = max(0, -d)
            j0 = i0 + d
            k = min(nq - i0, nr - j0)
            if k < 1:
                continue
            prod = xq[i0: i0 + k + m - 1] * xr[j0: j0 + k + m - 1]
            c = np.concatenate(([0.0], np.cumsum(prod)))
            qt = c[m:] - c[:-m]
            dist = _pair_dist(
                qt, muq[i0: i0 + k], sigq[i0: i0 + k],
                mur[j0: j0 + k], sigr[j0: j0 + k], m,
            )
            upd = dist < best[i0: i0 + k]
            best[i0: i0 + k] = np.where(upd, dist, best[i0: i0 + k])
            besti[i0: i0 + k] = np.where(
                upd, j0 + np.arange(k), besti[i0: i0 + k]
            )
        return pd.DataFrame({
            "key": qpdf["key"].iloc[:nq].values,
            "idx": np.arange(nq, dtype=np.int64),
            "ts": qpdf["ts"].iloc[:nq].values,
            "mp": best,
            "mp_idx": besti,
        })

    out_schema = (
        f"key {query.schema[key_col].dataType.simpleString()}, "
        f"idx long, ts {query.schema[ts_col].dataType.simpleString()}, "
        "mp double, mp_idx long"
    )
    out = prep(query).groupBy("key").cogroup(
        prep(ref).groupBy("key")
    ).applyInPandas(kernel, out_schema)
    return out.withColumnRenamed("key", key_col)
