"""CUSUM mean-shift detection as pure window expressions (zero UDFs).

The reference ecosystem is Kats-based (its 40-dim embedding is Kats
``TsFeatures``, /root/reference/katslib/opkatsDataUtil.py:210-212); Kats'
flagship detector family is CUSUM. The reference repo itself never calls
the detectors, so this module is beyond-reference surface in the same
family as the pattern screeners (SURVEY.md §2.8) — a per-series mean-shift
detector a monitoring/rollup pipeline runs over the 1m/1h tiers.

Classic two-sided tabular CUSUM (Page 1954; NIST/SEMATECH e-handbook
§6.3.2.3): with standardized ``z_t = (x_t - mu0) / sigma`` and slack
``kappa`` (in sigmas),

    C+_t = max(0, C+_{t-1} + z_t - kappa)      alarm when C+_t > h
    C-_t = max(0, C-_{t-1} - z_t - kappa)      alarm when C-_t > h

The recurrence looks stateful, but it has a closed prefix form — with
``S_t = sum_{i<=t} (z_i - kappa)`` (and ``S_0 = 0``):

    C+_t = S_t - min_{0<=j<=t} S_j

(a reset to 0 at time j is exactly "the prefix minimum moved to j"), and
symmetrically for C- over ``(-z_i - kappa)``. Running sum and running min
are both ordered-window aggregates, so the whole detector stays inside
whole-stage codegen: ONE Exchange on the series key, no recursion, no
Python (plan-pinned in tests/test_changepoints.py, recurrence-vs-closed-
form equality pinned against an independent pandas loop oracle).

The changepoint location estimate is the standard one: the last time the
prefix sum touched its running minimum before the alarm — i.e. the shift
began on the NEXT row after ``argmin_j S_j``. We surface the argmin row's
timestamp via a lexicographic ``min(struct(S, ts))`` window (earliest ts
wins S-ties, deterministic).

Scale: everything is one hash Exchange on ``series_col`` + one sort —
identical shape to every other per-series window operator in this engine,
so the 100 TB arguments from ``operators/windows.py`` carry over verbatim
(salt/AQE handle skewed series; state per row is O(1)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cusum_stats(
    df: DataFrame,
    value_col: str = "close",
    series_col: str = "series_id",
    ts_col: str = "ts",
    kappa: float = 0.5,
    h: float = 5.0,
    baseline_n: int = 30,
    mu0: float | None = None,
    sigma: float | None = None,
    chunk_by: str | Column | None = None,
) -> DataFrame:
    """Add two-sided CUSUM columns per series: ``cusum_pos``, ``cusum_neg``,
    ``alarm_pos``, ``alarm_neg``, ``cp_ts_pos``, ``cp_ts_neg``.

    ``mu0``/``sigma`` default to the mean / sample stddev of each series'
    first ``baseline_n`` rows (the in-control reference period); pass
    constants to use known process parameters instead. Rows inside the
    baseline window never alarm (the baseline is in-control by
    definition), and a series whose baseline stddev is 0/undefined (a
    constant or too-short prefix) yields null CUSUM columns and no alarms
    — mirroring the constant-series guard of ``features_40``
    (SURVEY.md §2.11).

    ``kappa`` is the slack in sigma units (detects shifts larger than
    ``2*kappa`` sigmas quickly); ``h`` the decision threshold in sigmas
    (4-5 is the textbook choice). Values after an alarm keep the
    NON-restarting running statistic — this is first-detection semantics
    (see :func:`cusum_changepoints` for the one-row-per-alarm view), not a
    self-resetting control chart.

    ``chunk_by`` — the SKEW ESCAPE HATCH. The default plan computes each
    series in one window partition: correct, but a series holding most of
    the data serializes into one task (a 14M-row series measured 45 s in
    scripts/sf1_bench.py). Pass a chunk expression that is NONDECREASING
    in ``ts_col`` within each series (a time bucket — e.g.
    ``F.to_date("ts")``; caller's contract, not validated) and the
    detector switches to a distributed two-phase prefix scan: local
    cumsum/min per (series, chunk) in parallel, then chunk offsets and
    cross-chunk running minima over a per-chunk summary table (rows =
    series x chunks), broadcast-joined back. Results are identical up to
    float association (offset + local sums re-associate the additions;
    agreement pinned at 1e-9 relative in tests/test_changepoints.py — an
    alarm can differ only when the statistic sits within float noise of
    ``h``).
    """
    if baseline_n < 2 and (mu0 is None or sigma is None):
        raise ValueError("baseline_n must be >= 2 to estimate mu0/sigma")
    if chunk_by is not None:
        return _cusum_stats_chunked(
            df, value_col, series_col, ts_col, kappa, h, baseline_n,
            mu0, sigma, chunk_by,
        )
    w = Window.partitionBy(series_col).orderBy(ts_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.partitionBy(series_col)

    rn = F.row_number().over(w)
    x = F.col(value_col).cast("double")
    out = df.withColumn("_rn", rn)

    base_val = F.when(F.col("_rn") <= baseline_n, x)
    mu_c = F.lit(float(mu0)) if mu0 is not None else F.avg(base_val).over(whole)
    sd_c = (
        F.lit(float(sigma))
        if sigma is not None
        else F.stddev_samp(base_val).over(whole)
    )
    sd_c = F.when(sd_c > 0, sd_c)  # 0 / null stddev -> null z -> no alarms
    z = (x - mu_c) / sd_c

    # prefix sums of (z - kappa) and (-z - kappa); the virtual S_0 = 0 term
    # is the F.least(lit(0), ...) arm of the running minimum
    s_pos = F.sum(z - F.lit(kappa)).over(run)
    s_neg = F.sum(-z - F.lit(kappa)).over(run)
    out = out.withColumn("_sp", s_pos).withColumn("_sn", s_neg)

    def side(s_col: str) -> tuple:
        run_min = F.least(F.lit(0.0), F.min(F.col(s_col)).over(run))
        cusum = F.col(s_col) - run_min
        # argmin via lexicographic struct-min; the cp estimate is only
        # defined when the min is an actual row (prefix min < 0) — when the
        # running min is the virtual S_0 the shift started at series start.
        # Rows with null S (all-null prefix) are excluded: a struct with a
        # null field would sort FIRST and poison the min
        arg = F.min(
            F.when(
                F.col(s_col).isNotNull(),
                F.struct(F.col(s_col).alias("s"), F.col(ts_col).alias("t")),
            )
        ).over(run)
        cp = F.when(arg["s"] < 0, arg["t"])
        return cusum, cp

    cusum_p, cp_p = side("_sp")
    cusum_n, cp_n = side("_sn")
    after_base = F.col("_rn") > baseline_n if (mu0 is None or sigma is None) else F.lit(True)
    out = (
        out.withColumn("cusum_pos", cusum_p)
        .withColumn("cusum_neg", cusum_n)
        .withColumn("alarm_pos", F.coalesce((cusum_p > h) & after_base, F.lit(False)))
        .withColumn("alarm_neg", F.coalesce((cusum_n > h) & after_base, F.lit(False)))
        .withColumn("cp_ts_pos", cp_p)
        .withColumn("cp_ts_neg", cp_n)
        .drop("_rn", "_sp", "_sn")
    )
    return out


def _cusum_stats_chunked(
    df: DataFrame,
    value_col: str,
    series_col: str,
    ts_col: str,
    kappa: float,
    h: float,
    baseline_n: int,
    mu0: float | None,
    sigma: float | None,
    chunk_by: str | Column,
) -> DataFrame:
    """Distributed prefix-scan CUSUM (see :func:`cusum_stats` ``chunk_by``).

    Classic parallel-scan decomposition: for chunk c with exclusive offset
    ``S_off(c) = sum of earlier chunks' totals``,

        S_t            = S_off(c) + local_cumsum_t
        min_{j<=t} S_j = min( min over chunks c'<c of
                                 (S_off(c') + local_min(c')),
                              S_off(c) + local_running_min_t )

    and the argmin struct composes the same way. Everything row-level is
    windowed within (series, chunk) — parallel across chunks — and the
    cross-chunk recurrences run over a summary table with one row per
    (series, chunk), broadcast back. ONE data-sized Exchange (the
    (series, chunk) partitioning); the summaries are series x chunks rows.
    """
    ck = F.col(chunk_by) if isinstance(chunk_by, str) else chunk_by
    est = mu0 is None or sigma is None
    x = F.col(value_col).cast("double")

    wloc = Window.partitionBy(series_col, "_ck").orderBy(ts_col)
    runloc = wloc.rowsBetween(Window.unboundedPreceding, 0)
    wser = Window.partitionBy(series_col).orderBy("_ck")
    prevser = wser.rowsBetween(Window.unboundedPreceding, -1)

    cur = df.withColumn("_ck", ck).withColumn("_lrn", F.row_number().over(wloc))

    if est:
        # global row number = exclusive chunk row-offset + local row number;
        # needed only to locate the first baseline_n rows per series
        cnts = cur.groupBy(series_col, "_ck").agg(F.count(F.lit(1)).alias("_cnt"))
        offs = cnts.select(
            series_col,
            "_ck",
            F.coalesce(F.sum("_cnt").over(prevser), F.lit(0)).alias("_roff"),
        )
        cur = cur.join(F.broadcast(offs), [series_col, "_ck"])
        cur = cur.withColumn("_grn", F.col("_roff") + F.col("_lrn"))
        base_rows = cur.filter(F.col("_grn") <= baseline_n)
        bstats = base_rows.groupBy(series_col).agg(
            F.avg(x).alias("_bmu"), F.stddev_samp(x).alias("_bsd")
        )
        cur = cur.join(F.broadcast(bstats), series_col, "left")
        after_base = F.col("_grn") > baseline_n
    else:
        after_base = F.lit(True)
    mu_c = F.lit(float(mu0)) if mu0 is not None else F.col("_bmu")
    sd_c = F.lit(float(sigma)) if sigma is not None else F.col("_bsd")
    sd_c = F.when(sd_c > 0, sd_c)
    z = (x - mu_c) / sd_c

    # window sums skip nulls (a null-x row keeps S at its previous value;
    # S is null only while a series' prefix holds NO non-null increment) —
    # the cross-chunk composition below reproduces that exactly: local sums
    # stay raw (null while the LOCAL prefix is all-null), and the row's
    # global S falls back to the chunk offset whenever any EARLIER
    # non-null increment exists (tracked by non-null counts)
    cur = cur.withColumn("_ip", z - F.lit(kappa)).withColumn("_in", -z - F.lit(kappa))
    for p in ("_p", "_n"):
        inc = F.col("_i" + p[1])
        cur = cur.withColumn("_lc" + p, F.sum(inc).over(runloc))
        cur = cur.withColumn("_lm" + p, F.min(F.col("_lc" + p)).over(runloc))
        cur = cur.withColumn(
            "_la" + p,
            F.min(
                F.when(
                    F.col("_lc" + p).isNotNull(),
                    F.struct(F.col("_lc" + p).alias("s"), F.col(ts_col).alias("t")),
                )
            ).over(runloc),
        )
    cur = cur.withColumn("_lnn", F.count("_ip").over(runloc))

    # per-chunk summary -> offsets + cross-chunk running minima (tiny table).
    # Null-S structs are excluded from every argmin (they'd sort first and
    # poison it — same guard as the single-partition form)
    aggs = [F.count("_ip").alias("_ncnt")]
    for p in ("_p", "_n"):
        aggs += [
            F.sum("_i" + p[1]).alias("_tot" + p),
            F.min("_lc" + p).alias("_cmin" + p),
            F.min(
                F.when(
                    F.col("_lc" + p).isNotNull(),
                    F.struct(F.col("_lc" + p).alias("s"), F.col(ts_col).alias("t")),
                )
            ).alias("_carg" + p),
        ]
    summ = cur.groupBy(series_col, "_ck").agg(*aggs)
    summ = summ.withColumn("_pcnt", F.coalesce(F.sum("_ncnt").over(prevser), F.lit(0)))
    for p in ("_p", "_n"):
        summ = summ.withColumn(
            "_soff" + p, F.coalesce(F.sum("_tot" + p).over(prevser), F.lit(0.0))
        )
    for p in ("_p", "_n"):
        summ = summ.withColumn(
            "_pmin" + p,
            F.min(F.col("_soff" + p) + F.col("_cmin" + p)).over(prevser),
        ).withColumn(
            "_parg" + p,
            F.min(
                F.when(
                    F.col("_carg" + p).isNotNull(),
                    F.struct(
                        (F.col("_soff" + p) + F.col("_carg" + p)["s"]).alias("s"),
                        F.col("_carg" + p)["t"].alias("t"),
                    ),
                )
            ).over(prevser),
        )
    summ = summ.select(
        series_col, "_ck", "_pcnt",
        *[c + p for p in ("_p", "_n") for c in ("_soff", "_pmin", "_parg")],
    )
    cur = cur.join(F.broadcast(summ), [series_col, "_ck"])

    any_nn = (F.col("_pcnt") + F.col("_lnn")) > 0
    out_cols = {}
    for p, side in (("_p", "pos"), ("_n", "neg")):
        s_t = F.when(
            any_nn, F.col("_soff" + p) + F.coalesce(F.col("_lc" + p), F.lit(0.0))
        )
        rowmin = F.least(
            F.col("_pmin" + p), F.col("_soff" + p) + F.col("_lm" + p)
        )
        cusum = s_t - F.least(F.lit(0.0), rowmin)
        curarg = F.when(
            F.col("_la" + p).isNotNull(),
            F.struct(
                (F.col("_soff" + p) + F.col("_la" + p)["s"]).alias("s"),
                F.col("_la" + p)["t"].alias("t"),
            ),
        )
        arg = F.least(F.col("_parg" + p), curarg)
        out_cols[f"cusum_{side}"] = cusum
        out_cols[f"alarm_{side}"] = F.coalesce((cusum > h) & after_base, F.lit(False))
        out_cols[f"cp_ts_{side}"] = F.when(arg["s"] < 0, arg["t"])

    out = cur
    for name in ("cusum_pos", "cusum_neg", "alarm_pos", "alarm_neg",
                 "cp_ts_pos", "cp_ts_neg"):
        out = out.withColumn(name, out_cols[name])
    drop = ["_ck", "_lrn", "_ip", "_in", "_lnn", "_pcnt"]
    drop += [c + p for p in ("_p", "_n")
             for c in ("_lc", "_lm", "_la", "_soff", "_pmin", "_parg")]
    if est:
        drop += ["_roff", "_grn", "_bmu", "_bsd"]
    return out.drop(*drop)


def cusum_changepoints(
    df: DataFrame,
    value_col: str = "close",
    series_col: str = "series_id",
    ts_col: str = "ts",
    kappa: float = 0.5,
    h: float = 5.0,
    baseline_n: int = 30,
    mu0: float | None = None,
    sigma: float | None = None,
    chunk_by: str | Column | None = None,
) -> DataFrame:
    """First-detection view: one row per (series, direction) giving the
    earliest alarm and its estimated changepoint.

    Columns: ``series_col``, ``direction`` ('up'|'down'), ``alarm_ts``
    (first row whose CUSUM crossed ``h``), ``cp_ts`` (estimated start of
    the shift — the prefix-sum argmin at alarm time), ``cusum`` (the
    statistic at the alarm). Series with no alarm emit nothing.
    """
    stats = cusum_stats(
        df, value_col, series_col, ts_col, kappa, h, baseline_n, mu0, sigma,
        chunk_by=chunk_by,
    )
    # one pass: both directions as an inline-exploded struct array (a
    # union of two filters would scan + shuffle the stats twice)
    side = lambda d, alarm, cus, cp: F.struct(  # noqa: E731
        F.lit(d).alias("direction"),
        F.col(alarm).alias("alarm"),
        F.col(ts_col).alias("alarm_ts"),
        F.col(cp).alias("cp_ts"),
        F.col(cus).alias("cusum"),
    )
    both = stats.select(
        series_col,
        F.explode(
            F.filter(
                F.array(
                    side("up", "alarm_pos", "cusum_pos", "cp_ts_pos"),
                    side("down", "alarm_neg", "cusum_neg", "cp_ts_neg"),
                ),
                lambda s: s["alarm"],
            )
        ).alias("_s"),
    ).select(
        series_col,
        F.col("_s")["direction"].alias("direction"),
        F.col("_s")["alarm_ts"].alias("alarm_ts"),
        F.col("_s")["cp_ts"].alias("cp_ts"),
        F.col("_s")["cusum"].alias("cusum"),
    )
    w = Window.partitionBy(series_col, "direction").orderBy("alarm_ts")
    return (
        both.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _pelt_kernel(penalty: float | None, min_size: int, max_points: int):
    """Grouped PELT (Killick, Fearnhead & Eckley 2012) with the L2
    mean-change cost computed from prefix sums. Exact: the pruning rule
    ``F(s) + C(s, t) > F(t)  =>  drop s`` is lossless for subadditive
    costs (L2 is, by the within/between variance decomposition), so the
    result equals the unpruned optimal-partitioning DP — pinned in
    tests/test_changepoints.py."""

    def run(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("ts").reset_index(drop=True)
        pdf = pdf[pdf["val"].notna() & pdf["ts"].notna()].reset_index(drop=True)
        empty = pd.DataFrame({
            "series": pd.Series([], dtype=pdf["series"].dtype),
            "seg": pd.Series([], dtype="int32"),
            "start_ts": pd.Series([], dtype=pdf["ts"].dtype),
            "end_ts": pd.Series([], dtype=pdf["ts"].dtype),
            "n_pts": pd.Series([], dtype="int64"),
            "mean": pd.Series([], dtype="float64"),
            "penalty": pd.Series([], dtype="float64"),
        })
        n = len(pdf)
        if n == 0:
            return empty
        if n > max_points:
            raise ValueError(
                f"PELT series has {n} points > max_points={max_points}; "
                f"raise max_points deliberately or pre-aggregate the series"
            )
        key = pdf["series"].iloc[0]
        y = pdf["val"].to_numpy(dtype=np.float64)
        if penalty is None:
            # robust sigma from first differences (MAD / (Phi^-1(3/4) * sqrt 2));
            # BIC-style beta = 2 * sigma^2 * log n. Deterministic in the data.
            if n >= 3:
                d = np.diff(y)
                sig = np.median(np.abs(d - np.median(d))) / (0.6744897501960817 * np.sqrt(2.0))
            else:
                sig = 0.0
            beta = max(2.0 * sig * sig * np.log(max(n, 2)), 1e-12)
        else:
            beta = float(penalty)

        cs = np.concatenate(([0.0], np.cumsum(y)))
        cs2 = np.concatenate(([0.0], np.cumsum(y * y)))

        def cost(a: int, b: int) -> float:  # y[a:b], b exclusive
            m = b - a
            s = cs[b] - cs[a]
            return float(cs2[b] - cs2[a] - s * s / m)

        INF = np.inf
        Fv = np.full(n + 1, INF)
        Fv[0] = -beta
        prev = np.zeros(n + 1, dtype=np.int64)
        cands: list[int] = [0]
        for t in range(min_size, n + 1):
            best, barg = INF, 0
            admissible = [s for s in cands if t - s >= min_size]
            for s in admissible:
                v = Fv[s] + cost(s, t) + beta
                if v < best:
                    best, barg = v, s
            if not admissible:  # n < 2*min_size tail: only s=0 later
                continue
            Fv[t] = best
            prev[t] = barg
            # lossless prune among the candidates actually considered
            cands = [s for s in cands if not (t - s >= min_size and Fv[s] + cost(s, t) > Fv[t])]
            cands.append(t)
        if not np.isfinite(Fv[n]):
            # fewer than min_size points: one degenerate whole-series segment
            bounds = [0, n]
        else:
            bounds = [n]
            while bounds[0] != 0:
                bounds.insert(0, int(prev[bounds[0]]))
        segs = list(zip(bounds[:-1], bounds[1:]))
        return pd.DataFrame({
            "series": key,
            "seg": np.arange(len(segs), dtype="int32"),
            "start_ts": [pdf["ts"].iloc[a] for a, _ in segs],
            "end_ts": [pdf["ts"].iloc[b - 1] for _, b in segs],
            "n_pts": [b - a for a, b in segs],
            "mean": [float((cs[b] - cs[a]) / (b - a)) for a, b in segs],
            "penalty": beta,
        })

    return run


def pelt_changepoints(
    df: DataFrame,
    value_col: str = "close",
    series_col: str = "series_id",
    ts_col: str = "ts",
    penalty: float | None = None,
    min_size: int = 2,
    max_points: int = 200_000,
) -> DataFrame:
    """Exact offline multi-changepoint segmentation per series: PELT
    (Killick et al. 2012) minimizing ``sum of segment L2 costs +
    penalty * (#segments)`` — the batch complement to the online
    :func:`cusum_changepoints` (CUSUM flags the FIRST shift as data
    arrives; PELT recovers ALL mean shifts of a finished window
    optimally). Returns one row per (series, segment): ``seg`` index,
    ``start_ts``/``end_ts`` (inclusive), ``n_pts``, segment ``mean``,
    and the ``penalty`` actually used.

    ``penalty=None`` uses a BIC-style default ``2 * sigma^2 * log n``
    with sigma estimated robustly from first differences (MAD) — a
    deterministic function of the series, reproduced by the oracle.
    NULL values/timestamps are dropped before segmentation.

    Distribution contract matches the matrix profile: one grouped
    kernel per series (O(n) memory, near-linear time thanks to PELT
    pruning), the distribution axis is the KEY count, and a series
    longer than ``max_points`` fails loudly rather than silently
    serializing a giant task. Segment series at a coarser tier (the
    rollup cascade exists for exactly this) when a key overflows."""
    if min_size < 1:
        raise ValueError(f"min_size must be >= 1, got {min_size}")
    if penalty is not None and penalty < 0:
        raise ValueError(f"penalty must be >= 0, got {penalty}")
    pts = df.select(
        F.col(series_col).alias("series"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("val"),
    )
    out_schema = (
        f"series {df.schema[series_col].dataType.simpleString()}, "
        f"seg int, "
        f"start_ts {df.schema[ts_col].dataType.simpleString()}, "
        f"end_ts {df.schema[ts_col].dataType.simpleString()}, "
        "n_pts bigint, mean double, penalty double"
    )
    out = pts.groupBy("series").applyInPandas(
        _pelt_kernel(penalty, int(min_size), int(max_points)), out_schema
    )
    return out.withColumnRenamed("series", series_col)
