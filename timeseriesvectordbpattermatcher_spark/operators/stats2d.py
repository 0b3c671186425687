"""Mergeable 1-D + 2-D statistical aggregates ("stats_agg") as tier
summaries — rolling regression / correlation over the cascade.

TimescaleDB-toolkit's ``stats_agg(y, x)`` (a public spec) exposes linear
regression, correlation, and covariance as a MERGEABLE aggregate so
continuous aggregates can serve "slope of the metric over any window"
without rescanning raw data. The reference fits trend lines by calling
numpy ``polyfit`` per driver-side frame (e.g. the trend-range scan at
/root/reference/extremaPatternLooper.py and the box trend scoring at
/root/reference/boxTaUtil.py) — one series at a time, in driver memory.
This module is the engine's distributed, tiered equivalent: per-bucket
moment sums that merge EXACTLY up the raw -> 1m -> 1h -> 1d cascade,
with regression/correlation read out at any tier by closed-form
accessors.

Summary row: ``(key, bucket_ts, x0, n, sx, sy, sxx, syy, sxy, sy3,
sy4)`` — plain power sums about an explicit x-origin ``x0``.

Numerical design (the part a naive power-sum scheme gets WRONG): the
accessors subtract ``sx^2/n`` from ``sxx``, which cancels catastrophically
when |x| dwarfs x's in-bucket spread. Regressing against raw epoch
seconds (~1.7e9) in 1-minute buckets (spread <= 59 s) loses ~20 decimal
digits — correlations come out past +/-1. TimescaleDB dodges this with
Youngs–Cramer running-centered sums; a distributed merge needs an
order-free equivalent, so this module uses SHIFTED power sums instead:

- TIME mode (``x_col=None``): x is measured from the row's OWN bucket
  start, recorded in the summary as ``x0 = bucket_ts``. In-bucket
  offsets are bounded by the bucket width, so no addend ever dwarfs the
  spread.
- The cascade re-origins each fine summary to the coarse bucket start
  with the exact polynomial identities (d = fine x0 - coarse x0):
  ``sx' = sx + n*d``, ``sxx' = sxx + 2d*sx + n*d^2``,
  ``sxy' = sxy + d*sy`` — the algebra stays a columnwise SUM after a
  per-row projection, so mergeability (and the same-tier seam merge the
  real-time views use) is untouched.
- Rolling reads over k buckets shift every in-window summary to the
  window's FIRST bucket's origin the same way, so offsets stay bounded
  by the window span, not by absolute time.
- EXPLICIT mode (``x_col=...``): x is the caller's column, ``x0`` is
  NULL, shifts are zero; bounded-magnitude x is the caller's contract
  (same disclosure every power-sum consumer in this repo makes).

Accessors follow the SQL-standard ``REGR_*`` / ``CORR`` / ``COVAR_*``
semantics (PostgreSQL 16 docs §9.21; DuckDB implements the same), which
the tests pin per-tier against DuckDB's own builtin aggregates computed
straight from raw. The 1-D extras (skewness/kurtosis, population
method) match TimescaleDB's ``skewness(stats_agg(y))`` /
``kurtosis(stats_agg(y))`` and are pinned against explicit moment SQL.
In time mode ``intercept`` is the fit line's value AT THE BUCKET START
(x = 0 at ``x0``); slope is per second.

Scale notes (10^12 rows):
- The 1m build is ONE hash aggregate on ``(key, minute-bucket)`` —
  map-side partial sums, a single Exchange, no window, no UDF; a hot
  key is bounded per bucket exactly like the rollup plane (and the
  build accepts ``salt_buckets`` for the same two-phase split the
  stats plane uses when one (key, bucket) cell is itself hot).
- Each cascade step is one projection + one ``groupBy`` sum over
  calendar-bounded rows (60 or 24 fine buckets per coarse bucket) —
  shuffle bytes are the TIER table's size, never raw's.
- Everything is codegen'd expressions; accessors are pure projections.

Float caveat (same disclosure as operators/timeweight.py): power sums
are double adds, exact in any order only while every addend is an
integer with magnitude < 2^53 — true for int-valued y and second-aligned
time at the tested scales (cascade == direct pinned BITWISE there,
time mode included); beyond that the sums are subject to
reduction-order rounding but, thanks to the bounded-offset design,
never to cancellation blowup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIER_ORDER, TIER_TRUNC

__all__ = [
    "stats2_bucket",
    "stats2_cascade",
    "stats2_read",
    "stats2_rolling_read",
]

_SUMS = ["n", "sx", "sy", "sxx", "syy", "sxy", "sy3", "sy4"]
#: full summary payload (origin marker + sums) for schema-stable selects
SUMMARY_COLS = ["x0", *_SUMS]


def _check_tiers(from_tier: str, to_tier: str) -> None:
    # same-tier allowed: identity trunc == the partial merge the
    # real-time seam needs (see operators/timeweight.py for rationale)
    if from_tier not in TIER_TRUNC or to_tier not in TIER_TRUNC:
        raise ValueError(f"tiers must be in {list(TIER_TRUNC)}")
    if TIER_ORDER.index(to_tier) < TIER_ORDER.index(from_tier):
        raise ValueError(f"cascade must coarsen: {from_tier} -> {to_tier}")


def _seconds_between(a: Column, b: Column) -> Column:
    return (F.unix_micros(b) - F.unix_micros(a)) / F.lit(1_000_000.0)


def stats2_bucket(
    points: DataFrame,
    tier: str = "1m",
    key_col: str = "source",
    ts_col: str = "event_ts",
    y_col: str = "n_tok",
    x_col: str | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Per-(key, bucket) mergeable stats summary from raw points.

    ``x_col=None`` regresses y against TIME measured in seconds from the
    row's own bucket start (``x0 = bucket_ts`` in the summary — the
    module docstring explains why not raw epoch). Rows with a NULL ts,
    y, or x are dropped — the SQL ``REGR_*`` family skips pairs with
    either side NULL, and a NULL has no moment.

    ``salt_buckets`` splits each (key, bucket) cell across that many
    partial cells before the final merge — same two-phase shape as
    ``rollup_1m(salt_buckets=...)`` for a cell hot enough to bound a
    single task (sums re-merge exactly, so the result is identical).
    """
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    y = F.col(y_col).cast("double")
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col(ts_col))
    if x_col is None:
        x = _seconds_between(bucket, F.col(ts_col))
        x0 = bucket
    else:
        x = F.col(x_col).cast("double")
        x0 = F.lit(None).cast("timestamp")
    pts = (
        points.filter(F.col(ts_col).isNotNull() & y.isNotNull() & x.isNotNull())
        .select(
            F.col(key_col).alias(key_col),
            bucket.alias("bucket_ts"),
            x0.alias("x0"),
            x.alias("_x"),
            y.alias("_y"),
        )
    )
    aggs = [
        F.max("x0").alias("x0"),
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_y") * F.col("_y") * F.col("_y")).alias("sy3"),
        F.sum(F.col("_y") * F.col("_y") * F.col("_y") * F.col("_y")).alias("sy4"),
    ]
    if salt_buckets is None:
        return pts.groupBy(key_col, "bucket_ts").agg(*aggs)
    # two-phase: deterministic salt -> partial cells -> exact re-merge
    # (sum of sums); identical result because every column is additive
    salted = pts.withColumn(
        "_salt", F.pmod(F.xxhash64("_x", "_y"), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key_col, "bucket_ts", "_salt").agg(*aggs)
    return (
        partial.groupBy(key_col, "bucket_ts")
        .agg(F.max("x0").alias("x0"), *[F.sum(c).alias(c) for c in _SUMS])
    )


def _shifted(d: Column) -> dict[str, Column]:
    """The x-origin shift identities: moments about ``x0`` re-expressed
    about ``x0 - d`` (i.e. x' = x + d). Exact polynomials in the stored
    sums — y-only moments are unchanged."""
    return {
        "n": F.col("n"),
        "sx": F.col("sx") + F.col("n") * d,
        "sy": F.col("sy"),
        "sxx": F.col("sxx") + 2.0 * d * F.col("sx") + F.col("n") * d * d,
        "syy": F.col("syy"),
        "sxy": F.col("sxy") + d * F.col("sy"),
        "sy3": F.col("sy3"),
        "sy4": F.col("sy4"),
    }


def stats2_cascade(
    stats: DataFrame,
    to_tier: str,
    from_tier: str = "1m",
    key_col: str = "source",
) -> DataFrame:
    """Merge fine-tier summaries into a coarser tier. Time-mode
    summaries (non-null ``x0``) are first re-origined to the coarse
    bucket start via the exact shift identities; then everything is a
    columnwise sum. ``to_tier == from_tier`` performs the same-bucket
    partial merge used by the real-time views (shift distance 0)."""
    _check_tiers(from_tier, to_tier)
    coarse = F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_ts"))
    return _stats2_merge(stats, coarse, key_col)


def stats2_cascade_width(
    stats: DataFrame,
    width_sec: int,
    key_col: str = "source",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Merge a stats2 tier into ARBITRARY fixed-width buckets
    (TimescaleDB ``time_bucket`` semantics via
    :func:`~.rollup.width_bucket`) — "slope per 4 hours" served from the
    committed 1m tier without a raw rescan. Time-mode moments re-origin
    to each width bucket's start via the exact shift identities, so the
    read equals a direct raw build whenever the source tier's width
    divides ``width_sec`` and aligns to the grid (caller's contract,
    same as :func:`~.rollup.cascade_width`)."""
    from .rollup import width_bucket

    coarse = width_bucket(F.col("bucket_ts"), width_sec, origin)
    return _stats2_merge(stats, coarse, key_col)


def _stats2_merge(stats: DataFrame, coarse, key_col: str) -> DataFrame:
    d = F.when(F.col("x0").isNotNull(), _seconds_between(coarse, F.col("x0"))).otherwise(F.lit(0.0))
    sh = _shifted(d)
    projected = stats.select(
        key_col,
        coarse.alias("_coarse"),
        F.when(F.col("x0").isNotNull(), coarse).alias("_x0"),
        *[sh[c].alias(c) for c in _SUMS],
    )
    return (
        projected.groupBy(key_col, "_coarse")
        .agg(F.max("_x0").alias("x0"), *[F.sum(c).alias(c) for c in _SUMS])
        .withColumnRenamed("_coarse", "bucket_ts")
        .select(key_col, "bucket_ts", *SUMMARY_COLS)
    )


#: accessor name -> doc. All follow PostgreSQL/DuckDB REGR_*/CORR/COVAR
#: NULL semantics (degenerate denominators -> NULL, except r2's
#: var(y)=0 special case -> 1).
ACCESSORS = (
    "avg_x", "avg_y",
    "stddev_pop_x", "stddev_samp_x", "stddev_pop_y", "stddev_samp_y",
    "slope", "intercept", "x_intercept",
    "corr", "r2", "covar_pop", "covar_samp",
    "slope_stderr", "slope_t",
    "skewness_y", "kurtosis_y",
)


def _accessor_cols(n: Column, sx: Column, sy: Column, sxx: Column,
                   syy: Column, sxy: Column, sy3: Column, sy4: Column) -> dict[str, Column]:
    nd = n.cast("double")
    avg_x = sx / nd
    avg_y = sy / nd
    # centered second moments: Mxx = sum((x - avg_x)^2) etc. The
    # greatest(0, ...) clamps float cancellation on near-constant data so
    # sqrt never sees a tiny negative.
    mxx = F.greatest(F.lit(0.0), sxx - sx * sx / nd)
    myy = F.greatest(F.lit(0.0), syy - sy * sy / nd)
    mxy = sxy - sx * sy / nd
    # third/fourth centered moments of y via the binomial expansion
    m3 = sy3 - 3.0 * avg_y * syy + 3.0 * avg_y * avg_y * sy - nd * avg_y * avg_y * avg_y
    m4 = (
        sy4
        - 4.0 * avg_y * sy3
        + 6.0 * avg_y * avg_y * syy
        - 4.0 * avg_y * avg_y * avg_y * sy
        + nd * avg_y * avg_y * avg_y * avg_y
    )
    slope = F.try_divide(mxy, F.nullif(mxx, F.lit(0.0)))
    intercept = avg_y - slope * avg_x
    var_pop_y = myy / nd
    nm1 = F.nullif(nd - 1.0, F.lit(0.0))
    out = {
        "avg_x": avg_x,
        "avg_y": avg_y,
        "stddev_pop_x": F.sqrt(mxx / nd),
        "stddev_samp_x": F.sqrt(F.try_divide(mxx, nm1)),
        "stddev_pop_y": F.sqrt(var_pop_y),
        "stddev_samp_y": F.sqrt(F.try_divide(myy, nm1)),
        "slope": slope,
        "intercept": intercept,
        # fit line's zero crossing; NULL when the fit is flat or undefined
        "x_intercept": F.try_divide(-intercept, F.nullif(slope, F.lit(0.0))),
        "corr": F.try_divide(mxy, F.nullif(F.sqrt(mxx * myy), F.lit(0.0))),
        # REGR_R2: NULL if var(x)=0; 1 if var(y)=0 (and var(x)!=0)
        "r2": F.when(mxx == 0.0, F.lit(None).cast("double")).otherwise(
            F.when(myy == 0.0, F.lit(1.0)).otherwise(
                (mxy * mxy) / (mxx * myy)
            )
        ),
        "covar_pop": mxy / nd,
        "covar_samp": F.try_divide(mxy, nm1),
        # classical OLS inference on the fit: residual SS = Myy - Mxy^2/Mxx,
        # sigma^2 = RSS/(n-2), se(slope) = sigma/sqrt(Mxx); NULL when the
        # fit is undefined (Mxx=0) or saturated (n<=2). slope_t is the
        # t-statistic with n-2 dof — the read is the statistic itself (a
        # p-value needs the t CDF; compare against the caller's critical
        # value, ~2 for the usual alpha=0.05 at moderate n).
        "slope_stderr": F.sqrt(
            F.try_divide(
                F.greatest(F.lit(0.0), myy - F.try_divide(mxy * mxy, F.nullif(mxx, F.lit(0.0)))),
                F.nullif((nd - 2.0) * mxx, F.lit(0.0)),
            )
        ),
        # population method (TimescaleDB stats_agg default): NULL on
        # zero variance, matching its NaN-free contract here
        "skewness_y": F.try_divide(
            m3 / nd, F.nullif(F.pow(var_pop_y, F.lit(1.5)), F.lit(0.0))
        ),
        "kurtosis_y": F.try_divide(
            m4 / nd, F.nullif(var_pop_y * var_pop_y, F.lit(0.0))
        ),
    }
    out["slope_t"] = F.try_divide(
        out["slope"], F.nullif(out["slope_stderr"], F.lit(0.0))
    )
    return out


def stats2_read(
    stats: DataFrame,
    accessors: tuple[str, ...] = ACCESSORS,
) -> DataFrame:
    """Read accessors off summary rows as pure projections.

    ``slope``/``intercept``/``x_intercept`` describe the least-squares
    line ``y = intercept + slope * x`` in the SUMMARY's x units — for
    time-mode builds that means slope per second and intercept = the
    fit's value at the bucket start (``x0``). NULL semantics follow the
    SQL-standard aggregates (``REGR_SLOPE`` et al.): a constant-x
    bucket has NULL slope, a single-point bucket has NULL sample stats,
    and ``r2`` is 1 for a varying-x/constant-y bucket.
    """
    bad = [a for a in accessors if a not in ACCESSORS]
    if bad:
        raise ValueError(f"unknown accessors {bad}; valid: {ACCESSORS}")
    cols = _accessor_cols(
        F.col("n"), F.col("sx"), F.col("sy"), F.col("sxx"),
        F.col("syy"), F.col("sxy"), F.col("sy3"), F.col("sy4"),
    )
    out = stats
    for a in accessors:
        out = out.withColumn(a, cols[a])
    return out


def stats2_rolling_read(
    stats: DataFrame,
    window_buckets: int,
    key_col: str = "source",
    accessors: tuple[str, ...] = ("slope", "corr", "avg_y"),
    min_buckets: int | None = None,
) -> DataFrame:
    """Rolling accessors over the TRAILING ``window_buckets`` summary
    rows per key — "slope of the last 24 hourly buckets" without
    touching raw data, the read TimescaleDB serves with
    ``stats_agg(...) OVER (...)`` rollups.

    Time-mode summaries are re-origined to the window's FIRST bucket's
    ``x0`` before summing — but a window sum cannot re-shift each frame
    row per output row, so the shift is applied algebraically: with
    ``u_i`` = each summary's origin in seconds from the KEY's first
    origin and ``v`` = the window head's ``u``, the shifted totals
    expand into window sums of per-row products (``sx*u``, ``n*u``,
    ``n*u^2``, ``sy*u``) combined with the row-constant ``v`` — exact
    identities, so the cross-bucket x axis is continuous seconds with
    x = 0 at the window's first bucket start. Precision: the expansion
    cancels terms of magnitude ~(key history span)^2, so accuracy
    degrades as (history span / window span)^2 grows; for multi-year
    histories read with tiny windows prefer explicit-x summaries.

    Windows order by ``bucket_ts`` and partition by bare ``key_col``,
    which is safe at any corpus size because summary rows are
    calendar-bounded (one per key per bucket). Rows with fewer than
    ``min_buckets`` (default: ``window_buckets``) contributing summary
    rows emit NULL accessors — the warm-up convention the repo's
    rolling operators share (operators/windows.py).
    """
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    mb = window_buckets if min_buckets is None else min_buckets
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(-(window_buckets - 1), 0)
    )
    w_all = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-key reference origin C = the key's first summary's x0; u_i =
    # seconds(C -> x0_i) (0.0 throughout in explicit-x mode)
    u = F.when(
        F.col("x0").isNotNull(),
        _seconds_between(F.first("x0").over(w_all), F.col("x0")),
    ).otherwise(F.lit(0.0))
    pre = stats.withColumn("_u", u).select(
        key_col, "bucket_ts", "x0", *_SUMS, "_u",
        (F.col("sx") * F.col("_u")).alias("_sxu"),
        (F.col("sy") * F.col("_u")).alias("_syu"),
        (F.col("n") * F.col("_u")).alias("_nu"),
        (F.col("n") * F.col("_u") * F.col("_u")).alias("_nuu"),
    )
    v = F.first("_u").over(w)
    s = {c: F.sum(c).over(w) for c in ("sx", "sy", "sxx", "syy", "sxy",
                                       "sy3", "sy4", "n",
                                       "_sxu", "_syu", "_nu", "_nuu")}
    # shifted totals about the window head's origin (d_i = u_i - v):
    #   sx'  = sum(sx_i + n_i d_i)              = Ssx + Snu - v*Sn
    #   sxx' = sum(sxx_i + 2 d_i sx_i + n_i d_i^2)
    #        = Ssxx + 2(Ssxu - v*Ssx) + Snuu - 2v*Snu + v^2*Sn
    #   sxy' = sum(sxy_i + d_i sy_i)            = Ssxy + Ssyu - v*Ssy
    tot = {
        "n": s["n"],
        "sx": s["sx"] + s["_nu"] - v * s["n"],
        "sy": s["sy"],
        "sxx": s["sxx"] + 2.0 * (s["_sxu"] - v * s["sx"])
               + s["_nuu"] - 2.0 * v * s["_nu"] + v * v * s["n"],
        "syy": s["syy"],
        "sxy": s["sxy"] + s["_syu"] - v * s["sy"],
        "sy3": s["sy3"],
        "sy4": s["sy4"],
    }
    nrows = F.count(F.lit(1)).over(w)
    cols = _accessor_cols(
        tot["n"], tot["sx"], tot["sy"], tot["sxx"],
        tot["syy"], tot["sxy"], tot["sy3"], tot["sy4"],
    )
    out = pre
    for a in accessors:
        if a not in ACCESSORS:
            raise ValueError(f"unknown accessor {a!r}; valid: {ACCESSORS}")
        out = out.withColumn(a, F.when(nrows >= mb, cols[a]))
    return out.drop("_u", "_sxu", "_syu", "_nu", "_nuu")
