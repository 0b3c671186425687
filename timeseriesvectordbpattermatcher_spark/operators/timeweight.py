"""Time-weighted averages + counter-reset aggregates as MERGEABLE bucket
summaries (TimescaleDB-toolkit ``time_weight``/``counter_agg`` semantics,
Prometheus ``increase``/``rate`` reset handling — both public specs).

The reference averages irregular points with plain row-weighted means
(/root/reference/patternTraderUtil.py rolling ``mean`` consumers and the
resample ``mean`` rule at /root/reference/extremaPatternUtil.py:186-188) —
correct only on a regular grid. On the north star's irregular event times a
5-second-spaced burst must not out-weigh an hour-long plateau, so the engine
adds the standard fix: integrate the value curve over time and divide by the
observed span.

Both aggregates follow the rollup cascade's partial->merge design
(operators/rollup.py): a bucket summary is a struct-typed row

    (key, bucket_ts, first(ts,val), last(ts,val), area | increase+resets, n)

that merges EXACTLY up the 1m -> 1h -> 1d tiers. The merge re-adds the
"bridge" segment between consecutive fine buckets (last point of bucket i ->
first point of bucket i+1), which is precisely the raw segment that crossed
the fine-bucket boundary — no point sits between those two by construction —
so cascaded summaries equal a direct build from raw at every tier
(pinned in tests/test_timeweight.py, including against a DuckDB window-SQL
recompute of the integral with no summaries anywhere).

Scale notes (10^12 rows):
- The 1m build windows over ``(key, minute-bucket)`` — NOT bare ``key`` — so
  a 70%-of-rows hot key never serializes into one sort partition: every
  window partition is bounded by one bucket's rows. Segments that cross a
  1m boundary are exactly the bridges the NEXT tier re-adds, so nothing is
  lost by keeping the window bucket-local.
- Each cascade step windows over ``(key, coarse-bucket)`` — bounded by
  fine-buckets-per-coarse (60 or 24 rows), then aggregates on the same key,
  so Catalyst reuses ONE Exchange per step (same pattern the gap-fill plan
  pins in tests/test_plans.py).
- Everything is codegen'd expressions (lead / struct min-max / conditional
  sums). Zero UDFs, zero Python in the row path.

Float caveat (same disclosure as SURVEY §4.3 makes for avg): ``area`` and
``increase`` are double sums, so cascaded == direct holds bitwise only while
the products stay inside 2^53 half-units (always true for the int-valued,
second-aligned north-star data; the tests pin bitwise equality there and
document the general reduction-order hazard).

Input contract: at most one point per (key, ts) — duplicate timestamps have
no well-defined segment order (TimescaleDB raises on them). The build is
still deterministic under duplicates (windows order by (ts, val)) and a
zero-length segment contributes zero area, but counter resets may be
spuriously counted; dedupe upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIER_ORDER, TIER_TRUNC

_METHODS = ("locf", "linear")


def _seconds_between(a: Column, b: Column) -> Column:
    # integer micros / 1e6: exact doubles for second-aligned timestamps
    return (F.unix_micros(b) - F.unix_micros(a)) / F.lit(1_000_000.0)


def _segment_area(method: str, val: Column, nxt_val: Column, dt_sec: Column) -> Column:
    """Area under one segment of the chosen interpolation curve."""
    if method == "locf":
        return val * dt_sec
    return (val + nxt_val) / F.lit(2.0) * dt_sec


def _check_method(method: str) -> None:
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")


def _check_tiers(from_tier: str, to_tier: str) -> None:
    # equal tiers are allowed: the bucket trunc is then the identity and the
    # cascade becomes a same-bucket PARTIAL merge — the seam operation the
    # real-time views (plans/realtime.py) rely on. Only strictly finer
    # targets are rejected.
    if from_tier not in TIER_TRUNC or to_tier not in TIER_TRUNC:
        raise ValueError(f"tiers must be in {list(TIER_TRUNC)}")
    if TIER_ORDER.index(to_tier) < TIER_ORDER.index(from_tier):
        raise ValueError(f"cascade must coarsen: {from_tier} -> {to_tier}")


def _point_struct(ts_col: str, val_col: str) -> Column:
    # ts leads the struct so lexicographic min/max orders by time; val breaks
    # the (documented-invalid) duplicate-ts tie deterministically
    return F.struct(F.col(ts_col).alias("ts"), F.col(val_col).cast("double").alias("val"))


def time_weight_bucket(
    points: DataFrame,
    tier: str = "1m",
    key_col: str = "source",
    ts_col: str = "event_ts",
    val_col: str = "val",
    method: str = "locf",
) -> DataFrame:
    """Per-(key, bucket) time-weight summary from raw irregular points.

    Output: ``(key, bucket_ts, first struct<ts,val>, last struct<ts,val>,
    area double, n long)`` where ``area`` integrates the locf / linear curve
    over the segments BOTH of whose endpoints fall in the bucket (boundary
    crossers are the next tier's bridges). Null ts / null val rows are
    dropped (TimescaleDB rejects them; a NULL has no place on the curve).
    """
    _check_method(method)
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    pts = (
        points.filter(F.col(ts_col).isNotNull() & F.col(val_col).isNotNull())
        .withColumn("bucket_ts", F.date_trunc(TIER_TRUNC[tier], F.col(ts_col)))
    )
    w = Window.partitionBy(key_col, "bucket_ts").orderBy(ts_col, val_col)
    val = F.col(val_col).cast("double")
    nxt_ts = F.lead(ts_col).over(w)
    nxt_val = F.lead(val).over(w)
    dt = _seconds_between(F.col(ts_col), nxt_ts)
    seg = pts.select(
        key_col,
        "bucket_ts",
        _point_struct(ts_col, val_col).alias("_pt"),
        F.when(nxt_ts.isNotNull(), _segment_area(method, val, nxt_val, dt)).alias("_a"),
    )
    return seg.groupBy(key_col, "bucket_ts").agg(
        F.min("_pt").alias("first"),
        F.max("_pt").alias("last"),
        F.coalesce(F.sum("_a"), F.lit(0.0)).alias("area"),
        F.count(F.lit(1)).alias("n"),
    )


def _bridge(method: str, last_pt: Column, nxt_first: Column) -> Column:
    """Area of the segment from this bucket's last point to the next
    bucket's first point — the raw segment that crossed the boundary."""
    dt = _seconds_between(last_pt["ts"], nxt_first["ts"])
    if method == "locf":
        return last_pt["val"] * dt
    return (last_pt["val"] + nxt_first["val"]) / F.lit(2.0) * dt


def time_weight_cascade(
    tw: DataFrame,
    to_tier: str,
    from_tier: str = "1m",
    key_col: str = "source",
    method: str = "locf",
) -> DataFrame:
    """Merge fine-tier time-weight summaries into a coarser tier EXACTLY:
    sum of fine areas + the bridge segments between consecutive fine buckets
    inside the coarse bucket. ``method`` must match the build's — a summary
    carries no curve shape, only endpoints and area.
    """
    _check_method(method)
    _check_tiers(from_tier, to_tier)
    coarse = F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_ts"))
    w = Window.partitionBy(key_col, "_coarse").orderBy("bucket_ts", "first")
    stepped = tw.withColumn("_coarse", coarse).withColumn(
        "_bridge",
        F.when(
            F.lead("first").over(w).isNotNull(),
            _bridge(method, F.col("last"), F.lead("first").over(w)),
        ),
    )
    return (
        stepped.groupBy(key_col, "_coarse")
        .agg(
            F.min("first").alias("first"),
            F.max("last").alias("last"),
            (F.sum("area") + F.coalesce(F.sum("_bridge"), F.lit(0.0))).alias("area"),
            F.sum("n").alias("n"),
        )
        .withColumnRenamed("_coarse", "bucket_ts")
    )


def tw_average(tw: DataFrame, out_col: str = "twa") -> DataFrame:
    """Read accessor: area / observed span (seconds). NULL for a span of
    zero (single point — no curve to average), matching TimescaleDB's
    ``average(time_weight(...))``. ``try_divide`` so ANSI mode can't raise."""
    span = _seconds_between(F.col("first")["ts"], F.col("last")["ts"])
    return tw.withColumn(out_col, F.try_divide(F.col("area"), F.nullif(span, F.lit(0.0))))


_TIER_INTERVAL = {"1m": "interval 60 seconds", "1h": "interval 3600 seconds",
                  "1d": "interval 1 day"}


def tw_interpolated_average(
    tw: DataFrame,
    tier: str,
    key_col: str = "source",
    method: str = "locf",
    out_col: str = "itwa",
) -> DataFrame:
    """Full-bucket time-weighted average (TimescaleDB
    ``interpolated_average`` semantics): extend each bucket's curve to the
    bucket EDGES using the neighboring summaries, so a bucket holding one
    point at 00:59 no longer reports a NULL/endpoint-only average.

    - Head: the raw segment ``prev.last -> this.first`` crosses this
      bucket's start (no point lies between them, by construction), so its
      in-bucket portion ``[bucket_start, first.ts]`` is integrated — locf
      carries ``prev.last.val``; linear evaluates the segment line at the
      boundary. No previous summary -> coverage starts at ``first.ts``.
    - Tail: symmetric with ``this.last -> next.first`` over
      ``[last.ts, bucket_end)``. locf needs no next (the last value carries
      to the bucket end unconditionally); linear without a next summary
      stops at ``last.ts``.
    - ``out_col`` = (area + head + tail) / covered seconds.

    Buckets with NO points have no summary row and get no output row —
    compose with the gap-fill operator (operators/gapfill.py) for a dense
    grid. The window here partitions by bare ``key_col``, which is safe at
    any corpus size because summary rows are CALENDAR-bounded (one per
    bucket), not raw-row-bounded — the skew argument that forces
    bucket-local windows in the builds does not apply to accessors.

    Adjacent-tier note: head/tail use the nearest summary regardless of gap
    length — the bridge segment is the same raw segment whichever summaries
    it connects, so a sparse key interpolates across empty buckets exactly
    like the raw curve would.
    """
    _check_method(method)
    if tier not in _TIER_INTERVAL:
        raise ValueError(f"tier must be in {list(_TIER_INTERVAL)}")
    w = Window.partitionBy(key_col).orderBy("bucket_ts")
    prev_last = F.lag("last").over(w)
    nxt_first = F.lead("first").over(w)
    b_start = F.col("bucket_ts")
    b_end = F.col("bucket_ts") + F.expr(_TIER_INTERVAL[tier])
    first, last = F.col("first"), F.col("last")

    head_dt = _seconds_between(b_start, first["ts"])
    tail_dt = _seconds_between(last["ts"], b_end)
    if method == "locf":
        head = F.when(prev_last.isNotNull(), prev_last["val"] * head_dt)
        tail = last["val"] * tail_dt  # carry-forward needs no next
        covered_hi = b_end
    else:
        # value of the crossing segment evaluated at the bucket boundary
        def _at(seg_a, seg_b, t):
            frac = F.try_divide(
                _seconds_between(seg_a["ts"], t),
                _seconds_between(seg_a["ts"], seg_b["ts"]),
            )
            return seg_a["val"] + (seg_b["val"] - seg_a["val"]) * frac

        v0 = _at(prev_last, first, b_start)
        v1 = _at(last, nxt_first, b_end)
        head = F.when(prev_last.isNotNull(), (v0 + first["val"]) / 2.0 * head_dt)
        tail = F.when(nxt_first.isNotNull(), (v1 + last["val"]) / 2.0 * tail_dt)
        covered_hi = F.when(nxt_first.isNotNull(), b_end).otherwise(last["ts"])
    covered_lo = F.when(prev_last.isNotNull(), b_start).otherwise(first["ts"])
    total = F.col("area") + F.coalesce(head, F.lit(0.0)) + F.coalesce(tail, F.lit(0.0))
    span = _seconds_between(covered_lo, covered_hi)
    return tw.withColumn(out_col, F.try_divide(total, F.nullif(span, F.lit(0.0))))


# --- counter aggregates (Prometheus increase/rate reset semantics) ---------


def counter_bucket(
    points: DataFrame,
    tier: str = "1m",
    key_col: str = "source",
    ts_col: str = "event_ts",
    val_col: str = "val",
) -> DataFrame:
    """Per-(key, bucket) counter summary over a monotonic-up-to-resets
    counter: ``increase`` sums per-segment deltas where a drop means the
    counter restarted (the new reading itself is the post-reset increase —
    Prometheus's rule), ``resets`` counts the drops. Same bucket-local window
    + bridge-at-merge shape as :func:`time_weight_bucket`.
    """
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    pts = (
        points.filter(F.col(ts_col).isNotNull() & F.col(val_col).isNotNull())
        .withColumn("bucket_ts", F.date_trunc(TIER_TRUNC[tier], F.col(ts_col)))
    )
    w = Window.partitionBy(key_col, "bucket_ts").orderBy(ts_col, val_col)
    val = F.col(val_col).cast("double")
    nxt_val = F.lead(val).over(w)
    seg_inc = F.when(nxt_val >= val, nxt_val - val).otherwise(nxt_val)
    seg = pts.select(
        key_col,
        "bucket_ts",
        _point_struct(ts_col, val_col).alias("_pt"),
        F.when(nxt_val.isNotNull(), seg_inc).alias("_inc"),
        F.when(nxt_val.isNotNull() & (nxt_val < val), F.lit(1)).alias("_rst"),
    )
    return seg.groupBy(key_col, "bucket_ts").agg(
        F.min("_pt").alias("first"),
        F.max("_pt").alias("last"),
        F.coalesce(F.sum("_inc"), F.lit(0.0)).alias("increase"),
        F.coalesce(F.sum("_rst"), F.lit(0)).cast("long").alias("resets"),
        F.count(F.lit(1)).alias("n"),
    )


def counter_cascade(
    ca: DataFrame,
    to_tier: str,
    from_tier: str = "1m",
    key_col: str = "source",
) -> DataFrame:
    """Merge fine counter summaries into a coarser tier exactly, re-adding
    the boundary-crossing segment between consecutive fine buckets."""
    _check_tiers(from_tier, to_tier)
    coarse = F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_ts"))
    w = Window.partitionBy(key_col, "_coarse").orderBy("bucket_ts", "first")
    nxt_first = F.lead("first").over(w)
    last_val = F.col("last")["val"]
    bridge_inc = F.when(
        nxt_first["val"] >= last_val, nxt_first["val"] - last_val
    ).otherwise(nxt_first["val"])
    stepped = (
        ca.withColumn("_coarse", coarse)
        .withColumn("_binc", F.when(nxt_first.isNotNull(), bridge_inc))
        .withColumn(
            "_brst",
            F.when(nxt_first.isNotNull() & (nxt_first["val"] < last_val), F.lit(1)),
        )
    )
    return (
        stepped.groupBy(key_col, "_coarse")
        .agg(
            F.min("first").alias("first"),
            F.max("last").alias("last"),
            (F.sum("increase") + F.coalesce(F.sum("_binc"), F.lit(0.0))).alias("increase"),
            (F.sum("resets") + F.coalesce(F.sum("_brst"), F.lit(0))).cast("long").alias("resets"),
            F.sum("n").alias("n"),
        )
        .withColumnRenamed("_coarse", "bucket_ts")
    )


def counter_rate(ca: DataFrame, out_col: str = "rate") -> DataFrame:
    """Read accessor: increase / observed span (per-second rate); NULL on a
    zero span, exactly like :func:`tw_average`."""
    span = _seconds_between(F.col("first")["ts"], F.col("last")["ts"])
    return ca.withColumn(
        out_col, F.try_divide(F.col("increase"), F.nullif(span, F.lit(0.0)))
    )


def gauge_delta(
    tw: DataFrame,
    delta_col: str = "delta",
    rate_col: str = "grate",
) -> DataFrame:
    """Gauge reads (TimescaleDB ``gauge_agg``'s ``delta``/``rate``): a
    gauge may go up or down, so there is no reset rule — the bucket's
    net change is simply ``last - first`` and the rate divides by the
    observed span (NULL on a single-point bucket, like
    :func:`tw_average`). Pure accessors over the endpoint structs the
    time-weight summaries already carry, so they read at ANY tier of
    either the tw plane or :func:`counter_bucket` summaries (whose
    first/last are the raw endpoints too — `increase` differs from
    `delta` exactly by the reset corrections). Note the in-bucket read
    sees only in-bucket endpoints; the boundary segment into the next
    bucket belongs to the next tier's merge, same convention as the
    area algebra."""
    span = _seconds_between(F.col("first")["ts"], F.col("last")["ts"])
    delta = F.col("last")["val"] - F.col("first")["val"]
    return tw.withColumn(delta_col, delta).withColumn(
        rate_col, F.try_divide(delta, F.nullif(span, F.lit(0.0)))
    )


# --- OHLC bucket summaries (mergeable candles) ------------------------------


def ohlc_bucket(
    points: DataFrame,
    tier: str = "1m",
    key_col: str = "source",
    ts_col: str = "event_ts",
    val_col: str = "val",
    vol_col: str | None = None,
) -> DataFrame:
    """Per-(key, bucket) candle summary ``(first, last, low, high, n)``. The
    rollup tiers (operators/rollup.py) carry min/max (= low/high) but not
    open/close — TimescaleDB's ``first(val, ts)``/``last(val, ts)``, the two
    reads a row-order-free aggregate can't give without the ts-argmin/argmax
    structs. Mergeable with NO bridges: the coarse open is the earliest fine
    bucket's open (``min(first)``), close the latest's close (``max(last)``),
    low/high plain min/max — so cascaded == direct holds exactly, ints and
    floats alike (no arithmetic, only selection). Same one-Exchange,
    bucket-local shape as :func:`time_weight_bucket` minus the window.

    ``vol_col`` adds the rest of TimescaleDB's ``candlestick_agg``: per-
    bucket ``vol`` (sum) and ``pv`` (sum of price*volume), both plain
    additive sums, so the cascade stays exact (2^53 integer caveat as
    everywhere) and :func:`ohlc_read` can serve ``vwap = pv / vol``. A
    NULL volume row still shapes the candle but contributes nothing to
    vol/pv (SQL SUM semantics)."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    pts = (
        points.filter(F.col(ts_col).isNotNull() & F.col(val_col).isNotNull())
        .withColumn("bucket_ts", F.date_trunc(TIER_TRUNC[tier], F.col(ts_col)))
    )
    val = F.col(val_col).cast("double")
    aggs = [
        F.min("_pt").alias("first"),
        F.max("_pt").alias("last"),
        F.min("_v").alias("low"),
        F.max("_v").alias("high"),
        F.count(F.lit(1)).alias("n"),
    ]
    cols = [key_col, "bucket_ts", _point_struct(ts_col, val_col).alias("_pt"), val.alias("_v")]
    if vol_col is not None:
        vol = F.col(vol_col).cast("double")
        cols.append(vol.alias("_vol"))
        aggs += [
            F.coalesce(F.sum("_vol"), F.lit(0.0)).alias("vol"),
            F.coalesce(F.sum(F.col("_v") * F.col("_vol")), F.lit(0.0)).alias("pv"),
        ]
    return pts.select(*cols).groupBy(key_col, "bucket_ts").agg(*aggs)


def ohlc_cascade(
    o: DataFrame,
    to_tier: str,
    from_tier: str = "1m",
    key_col: str = "source",
) -> DataFrame:
    """Exact selection merge of fine candles into a coarser tier (plus
    additive vol/pv when the build carried a volume column)."""
    _check_tiers(from_tier, to_tier)
    aggs = [
        F.min("first").alias("first"),
        F.max("last").alias("last"),
        F.min("low").alias("low"),
        F.max("high").alias("high"),
        F.sum("n").alias("n"),
    ]
    if "vol" in o.columns:
        aggs += [F.sum("vol").alias("vol"), F.sum("pv").alias("pv")]
    return (
        o.withColumn("bucket_ts", F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_ts")))
        .groupBy(key_col, "bucket_ts")
        .agg(*aggs)
    )


def ohlc_read(o: DataFrame) -> DataFrame:
    """Read accessor: unpack open/close from the endpoint structs; when
    the summary carries volume, also ``vwap = pv / vol`` (NULL on a
    zero-volume bucket, matching TimescaleDB's ``vwap`` accessor)."""
    out = o.withColumn("open", F.col("first")["val"]).withColumn(
        "close", F.col("last")["val"]
    )
    if "vol" in o.columns:
        out = out.withColumn(
            "vwap", F.try_divide(F.col("pv"), F.nullif(F.col("vol"), F.lit(0.0)))
        )
    return out


def time_weight_cascade_width(
    tw: DataFrame,
    width_sec: int,
    key_col: str = "source",
    method: str = "locf",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Merge time-weight summaries onto an ARBITRARY fixed-width grid
    (``time_bucket`` semantics via :func:`~.rollup.width_bucket`) — the
    width companion to :func:`time_weight_cascade`, same bridge re-add
    per coarse bucket, exact under the same source-width-divides-target
    alignment contract as :func:`~.rollup.cascade_width`."""
    from .rollup import width_bucket

    _check_method(method)
    coarse = width_bucket(F.col("bucket_ts"), width_sec, origin)
    w = Window.partitionBy(key_col, "_coarse").orderBy("bucket_ts", "first")
    stepped = tw.withColumn("_coarse", coarse).withColumn(
        "_bridge",
        F.when(
            F.lead("first").over(w).isNotNull(),
            _bridge(method, F.col("last"), F.lead("first").over(w)),
        ),
    )
    return (
        stepped.groupBy(key_col, "_coarse")
        .agg(
            F.min("first").alias("first"),
            F.max("last").alias("last"),
            (F.sum("area") + F.coalesce(F.sum("_bridge"), F.lit(0.0))).alias("area"),
            F.sum("n").alias("n"),
        )
        .withColumnRenamed("_coarse", "bucket_ts")
    )


def ohlc_cascade_width(
    o: DataFrame,
    width_sec: int,
    key_col: str = "source",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Merge candles onto an ARBITRARY fixed-width grid — "4-hour
    candles from the 1m tier". Selection + additive merge, so the width
    candle equals a direct raw build exactly under the alignment
    contract of :func:`~.rollup.cascade_width`."""
    from .rollup import width_bucket

    aggs = [
        F.min("first").alias("first"),
        F.max("last").alias("last"),
        F.min("low").alias("low"),
        F.max("high").alias("high"),
        F.sum("n").alias("n"),
    ]
    if "vol" in o.columns:
        aggs += [F.sum("vol").alias("vol"), F.sum("pv").alias("pv")]
    return (
        o.withColumn("bucket_ts", width_bucket(F.col("bucket_ts"), width_sec, origin))
        .groupBy(key_col, "bucket_ts")
        .agg(*aggs)
    )


# --- rolling (trailing-k calendar slots) reads ------------------------------

def _scatter(df: DataFrame, window_buckets: int, tier: str) -> DataFrame:
    """Bounded scatter shared by the rolling reads: each summary row is
    copied to the <= k trailing calendar slots it serves (narrow, no
    shuffle); the caller aggregates per (key, ``_tgt``)."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    unit = TIER_TRUNC[tier]
    targets = F.expr(
        f"sequence(bucket_ts, bucket_ts + interval {window_buckets - 1} {unit}, "
        f"interval 1 {unit})"
    )
    return df.withColumn("_tgt", F.explode(targets))


def tw_rolling(
    tw: DataFrame,
    window_buckets: int,
    tier: str,
    key_col: str = "source",
    method: str = "locf",
    min_buckets: int | None = None,
) -> DataFrame:
    """Merged time-weight summary over the TRAILING ``window_buckets``
    calendar slots per present slot — "time-weighted average of the last
    24 hourly buckets" via :func:`tw_average`/:func:`gauge_delta` on the
    output, which has the standard summary schema plus ``win_buckets``.
    The merge is the cascade's: member areas + the bridge segments
    between CONSECUTIVE members (a calendar gap inside the window
    contributes one long bridge across it, exactly the raw segment that
    crossed the gap — same convention as the tier merge). ``method``
    must match the build's. Payload columns are NULL below the
    ``min_buckets`` warm-up (default: the full window); ``n`` stays."""
    _check_method(method)
    mb = window_buckets if min_buckets is None else min_buckets
    sc = _scatter(
        tw.select(key_col, "bucket_ts", "first", "last", "area", "n"),
        window_buckets, tier,
    )
    w = Window.partitionBy(key_col, "_tgt").orderBy("bucket_ts", "first")
    stepped = sc.withColumn(
        "_bridge",
        F.when(
            F.lead("first").over(w).isNotNull(),
            _bridge(method, F.col("last"), F.lead("first").over(w)),
        ),
    )
    agg = stepped.groupBy(key_col, "_tgt").agg(
        F.min("first").alias("first"),
        F.max("last").alias("last"),
        (F.sum("area") + F.coalesce(F.sum("_bridge"), F.lit(0.0))).alias("area"),
        F.sum("n").alias("n"),
        F.max(F.col("bucket_ts") == F.col("_tgt")).alias("_has_origin"),
        F.size(F.collect_set("bucket_ts")).alias("win_buckets"),
    )
    warm = F.col("win_buckets") >= F.lit(mb)
    return (
        agg.filter(F.col("_has_origin"))
        .select(
            key_col,
            F.col("_tgt").alias("bucket_ts"),
            F.when(warm, F.col("first")).alias("first"),
            F.when(warm, F.col("last")).alias("last"),
            F.when(warm, F.col("area")).alias("area"),
            "n",
            "win_buckets",
        )
    )


def ohlc_rolling(
    o: DataFrame,
    window_buckets: int,
    tier: str,
    key_col: str = "source",
    min_buckets: int | None = None,
) -> DataFrame:
    """Merged candle over the TRAILING ``window_buckets`` calendar slots
    per present slot — "the 24-hour candle as of each hour". Selection
    merge (min first / max last / min low / max high) plus additive
    vol/pv when present, so the window candle equals a direct build over
    the window's raw rows exactly. Read with :func:`ohlc_read`. Payload
    NULL below ``min_buckets`` (default: full window); ``n`` stays."""
    mb = window_buckets if min_buckets is None else min_buckets
    has_vol = "vol" in o.columns
    cols = [key_col, "bucket_ts", "first", "last", "low", "high", "n"] + (
        ["vol", "pv"] if has_vol else []
    )
    sc = _scatter(o.select(*cols), window_buckets, tier)
    aggs = [
        F.min("first").alias("first"),
        F.max("last").alias("last"),
        F.min("low").alias("low"),
        F.max("high").alias("high"),
        F.sum("n").alias("n"),
        F.max(F.col("bucket_ts") == F.col("_tgt")).alias("_has_origin"),
        F.size(F.collect_set("bucket_ts")).alias("win_buckets"),
    ]
    if has_vol:
        aggs += [F.sum("vol").alias("vol"), F.sum("pv").alias("pv")]
    agg = sc.groupBy(key_col, "_tgt").agg(*aggs)
    warm = F.col("win_buckets") >= F.lit(mb)
    sel = [
        key_col,
        F.col("_tgt").alias("bucket_ts"),
        F.when(warm, F.col("first")).alias("first"),
        F.when(warm, F.col("last")).alias("last"),
        F.when(warm, F.col("low")).alias("low"),
        F.when(warm, F.col("high")).alias("high"),
        "n",
        "win_buckets",
    ]
    if has_vol:
        sel += [
            F.when(warm, F.col("vol")).alias("vol"),
            F.when(warm, F.col("pv")).alias("pv"),
        ]
    return agg.filter(F.col("_has_origin")).select(*sel)
