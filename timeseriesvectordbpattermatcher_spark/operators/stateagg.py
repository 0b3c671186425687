"""Duration-in-state + heartbeat liveness as MERGEABLE bucket summaries
(TimescaleDB-toolkit ``state_agg`` / ``heartbeat_agg`` semantics — public
specs), completing the irregular-time family in operators/timeweight.py.

The reference never aggregates categorical state columns or liveness — its
flag handling is rolling debounce over a regular grid
(/root/reference/patternTraderUtil.py ``min_periods`` rolling flags) — but
the north star's retention engine monitors sources whose readings arrive
irregularly, and the two classic reads a row-weighted rollup cannot answer
there are "how long was each source in state X per bucket" and "what
fraction of each bucket was the source alive".

Both follow the cascade's partial->merge design (operators/rollup.py,
operators/timeweight.py):

- ``state_bucket`` -> ``(key, bucket_ts, first struct<ts,state>,
  last struct<ts,state>, durs map<state,double>, n)``. A state holds from
  its reading until the next reading (locf — states are step functions).
  Durations whose segment crosses a fine-bucket boundary are exactly the
  bridges the next tier re-adds (``state_cascade``), so cascaded == direct
  at every tier.
- ``heartbeat_bucket`` -> ``(key, bucket_ts, first_hb, last_hb,
  live array<struct<s,e>>, n)`` where ``live`` is the merged union of the
  liveness intervals ``[hb, hb + period)`` of the bucket's heartbeats.
  ``heartbeat_cascade`` re-merges fine islands (only seam islands can
  touch); merging interval unions is associative, so cascaded == direct.

Scale notes (10^12 rows):
- Builds window over ``(key, bucket)`` — never bare ``key`` — so a hot key
  is bounded by one bucket's rows per partition; each build pays the same
  ONE data-sized Exchange reused by its window + groupBy (plan-pinned).
- state summaries are bounded by buckets x |state domain| (like the
  quantile histograms); heartbeat islands by the bucket's heartbeat count
  (<= n, collapsing toward span/period as density rises — merged islands
  of width >= period cannot overlap).
- Everything is expressions (windows, struct min/max, map rebuilds, one
  higher-order ``aggregate`` fold for the island merge). Zero UDFs, zero
  Python in the row path.

Input contract: at most one reading per (key, ts) — same as
operators/timeweight.py (TimescaleDB raises on duplicates; here windows
order by (ts, state) so the build stays deterministic, but duplicate-ts
durations are ill-defined; dedupe upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIER_TRUNC
from .timeweight import _TIER_INTERVAL, _check_tiers, _seconds_between

__all__ = [
    "state_bucket",
    "state_cascade",
    "duration_in",
    "interpolated_duration_in",
    "heartbeat_bucket",
    "heartbeat_cascade",
    "heartbeat_read",
    "interpolated_uptime",
    "hb_rolling",
    "state_rolling",
]


# --- state_agg: duration-in-state --------------------------------------------


def _state_point(ts_col: str, state_col: str) -> Column:
    # ts leads so lexicographic min/max orders by time; state breaks the
    # (documented-invalid) duplicate-ts tie deterministically
    return F.struct(
        F.col(ts_col).alias("ts"), F.col(state_col).cast("string").alias("state")
    )


def state_bucket(
    points: DataFrame,
    tier: str = "1m",
    key_col: str = "source",
    ts_col: str = "event_ts",
    state_col: str = "state",
) -> DataFrame:
    """Per-(key, bucket) duration-in-state summary from raw irregular
    readings. ``durs[state]`` sums the seconds of every segment
    ``[ts_i, ts_{i+1})`` BOTH of whose endpoints fall in the bucket,
    attributed to the state at ``ts_i`` (states are locf step functions).
    Boundary-crossing segments are the next tier's bridges. A state seen
    only at the bucket's final reading appears with duration 0.0 (its time
    lives in the bridge). Null ts / null state rows are dropped.
    """
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    pts = (
        points.filter(F.col(ts_col).isNotNull() & F.col(state_col).isNotNull())
        .withColumn("bucket_ts", F.date_trunc(TIER_TRUNC[tier], F.col(ts_col)))
    )
    w = Window.partitionBy(key_col, "bucket_ts").orderBy(ts_col, state_col)
    nxt_ts = F.lead(ts_col).over(w)
    seg = pts.select(
        key_col,
        "bucket_ts",
        F.col(state_col).cast("string").alias("_st"),
        _state_point(ts_col, state_col).alias("_pt"),
        F.when(nxt_ts.isNotNull(), _seconds_between(F.col(ts_col), nxt_ts)).alias("_d"),
    )
    # two aggs on the same key prefix, both bounded by buckets x |states|
    per_state = seg.groupBy(key_col, "bucket_ts", "_st").agg(
        F.coalesce(F.sum("_d"), F.lit(0.0)).alias("_dsum"),
        F.min("_pt").alias("_minpt"),
        F.max("_pt").alias("_maxpt"),
        F.count(F.lit(1)).alias("_n"),
    )
    return per_state.groupBy(key_col, "bucket_ts").agg(
        F.min("_minpt").alias("first"),
        F.max("_maxpt").alias("last"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_st", "_dsum")))
        ).alias("durs"),
        F.sum("_n").alias("n"),
    )


def state_cascade(
    sa: DataFrame,
    to_tier: str,
    from_tier: str = "1m",
    key_col: str = "source",
) -> DataFrame:
    """Merge fine state summaries one tier coarser EXACTLY: per-state sums
    plus the bridge segment between consecutive fine buckets (last reading
    of bucket i holds its state until the first reading of bucket i+1 —
    no reading lies between them, by construction)."""
    _check_tiers(from_tier, to_tier)
    coarse = F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_ts"))
    return _state_merge(sa, coarse, key_col)


def state_cascade_width(
    sa: DataFrame,
    width_sec: int,
    key_col: str = "source",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Merge a state tier into ARBITRARY fixed-width buckets
    (TimescaleDB ``time_bucket`` semantics via
    :func:`~.rollup.width_bucket`) — "duration-in-state per 4 hours"
    from the committed 1m tier, bridge segments between consecutive fine
    buckets included, without a raw rescan. Exact whenever the source
    tier's width divides ``width_sec`` and aligns to the grid (caller's
    contract, same as :func:`~.rollup.cascade_width`)."""
    from .rollup import width_bucket

    coarse = width_bucket(F.col("bucket_ts"), width_sec, origin)
    return _state_merge(sa, coarse, key_col)


def _state_merge(sa: DataFrame, coarse, key_col: str) -> DataFrame:
    w = Window.partitionBy(key_col, "_coarse").orderBy("bucket_ts", "first")
    nxt_first = F.lead("first").over(w)
    bridge = F.when(
        nxt_first.isNotNull(),
        F.array(
            F.struct(
                F.col("last")["state"].alias("_st"),
                _seconds_between(F.col("last")["ts"], nxt_first["ts"]).alias("_dsum"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<_st:string,_dsum:double>>"))
    entries = F.concat(
        F.transform(
            F.map_entries("durs"),
            lambda e: F.struct(e["key"].alias("_st"), e["value"].alias("_dsum")),
        ),
        F.col("_bridge"),
    )
    # window exprs can't live inside a Generate — materialize the bridge
    # entries first, then explode (same Exchange: window and the per-state
    # agg below both cluster on (key, _coarse))
    stepped = (
        sa.withColumn("_coarse", coarse)
        .withColumn("_bridge", bridge)
        .select(
            key_col,
            "_coarse",
            "first",
            "last",
            "n",
            F.posexplode_outer(entries).alias("_pos", "_e"),
        )
    )
    # n / first / last ride along once per fine row (_pos 0 or the
    # explode_outer null row); per-state sums aggregate the exploded entries
    once = F.col("_pos").isNull() | (F.col("_pos") == 0)
    per_state = stepped.groupBy(key_col, "_coarse", F.col("_e")["_st"].alias("_st")).agg(
        F.sum(F.col("_e")["_dsum"]).alias("_dsum"),
        F.min("first").alias("_minpt"),
        F.max("last").alias("_maxpt"),
        F.sum(F.when(once, F.col("n"))).alias("_n"),
    )
    return per_state.groupBy(key_col, "_coarse").agg(
        F.min("_minpt").alias("first"),
        F.max("_maxpt").alias("last"),
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_st").isNotNull(), F.struct("_st", "_dsum"))
                )
            )
        ).alias("durs"),
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n"),
    ).withColumnRenamed("_coarse", "bucket_ts")


def duration_in(sa: DataFrame, state: str, out_col: str = "dur") -> DataFrame:
    """Read accessor: seconds spent in ``state`` per summary row (0.0 when
    the state never appears — TimescaleDB's ``duration_in`` contract)."""
    return sa.withColumn(
        out_col, F.coalesce(F.element_at("durs", F.lit(state)), F.lit(0.0))
    )


def interpolated_duration_in(
    sa: DataFrame,
    state: str,
    tier: str | int,
    key_col: str = "source",
    out_col: str = "idur",
) -> DataFrame:
    """Full-bucket duration-in-state (TimescaleDB
    ``interpolated_duration_in`` semantics): extend the step curve to the
    bucket edges using the neighboring summaries.

    - Head: the previous summary's last state holds over
      ``[bucket_start, first.ts)`` (no reading lies between, by
      construction). No previous summary -> coverage starts at the first
      reading.
    - Tail: the bucket's last state carries to ``bucket_end`` — locf needs
      no next reading, same choice :func:`timeweight.tw_interpolated_average`
      makes for its locf tail.

    Buckets with NO readings have no summary row and get no output row —
    compose with operators/gapfill.py for a dense grid. The bare-``key_col``
    window is safe at any corpus size: summary rows are calendar-bounded.
    """
    _bucket_len(tier)  # validate early
    w = Window.partitionBy(key_col).orderBy("bucket_ts")
    prev_last = F.lag("last").over(w)
    b_start = F.col("bucket_ts")
    b_end = F.col("bucket_ts") + _bucket_len(tier)
    head = F.when(
        prev_last.isNotNull() & (prev_last["state"] == F.lit(state)),
        _seconds_between(b_start, F.col("first")["ts"]),
    ).otherwise(F.lit(0.0))
    tail = F.when(
        F.col("last")["state"] == F.lit(state),
        _seconds_between(F.col("last")["ts"], b_end),
    ).otherwise(F.lit(0.0))
    base = F.coalesce(F.element_at("durs", F.lit(state)), F.lit(0.0))
    return sa.withColumn(out_col, base + head + tail)


# --- heartbeat_agg: liveness islands -----------------------------------------


def _merge_islands(sorted_islands: Column) -> Column:
    """Fold a (s,e)-sorted island array into its merged union — touching or
    overlapping intervals coalesce (half-open ``[s, e)``: ``s == prev.e``
    is contiguous). Island counts are summary-bounded, so the per-row fold
    is O(islands), never O(corpus)."""
    empty = F.array().cast("array<struct<s:timestamp,e:timestamp>>")
    return F.aggregate(
        sorted_islands,
        empty,
        lambda acc, x: F.when(F.size(acc) == 0, F.array(x)).otherwise(
            F.when(
                x["s"] <= F.element_at(acc, -1)["e"],
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)["s"].alias("s"),
                            F.greatest(F.element_at(acc, -1)["e"], x["e"]).alias("e"),
                        )
                    ),
                ),
            ).otherwise(F.concat(acc, F.array(x)))
        ),
    )


def heartbeat_bucket(
    points: DataFrame,
    period_sec: float,
    tier: str = "1m",
    key_col: str = "source",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Per-(key, bucket) liveness summary: each heartbeat asserts the
    source live for ``[hb, hb + period_sec)``; ``live`` is the merged union
    of the bucket's heartbeat intervals (UNCLAMPED — an island may extend
    past the bucket end; accessors clamp, and the cascade needs the
    overhang to merge seams exactly). Null-ts rows are dropped.
    """
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    if not period_sec > 0:
        raise ValueError(f"period_sec must be > 0, got {period_sec}")
    period = F.make_dt_interval(secs=F.lit(float(period_sec)))
    pts = (
        points.filter(F.col(ts_col).isNotNull())
        .withColumn("bucket_ts", F.date_trunc(TIER_TRUNC[tier], F.col(ts_col)))
    )
    w = Window.partitionBy(key_col, "bucket_ts").orderBy(ts_col)
    end = F.col(ts_col) + period
    # window functions can't nest — classic two-step islands: running max of
    # prior ends first, then the cumulative new-island counter (same window
    # spec, so both reuse ONE Exchange + sort)
    marked = pts.select(
        key_col,
        "bucket_ts",
        F.col(ts_col).alias("_hb"),
        end.alias("_end"),
        F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("_pme"),
    )
    is_new = F.when(
        F.col("_pme").isNull() | (F.col("_hb") > F.col("_pme")), F.lit(1)
    ).otherwise(F.lit(0))
    w2 = Window.partitionBy(key_col, "bucket_ts").orderBy("_hb")
    flagged = marked.select(
        key_col,
        "bucket_ts",
        "_hb",
        "_end",
        F.sum(is_new).over(w2.rowsBetween(Window.unboundedPreceding, 0)).alias("_isl"),
    )
    # same (key, bucket) grouping prefix as the window: one Exchange total
    per_island = flagged.groupBy(key_col, "bucket_ts", "_isl").agg(
        F.min("_hb").alias("s"),
        F.max("_end").alias("e"),
        F.min("_hb").alias("_first"),
        F.max("_hb").alias("_last"),
        F.count(F.lit(1)).alias("_n"),
    )
    return per_island.groupBy(key_col, "bucket_ts").agg(
        F.min("_first").alias("first_hb"),
        F.max("_last").alias("last_hb"),
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("live"),
        F.sum("_n").alias("n"),
    )


def heartbeat_cascade(
    hb: DataFrame,
    to_tier: str,
    from_tier: str = "1m",
    key_col: str = "source",
) -> DataFrame:
    """Merge fine liveness summaries one tier coarser: flatten the island
    arrays, re-sort, re-merge. Interval-union merge is associative and the
    fine islands carry their cross-boundary overhang, so cascaded == direct
    exactly."""
    _check_tiers(from_tier, to_tier)
    coarse = F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_ts"))
    return _hb_merge(hb, coarse, key_col)


def heartbeat_cascade_width(
    hb: DataFrame,
    width_sec: int,
    key_col: str = "source",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Merge a liveness tier into ARBITRARY fixed-width buckets
    (TimescaleDB ``time_bucket`` semantics via
    :func:`~.rollup.width_bucket`) — "uptime per 4 hours" from the 1m
    tier without a raw rescan. Interval-union merge is associative and
    islands carry their overhang, so the width read is exact under the
    same divides-and-aligns contract as :func:`~.rollup.cascade_width`.
    Read the result with the width (in seconds) as the ``tier`` argument
    of :func:`heartbeat_read` / :func:`interpolated_uptime`."""
    from .rollup import width_bucket

    coarse = width_bucket(F.col("bucket_ts"), width_sec, origin)
    return _hb_merge(hb, coarse, key_col)


def _hb_merge(hb: DataFrame, coarse, key_col: str) -> DataFrame:
    merged = hb.withColumn("_coarse", coarse).groupBy(key_col, "_coarse").agg(
        F.min("first_hb").alias("first_hb"),
        F.max("last_hb").alias("last_hb"),
        F.array_sort(F.flatten(F.collect_list("live"))).alias("_flat"),
        F.sum("n").alias("n"),
    )
    return merged.select(
        key_col,
        F.col("_coarse").alias("bucket_ts"),
        "first_hb",
        "last_hb",
        _merge_islands(F.col("_flat")).alias("live"),
        "n",
    )


def _bucket_len(tier) -> Column:
    """Bucket length as an interval: a tier name from the calendar set,
    or an int width in seconds (the ``*_cascade_width`` grids)."""
    if isinstance(tier, int):
        if tier < 1:
            raise ValueError(f"width must be >= 1 second, got {tier}")
        return F.expr(f"INTERVAL {int(tier)} SECONDS")
    if tier not in _TIER_INTERVAL:
        raise ValueError(
            f"tier must be an int width in seconds or in {list(_TIER_INTERVAL)}"
        )
    return F.expr(_TIER_INTERVAL[tier])


def _clamped_live_seconds(lo: Column, hi: Column) -> Column:
    """Sum of island overlap with ``[lo, hi)`` in seconds."""
    return F.aggregate(
        F.col("live"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.greatest(
            F.lit(0.0),
            _seconds_between(F.greatest(x["s"], lo), F.least(x["e"], hi)),
        ),
    )


def heartbeat_read(hb: DataFrame, tier: str | int) -> DataFrame:
    """Read accessors from the bucket's OWN heartbeats: ``uptime`` =
    live seconds within ``[bucket_ts, bucket_end)``, ``downtime`` = bucket
    span - uptime, ``num_gaps`` = dead stretches inside the bucket (before
    the first island, between islands, after the last island's in-bucket
    end). Liveness spilling in from the previous bucket is the
    interpolated accessor's job (:func:`interpolated_uptime`)."""
    b_start = F.col("bucket_ts")
    b_end = F.col("bucket_ts") + _bucket_len(tier)
    span = _seconds_between(b_start, b_end)
    up = _clamped_live_seconds(b_start, b_end)
    # islands are sorted + merged and all start inside the bucket; gaps =
    # (head gap before island 1) + (internal gaps) + (tail gap if the last
    # island ends before bucket_end)
    first_s = F.element_at("live", 1)["s"]
    last_e = F.element_at("live", -1)["e"]
    head_gap = F.when(first_s > b_start, 1).otherwise(0)
    tail_gap = F.when(last_e < b_end, 1).otherwise(0)
    internal = F.size("live") - 1
    return (
        hb.withColumn("uptime", F.least(up, span))
        .withColumn("downtime", span - F.least(up, span))
        .withColumn("num_gaps", head_gap + internal + tail_gap)
    )


def interpolated_uptime(
    hb: DataFrame,
    tier: str | int,
    key_col: str = "source",
    out_col: str = "iuptime",
) -> DataFrame:
    """Uptime including liveness carried in from the PREVIOUS summary's
    final island (the only island that can cross the seam — islands are
    merged, so at most one overhangs). Any prev-island overlap beyond this
    bucket's first own island start is already covered by that island
    (own island 1 ends >= its start + period > prev island end), so the
    carry-in is exactly ``[bucket_start, min(prev_e, bucket_end,
    first_own_island_start))``. Calendar-bounded bare-key window, same
    safety argument as :func:`interpolated_duration_in`."""
    _bucket_len(tier)  # validate early
    w = Window.partitionBy(key_col).orderBy("bucket_ts")
    prev_e = F.lag(F.element_at("live", -1)["e"]).over(w)
    b_start = F.col("bucket_ts")
    b_end = F.col("bucket_ts") + _bucket_len(tier)
    span = _seconds_between(b_start, b_end)
    own = F.least(_clamped_live_seconds(b_start, b_end), span)
    first_s = F.element_at("live", 1)["s"]
    carry_hi = F.least(prev_e, b_end, first_s)
    carry = F.when(
        prev_e.isNotNull() & (prev_e > b_start),
        F.greatest(F.lit(0.0), _seconds_between(b_start, carry_hi)),
    ).otherwise(F.lit(0.0))
    return hb.withColumn(out_col, F.least(own + carry, span))


def hb_rolling(
    hb: DataFrame,
    window_buckets: int,
    tier: str | int,
    key_col: str = "source",
    min_buckets: int | None = None,
) -> DataFrame:
    """Merged liveness summary over the TRAILING ``window_buckets``
    calendar slots per present slot, plus window accessors: ``uptime`` /
    ``downtime`` in seconds over the WINDOW SPAN ``[slot_start -
    (k-1) steps, slot_end)`` via the clamped island fold — "uptime over
    the last 24 hourly buckets as of each hour". Island interval-union
    is associative and order-free, so the window merge is exact; a slot
    with no summary simply contributes no islands (``win_buckets``
    reports contributors, same convention as the other rolling reads).
    Accessors and the merged ``live`` array are NULL below the
    ``min_buckets`` warm-up (default: the full window); ``n`` stays."""
    if tier not in _TIER_INTERVAL:
        raise ValueError(f"tier must be in {list(_TIER_INTERVAL)}")
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    mb = window_buckets if min_buckets is None else min_buckets
    unit = TIER_TRUNC[tier]
    targets = F.expr(
        f"sequence(bucket_ts, bucket_ts + interval {window_buckets - 1} {unit}, "
        f"interval 1 {unit})"
    )
    sc = hb.select(key_col, "bucket_ts", "first_hb", "last_hb", "live", "n") \
        .withColumn("_tgt", F.explode(targets))
    agg = sc.groupBy(key_col, "_tgt").agg(
        F.min("first_hb").alias("first_hb"),
        F.max("last_hb").alias("last_hb"),
        F.array_sort(F.flatten(F.collect_list("live"))).alias("_flat"),
        F.sum("n").alias("n"),
        F.max(F.col("bucket_ts") == F.col("_tgt")).alias("_has_origin"),
        F.size(F.collect_set("bucket_ts")).alias("win_buckets"),
    )
    win_start = (
        F.col("_tgt")
        - F.expr(f"interval {window_buckets - 1} {unit}")
    )
    win_end = F.col("_tgt") + F.expr(_TIER_INTERVAL[tier])
    span = _seconds_between(win_start, win_end)
    merged = agg.filter(F.col("_has_origin")).select(
        key_col,
        F.col("_tgt").alias("bucket_ts"),
        "first_hb",
        "last_hb",
        _merge_islands(F.col("_flat")).alias("live"),
        "n",
        "win_buckets",
        win_start.alias("_lo"),
        win_end.alias("_hi"),
        span.alias("_span"),
    )
    up = F.aggregate(
        F.col("live"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.greatest(
            F.lit(0.0),
            _seconds_between(
                F.greatest(x["s"], F.col("_lo")), F.least(x["e"], F.col("_hi"))
            ),
        ),
    )
    warm = F.col("win_buckets") >= F.lit(mb)
    return (
        merged.withColumn("uptime", F.when(warm, up))
        .withColumn("downtime", F.when(warm, F.col("_span") - F.col("uptime")))
        .withColumn("live", F.when(warm, F.col("live")))
        .withColumn("first_hb", F.when(warm, F.col("first_hb")))
        .withColumn("last_hb", F.when(warm, F.col("last_hb")))
        .drop("_lo", "_hi", "_span")
    )


def state_rolling(
    sa: DataFrame,
    window_buckets: int,
    tier: str,
    key_col: str = "source",
    min_buckets: int | None = None,
) -> DataFrame:
    """Merged duration-in-state summary over the TRAILING
    ``window_buckets`` calendar slots per present slot — "seconds per
    state over the last 24 hourly buckets" read with
    :func:`duration_in` on the output. The merge is the cascade's:
    per-state sums plus the locf bridge between consecutive window
    members (a calendar gap contributes one long bridge in the last
    member's closing state, exactly the tier-merge convention). Same
    scatter shape, ``win_buckets`` gap reporting, and ``min_buckets``
    warm-up NULLs as the other rolling reads (``n`` stays exact)."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    mb = window_buckets if min_buckets is None else min_buckets
    unit = TIER_TRUNC[tier]
    targets = F.expr(
        f"sequence(bucket_ts, bucket_ts + interval {window_buckets - 1} {unit}, "
        f"interval 1 {unit})"
    )
    sc = sa.select(key_col, "bucket_ts", "first", "last", "durs", "n") \
        .withColumn("_tgt", F.explode(targets))
    w = Window.partitionBy(key_col, "_tgt").orderBy("bucket_ts", "first")
    nxt_first = F.lead("first").over(w)
    bridge = F.when(
        nxt_first.isNotNull(),
        F.array(
            F.struct(
                F.col("last")["state"].alias("_st"),
                _seconds_between(F.col("last")["ts"], nxt_first["ts"]).alias("_dsum"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<_st:string,_dsum:double>>"))
    entries = F.concat(
        F.transform(
            F.map_entries("durs"),
            lambda e: F.struct(e["key"].alias("_st"), e["value"].alias("_dsum")),
        ),
        F.col("_bridge"),
    )
    stepped = (
        sc.withColumn("_bridge", bridge)
        .select(
            key_col,
            "_tgt",
            "bucket_ts",
            "first",
            "last",
            "n",
            F.posexplode_outer(entries).alias("_pos", "_e"),
        )
    )
    once = F.col("_pos").isNull() | (F.col("_pos") == 0)
    per_state = stepped.groupBy(
        key_col, "_tgt", F.col("_e")["_st"].alias("_st")
    ).agg(
        F.sum(F.col("_e")["_dsum"]).alias("_dsum"),
        F.min("first").alias("_minpt"),
        F.max("last").alias("_maxpt"),
        F.sum(F.when(once, F.col("n"))).alias("_n"),
        F.max(F.when(once & (F.col("bucket_ts") == F.col("_tgt")), True)).alias("_orig"),
        F.collect_set(F.when(once, F.col("bucket_ts"))).alias("_srcs"),
    )
    agg = per_state.groupBy(key_col, "_tgt").agg(
        F.min("_minpt").alias("first"),
        F.max("_maxpt").alias("last"),
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_st").isNotNull(), F.struct("_st", "_dsum"))
                )
            )
        ).alias("durs"),
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n"),
        F.max(F.coalesce(F.col("_orig"), F.lit(False))).alias("_has_origin"),
        F.size(F.array_distinct(F.flatten(F.collect_list("_srcs")))).alias(
            "win_buckets"
        ),
    )
    warm = F.col("win_buckets") >= F.lit(mb)
    return (
        agg.filter(F.col("_has_origin"))
        .select(
            key_col,
            F.col("_tgt").alias("bucket_ts"),
            F.when(warm, F.col("first")).alias("first"),
            F.when(warm, F.col("last")).alias("last"),
            F.when(warm, F.col("durs")).alias("durs"),
            "n",
            "win_buckets",
        )
    )
