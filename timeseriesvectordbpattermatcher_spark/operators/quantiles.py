"""Tiered EXACT quantiles via mergeable bounded histograms.

The north-star metric asks for "continuous aggregates (count/sum/min/max/
avg of n_tok and token-level stats) at cascading retention tiers". Plain
count/sum/min/max/avg merge trivially up the cascade; quantiles do not —
``percentile_approx`` results computed at 1m cannot be combined into an
exact 1h percentile, and re-scanning raw for every tier defeats the
cascade. The classic warehouse fix (Druid/Pinot sketch columns) stores a
MERGEABLE summary per bucket and folds summaries upward.

For a column with a bounded integer domain — exactly what ``n_tok`` is
(sequence length <= model context window) and what token ids are (vocab
size) — the mergeable summary can be the EXACT frequency histogram
``map<int, count>``: merging histograms is addition, so quantiles read
from any tier equal quantiles recomputed from raw, bit for bit. No sketch
error budget, no re-scan. A 1d bucket's histogram holds at most
|domain| entries regardless of row count, so tier size stays bounded by
(buckets x domain), never by corpus rows.

Scale shape: building the 1m histogram is one agg on (keys, value) — the
shuffle carries (keys, value, partial_count) rows, bounded by
buckets x distinct values, with map-side partial aggregation doing the
heavy lifting (10^12 raw rows never cross the wire). Each cascade merge
explodes the finer tier's maps (rows = buckets x domain, corpus-size
independent) and re-aggregates one tier coarser. Quantile extraction is a
pure codegen'd ``aggregate`` fold over the sorted map entries — zero UDFs,
zero Python anywhere in this module.

Unbounded/float domains: pass ``bucket`` to quantize values first (e.g.
``F.ceil(F.log2("latency_ms"))``); quantiles then carry that bucketing's
resolution, which the caller chose explicitly. This module never silently
approximates.

Quantile definition (pinned to the DuckDB oracle in tests): the q-quantile
of n values is the smallest histogram key whose cumulative count reaches
``ceil(q * n)`` — inverted-CDF / Hyndman-Fan type 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIER_TRUNC


def hist_rollup(
    df: DataFrame,
    keys: list[str],
    value_col: str = "n_tok",
    bucket: Column | None = None,
    hist_col: str = "hist",
) -> DataFrame:
    """One exact histogram per ``keys`` group: ``hist_col`` =
    ``map<value, count>`` over ``value_col`` (or over ``bucket`` when the
    domain needs quantizing first). NULL values are excluded (a quantile
    over nothing is nothing); groups whose values are all NULL keep an
    empty map, so downstream merges and quantile folds never see NULL maps.

    Two aggs: (keys, value) counts with map-side partial combine, then the
    map rebuild on keys — both shuffles bounded by groups x domain.
    """
    v = (bucket if bucket is not None else F.col(value_col)).cast("int").alias("_hv")
    # NULL values aren't pre-filtered: an all-NULL group must still surface
    # with an empty map (count(_hv) ignores NULLs; collect_list drops the
    # NULL-guarded struct), or the group would silently vanish from the tier
    counts = (
        df.select(*keys, v)
        .groupBy(*keys, "_hv")
        .agg(F.count("_hv").alias("_hc"))
    )
    return (
        counts.groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_hv").isNotNull(), F.struct("_hv", "_hc"))
                    )
                )
            ).alias(hist_col)
        )
    )


def hist_1m(
    df: DataFrame,
    value_col: str = "n_tok",
    ts_col: str = "event_ts",
    key_col: str = "source",
    bucket: Column | None = None,
) -> DataFrame:
    """The finest histogram tier: (key, minute bucket) -> exact histogram.
    Composes with ``rollup.rollup_1m`` on the same keys (join or co-group);
    kept separate so the plain-stats driver queries' schemas stay frozen."""
    keyed = df.withColumn(
        "bucket_ts", F.date_trunc(TIER_TRUNC["1m"], F.col(ts_col))
    )
    return hist_rollup(keyed, [key_col, "bucket_ts"], value_col, bucket=bucket)


def hist_cascade(
    df: DataFrame,
    tier: str,
    key_col: str = "source",
    hist_col: str = "hist",
) -> DataFrame:
    """Merge a finer tier's histograms one tier coarser (1m->1h, 1h->1d):
    explode the maps (rows = buckets x domain, never corpus rows), sum
    counts per (key, coarse bucket, value), rebuild the map. Histogram
    addition is exact, so quantiles at every tier equal a raw recompute."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    coarse = F.date_trunc(TIER_TRUNC[tier], F.col("bucket_ts")).alias("bucket_ts")
    return _hist_merge(df, coarse, key_col, hist_col)


def hist_cascade_width(
    df: DataFrame,
    width_sec: int,
    key_col: str = "source",
    hist_col: str = "hist",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Merge a histogram tier into ARBITRARY fixed-width buckets
    (TimescaleDB ``time_bucket`` semantics via
    :func:`~.rollup.width_bucket`) — "p99 per 15 minutes" from the 1m
    tier without a raw rescan. Histogram addition is exact, so the
    width read equals a raw recompute whenever the source tier's width
    divides ``width_sec`` and aligns to the grid (caller's contract,
    same as :func:`~.rollup.cascade_width`)."""
    from .rollup import width_bucket

    coarse = width_bucket(F.col("bucket_ts"), width_sec, origin).alias("bucket_ts")
    return _hist_merge(df, coarse, key_col, hist_col)


def _hist_merge(df: DataFrame, coarse, key_col: str, hist_col: str) -> DataFrame:
    exploded = df.select(
        key_col, coarse, F.explode_outer(hist_col).alias("_hv", "_hc")
    )
    summed = (
        exploded.filter(F.col("_hv").isNotNull())
        .groupBy(key_col, "bucket_ts", "_hv")
        .agg(F.sum("_hc").alias("_hc"))
    )
    merged = summed.groupBy(key_col, "bucket_ts").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_hv", "_hc")))
        ).alias(hist_col)
    )
    # preserve groups whose histograms were all empty (all-NULL values at
    # the fine tier): explode_outer keeps them as a NULL entry row
    empties = (
        exploded.groupBy(key_col, "bucket_ts")
        .agg(F.max(F.col("_hv").isNotNull()).alias("_any"))
        .filter(~F.col("_any"))
        .select(
            key_col,
            "bucket_ts",
            F.map_from_entries(F.array().cast("array<struct<_hv:int,_hc:bigint>>")).alias(hist_col),
        )
    )
    return merged.unionByName(empties)


def _hist_total(hist_col: str) -> Column:
    return F.aggregate(
        F.map_values(hist_col), F.lit(0).cast("bigint"), lambda a, c: a + c
    )


def hist_quantile(hist_col: str, q: float) -> Column:
    """Exact q-quantile from a histogram map as a pure codegen'd fold:
    smallest key whose cumulative count >= ceil(q * total) (inverted CDF,
    Hyndman-Fan type 1 — the definition the DuckDB window oracle in
    tests/test_quantiles.py reproduces). NULL on an empty histogram."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    entries = F.array_sort(F.map_entries(hist_col))
    target = F.greatest(F.lit(1).cast("bigint"), F.ceil(_hist_total(hist_col) * F.lit(q)))
    acc0 = F.struct(
        F.lit(0).cast("bigint").alias("cum"),
        F.lit(None).cast("int").alias("ans"),
    )
    fold = F.aggregate(
        entries,
        acc0,
        lambda acc, e: F.when(acc["ans"].isNotNull(), acc).otherwise(
            F.struct(
                (acc["cum"] + e["value"]).alias("cum"),
                F.when(acc["cum"] + e["value"] >= target, e["key"])
                .cast("int")
                .alias("ans"),
            )
        ),
        lambda acc: acc["ans"],
    )
    return fold


def add_hist_quantiles(
    df: DataFrame,
    qs: dict[str, float] | None = None,
    hist_col: str = "hist",
    keys: list[str] | None = None,
) -> DataFrame:
    """Add named quantile columns (default p50/p95/p99) plus ``hist_n``
    (the histogram's total count — equals the tier's ``cnt`` when both
    came from the same rows, a useful cross-check).

    Physical form: explode the maps, ONE window cumsum per group, re-agg
    ``min(value where cum >= target_q)`` for every quantile at once — all
    codegen'd, one Exchange on ``keys``, rows = groups x domain. The
    :func:`hist_quantile` fold expression computes the same thing inline,
    but Spark evaluates higher-order lambdas INTERPRETED per element — on
    a day tier with thousand-entry maps the fold measured 4.9 s where this
    plan runs in ~0.3 s (same result, pinned in tests). Use the fold only
    for ad-hoc single-map expressions.

    ``keys`` defaults to every non-histogram column; the other columns of
    ``df`` survive (they ride along in the group key, so they must be
    functionally dependent on the group — true for tier tables)."""
    qs = qs or {"p50": 0.50, "p95": 0.95, "p99": 0.99}
    keys = keys or [c for c in df.columns if c != hist_col]
    ex = df.select(*keys, F.explode_outer(hist_col).alias("_hv", "_hc"))
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("_hv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*keys)
    ex = ex.withColumn("_cum", F.sum("_hc").over(w_cum)).withColumn(
        "_tot", F.sum("_hc").over(w_all)
    )
    aggs = [F.coalesce(F.max("_tot"), F.lit(0).cast("bigint")).alias("hist_n")]
    for name, q in qs.items():
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must be in (0, 1], got {q}")
        target = F.greatest(F.lit(1).cast("bigint"), F.ceil(F.col("_tot") * F.lit(q)))
        aggs.append(F.min(F.when(F.col("_cum") >= target, F.col("_hv"))).alias(name))
    # the histogram column rides through the SAME agg (entries re-sort
    # deterministically — values are distinct per group), so no join back
    aggs.append(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_hv").isNotNull(), F.struct("_hv", "_hc"))
                )
            )
        ).alias(hist_col)
    )
    return ex.groupBy(*keys).agg(*aggs)


_TIER_UNIT = {"1m": "minute", "1h": "hour", "1d": "day"}
_TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def hist_rolling_quantiles(
    df: DataFrame,
    window_buckets: int,
    tier: str,
    qs: dict[str, float] | None = None,
    key_col: str = "source",
    hist_col: str = "hist",
    min_buckets: int | None = None,
) -> DataFrame:
    """Rolling quantiles over the TRAILING ``window_buckets`` CALENDAR
    slots of a histogram tier — "p99 of the last 24 hourly buckets"
    served from tier summaries, never from raw. Exact (the histograms
    are exact and merge by addition), inverted-CDF type 1 like every
    read in this module.

    The window is calendar-ranged, not row-ranged: a bucket with no
    summary row (nothing ingested that slot) simply contributes nothing,
    and ``win_buckets`` (emitted) counts the slots that DID contribute,
    so a gap shows up as a smaller denominator rather than silently
    stretching the window back in time (the row-frame behavior).
    Quantile columns are NULL while ``win_buckets < min_buckets``
    (default: ``window_buckets`` — the repo's warm-up convention); pass
    ``min_buckets=1`` for gap-tolerant reads.

    Cost shape: the scatter fans every map entry to <= k slots, so the
    walk processes ~ slots x window x value-domain rows — pick the
    SOURCE TIER to match the window (weekly windows from the 1d tier,
    not 24 x 1h), exactly as you would for any rollup read; wide
    windows over a fine tier pay the fan-out.

    Physical shape (10^12-safe because inputs are TIER tables, already
    calendar-bounded): explode maps -> scatter each entry to the <=
    ``window_buckets`` future slots it serves (bounded fan-out, narrow)
    -> ONE Exchange on (key, target slot) where a window cumsum walks
    the sorted values (duplicate values from different source slots are
    fine: rows order by value, so the first row whose cumulative count
    reaches the target is still the quantile value) -> final agg reuses
    the same partitioning. Output rows exist only for slots present in
    the input (no densification — compose with gap-fill for a grid).
    """
    if tier not in _TIER_UNIT:
        raise ValueError(f"tier must be one of {sorted(_TIER_UNIT)}, got {tier!r}")
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    qs = qs or {"p50": 0.50, "p95": 0.95, "p99": 0.99}
    mb = window_buckets if min_buckets is None else min_buckets
    unit = _TIER_UNIT[tier]
    step = _TIER_SECONDS[tier]

    # scatter: entry at slot b serves targets b .. b+(k-1) slots
    targets = F.expr(
        f"sequence(bucket_ts, bucket_ts + interval {window_buckets - 1} {unit}, "
        f"interval 1 {unit})"
    )
    ex = (
        df.select(key_col, "bucket_ts", F.explode_outer(hist_col).alias("_hv", "_hc"))
        .withColumn("_tgt", F.explode(targets))
    )

    w_cum = (
        Window.partitionBy(key_col, "_tgt")
        .orderBy("_hv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(key_col, "_tgt")
    ex = (
        ex.withColumn("_cum", F.sum("_hc").over(w_cum))
        .withColumn("_tot", F.sum("_hc").over(w_all))
    )
    aggs = [
        F.coalesce(F.max("_tot"), F.lit(0).cast("bigint")).alias("hist_n"),
        # a slot is an OUTPUT slot only if its own summary row exists
        F.max(F.col("bucket_ts") == F.col("_tgt")).alias("_has_origin"),
        F.size(F.collect_set("bucket_ts")).alias("win_buckets"),
    ]
    for name, q in qs.items():
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must be in (0, 1], got {q}")
        target = F.greatest(F.lit(1).cast("bigint"), F.ceil(F.col("_tot") * F.lit(q)))
        aggs.append(F.min(F.when(F.col("_cum") >= target, F.col("_hv"))).alias(name))
    out = (
        ex.groupBy(key_col, "_tgt")
        .agg(*aggs)
        .filter(F.col("_has_origin"))
        .drop("_has_origin")
        .withColumnRenamed("_tgt", "bucket_ts")
    )
    for name in qs:
        out = out.withColumn(
            name, F.when(F.col("win_buckets") >= F.lit(mb), F.col(name))
        )
    return out


def hist_merge_all(
    df: DataFrame,
    key_col: str = "source",
    hist_col: str = "hist",
) -> DataFrame:
    """Collapse a histogram tier to ONE merged map per key (map
    addition over every bucket) — the range aggregation feeding
    :func:`hist_drift`; restrict the input first (``read_range`` /
    a bucket_ts filter) to scope the window."""
    exploded = df.select(key_col, F.explode_outer(hist_col).alias("_hv", "_hc"))
    summed = (
        exploded.filter(F.col("_hv").isNotNull())
        .groupBy(key_col, "_hv")
        .agg(F.sum("_hc").alias("_hc"))
    )
    merged = summed.groupBy(key_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_hv", "_hc")))
        ).alias(hist_col)
    )
    empties = (
        exploded.groupBy(key_col)
        .agg(F.max(F.col("_hv").isNotNull()).alias("_any"))
        .filter(~F.col("_any"))
        .select(
            key_col,
            F.map_from_entries(
                F.array().cast("array<struct<_hv:int,_hc:bigint>>")
            ).alias(hist_col),
        )
    )
    return merged.unionByName(empties)


def hist_drift(
    hist_a: DataFrame,
    hist_b: DataFrame,
    key_col: str = "source",
    hist_col: str = "hist",
    psi_eps: float = 1e-6,
) -> DataFrame:
    """Distribution drift between two histogram sets per key, EXACTLY
    from the tier summaries (no raw rescan):

    - ``ks`` — the two-sample Kolmogorov–Smirnov statistic
      ``max_v |CDF_a(v) - CDF_b(v)|`` over the union of observed
      values (exact for integer-binned histograms; the test STATISTIC,
      not a p-value — compare against the caller's threshold or
      c(alpha)*sqrt((n_a+n_b)/(n_a*n_b)) per the published asymptotic
      form).
    - ``psi`` — the Population Stability Index
      ``sum_v (p_a - p_b) * ln(p_a / p_b)`` with additive smoothing
      ``psi_eps`` on each bin's probability (the standard guard for
      bins present on one side only; the credit-scoring rule of thumb
      reads < 0.1 stable, 0.1-0.25 shifted, > 0.25 drifted).

    Keys present on only one side get NULL stats (nothing to compare);
    all-empty sides likewise. Physical shape: explode both maps, one
    full-outer merge per (key, value), one cumsum window per key — all
    codegen'd, rows bounded by keys x domain.
    """
    a = hist_a.select(key_col, F.explode_outer(hist_col).alias("_hv", "_ca"))
    b = hist_b.select(key_col, F.explode_outer(hist_col).alias("_hv", "_cb"))
    av = a.filter(F.col("_hv").isNotNull()).groupBy(key_col, "_hv").agg(
        F.sum("_ca").alias("_ca")
    )
    bv = b.filter(F.col("_hv").isNotNull()).groupBy(key_col, "_hv").agg(
        F.sum("_cb").alias("_cb")
    )
    keys_a = a.select(key_col).distinct()
    keys_b = b.select(key_col).distinct()
    both = keys_a.join(keys_b, key_col)  # only comparable keys emit stats
    grid = (
        av.join(bv, [key_col, "_hv"], "full_outer")
        .join(both, key_col, "left_semi")
        .select(
            key_col, "_hv",
            F.coalesce("_ca", F.lit(0)).alias("_ca"),
            F.coalesce("_cb", F.lit(0)).alias("_cb"),
        )
    )
    w_all = Window.partitionBy(key_col)
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy("_hv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    na = F.sum("_ca").over(w_all)
    nb = F.sum("_cb").over(w_all)
    cda = F.sum("_ca").over(w_cum) / na
    cdb = F.sum("_cb").over(w_cum) / nb
    # smoothed bin probabilities for PSI; |bins| is the key's union grid
    nbins = F.count(F.lit(1)).over(w_all)
    pa = (F.col("_ca") + F.lit(psi_eps)) / (na + nbins * F.lit(psi_eps))
    pb = (F.col("_cb") + F.lit(psi_eps)) / (nb + nbins * F.lit(psi_eps))
    scored = grid.select(
        key_col,
        na.alias("n_a"),
        nb.alias("n_b"),
        F.abs(cda - cdb).alias("_gap"),
        ((pa - pb) * F.log(pa / pb)).alias("_psi_term"),
    )
    out = scored.groupBy(key_col).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max("_gap").alias("ks"),
        F.sum("_psi_term").alias("psi"),
    )
    return out.withColumn(
        "ks", F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("ks"))
    ).withColumn(
        "psi", F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("psi"))
    )
