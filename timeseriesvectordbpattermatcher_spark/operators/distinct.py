"""Mergeable per-bucket distinct counts via Apache DataSketches HLL.

The reference counts distincts with pandas ``nunique`` over full frames
(/root/reference/datalib/commonUtil.py consumers) — a full rescan per ask.
The continuous-aggregate answer is a distinct SKETCH per bucket that merges
up the retention tiers exactly like the count/sum/min/max plane
(operators/rollup.py): Spark 3.5+ ships DataSketches HLL as builtin JVM
aggregates (``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``
— public Spark API, whole-stage codegen'd, zero Python), so the engine only
has to arrange them into the cascade shape.

Why a sketch and not exact: per-bucket exact distinct does NOT merge — the
1h distinct is not the sum of its 1m distincts (overlap), so an exact tier
would re-scan raw. HLL union is overlap-correct, and the 1h/1d tiers
shuffle only the 1m sketch table — bytes per group bounded by ``2^lgk``
registers, corpus-size-independent.

What the sketch contract actually guarantees (probed empirically against
Spark's DataSketches build so nobody rediscovers it in production):
estimates are NOT bitwise grouping-independent. A direct raw build uses the
stream-order HIP estimator while unions use the composite one, and sparse
(coupon) sketches promote to dense registers at grouping-dependent points —
so ``1m -> 1h -> 1d`` vs ``1m -> 1d`` vs a direct rebuild can each return
slightly different numbers. What IS guaranteed, and what the tests pin: (a)
every tier's estimate — direct or cascaded, any grouping — sits inside the
published error bound (~1.04/sqrt(2^lgk) relative standard error; lgk=12 ->
~1.6%; tests assert a 5-sigma band against DuckDB's exact COUNT DISTINCT),
and (b) a fixed plan is deterministic — the same cascade re-run yields
identical estimates. This module never pretends the estimate is exact — the
exact path, when a consumer truly needs it, is a raw groupBy countDistinct
at that one tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import TIER_ORDER, TIER_TRUNC


def distinct_bucket(
    rows: DataFrame,
    col: str = "doc_id",
    tier: str = "1m",
    key_col: str = "source",
    ts_col: str = "event_ts",
    lgk: int = 12,
) -> DataFrame:
    """Per-(key, bucket) HLL sketch of distinct ``col`` values. Null ts rows
    are dropped (no bucket to land in); null values simply don't update the
    sketch (builtin semantics) — an all-null bucket keeps an empty sketch
    that estimates 0, it does not vanish."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    return (
        rows.filter(F.col(ts_col).isNotNull())
        .withColumn("bucket_ts", F.date_trunc(TIER_TRUNC[tier], F.col(ts_col)))
        .groupBy(key_col, "bucket_ts")
        .agg(F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("dsk"))
    )


def distinct_cascade(
    sketches: DataFrame,
    to_tier: str,
    from_tier: str = "1m",
    key_col: str = "source",
) -> DataFrame:
    """Merge fine-tier sketches into a coarser tier: register-max union,
    associative and overlap-correct by construction."""
    if from_tier not in TIER_TRUNC or to_tier not in TIER_TRUNC:
        raise ValueError(f"tiers must be in {list(TIER_TRUNC)}")
    if TIER_ORDER.index(to_tier) < TIER_ORDER.index(from_tier):
        # equal tiers = same-bucket partial merge (real-time seam read)
        raise ValueError(f"cascade must coarsen: {from_tier} -> {to_tier}")
    return (
        sketches.withColumn(
            "bucket_ts", F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_ts"))
        )
        .groupBy(key_col, "bucket_ts")
        .agg(F.hll_union_agg("dsk").alias("dsk"))
    )


def distinct_estimate(sketches: DataFrame, out_col: str = "approx_distinct") -> DataFrame:
    """Read accessor: the HLL cardinality estimate (long)."""
    return sketches.withColumn(out_col, F.hll_sketch_estimate("dsk"))


def distinct_rolling_estimate(
    sketches: DataFrame,
    window_buckets: int,
    tier: str,
    key_col: str = "source",
    min_buckets: int | None = None,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Rolling distinct estimate over the TRAILING ``window_buckets``
    CALENDAR slots of a sketch tier — "distinct doc_ids in the last 24
    hourly buckets" from summaries, never raw. HLL union is
    overlap-correct, so a value active in several slots of the window
    still counts once, and every read sits inside the same published
    error band as a single-bucket estimate (module docstring).

    Window semantics match
    :func:`~.quantiles.hist_rolling_quantiles`: calendar-ranged (a slot
    with no summary contributes nothing; ``win_buckets`` reports how
    many did), output rows only for slots present in the input, NULL
    estimate below the ``min_buckets`` warm-up (default: the full
    window). Physical shape: scatter each summary row to the <= k slots
    it serves (bounded fan-out, narrow), then ONE Exchange on
    (key, slot) for the ``hll_union_agg`` — tier-table-sized, never raw.
    """
    from .rollup import TIER_TRUNC  # noqa: F401  (tier names shared)

    units = {"1m": "minute", "1h": "hour", "1d": "day"}
    if tier not in units:
        raise ValueError(f"tier must be one of {sorted(units)}, got {tier!r}")
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    mb = window_buckets if min_buckets is None else min_buckets
    unit = units[tier]
    targets = F.expr(
        f"sequence(bucket_ts, bucket_ts + interval {window_buckets - 1} {unit}, "
        f"interval 1 {unit})"
    )
    ex = sketches.select(
        key_col, "bucket_ts", "dsk", F.explode(targets).alias("_tgt")
    )
    out = (
        ex.groupBy(key_col, "_tgt")
        .agg(
            F.hll_union_agg("dsk").alias("dsk"),
            F.max(F.col("bucket_ts") == F.col("_tgt")).alias("_has_origin"),
            F.size(F.collect_set("bucket_ts")).alias("win_buckets"),
        )
        .filter(F.col("_has_origin"))
        .drop("_has_origin")
        .withColumnRenamed("_tgt", "bucket_ts")
    )
    return out.withColumn(
        out_col,
        F.when(
            F.col("win_buckets") >= F.lit(mb), F.hll_sketch_estimate("dsk")
        ),
    )


def distinct_cascade_width(
    sketches: DataFrame,
    width_sec: int,
    key_col: str = "source",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Merge HLL sketch summaries onto an ARBITRARY fixed-width grid
    (``time_bucket`` semantics) — distinct-per-15-minutes from the 1m
    tier; register-max union, overlap-correct, same estimator caveats
    and error band as the tier cascade. Alignment contract as
    :func:`~.rollup.cascade_width`."""
    from .rollup import width_bucket

    return (
        sketches.withColumn(
            "bucket_ts", width_bucket(F.col("bucket_ts"), width_sec, origin)
        )
        .groupBy(key_col, "bucket_ts")
        .agg(F.hll_union_agg("dsk").alias("dsk"))
    )
