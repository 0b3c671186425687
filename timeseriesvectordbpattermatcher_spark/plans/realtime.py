"""Real-time continuous aggregates: committed tier + fresh raw tail.

Between RollupJob runs the tier tables are stale: rows ingested after
the last commit are invisible to tier readers until the next batch (or
stream micro-batch) lands. TimescaleDB calls the fix "real-time
continuous aggregates": a read-path view that UNIONs the materialized
aggregate with an on-the-fly aggregation of only the raw rows past the
materialization watermark. This module is that view for the engine's
tiers.

Exactness at the seam: the watermark bucket is typically PARTIAL in the
committed tier (rows <= watermark) while the fresh tail holds the rest.
Every stats column is a mergeable partial (cnt/sum/min/max/tok_* — the
same partial->final algebra the 1h/1d cascade already uses), so merging
``committed ∪ fresh`` per (source, bucket) with ``cascade(..., same
tier)`` reconstructs the full bucket exactly; ``avg_n_tok`` is
recomputed from the merged sums. The histogram plane merges the same
way (map addition via ``hist_cascade``). Pinned in
tests/test_realtime.py: the real-time view at ANY cut point equals a
full recompute over all raw, bit for bit, at every tier.

Scale shape: the committed side is a manifest-pruned tier read; the
fresh side scans ONLY rows with ``event_ts`` past the TIER'S OWN
watermark (each tier records the raw watermark it reflects, so a 1h
view lagging the 1m table still reads the right tail) — at 10^12 rows
that filter is the difference between a view and a full re-scan, and it
pushes down to the raw source's time partitioning/file stats when the
input is a SnapshotTable written by this engine. Same in-order
assumption as ``RollupJob.run``: late rows AT or BEHIND the watermark
are the ingestion paths' job (``run_from_snapshot`` / ``merge_into``),
not this read's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quantiles import hist_1m, hist_cascade
from ..operators.rollup import TIER_TRUNC, cascade, rollup_1m
from .checkpoint import RollupJob

__all__ = ["realtime_stats", "realtime_hist", "realtime_dds", "realtime_cms", "realtime_topk", "realtime_tw", "realtime_distinct", "realtime_hb", "realtime_stats2"]

_PARTIALS = [
    "cnt", "sum_n_tok", "min_n_tok", "max_n_tok",
    "tok_min", "tok_max", "tok_sum",
]


def _tier_watermark(job: RollupJob, plane: str, tier: str) -> str | None:
    table = job._plane_tables[plane][tier]
    snap = table.current_snapshot()
    return snap.watermark if snap is not None else None


def _fresh_tail(raw: DataFrame, wm: str | None) -> DataFrame:
    if wm is None:
        return raw
    return raw.filter(F.col("event_ts") > F.lit(wm))


def realtime_stats(
    job: RollupJob,
    spark: SparkSession,
    raw: DataFrame,
    tier: str = "1m",
    token_engine: str = "expr",
    salt_buckets: int | None = None,
) -> DataFrame:
    """The stats tier as it WOULD look if the job ran right now:
    committed ``tier`` rows merged with a fresh rollup of raw rows past
    that tier's watermark. Output schema matches the tier tables
    (source, bucket_ts, cnt, sum/min/max/avg_n_tok, tok_min/max/sum).
    ``raw`` must carry ``event_ts`` (derive_event_ts upstream)."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    wm = _tier_watermark(job, "rollup", tier)
    fresh_1m = rollup_1m(
        _fresh_tail(raw, wm),
        salt_buckets=salt_buckets,
        token_engine=token_engine,
    )
    fresh = fresh_1m if tier == "1m" else cascade(
        fresh_1m if tier == "1h" else cascade(fresh_1m, "1h"), tier
    )
    committed = job.tables[tier].read(spark)
    if committed is None:
        return fresh
    parts = committed.select("source", "bucket_ts", *_PARTIALS).unionByName(
        fresh.select("source", "bucket_ts", *_PARTIALS)
    )
    # cascade to the SAME tier: bucket trunc is the identity, so this is
    # exactly the partial->final merge over the seam buckets
    return cascade(parts, tier)


def realtime_hist(
    job: RollupJob,
    spark: SparkSession,
    raw: DataFrame,
    tier: str = "1m",
    value_col: str = "n_tok",
) -> DataFrame:
    """The histogram plane's real-time view: committed ``hist`` maps
    merged (map addition) with a fresh build over the raw tail past the
    hist tier's own watermark. Same seam algebra as the hist cascade,
    so quantiles read from this view equal a full recompute."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    wm = _tier_watermark(job, "hist", tier)
    fresh_1m = hist_1m(_fresh_tail(raw, wm), value_col=value_col)
    fresh = fresh_1m if tier == "1m" else hist_cascade(
        fresh_1m if tier == "1h" else hist_cascade(fresh_1m, "1h"), tier
    )
    committed = job.hist_tables[tier].read(spark)
    if committed is None:
        return fresh
    parts = committed.select("source", "bucket_ts", "hist").unionByName(
        fresh.select("source", "bucket_ts", "hist")
    )
    return hist_cascade(parts, tier)


def realtime_dds(
    job: RollupJob,
    spark: SparkSession,
    raw: DataFrame,
    tier: str = "1m",
    alpha: float = 0.01,
    value_col: str = "n_tok",
) -> DataFrame:
    """Real-time DDSketch plane: committed sketch maps merged (count
    addition) with a fresh build over the raw tail. ``alpha`` must be
    the plane's build alpha — bucket keys are alpha-dependent and this
    read cannot detect a mismatch."""
    from ..operators.ddsketch import dds_bucket, dds_cascade

    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    wm = _tier_watermark(job, "dds", tier)
    fresh_1m = dds_bucket(_fresh_tail(raw, wm), alpha=alpha, value_col=value_col)
    fresh = fresh_1m if tier == "1m" else dds_cascade(
        fresh_1m if tier == "1h" else dds_cascade(fresh_1m, "1h"), tier
    )
    committed = job.dds_tables[tier].read(spark)
    if committed is None:
        return fresh
    parts = committed.select("source", "bucket_ts", "dds").unionByName(
        fresh.select("source", "bucket_ts", "dds")
    )
    return dds_cascade(parts, tier)


def realtime_cms(
    job: RollupJob,
    spark: SparkSession,
    raw: DataFrame,
    tier: str = "1m",
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Real-time Count-Min plane: cell addition over committed + fresh.
    ``width``/``depth`` must match the plane's build config (the
    cascade's stride widening protects against collisions but the
    estimates only carry the build's error bound)."""
    from ..operators.cms import cms_bucket, cms_cascade

    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    wm = _tier_watermark(job, "cms", tier)
    fresh_1m = cms_bucket(_fresh_tail(raw, wm), width=width, depth=depth)
    fresh = fresh_1m if tier == "1m" else cms_cascade(
        fresh_1m if tier == "1h" else cms_cascade(fresh_1m, "1h", width=width, depth=depth),
        tier, width=width, depth=depth,
    )
    committed = job.cms_tables[tier].read(spark)
    if committed is None:
        return fresh
    parts = committed.select("source", "bucket_ts", "cms").unionByName(
        fresh.select("source", "bucket_ts", "cms")
    )
    return cms_cascade(parts, tier, width=width, depth=depth)


def realtime_topk(
    job: RollupJob,
    spark: SparkSession,
    raw: DataFrame,
    tier: str = "1m",
    cap: int = 64,
) -> DataFrame:
    """Real-time heavy-hitter plane: counter addition + one re-compress
    over committed + fresh (the standard mergeable-summaries merge, so
    the est <= true <= est + hh_err bound still holds — the seam merge
    may add one more compression's worth of ``hh_err`` vs a batch
    rebuild, which the bound accounts for)."""
    from ..operators.heavyhitters import topk_bucket, topk_cascade

    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    wm = _tier_watermark(job, "topk", tier)
    fresh_1m = topk_bucket(_fresh_tail(raw, wm), cap=cap)
    fresh = fresh_1m if tier == "1m" else topk_cascade(
        fresh_1m if tier == "1h" else topk_cascade(fresh_1m, "1h", cap=cap),
        tier, cap=cap,
    )
    committed = job.topk_tables[tier].read(spark)
    if committed is None:
        return fresh
    parts = committed.select(
        "source", "bucket_ts", "hh", "hh_err", "hh_n"
    ).unionByName(fresh.select("source", "bucket_ts", "hh", "hh_err", "hh_n"))
    return topk_cascade(parts, tier, cap=cap)


def realtime_tw(
    job: RollupJob,
    spark: SparkSession,
    raw: DataFrame,
    tier: str = "1m",
    method: str = "locf",
    val_col: str = "n_tok",
) -> DataFrame:
    """Real-time time-weight plane. The seam is EXACT here too: the
    same-tier merge (cascade with identity bucket trunc, partials
    ordered by their own first point) re-adds the bridge segment from
    the committed partial's last reading to the fresh tail's first —
    precisely the raw segment that crossed the watermark. Replicates
    the job plane's per-instant ``max`` collapse so the view matches
    what a batch run would commit."""
    from ..operators.timeweight import time_weight_bucket, time_weight_cascade

    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    wm = _tier_watermark(job, "tw", tier)
    pts = (
        _fresh_tail(raw, wm)
        .groupBy("source", "event_ts")
        .agg(F.max(val_col).alias("_twv"))
    )
    fresh_1m = time_weight_bucket(pts, tier="1m", val_col="_twv", method=method)
    fresh = fresh_1m if tier == "1m" else time_weight_cascade(
        fresh_1m if tier == "1h" else time_weight_cascade(
            fresh_1m, "1h", method=method
        ),
        tier, from_tier="1h", method=method,
    )
    committed = job.tw_tables[tier].read(spark)
    if committed is None:
        return fresh
    parts = committed.select(
        "source", "bucket_ts", "first", "last", "area", "n"
    ).unionByName(fresh.select("source", "bucket_ts", "first", "last", "area", "n"))
    return time_weight_cascade(parts, tier, from_tier=tier, method=method)


def realtime_distinct(
    job: RollupJob,
    spark: SparkSession,
    raw: DataFrame,
    tier: str = "1m",
    col: str = "doc_id",
    lgk: int = 12,
) -> DataFrame:
    """Real-time HLL distinct plane: register-max union of committed and
    fresh sketches — union is overlap-correct, so even a value seen on
    both sides of the watermark counts once."""
    from ..operators.distinct import distinct_bucket, distinct_cascade

    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    wm = _tier_watermark(job, "distinct", tier)
    fresh_1m = distinct_bucket(_fresh_tail(raw, wm), col=col, tier="1m", lgk=lgk)
    fresh = fresh_1m if tier == "1m" else distinct_cascade(
        fresh_1m if tier == "1h" else distinct_cascade(fresh_1m, "1h"),
        tier, from_tier="1h",
    )
    committed = job.distinct_tables[tier].read(spark)
    if committed is None:
        return fresh
    parts = committed.select("source", "bucket_ts", "dsk").unionByName(
        fresh.select("source", "bucket_ts", "dsk")
    )
    return distinct_cascade(parts, tier, from_tier=tier)


def realtime_hb(
    job: RollupJob,
    spark: SparkSession,
    raw: DataFrame,
    tier: str = "1m",
    period_sec: float = 120.0,
) -> DataFrame:
    """Real-time heartbeat plane: island interval-union over committed +
    fresh — associative and order-free, so the seam (an island spanning
    the watermark) merges exactly."""
    from ..operators.stateagg import heartbeat_bucket, heartbeat_cascade

    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    wm = _tier_watermark(job, "hb", tier)
    fresh_1m = heartbeat_bucket(_fresh_tail(raw, wm), period_sec, tier="1m")
    fresh = fresh_1m if tier == "1m" else heartbeat_cascade(
        fresh_1m if tier == "1h" else heartbeat_cascade(fresh_1m, "1h"),
        tier, from_tier="1h",
    )
    committed = job.hb_tables[tier].read(spark)
    if committed is None:
        return fresh
    parts = committed.select(
        "source", "bucket_ts", "first_hb", "last_hb", "live", "n"
    ).unionByName(
        fresh.select("source", "bucket_ts", "first_hb", "last_hb", "live", "n")
    )
    return heartbeat_cascade(parts, tier, from_tier=tier)


def realtime_stats2(
    job: RollupJob,
    spark: SparkSession,
    raw: DataFrame,
    tier: str = "1m",
    y_col: str = "n_tok",
    x_col: str | None = None,
) -> DataFrame:
    """Real-time regression-moments plane: columnwise sum over committed
    + fresh (power sums are additive, so the seam bucket reconstructs
    exactly — the same merge the cascade uses). ``y_col``/``x_col``
    must match the plane's build config; moment sums carry no column
    identity and this read cannot detect a mismatch."""
    from ..operators.stats2d import SUMMARY_COLS, stats2_bucket, stats2_cascade

    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    wm = _tier_watermark(job, "stats2", tier)
    fresh_1m = stats2_bucket(_fresh_tail(raw, wm), y_col=y_col, x_col=x_col)
    fresh = fresh_1m if tier == "1m" else stats2_cascade(
        fresh_1m if tier == "1h" else stats2_cascade(fresh_1m, "1h"),
        tier, from_tier="1h",
    )
    committed = job.stats2_tables[tier].read(spark)
    if committed is None:
        return fresh
    parts = committed.select("source", "bucket_ts", *SUMMARY_COLS).unionByName(
        fresh.select("source", "bucket_ts", *SUMMARY_COLS)
    )
    return stats2_cascade(parts, tier, from_tier=tier)
