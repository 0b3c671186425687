"""Tiered APPROXIMATE quantiles for unbounded/float domains via mergeable
DDSketch-style log-bucketed histograms (relative-error guarantee alpha).

operators/quantiles.py gives EXACT tiered quantiles when the value domain
is bounded integers (n_tok, token ids) — the right tool for the native
token table. This module covers the domain that histogram cannot: floats
and unbounded ranges (inter-arrival gaps, rates, latencies, scores),
where per-value exact counting would make tier size corpus-dependent.

Design follows the published DDSketch paper (Masson, Rim, Lee — "DDSketch:
a fast and fully-mergeable quantile sketch with relative-error
guarantees", VLDB 2019): values map to geometric buckets
``i = ceil(log_gamma(x))`` with ``gamma = (1+alpha)/(1-alpha)``; any value
in bucket i is reported as the bucket midpoint ``2*gamma^i/(gamma+1)``,
which is within relative error alpha of the true value. Bucket maps merge
by count addition — fully mergeable, so the 1m -> 1h -> 1d cascade is
bit-exact against a direct build at any tier (same guarantee the exact
histogram plane has; only the DECODED read carries the alpha error, and
that error does not grow with merging).

Unlike the paper's bounded-memory variant this implementation never
collapses buckets: the bucket count is bounded by the value DYNAMIC RANGE
(<= ~log_gamma(DBL_MAX) - log_gamma(DBL_MIN) ~ 71k keys at alpha=0.01,
in practice a few hundred for real metrics), not by rows — acceptable for
tier tables bounded by buckets x range, and it keeps the alpha guarantee
unconditional (collapsed DDSketch loses it on the collapsed tail).

Sign handling (paper section 2.3): separate positive and negative stores
plus a zero bucket, encoded here into ONE int key whose integer order
equals value order, so the generic sorted-map quantile walk
(quantiles.add_hist_quantiles) applies unchanged:

    x < 0 : key = -OFFSET - ceil(log_gamma(-x))
    x = 0 : key = 0
    x > 0 : key = +OFFSET + ceil(log_gamma(x))

with OFFSET = 2^30 (indices are bounded by ~710/ln(gamma), far below
OFFSET for any alpha >= 1e-4, so the three ranges never overlap).

Everything is codegen'd expressions — the index is ln()/ceil arithmetic,
the map build/merge reuses the exact-histogram machinery, the decode is
pow() — zero UDFs, zero Python in the row path. The reference repo has no
sketch aggregation at all (its quantile uses are full-materialization
pandas, e.g. /root/reference/patternTraderUtil.py rolling quantiles);
this plane exists for the north star's 10^12-row retention tiers.

Scale shape: identical to the exact histogram plane — the build shuffle
carries (keys, bucket_index, partial_count) rows bounded by
buckets x dynamic-range with map-side combine; cascades explode tier maps
(corpus-size independent) and re-add.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quantiles import add_hist_quantiles, hist_cascade, hist_rollup
from .rollup import TIER_TRUNC

__all__ = [
    "dds_gamma",
    "dds_index",
    "dds_decode",
    "dds_bucket",
    "dds_cascade",
    "dds_quantiles",
    "dds_rolling_quantiles",
    "dds_cascade_width",
]

#: separates the negative / zero / positive key ranges; indices are
#: bounded by ln(DBL_MAX)/ln(gamma) ~ 710/ln(gamma) << 2^30 for alpha>=1e-4
_OFFSET = 1 << 30


def dds_gamma(alpha: float) -> float:
    """gamma = (1+alpha)/(1-alpha); bucket i covers (gamma^(i-1), gamma^i]."""
    if not 1e-4 <= alpha < 1.0:
        raise ValueError(f"alpha must be in [1e-4, 1), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


def dds_index(value: Column, alpha: float) -> Column:
    """Order-preserving encoded bucket key (int) for ``value``; NULL stays
    NULL (excluded from sketches). NaN/Inf must be guarded upstream —
    they would ceil to NULL/overflow; the bucket builder drops them."""
    lg = math.log(dds_gamma(alpha))
    mag = F.ceil(F.log(F.abs(value)) / F.lit(lg)).cast("int")
    return (
        F.when(value > 0, F.lit(_OFFSET) + mag)
        .when(value < 0, F.lit(-_OFFSET) - mag)
        .when(value == 0, F.lit(0))
        .cast("int")
    )


def dds_decode(key: Column, alpha: float) -> Column:
    """Bucket midpoint for an encoded key: the value DDSketch reports for
    anything that landed in that bucket — within relative error alpha of
    the original (midpoint of (gamma^(i-1), gamma^i] in ratio space)."""
    g = dds_gamma(alpha)
    scale = 2.0 * g / (g + 1.0)  # midpoint = gamma^i * 2/(gamma+1)
    pos = F.lit(scale) * F.pow(F.lit(g), (key - F.lit(_OFFSET)).cast("double") - 1.0)
    neg = -F.lit(scale) * F.pow(F.lit(g), (-key - F.lit(_OFFSET)).cast("double") - 1.0)
    return (
        F.when(key == 0, F.lit(0.0))
        .when(key > 0, pos)
        .otherwise(neg)
    )


def dds_bucket(
    rows: DataFrame,
    alpha: float = 0.01,
    value_col: str = "n_tok",
    tier: str = "1m",
    key_col: str = "source",
    ts_col: str = "event_ts",
    sketch_col: str = "dds",
) -> DataFrame:
    """Per-(key, bucket) DDSketch as ``map<int,bigint>`` over ``value_col``.
    Null ts rows are dropped (no bucket); null/NaN/Inf values don't update
    the sketch (no finite bucket exists for them) — an all-null bucket
    keeps an empty map, it does not vanish. Reuses the exact-histogram
    builder with the log-gamma index as the quantizer."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    v = F.col(value_col).cast("double")
    finite = F.when(~F.isnan(v) & (F.abs(v) != float("inf")), v)
    keyed = rows.filter(F.col(ts_col).isNotNull()).withColumn(
        "bucket_ts", F.date_trunc(TIER_TRUNC[tier], F.col(ts_col))
    )
    return hist_rollup(
        keyed,
        [key_col, "bucket_ts"],
        value_col,
        bucket=dds_index(finite, alpha),
        hist_col=sketch_col,
    )


def dds_cascade(
    sketches: DataFrame,
    tier: str,
    key_col: str = "source",
    sketch_col: str = "dds",
) -> DataFrame:
    """Merge fine-tier sketches one tier coarser — count addition, so a
    cascaded tier is BIT-EXACT vs building that tier from raw (alpha error
    enters only at decode, never grows with merging)."""
    return hist_cascade(sketches, tier, key_col=key_col, hist_col=sketch_col)


def dds_quantiles(
    sketches: DataFrame,
    alpha: float = 0.01,
    qs: dict[str, float] | None = None,
    sketch_col: str = "dds",
    keys: list[str] | None = None,
) -> DataFrame:
    """Read accessor: named quantile VALUE columns (default p50/p95/p99),
    each within relative error alpha of the exact quantile over the rows
    the sketch saw, plus ``dds_n`` (total count). Same physical form as
    the exact plane's reader: explode + one window cumsum (codegen'd),
    then decode the winning bucket key to its midpoint."""
    qs = qs or {"p50": 0.50, "p95": 0.95, "p99": 0.99}
    out = add_hist_quantiles(sketches, qs=qs, hist_col=sketch_col, keys=keys)
    out = out.withColumnRenamed("hist_n", "dds_n")
    for name in qs:
        out = out.withColumn(name, dds_decode(F.col(name), alpha))
    return out


def dds_rolling_quantiles(
    sketches: DataFrame,
    window_buckets: int,
    tier: str,
    alpha: float = 0.01,
    qs: dict[str, float] | None = None,
    key_col: str = "source",
    sketch_col: str = "dds",
    min_buckets: int | None = None,
) -> DataFrame:
    """Rolling approximate quantiles over the TRAILING ``window_buckets``
    calendar slots of a DDSketch tier — "p99 latency of the last 24
    hourly buckets" read from tier summaries, never raw. Merging is
    count addition (exact), so each read carries the same relative-error
    guarantee ``alpha`` as a single-bucket read; ``alpha`` must match
    the plane's build alpha (bucket keys are alpha-dependent and this
    read cannot detect a mismatch). Same calendar-range window, warm-up
    (``min_buckets``), and ``win_buckets`` semantics as
    :func:`~.quantiles.hist_rolling_quantiles`, which does the walking;
    this wrapper decodes the winning keys to bucket midpoints."""
    from .quantiles import hist_rolling_quantiles

    qs = qs or {"p50": 0.50, "p95": 0.95, "p99": 0.99}
    out = hist_rolling_quantiles(
        sketches, window_buckets, tier, qs=qs,
        key_col=key_col, hist_col=sketch_col, min_buckets=min_buckets,
    ).withColumnRenamed("hist_n", "dds_n")
    for name in qs:
        out = out.withColumn(name, dds_decode(F.col(name), alpha))
    return out


def dds_cascade_width(
    sketches: DataFrame,
    width_sec: int,
    key_col: str = "source",
    sketch_col: str = "dds",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Merge a DDSketch tier into ARBITRARY fixed-width buckets
    (``time_bucket`` semantics) — approx quantiles per 15 minutes from
    the 1m tier, same exact count-addition merge as :func:`dds_cascade`;
    the alpha guarantee is untouched (error enters at decode only).
    Source-width/alignment contract as :func:`~.rollup.cascade_width`."""
    from .quantiles import hist_cascade_width

    return hist_cascade_width(
        sketches, width_sec, key_col=key_col, hist_col=sketch_col, origin=origin
    )
