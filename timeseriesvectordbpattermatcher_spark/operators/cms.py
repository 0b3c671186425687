"""Tiered per-token frequency via mergeable Count-Min sketches.

The rollup planes answer "how many tokens" (stats), "how are lengths
distributed" (histogram/DDSketch), "how many distinct docs" (HLL) — but
not "how often did TOKEN t appear in this bucket". Exact per-token counts
per (source, bucket) are a buckets x vocab blow-up (50k-entry maps per
minute bucket at 10^12 rows); the classic fix is the Count-Min sketch
(Cormode & Muthukrishnan, J. Algorithms 2005): a d x w counter grid where
each occurrence increments one counter per hash row, point estimates read
``min_j grid[j][h_j(t)]``, guaranteeing

    exact <= estimate <= exact + (e/w) * N   with prob >= 1 - e^(-d)

(N = the bucket's total token occurrences). CMS grids merge by
element-wise ADDITION — fully mergeable, so the 1m -> 1h -> 1d cascade is
bit-exact vs a direct build and the error bound at every tier is the
bound for that tier's own N. No other plane needs rescanning raw to
answer per-token questions at day granularity.

Representation: the grid is stored SPARSE as ``map<int,bigint>`` of
non-zero cells keyed ``j*width + h_j(token)`` — most minute buckets touch
far fewer than d*w distinct cells, sparse maps merge with the exact
histogram machinery verbatim (count addition), and the dense bound d*w
caps every bucket's summary regardless of corpus size.

Hashing: row j's hash is ``xxhash64(token AS LONG, j)`` (Spark's builtin
64-bit xxHash chain) reduced mod width — d=depth independent functions by
seeding with the row index. The engine-free oracle in
tests/oracle/xxh64_pure.py reproduces this chain from the public xxHash
spec, so the sketch tests pin map equality against an implementation that
imports nothing from the engine.

Everything is codegen'd expressions — explode + two hash-bounded
aggregations to build (same two-Exchange shape as the exact histogram
plane; map-side partial aggregation absorbs the d-way cell fan-out, so
the build shuffle carries at most buckets x d x width rows no matter the
corpus), map addition to merge, a least()-of-lookups expression to read.
Zero UDFs, zero Python in the row path.

The reference repo has no frequency sketches (its token work is
full-materialization pandas); this plane exists for the north star's
"token-level stats" at cascading retention tiers.
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quantiles import hist_cascade
from .rollup import TIER_TRUNC

__all__ = [
    "cms_error_bound",
    "cms_cell_keys",
    "cms_bucket",
    "cms_cascade",
    "cms_estimate",
    "cms_n",
    "cms_estimates_for",
]


def _check_dims(width: int, depth: int) -> None:
    if not (isinstance(width, int) and width >= 2):
        raise ValueError(f"width must be an int >= 2, got {width!r}")
    if not (isinstance(depth, int) and 1 <= depth <= 16):
        raise ValueError(f"depth must be an int in [1, 16], got {depth!r}")


def cms_error_bound(width: int, depth: int) -> tuple[float, float]:
    """(epsilon, delta): estimate <= exact + epsilon*N with prob >= 1-delta."""
    _check_dims(width, depth)
    return math.e / width, math.exp(-depth)


def cms_cell_keys(token: Column, width: int, depth: int) -> Column:
    """The d sparse-map keys a token occurrence increments:
    ``j*width + pmod(xxhash64(token::long, j), width)`` for each hash row
    j. NULL token -> NULL (callers exclude it from the sketch)."""
    _check_dims(width, depth)
    t = token.cast("long")
    return F.when(
        t.isNotNull(),
        F.array(
            *[
                (
                    F.lit(j * width)
                    + F.pmod(F.xxhash64(t, F.lit(j)), F.lit(width))
                ).cast("int")
                for j in range(depth)
            ]
        ),
    )


def cms_bucket(
    rows: DataFrame,
    tier: str = "1m",
    width: int = 2048,
    depth: int = 4,
    key_col: str = "source",
    ts_col: str = "event_ts",
    tokens_col: str = "tokens",
    sketch_col: str = "cms",
) -> DataFrame:
    """Per-(key, bucket) CMS over every token occurrence in ``tokens_col``
    (array column; duplicate tokens in one row count once each, matching
    total-occurrence semantics). Null ts rows are dropped (no bucket);
    null/empty token arrays and null elements don't update the sketch —
    a bucket whose rows carry no tokens keeps an empty map, it does not
    vanish."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    _check_dims(width, depth)
    tok = (
        rows.filter(F.col(ts_col).isNotNull())
        .withColumn("bucket_ts", F.date_trunc(TIER_TRUNC[tier], F.col(ts_col)))
        .select(
            key_col, "bucket_ts", F.explode_outer(tokens_col).alias("_t")
        )
    )
    cells = tok.select(
        key_col,
        "bucket_ts",
        F.explode_outer(cms_cell_keys(F.col("_t"), width, depth)).alias("_hv"),
    )
    per_cell = cells.groupBy(key_col, "bucket_ts", "_hv").agg(
        F.count("_hv").alias("_hc")  # count() skips the null keep-alive rows
    )
    return per_cell.groupBy(key_col, "bucket_ts").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_hv").isNotNull(), F.struct("_hv", "_hc"))
                )
            )
        ).alias(sketch_col)
    )


def cms_cascade(
    sketches: DataFrame,
    tier: str,
    key_col: str = "source",
    sketch_col: str = "cms",
) -> DataFrame:
    """Merge fine-tier sketches one tier coarser — cell-count addition, so
    a cascaded tier is BIT-EXACT vs building that tier from raw and its
    error bound is the CMS bound for the coarser bucket's own N."""
    return hist_cascade(sketches, tier, key_col=key_col, hist_col=sketch_col)


def cms_estimate(
    sketch: Column | str,
    token: Column | int,
    width: int = 2048,
    depth: int = 4,
) -> Column:
    """Point-estimate expression: ``min_j`` of the token's d cells (absent
    sparse cell = 0). Always >= the true occurrence count; exceeds it by
    more than ``(e/width) * N`` with probability <= ``e^-depth``."""
    _check_dims(width, depth)
    sk = F.col(sketch) if isinstance(sketch, str) else sketch
    tok = F.lit(token) if isinstance(token, int) else token
    keys = cms_cell_keys(tok, width, depth)
    reads = [
        F.coalesce(
            F.element_at(sk, F.element_at(keys, j + 1)), F.lit(0).cast("bigint")
        )
        for j in range(depth)
    ]
    est = reads[0] if depth == 1 else F.least(*reads)
    return F.when(tok.isNotNull(), est)


def cms_n(sketch: Column | str, width: int) -> Column:
    """Total token occurrences the sketch saw: every hash row sums to N,
    so fold row 0's cells (keys < width). This is the N in the error
    bound and doubles as a cross-check against the stats plane's
    ``sum_n_tok``."""
    sk = F.col(sketch) if isinstance(sketch, str) else sketch
    row0 = F.filter(F.map_entries(sk), lambda e: e["key"] < F.lit(width))
    return F.aggregate(
        row0, F.lit(0).cast("bigint"), lambda acc, e: acc + e["value"]
    )


def cms_estimates_for(
    sketches: DataFrame,
    tokens: Iterable[int],
    width: int = 2048,
    depth: int = 4,
    sketch_col: str = "cms",
) -> DataFrame:
    """Convenience reader: one ``tok_<t>`` estimate column per candidate
    token (candidate lists come from a sample or a vocab table — CMS
    answers point queries, it cannot enumerate its own heavy hitters)."""
    out = sketches
    for t in tokens:
        out = out.withColumn(
            f"tok_{t}", cms_estimate(sketch_col, int(t), width, depth)
        )
    return out
