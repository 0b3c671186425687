"""Gap-fill for rollup tables: calendar spine + locf + linear interpolation.

The reference's only gap handling is pandas ``ffill``/``bfill``
(/root/reference/katslib/opkatsDataUtil.py:262,
/root/reference/patternReviewUtil.py:183-185 — port-column + bfill + ffill).
The north star upgrades that to per-(source) bucket-spine gap-fill with two
policies:

- **locf** (last observation carried forward) — exactly the reference's
  ``ffill`` semantics, expressed as ``last(x, ignorenulls=True)`` over an
  unbounded-preceding window.
- **linear** — time-weighted blend between the previous and next observed
  values; leading/trailing gaps fall back to the nearest observed value
  (matching the reference's bfill-then-ffill composite at
  /root/reference/patternReviewUtil.py:183-184).

Everything is built-in expressions: ``sequence`` + ``explode`` for the spine,
window ``last/first ignorenulls`` for the neighbors. No Python in the row
path.

Scale notes: the spine explodes one row per (source, bucket) — at the 1m tier
over a year that's ~525k buckets/source, trivially small next to the raw
data. The join back to the rollup is an equi-join on (source, bucket_ts);
both sides are already aggregated, so this never touches raw sequences. The
two window passes (preceding/following) sort within (source) partitions —
bounded by bucket count, not row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def bucket_spine(rollup: DataFrame, tier: str = "1m", key_col: str = "source") -> DataFrame:
    """One row per (key, bucket) from each key's min to max observed bucket."""
    step = F.expr(f"interval {_TIER_SECONDS[tier]} seconds")
    bounds = rollup.groupBy(key_col).agg(
        F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi")
    )
    return bounds.select(
        key_col,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("bucket_ts"),
    )


def gap_fill(
    rollup: DataFrame,
    value_cols: list[str],
    tier: str = "1m",
    key_col: str = "source",
    method: str = "locf",
) -> DataFrame:
    """Fill missing (key, bucket) rows of a rollup table.

    Returns the spine with, per value column ``c``:
      - ``c`` — observed value (null on filled rows),
      - ``c_filled`` — gap-filled value per ``method`` ('locf' | 'linear'),
    plus ``is_filled`` marking synthesized rows.
    """
    spine = bucket_spine(rollup, tier=tier, key_col=key_col)
    joined = spine.join(
        rollup.select(key_col, "bucket_ts", *value_cols), [key_col, "bucket_ts"], "left"
    ).withColumn("is_filled", F.col(value_cols[0]).isNull())

    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next observed" via a reverse-ordered RUNNING frame: Spark evaluates
    # (currentRow, unboundedFollowing) frames by rescanning the remainder per
    # row — O(n^2) per partition — while a running unbounded-preceding frame
    # is a single O(n) pass. last(...) over desc order == first(...) over
    # the following frame.
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(F.desc("bucket_ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    out = joined
    ts_obs = F.when(~F.col("is_filled"), F.col("bucket_ts").cast("double"))
    prev_ts = F.last(ts_obs, ignorenulls=True).over(w_prev)
    next_ts = F.last(ts_obs, ignorenulls=True).over(w_next)
    for c in value_cols:
        prev_v = F.last(c, ignorenulls=True).over(w_prev)
        if method == "locf":
            out = out.withColumn(f"{c}_filled", prev_v)
        elif method == "linear":
            next_v = F.last(c, ignorenulls=True).over(w_next)
            frac = (F.col("bucket_ts").cast("double") - prev_ts) / (next_ts - prev_ts)
            interp = prev_v + (next_v - prev_v) * frac
            out = out.withColumn(
                f"{c}_filled",
                F.when(~F.col("is_filled"), F.col(c))
                .when(prev_v.isNull(), next_v)  # leading gap -> bfill
                .when(next_v.isNull(), prev_v)  # trailing gap -> ffill
                .otherwise(interp),
            )
        else:
            raise ValueError(f"unknown gap-fill method {method!r}")
    return out
