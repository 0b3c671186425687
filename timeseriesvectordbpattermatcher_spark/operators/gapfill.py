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

Everything is built-in expressions: ``sequence`` + ``explode`` for the gap
rows, window ``last ignorenulls``/``lead`` for the neighbors. No Python in
the row path.

Scale notes (round 3 rewrite): gap rows are generated directly from each
observed row's ``lead(bucket_ts)`` — ``sequence(ts, next_ts - step)`` —
instead of materializing a min-to-max spine and joining it back. That
removes two of the three shuffles the spine plan paid (the bounds
aggregation and the spine⋈rollup sort-merge join) and, more importantly at
100 TB, stops computing the upstream rollup TWICE (the spine's bounds and
the join probe were two consumers of the same un-cached aggregate). What
remains is ONE exchange on the key: every window here (asc running, desc
running, lead) shares the same ``partitionBy(key)`` so Catalyst reuses a
single Exchange with per-window sorts — bounded by bucket count, not raw
row count. All frames are RUNNING frames (unbounded-PRECEDING); Spark
evaluates unbounded-FOLLOWING frames O(n^2)-per-partition, so "next
observed" is a reverse-ordered running ``last`` (pinned by
tests/test_plans.py::test_gapfill_linear_uses_running_frames_only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}
# '1d' steps by a CALENDAR day, not 86400s: rollup buckets come from
# date_trunc('day') in session-local time, so a fixed-second spine would
# misalign with the bucket grid across DST transitions in any non-UTC
# session (23h/25h local days). Sub-day tiers are DST-safe in seconds.
_TIER_STEP = {"1m": "interval 60 seconds", "1h": "interval 3600 seconds",
              "1d": "interval 1 day"}


def bucket_spine(rollup: DataFrame, tier: str = "1m", key_col: str = "source") -> DataFrame:
    """One row per (key, bucket) from each key's min to max observed bucket."""
    step = F.expr(_TIER_STEP[tier])
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
    if method not in ("locf", "linear"):
        raise ValueError(f"unknown gap-fill method {method!r}")
    step_s = _TIER_SECONDS[tier]
    step = F.expr(f"interval {step_s} seconds")

    w = Window.partitionBy(key_col).orderBy("bucket_ts")
    w_prev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
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

    # Pre-explode neighbor state, one row per rollup row. is_filled (the
    # row-level synthesized marker) keys off value_cols[0]; fill ANCHORS are
    # per column — each column interpolates between ITS OWN nearest non-null
    # neighbors (ts included), so a null cell in one column neither borrows
    # another column's time anchors (numerically wrong frac) nor blocks its
    # own fill (a review counterexample caught both).
    ts_obs = {
        c: F.when(F.col(c).isNotNull(), F.col("bucket_ts").cast("double"))
        for c in value_cols
    }
    anchored = rollup.select(key_col, "bucket_ts", *value_cols).withColumn(
        "_nxt_bucket", F.lead("bucket_ts").over(w)
    )
    cols = {}
    for c in value_cols:
        cols[f"_prev_{c}"] = F.last(c, ignorenulls=True).over(w_prev)
        if method == "linear":
            cols[f"_prev_ts_{c}"] = F.last(ts_obs[c], ignorenulls=True).over(w_prev)
            cols[f"_next_{c}_at"] = F.last(c, ignorenulls=True).over(w_next)
            cols[f"_next_ts_{c}_at"] = F.last(ts_obs[c], ignorenulls=True).over(w_next)
    anchored = anchored.withColumns(cols)
    if method == "linear":
        leads = {f"_next_{c}": F.lead(f"_next_{c}_at").over(w) for c in value_cols}
        leads.update(
            {f"_next_ts_{c}": F.lead(f"_next_ts_{c}_at").over(w) for c in value_cols}
        )
        anchored = anchored.withColumns(leads)

    # Emit the anchor row plus one row per missing bucket strictly before the
    # next observed bucket. The last row per key emits only itself. The
    # greatest() clamp keeps sequence() boundaries legal when consecutive
    # buckets sit closer than one tier step (duplicate bucket rows, or a tier
    # coarser than the data's spacing) — such anchors emit only themselves
    # instead of aborting the job with IllegalArgumentException.
    gap_end = F.greatest(
        F.coalesce(F.col("_nxt_bucket") - step, F.col("bucket_ts")),
        F.col("bucket_ts"),
    )
    exploded = anchored.withColumn(
        "_b", F.explode(F.sequence(F.col("bucket_ts"), gap_end, step))
    )
    is_anchor = F.col("_b") == F.col("bucket_ts")
    obs = {c: F.when(is_anchor, F.col(c)) for c in value_cols}
    is_filled = obs[value_cols[0]].isNull()

    out_cols = [F.col(key_col), F.col("_b").alias("bucket_ts")]
    out_cols += [obs[c].alias(c) for c in value_cols]
    out_cols.append(is_filled.alias("is_filled"))
    for c in value_cols:
        prev_v = F.col(f"_prev_{c}")
        if method == "locf":
            out_cols.append(prev_v.alias(f"{c}_filled"))
        else:
            # for the anchor row itself the at-or-after neighbor is its own
            # desc-running value (which already skips the anchor when THIS
            # column is null); generated gap rows take the next anchor's
            # at-or-after state via the pre-computed lead
            next_v = F.when(is_anchor, F.col(f"_next_{c}_at")).otherwise(F.col(f"_next_{c}"))
            prev_ts = F.col(f"_prev_ts_{c}")
            next_ts = F.when(is_anchor, F.col(f"_next_ts_{c}_at")).otherwise(
                F.col(f"_next_ts_{c}")
            )
            frac = (F.col("_b").cast("double") - prev_ts) / (next_ts - prev_ts)
            # next_ts > prev_ts guard: duplicate-bucket anchors can collapse
            # both anchors onto one ts (frac 0/0 -> NaN); degrade to locf
            interp = F.when(next_ts > prev_ts, prev_v + (next_v - prev_v) * frac).otherwise(
                prev_v
            )
            out_cols.append(
                F.when(obs[c].isNotNull(), obs[c])  # observed cell -> keep
                .when(prev_v.isNull(), next_v)  # leading gap -> bfill
                .when(next_v.isNull(), prev_v)  # trailing gap -> ffill
                .otherwise(interp)
                .alias(f"{c}_filled")
            )
    return exploded.select(*out_cols)
