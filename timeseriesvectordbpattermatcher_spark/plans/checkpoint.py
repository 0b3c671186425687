"""Resumable, audited rollup job: snapshot-checkpointed tier cascade.

Orchestrates raw -> 1m -> 1h -> 1d into three SnapshotTables with
idempotent partition overwrites, per-tier checkpoints, and audit rows —
the E1 lifecycle of SURVEY.md §3 restated for the north star:

    scan seqs -> derive event_ts -> rollup affected (source, day)
    partitions -> commit snapshot(1m) -> cascade 1h -> commit -> 1d -> commit
    -> audit append per tier

Resume + incrementality:
- The 1m tier checkpoints a raw-input **watermark** (max event_ts fully
  processed); a rerun recomputes only days carrying rows past it. Late rows
  behind the watermark are handled by re-running with ``full_refresh=True``
  (or feeding input through its own snapshot log — out of v1 scope).
- The 1h/1d tiers are **snapshot-incremental**: each checkpoints the
  upstream snapshot version it last consumed (``meta.upstream_version``) and
  recomputes exactly the partitions the upstream rewrote since
  (``Snapshot.changed_partitions``). This is the Iceberg
  incremental-read pattern; late data that rewrites an old 1m partition
  automatically propagates to 1h/1d on the next run.
- Overwrites are partition-granular and deterministic, so a crash between
  commits (test hook ``fail_after``) re-converges to the single-run state
  on rerun (FIXTURES.md F5 invariant 5).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup import cascade, rollup_1m
from ..plans.audit import AuditLog
from ..sources.snapshot_table import SnapshotTable

TIERS = ("1m", "1h", "1d")


class RollupJob:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        self.tables = {t: SnapshotTable(os.path.join(base_dir, f"rollup_{t}")) for t in TIERS}
        # the quantile-histogram plane (operators/quantiles.py): a parallel
        # tier set holding the mergeable exact n_tok histograms, cascaded
        # with the SAME watermark / snapshot-incremental / resume semantics
        # as the stats tiers. Empty (and costless) unless run(...,
        # quantile_hist=True) populates it.
        self.hist_tables = {t: SnapshotTable(os.path.join(base_dir, f"hist_{t}")) for t in TIERS}
        self.audit = AuditLog(os.path.join(base_dir, "audit"))

    def _commit_tier(
        self,
        spark: SparkSession,
        tier: str,
        df: DataFrame,
        watermark: str | None,
        run_id: str,
        t0: float,
        meta: dict | None = None,
        target_file_rows: int | None = None,
        plane: str = "rollup",
    ):
        table = (self.tables if plane == "rollup" else self.hist_tables)[tier]
        snap = table.overwrite_partitions(
            df.withColumn("bucket_day", F.to_date("bucket_ts")),
            ["source", "bucket_day"],
            run_id=run_id,
            watermark=watermark,
            meta=meta,
            # per-file bucket_ts min/max (read from footers the inventory
            # already opens) -> read_range() skips files by time, and fat
            # partitions fan out RANGE-clustered so intra-day skipping bites
            stats_cols=["bucket_ts"],
            cluster_by=["bucket_ts"] if target_file_rows else None,
            target_file_rows=target_file_rows,
        )
        self.audit.append(
            spark,
            run_id=run_id,
            stage=f"{plane}_{tier}",
            partition_rows={
                pk: p.get("rows", 0)
                for pk, p in snap.partitions.items()
                if p.get("v") == snap.version  # only partitions THIS run wrote
            },
            partition_bytes={
                pk: p.get("bytes", 0)
                for pk, p in snap.partitions.items()
                if p.get("v") == snap.version
            },
            wall_ms=(time.time() - t0) * 1000.0,
            snapshot_version=snap.version,
        )
        return snap

    def run(
        self,
        spark: SparkSession,
        seqs_ts: DataFrame,
        run_id: str | None = None,
        fail_after: str | None = None,
        full_refresh: bool = False,
        salt_buckets: int | None = None,
        token_engine: str = "expr",
        target_file_rows: int | None = None,
        quantile_hist: bool = False,
    ) -> dict[str, DataFrame | None]:
        """Incremental run. ``seqs_ts`` must carry event_ts (derive_event_ts).
        ``salt_buckets`` enables the two-phase salted 1m aggregation for
        hot-key skew (north rule) — merge tiers are already small.
        ``token_engine`` selects the token-stat engine (see
        rollup.add_token_stats) — expr measured fastest on this host.
        ``target_file_rows`` fans fat 1m partitions out range-clustered on
        ``bucket_ts`` (parallel write + per-file time stats that make
        :meth:`read_range` skip files inside a day).
        ``quantile_hist`` also maintains the exact mergeable n_tok histogram
        tiers (``hist_tables``, operators/quantiles.py) with their own
        watermarks — a crash between the stats and hist 1m commits resumes
        exactly, and enabling it on an existing job backfills nothing by
        itself (run once with ``full_refresh=True`` to catch the hist plane
        up over history)."""
        run_id = run_id or uuid.uuid4().hex[:12]
        t0 = time.time()
        snap_1m = self.tables["1m"].current_snapshot()
        wm_1m = None if (full_refresh or snap_1m is None) else snap_1m.watermark
        hsnap_1m = self.hist_tables["1m"].current_snapshot() if quantile_hist else None
        wm_h1m = None if (full_refresh or hsnap_1m is None) else hsnap_1m.watermark

        def _beyond(wm):
            return F.col("event_ts") > F.lit(wm) if wm else F.col("event_ts").isNotNull()

        # ONE raw scan computes the new watermark and the affected-day set
        # for EVERY enabled plane (each plane gates on its own watermark, so
        # a crash between plane commits resumes without gaps); the day sets
        # are calendar-bounded, so the collect_sets stay tiny. Rows with
        # null event_ts (unparseable doc_id) drop out of all aggregates.
        aggs = [
            F.max("event_ts").alias("wm"),
            F.collect_set(F.when(_beyond(wm_1m), F.to_date("event_ts"))).alias("days"),
        ]
        if quantile_hist:
            aggs.append(
                F.collect_set(F.when(_beyond(wm_h1m), F.to_date("event_ts"))).alias("hdays")
            )
        head = seqs_ts.agg(*aggs).first()
        new_wm = head["wm"]
        if new_wm is not None:
            wm_str = new_wm.isoformat()

            # ---- tier 1m: recompute affected (source, day) partitions from raw
            if wm_1m is None or wm_str > wm_1m:
                days = sorted(d.isoformat() for d in head["days"])
                if days:
                    affected_raw = seqs_ts.filter(F.to_date("event_ts").isin(days))
                    self._commit_tier(
                        spark,
                        "1m",
                        rollup_1m(affected_raw, salt_buckets=salt_buckets, token_engine=token_engine),
                        wm_str,
                        run_id,
                        t0,
                        target_file_rows=target_file_rows,
                    )
                    if fail_after == "1m":
                        raise RuntimeError("injected failure after 1m commit")
            if quantile_hist and (wm_h1m is None or wm_str > wm_h1m):
                hdays = sorted(d.isoformat() for d in head["hdays"])
                if hdays:
                    from ..operators.quantiles import hist_1m

                    h_raw = seqs_ts.filter(F.to_date("event_ts").isin(hdays))
                    self._commit_tier(
                        spark,
                        "1m",
                        hist_1m(h_raw),
                        wm_str,
                        run_id,
                        t0,
                        target_file_rows=target_file_rows,
                        plane="hist",
                    )
                    if fail_after == "hist_1m":
                        raise RuntimeError("injected failure after hist_1m commit")

        # ---- tiers 1h, 1d: snapshot-incremental cascade
        self.run_cascade(spark, run_id=run_id, full_refresh=full_refresh,
                         fail_after=fail_after, quantile_hist=quantile_hist)

        return {t: self.tables[t].read(spark) for t in TIERS}

    def read_range(self, spark: SparkSession, tier: str, lo=None, hi=None):
        """Time-range probe over a tier with manifest-stats file skipping:
        only data files whose per-file ``bucket_ts`` [min, max] (recorded at
        commit) can intersect ``[lo, hi]`` are opened, then the exact range
        filter is applied. At 10^12 rows a dashboard's "last 6 hours of one
        day" probe opens the few range-clustered files of that slice, not
        every file of every day. ``lo``/``hi`` are datetimes (None =
        unbounded). None when the tier is empty or nothing can match."""
        out = self.tables[tier].read_where(spark, {"bucket_ts": (lo, hi)})
        return out.drop("bucket_day") if out is not None else None

    def run_cascade(
        self,
        spark: SparkSession,
        run_id: str | None = None,
        full_refresh: bool = False,
        fail_after: str | None = None,
        quantile_hist: bool = False,
    ) -> None:
        """Cascade the 1h/1d tiers from whatever the 1m snapshot table
        currently holds — shared by batch runs (``run``) and by streaming
        ingestion, where micro-batches commit the 1m tier through
        ``streaming.rollup_stream.snapshot_sink`` and this method then
        roll-ups exactly as if the 1m partitions had been batch-written.
        ``quantile_hist`` cascades the histogram plane too (exact merge —
        the coarser histogram is the SUM of the finer ones, never a raw
        rescan)."""
        run_id = run_id or uuid.uuid4().hex[:12]
        planes: list[tuple[str, dict, object]] = [("rollup", self.tables, cascade)]
        if quantile_hist:
            from ..operators.quantiles import hist_cascade

            planes.append(("hist", self.hist_tables, hist_cascade))
        for tier, src_tier in (("1h", "1m"), ("1d", "1h")):
            t0 = time.time()
            for plane, tables, cascade_fn in planes:
                src_snap = tables[src_tier].current_snapshot()
                if src_snap is None:
                    continue
                snap = tables[tier].current_snapshot()
                last_sync = 0 if (full_refresh or snap is None or not snap.meta) else int(
                    snap.meta.get("upstream_version", 0)
                )
                changed = src_snap.changed_partitions(last_sync)
                if not changed:
                    continue
                # manifest-pruned read of EXACTLY the changed (source, day)
                # partitions: a tier's (source, day) output depends only on
                # the same (source, day) upstream, so this is complete AND
                # minimal. (The previous day-level filter recomputed every
                # source sharing a changed day — harmless content-wise, but
                # each rewrite bumped those partitions' versions and the
                # NEXT tier then saw them as changed too: write
                # amplification across sources that compounds down the
                # cascade at 10^12 scale.)
                affected = tables[src_tier].read_partitions(spark, changed)
                affected = affected.drop("bucket_day")
                out = cascade_fn(affected, tier)
                self._commit_tier(
                    spark,
                    tier,
                    out,
                    src_snap.watermark,
                    run_id,
                    t0,
                    meta={"upstream_version": src_snap.version},
                    plane=plane,
                )
            if fail_after == tier:
                raise RuntimeError(f"injected failure after {tier} commit")
