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
        # parallel tier PLANES, each cascaded with the SAME watermark /
        # snapshot-incremental / resume semantics as the stats tiers and
        # empty (and costless) unless its run(...) flag populates it:
        # - hist: mergeable exact n_tok histograms (operators/quantiles.py)
        # - tw: mergeable time-weight summaries (operators/timeweight.py)
        # - distinct: mergeable HLL distinct sketches (operators/distinct.py)
        self.hist_tables = {t: SnapshotTable(os.path.join(base_dir, f"hist_{t}")) for t in TIERS}
        self.tw_tables = {t: SnapshotTable(os.path.join(base_dir, f"tw_{t}")) for t in TIERS}
        self.distinct_tables = {
            t: SnapshotTable(os.path.join(base_dir, f"distinct_{t}")) for t in TIERS
        }
        # - hb: mergeable heartbeat liveness islands (operators/stateagg.py)
        self.hb_tables = {t: SnapshotTable(os.path.join(base_dir, f"hb_{t}")) for t in TIERS}
        # - dds: mergeable DDSketch approx-quantiles (operators/ddsketch.py)
        self.dds_tables = {t: SnapshotTable(os.path.join(base_dir, f"dds_{t}")) for t in TIERS}
        # - cms: mergeable Count-Min token-frequency sketches (operators/cms.py)
        self.cms_tables = {t: SnapshotTable(os.path.join(base_dir, f"cms_{t}")) for t in TIERS}
        # - topk: mergeable Misra-Gries heavy-hitter token summaries
        #   (operators/heavyhitters.py)
        self.topk_tables = {
            t: SnapshotTable(os.path.join(base_dir, f"topk_{t}")) for t in TIERS
        }
        # - stats2: mergeable 1-D/2-D regression moment sums
        #   (operators/stats2d.py)
        self.stats2_tables = {
            t: SnapshotTable(os.path.join(base_dir, f"stats2_{t}")) for t in TIERS
        }
        self._plane_tables = {
            "rollup": self.tables,
            "hist": self.hist_tables,
            "tw": self.tw_tables,
            "distinct": self.distinct_tables,
            "hb": self.hb_tables,
            "dds": self.dds_tables,
            "cms": self.cms_tables,
            "topk": self.topk_tables,
            "stats2": self.stats2_tables,
        }
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
        table = self._plane_tables[plane][tier]
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

    @staticmethod
    def _plane_builders(
        salt_buckets=None,
        token_engine="expr",
        quantile_hist=False,
        time_weight=False,
        tw_method="locf",
        tw_val_col="n_tok",
        distinct=False,
        distinct_col="doc_id",
        distinct_lgk=12,
        heartbeat=False,
        hb_period_sec=120.0,
        dds=False,
        dds_col="n_tok",
        dds_alpha=0.01,
        cms=False,
        cms_width=2048,
        cms_depth=4,
        topk=False,
        topk_cap=64,
        stats2=False,
        stats2_y="n_tok",
        stats2_x=None,
    ) -> list:
        """(plane, build_1m(affected_raw) -> df) for every enabled plane —
        order fixed so fail_after hooks stay deterministic. Shared by the
        event-time-watermark path (:meth:`run`) and the input-snapshot-
        incremental path (:meth:`run_from_snapshot`)."""

        def _build_rollup(raw):
            return rollup_1m(raw, salt_buckets=salt_buckets, token_engine=token_engine)

        def _build_hist(raw):
            from ..operators.quantiles import hist_1m

            return hist_1m(raw)

        def _build_tw(raw):
            from ..operators.timeweight import time_weight_bucket

            # the raw table has many rows per (source, second); collapse to
            # the per-instant max first — time_weight's input contract is
            # one point per (key, ts), and max keeps the int exactness the
            # cascade's bitwise pins rely on
            pts = raw.groupBy("source", "event_ts").agg(
                F.max(tw_val_col).alias("_twv")
            )
            return time_weight_bucket(pts, tier="1m", val_col="_twv", method=tw_method)

        def _build_distinct(raw):
            from ..operators.distinct import distinct_bucket

            return distinct_bucket(raw, col=distinct_col, tier="1m", lgk=distinct_lgk)

        def _build_hb(raw):
            from ..operators.stateagg import heartbeat_bucket

            return heartbeat_bucket(raw, hb_period_sec, tier="1m")

        def _build_dds(raw):
            from ..operators.ddsketch import dds_bucket

            return dds_bucket(raw, alpha=dds_alpha, value_col=dds_col, tier="1m")

        def _build_cms(raw):
            from ..operators.cms import cms_bucket

            return cms_bucket(raw, tier="1m", width=cms_width, depth=cms_depth)

        def _build_topk(raw):
            from ..operators.heavyhitters import topk_bucket

            return topk_bucket(raw, tier="1m", cap=topk_cap)

        def _build_stats2(raw):
            from ..operators.stats2d import stats2_bucket

            return stats2_bucket(
                raw, tier="1m", y_col=stats2_y, x_col=stats2_x,
                salt_buckets=salt_buckets,
            )

        planes = [("rollup", _build_rollup)]
        if quantile_hist:
            planes.append(("hist", _build_hist))
        if time_weight:
            planes.append(("tw", _build_tw))
        if distinct:
            planes.append(("distinct", _build_distinct))
        if heartbeat:
            planes.append(("hb", _build_hb))
        if dds:
            planes.append(("dds", _build_dds))
        if cms:
            planes.append(("cms", _build_cms))
        if topk:
            planes.append(("topk", _build_topk))
        if stats2:
            planes.append(("stats2", _build_stats2))
        return planes

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
        time_weight: bool = False,
        tw_method: str = "locf",
        tw_val_col: str = "n_tok",
        distinct: bool = False,
        distinct_col: str = "doc_id",
        distinct_lgk: int = 12,
        heartbeat: bool = False,
        hb_period_sec: float = 120.0,
        dds: bool = False,
        dds_col: str = "n_tok",
        dds_alpha: float = 0.01,
        cms: bool = False,
        cms_width: int = 2048,
        cms_depth: int = 4,
        topk: bool = False,
        topk_cap: int = 64,
        stats2: bool = False,
        stats2_y: str = "n_tok",
        stats2_x: str | None = None,
    ) -> dict[str, DataFrame | None]:
        """Incremental run. ``seqs_ts`` must carry event_ts (derive_event_ts).
        ``salt_buckets`` enables the two-phase salted 1m aggregation for
        hot-key skew (north rule) — merge tiers are already small.
        ``token_engine`` selects the token-stat engine (see
        rollup.add_token_stats) — expr measured fastest on this host.
        ``target_file_rows`` fans fat 1m partitions out range-clustered on
        ``bucket_ts`` (parallel write + per-file time stats that make
        :meth:`read_range` skip files inside a day).

        Optional planes, each a parallel tier set with its OWN watermark —
        a crash between plane commits resumes exactly, and enabling one on
        an existing job backfills nothing by itself (run once with
        ``full_refresh=True`` to catch it up over history):

        - ``quantile_hist``: exact mergeable n_tok histograms
          (operators/quantiles.py).
        - ``time_weight``: mergeable time-weight summaries of ``tw_val_col``
          under the ``tw_method`` curve (operators/timeweight.py) — the
          irregular-sampling average the row-weighted avg_n_tok can't give.
          Day-granular recompute is exact: a tier's (source, day) output
          depends only on same-day segments (bridges never cross the 1d
          bucket).
        - ``distinct``: mergeable HLL sketches of ``distinct_col``
          (operators/distinct.py); estimates carry the published ~1.6%
          (lgk=12) error, never presented as exact.
        - ``heartbeat``: mergeable liveness islands over the sources' own
          event times (operators/stateagg.py) — each arriving row asserts
          its source live for ``hb_period_sec``; the read accessors give
          per-bucket ingestion uptime/gap counts, the retention engine's
          source-health monitor. Duplicate (source, ts) rows are harmless
          (equal intervals merge; ``n`` counts rows). Day-granular
          recompute is exact: islands never merge across the 1d boundary,
          so a (source, day) output depends only on same-day rows.
        - ``dds``: mergeable DDSketch log-bucket maps of ``dds_col``
          (operators/ddsketch.py) for approx quantiles with relative-error
          guarantee ``dds_alpha`` — the unbounded/float-domain companion
          to the exact ``quantile_hist`` plane (prefer hist when the
          domain is bounded ints; it is exact). Sketch maps themselves
          merge exactly, so cascaded tiers are bit-equal to direct.
        - ``cms``: mergeable Count-Min per-token frequency sketches over
          the ``tokens`` arrays (operators/cms.py) — point estimates of
          any token's occurrence count per bucket within
          (e/cms_width)*N with prob >= 1-e^-cms_depth; cell addition
          merges exactly, so cascaded tiers are bit-equal to direct.
        - ``topk``: mergeable Misra-Gries heavy-hitter summaries over the
          ``tokens`` arrays (operators/heavyhitters.py) — the top-k
          ENUMERATION read CMS point queries can't give, <= ``topk_cap``
          entries per bucket with the per-token overcount bound carried
          as ``hh_err`` (est <= true <= est + hh_err at every tier).
        - ``stats2``: mergeable regression/correlation moment sums of
          ``stats2_y`` against ``stats2_x`` (None = time in seconds from
          each row's OWN bucket start, so slope is per second and
          intercept / x_intercept are fit values at the bucket start;
          cascaded tiers re-originate via the shift identity in
          operators/stats2d.py) per bucket — per-tier slope / corr / r2
          / skew reads without rescanning raw."""
        run_id = run_id or uuid.uuid4().hex[:12]
        t0 = time.time()

        planes = self._plane_builders(
            salt_buckets=salt_buckets,
            token_engine=token_engine,
            quantile_hist=quantile_hist,
            time_weight=time_weight,
            tw_method=tw_method,
            tw_val_col=tw_val_col,
            distinct=distinct,
            distinct_col=distinct_col,
            distinct_lgk=distinct_lgk,
            heartbeat=heartbeat,
            hb_period_sec=hb_period_sec,
            dds=dds,
            dds_col=dds_col,
            dds_alpha=dds_alpha,
            cms=cms,
            cms_width=cms_width,
            cms_depth=cms_depth,
            topk=topk,
            topk_cap=topk_cap,
            stats2=stats2,
            stats2_y=stats2_y,
            stats2_x=stats2_x,
        )

        wms = {}
        for plane, _ in planes:
            snap = self._plane_tables[plane]["1m"].current_snapshot()
            wms[plane] = None if (full_refresh or snap is None) else snap.watermark

        def _beyond(wm):
            return F.col("event_ts") > F.lit(wm) if wm else F.col("event_ts").isNotNull()

        # ONE raw scan computes the new watermark and the affected-day set
        # for EVERY enabled plane (each plane gates on its own watermark, so
        # a crash between plane commits resumes without gaps); the day sets
        # are calendar-bounded, so the collect_sets stay tiny. Rows with
        # null event_ts (unparseable doc_id) drop out of all aggregates.
        aggs = [F.max("event_ts").alias("wm")] + [
            F.collect_set(F.when(_beyond(wms[plane]), F.to_date("event_ts"))).alias(
                f"days_{plane}"
            )
            for plane, _ in planes
        ]
        head = seqs_ts.agg(*aggs).first()
        new_wm = head["wm"]
        if new_wm is not None:
            wm_str = new_wm.isoformat()
            # ---- tier 1m per plane: recompute affected (source, day)
            # partitions from raw
            for plane, build in planes:
                if wms[plane] is not None and wm_str <= wms[plane]:
                    continue
                days = sorted(d.isoformat() for d in head[f"days_{plane}"])
                if not days:
                    continue
                affected_raw = seqs_ts.filter(F.to_date("event_ts").isin(days))
                self._commit_tier(
                    spark,
                    "1m",
                    build(affected_raw),
                    wm_str,
                    run_id,
                    t0,
                    target_file_rows=target_file_rows,
                    plane=plane,
                )
                hook = "1m" if plane == "rollup" else f"{plane}_1m"
                if fail_after == hook:
                    raise RuntimeError(f"injected failure after {hook} commit")

        # ---- tiers 1h, 1d: snapshot-incremental cascade
        self.run_cascade(spark, run_id=run_id, full_refresh=full_refresh,
                         fail_after=fail_after, quantile_hist=quantile_hist,
                         time_weight=time_weight, tw_method=tw_method,
                         distinct=distinct, heartbeat=heartbeat, dds=dds,
                         cms=cms, topk=topk, topk_cap=topk_cap, stats2=stats2)

        return {t: self.tables[t].read(spark) for t in TIERS}

    def run_from_snapshot(
        self,
        spark: SparkSession,
        input_table: SnapshotTable,
        run_id: str | None = None,
        fail_after: str | None = None,
        full_refresh: bool = False,
        target_file_rows: int | None = None,
        **plane_opts,
    ) -> dict[str, DataFrame | None]:
        """Input-SNAPSHOT-incremental run: consume ``input_table``'s commit
        log instead of an event-time watermark, closing :meth:`run`'s
        documented late-data gap — rows landing in days at or behind the
        watermark are silently skipped there, but here ANY rewritten input
        partition (late corrections included, e.g. via
        ``SnapshotTable.merge_into``) recomputes exactly those
        (source, day) outputs. This is the same changed-partition protocol
        :meth:`run_cascade` already applies tier-to-tier, extended one hop
        upstream to the raw table.

        Contract: ``input_table`` is partitioned by ``(source, bucket_day)``
        with ``bucket_day = to_date(event_ts)`` and rows carrying
        ``event_ts`` (the layout ``overwrite_partitions(df,
        ["source", "bucket_day"])`` / ``merge_into(...,
        partition_cols=["source", "bucket_day"])`` writes) — each input
        partition then holds EXACTLY the rows of one output partition, so
        the recompute set is both complete and minimal, and a 10^12-row
        history is never rescanned. Each plane's 1m snapshot records the
        input version it consumed (``meta.input_version``); crashes between
        plane commits resume per-plane, reruns over an unchanged input are
        no-ops. A job should use ONE ingestion mode (``run`` or
        ``run_from_snapshot``) — the modes track different cursors.

        ``plane_opts`` are :meth:`run`'s plane flags (``quantile_hist``,
        ``time_weight``/``tw_method``, ``distinct``/..., ``heartbeat``/...,
        ``dds``/..., ``cms``/..., ``salt_buckets``, ``token_engine``)."""
        run_id = run_id or uuid.uuid4().hex[:12]
        t0 = time.time()
        planes = self._plane_builders(**plane_opts)

        in_snap = input_table.current_snapshot()
        if in_snap is not None:
            for plane, build in planes:
                snap1m = self._plane_tables[plane]["1m"].current_snapshot()
                last = (
                    -1
                    if (full_refresh or snap1m is None or not snap1m.meta)
                    else int(snap1m.meta.get("input_version", -1))
                )
                changed = in_snap.changed_partitions(last)
                if not changed:
                    continue
                rows = input_table.read_partitions(spark, changed)
                if rows is None:
                    continue
                if "bucket_day" in rows.columns:
                    rows = rows.drop("bucket_day")
                # watermark stays monotone for observability (read_range,
                # retention absorption guards) even when late days rewrite
                new_max = rows.agg(F.max("event_ts")).first()[0]
                wm = snap1m.watermark if (snap1m and snap1m.watermark) else None
                if new_max is not None:
                    wm = max(wm, new_max.isoformat()) if wm else new_max.isoformat()
                self._commit_tier(
                    spark,
                    "1m",
                    build(rows),
                    wm,
                    run_id,
                    t0,
                    meta={"input_version": in_snap.version},
                    target_file_rows=target_file_rows,
                    plane=plane,
                )
                hook = "1m" if plane == "rollup" else f"{plane}_1m"
                if fail_after == hook:
                    raise RuntimeError(f"injected failure after {hook} commit")

        self.run_cascade(
            spark,
            run_id=run_id,
            full_refresh=full_refresh,
            fail_after=fail_after,
            quantile_hist=plane_opts.get("quantile_hist", False),
            time_weight=plane_opts.get("time_weight", False),
            tw_method=plane_opts.get("tw_method", "locf"),
            distinct=plane_opts.get("distinct", False),
            heartbeat=plane_opts.get("heartbeat", False),
            dds=plane_opts.get("dds", False),
            cms=plane_opts.get("cms", False),
            topk=plane_opts.get("topk", False),
            topk_cap=plane_opts.get("topk_cap", 64),
            stats2=plane_opts.get("stats2", False),
        )
        return {t: self.tables[t].read(spark) for t in TIERS}

    def apply_retention(
        self,
        as_of,
        horizon_days: dict[str, int | None] | None = None,
        planes: tuple[str, ...] = ("rollup",),
        run_id: str | None = None,
    ) -> dict[str, dict[str, list[str]]]:
        """Expire fine-tier partitions past their horizon with the
        absorption guard DERIVED from the job's own tier state — the glue
        that makes ``operators.retention`` safe to call without hand-
        computing watermarks:

        - A tier's ``absorbed_through`` is the next-coarser tier's committed
          watermark day minus one (the last FULLY-covered day at or before
          the coarser tier's raw watermark) — so 1m drops only days the 1h
          table provably holds, 1h guards on 1d.
        - If the coarser tier is not SYNCED to the finer tier's current
          snapshot (``meta.upstream_version`` lags — e.g. late data rewrote
          an old 1m partition and the cascade hasn't run), the tier is
          SKIPPED entirely this round rather than risk dropping a rewritten
          partition the coarser tier absorbed only in its old form.
        - The coarsest tier (or any tier with horizon ``None``) never
          expires here; dropping it means data leaves the engine, which is
          a caller decision (pass retention.UNGUARDED to
          ``expire_partitions`` directly, deliberately).

        ``as_of`` is the retention clock (a date) — explicit so reruns are
        deterministic. Returns ``{plane: {tier: [dropped keys]}}``; the
        unreferenced data files are reclaimed by ``retention.vacuum``.
        """
        import datetime as _dt

        from ..operators.retention import DEFAULT_HORIZON_DAYS, expire_partitions

        horizons = dict(DEFAULT_HORIZON_DAYS if horizon_days is None else horizon_days)
        dropped: dict[str, dict[str, list[str]]] = {}
        for plane in planes:
            tables = self._plane_tables[plane]
            dropped[plane] = {}
            for tier, coarser in (("1m", "1h"), ("1h", "1d")):
                horizon = horizons.get(tier)
                if horizon is None:
                    continue
                fine_snap = tables[tier].current_snapshot()
                up_snap = tables[coarser].current_snapshot()
                if fine_snap is None or up_snap is None or not up_snap.watermark:
                    continue
                synced = (up_snap.meta or {}).get("upstream_version") == fine_snap.version
                if not synced:
                    continue
                wm_day = _dt.date.fromisoformat(up_snap.watermark[:10])
                absorbed = wm_day - _dt.timedelta(days=1)
                dropped[plane][tier] = expire_partitions(
                    tables[tier],
                    horizon,
                    as_of,
                    run_id=run_id,
                    absorbed_through=absorbed,
                )
        return dropped

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
        time_weight: bool = False,
        tw_method: str = "locf",
        distinct: bool = False,
        heartbeat: bool = False,
        dds: bool = False,
        cms: bool = False,
        topk: bool = False,
        topk_cap: int = 64,
        stats2: bool = False,
    ) -> None:
        """Cascade the 1h/1d tiers from whatever the 1m snapshot table
        currently holds — shared by batch runs (``run``) and by streaming
        ingestion, where micro-batches commit the 1m tier through
        ``streaming.rollup_stream.snapshot_sink`` and this method then
        roll-ups exactly as if the 1m partitions had been batch-written.
        The optional plane flags cascade those planes too — every merge is
        summary-to-summary (histogram sums, bridge re-adds, sketch unions),
        never a raw rescan."""
        run_id = run_id or uuid.uuid4().hex[:12]
        planes: list[tuple[str, dict, object]] = [
            ("rollup", self.tables, lambda df, t, s: cascade(df, t))
        ]
        if quantile_hist:
            from ..operators.quantiles import hist_cascade

            planes.append(("hist", self.hist_tables, lambda df, t, s: hist_cascade(df, t)))
        if time_weight:
            from ..operators.timeweight import time_weight_cascade

            planes.append(
                (
                    "tw",
                    self.tw_tables,
                    lambda df, t, s: time_weight_cascade(
                        df, t, from_tier=s, method=tw_method
                    ),
                )
            )
        if distinct:
            from ..operators.distinct import distinct_cascade

            planes.append(
                (
                    "distinct",
                    self.distinct_tables,
                    lambda df, t, s: distinct_cascade(df, t, from_tier=s),
                )
            )
        if heartbeat:
            from ..operators.stateagg import heartbeat_cascade

            planes.append(
                (
                    "hb",
                    self.hb_tables,
                    lambda df, t, s: heartbeat_cascade(df, t, from_tier=s),
                )
            )
        if dds:
            from ..operators.ddsketch import dds_cascade

            planes.append(
                ("dds", self.dds_tables, lambda df, t, s: dds_cascade(df, t))
            )
        if cms:
            from ..operators.cms import cms_cascade

            planes.append(
                ("cms", self.cms_tables, lambda df, t, s: cms_cascade(df, t))
            )
        if topk:
            from ..operators.heavyhitters import topk_cascade

            planes.append(
                (
                    "topk",
                    self.topk_tables,
                    lambda df, t, s: topk_cascade(df, t, cap=topk_cap),
                )
            )
        if stats2:
            from ..operators.stats2d import stats2_cascade

            planes.append(
                (
                    "stats2",
                    self.stats2_tables,
                    lambda df, t, s: stats2_cascade(df, t, from_tier=s),
                )
            )
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
                out = cascade_fn(affected, tier, src_tier)
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
