from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.retention import (
    UNGUARDED,
    expire_partitions,
    vacuum,
)
from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts
from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import SnapshotTable
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs


def _tiers_as_sets(tiers):
    out = {}
    for t, df in tiers.items():
        cols = ["source", "bucket_ts", "cnt", "sum_n_tok", "min_n_tok", "max_n_tok",
                "tok_min", "tok_max", "tok_sum"]
        out[t] = {tuple(r) for r in df.select(*cols).collect()}
    return out


def test_snapshot_table_atomic_overwrite(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    df1 = spark.createDataFrame([("a", "2024-01-01", 1), ("b", "2024-01-01", 2)],
                                "source string, day string, v int")
    tbl.overwrite_partitions(df1, ["source", "day"])
    df2 = spark.createDataFrame([("a", "2024-01-01", 99)], "source string, day string, v int")
    snap = tbl.overwrite_partitions(df2, ["source", "day"])
    got = {(r["source"], r["v"]) for r in tbl.read(spark).collect()}
    assert got == {("a", 99), ("b", 2)}  # only partition a/2024-01-01 replaced
    assert snap.version == 2
    assert snap.changed_partitions(1) == ["a/2024-01-01"]
    assert snap.changed_partitions(0) == ["a/2024-01-01", "b/2024-01-01"]


def test_rollup_job_end_to_end(spark, seqs_2k, tmp_path):
    job = RollupJob(str(tmp_path / "job"))
    tiers = job.run(spark, derive_event_ts(seqs_2k))
    assert tiers["1m"].count() > tiers["1h"].count() > tiers["1d"].count() >= 1
    # audit rows exist for all three stages
    audit = job.audit.read(spark)
    stages = {r[0] for r in audit.select("stage").distinct().collect()}
    assert stages == {"rollup_1m", "rollup_1h", "rollup_1d"}
    # second run with the same input is a no-op (watermark caught up)
    v_before = job.tables["1m"].current_snapshot().version
    job.run(spark, derive_event_ts(seqs_2k))
    assert job.tables["1m"].current_snapshot().version == v_before


def test_resume_after_injected_failure(spark, tmp_path):
    """FIXTURES.md F5 invariant 5: kill after tier-1 commit, rerun ->
    identical tables to a single clean run."""
    seqs = derive_event_ts(synth_seqs(spark, 1500, seed=11))
    clean = RollupJob(str(tmp_path / "clean"))
    want = _tiers_as_sets(clean.run(spark, seqs))

    crashed = RollupJob(str(tmp_path / "crashed"))
    with pytest.raises(RuntimeError, match="injected failure"):
        crashed.run(spark, seqs, fail_after="1m")
    assert crashed.tables["1h"].current_snapshot() is None  # crashed before 1h
    got = _tiers_as_sets(crashed.run(spark, seqs))  # resume
    assert got == want


def test_incremental_run_appends_new_days(spark, tmp_path):
    """New data for later days must flow through all tiers without
    recomputing old partitions."""
    all_seqs = derive_event_ts(synth_seqs(spark, 2000, seed=13))
    cut = all_seqs.agg(F.percentile_approx(F.col("event_ts").cast("double"), 0.5)).collect()[0][0]
    first_half = all_seqs.filter(F.col("event_ts").cast("double") <= cut)
    job = RollupJob(str(tmp_path / "incr"))
    job.run(spark, first_half)
    tiers = job.run(spark, all_seqs)  # second run sees the full input
    want = _tiers_as_sets(RollupJob(str(tmp_path / "oneshot")).run(spark, all_seqs))
    assert _tiers_as_sets(tiers) == want


def test_late_data_propagates_via_full_refresh(spark, tmp_path):
    seqs = derive_event_ts(synth_seqs(spark, 1000, seed=17))
    late = seqs.limit(100)
    job = RollupJob(str(tmp_path / "late"))
    job.run(spark, seqs.subtract(late))
    tiers = job.run(spark, seqs, full_refresh=True)
    want = _tiers_as_sets(RollupJob(str(tmp_path / "late2")).run(spark, seqs))
    assert _tiers_as_sets(tiers) == want


def test_retention_and_vacuum(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "ret"))
    rows = [("web", f"2024-01-{d:02d}", d) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "source string, day string, v int")
    tbl.overwrite_partitions(df, ["source", "day"])
    # absorbed_through caps the drop: partitions the coarser tier has not
    # committed yet must survive regardless of age (crash-before-cascade
    # would otherwise lose them permanently)
    capped = expire_partitions(
        tbl, horizon_days=3, as_of=dt.date(2024, 1, 10),
        absorbed_through=dt.date(2024, 1, 3),
    )
    assert capped == [f"web/2024-01-{d:02d}" for d in range(1, 4)]
    # age-only expiry now requires the explicit UNGUARDED opt-out — a caller
    # that forgets absorbed_through gets a TypeError, not silent data loss
    with pytest.raises(TypeError):
        expire_partitions(tbl, 3, dt.date(2024, 1, 10))  # type: ignore[call-arg]
    with pytest.raises(TypeError):
        expire_partitions(tbl, 3, dt.date(2024, 1, 10), absorbed_through=None)
    dropped = expire_partitions(
        tbl, horizon_days=3, as_of=dt.date(2024, 1, 10), absorbed_through=UNGUARDED
    )
    assert dropped == [f"web/2024-01-{d:02d}" for d in range(4, 7)]
    kept_days = {r["day"] for r in tbl.read(spark).collect()}
    assert kept_days == {f"2024-01-{d:02d}" for d in range(7, 11)}
    # default min-age guard protects freshly written files (racing writer)
    assert vacuum(tbl) == 0
    n_removed = vacuum(tbl, min_age_secs=0)  # no live writer: GC everything
    assert n_removed >= len(dropped)
    # table still readable after GC
    assert tbl.read(spark).count() == 4


def test_fat_partition_fanout_and_compaction(spark, tmp_path):
    """overwrite_partitions(target_file_rows) salts a fat partition across
    multiple write tasks/files (no single-task serial point) with exact row
    parity; compact_partitions later bin-packs the fanout back down and
    vacuum reclaims the replaced files."""
    from timeseriesvectordbpattermatcher_spark.operators.retention import (
        compact_partitions,
    )

    tbl = SnapshotTable(str(tmp_path / "fat"))
    fat = spark.range(5000).select(
        F.lit("hot").alias("source"),
        F.lit("2024-03-01").alias("day"),
        F.col("id").cast("int").alias("v"),
    )
    slim = spark.createDataFrame(
        [("cold", "2024-03-01", -1)], "source string, day string, v int"
    )
    snap = tbl.overwrite_partitions(
        fat.unionByName(slim), ["source", "day"], target_file_rows=1000
    )
    n_fat = len(snap.partitions["hot/2024-03-01"]["files"])
    assert n_fat > 1  # fat key fanned out across write tasks
    assert len(snap.partitions["cold/2024-03-01"]["files"]) == 1  # slim key untouched
    got = tbl.read(spark)
    assert got.count() == 5001
    assert got.filter(F.col("source") == "hot").agg(F.sum("v")).first()[0] == sum(
        range(5000)
    )
    # salted write is deterministic: rewriting the same rows produces the
    # same per-partition file counts (stable under task retries by design)
    snap2 = tbl.overwrite_partitions(fat, ["source", "day"], target_file_rows=1000)
    assert len(snap2.partitions["hot/2024-03-01"]["files"]) == n_fat

    # compaction: target sized well above the partition's bytes -> 1 file
    before = {tuple(r) for r in tbl.read(spark).collect()}
    stats = compact_partitions(
        tbl, spark, ["source", "day"], target_file_bytes=64 * 1024 * 1024
    )
    assert stats["compacted"] == ["hot/2024-03-01"]
    assert stats["files_before"] == n_fat and stats["files_after"] == 1
    snap3 = tbl.current_snapshot()
    assert len(snap3.partitions["hot/2024-03-01"]["files"]) == 1
    # cold partition untouched: same version, invisible to incremental readers
    assert snap3.partitions["cold/2024-03-01"]["v"] < snap3.version
    assert snap3.changed_partitions(snap2.version) == ["hot/2024-03-01"]
    assert {tuple(r) for r in tbl.read(spark).collect()} == before
    # nothing left to compact; replaced files GC'd; table still readable
    assert compact_partitions(tbl, spark, ["source", "day"])["compacted"] == []
    assert vacuum(tbl, min_age_secs=0) >= n_fat
    assert tbl.read(spark).count() == 5001


def test_expire_snapshots_trims_log_and_pairs_with_vacuum(spark, tmp_path):
    """expire_snapshots drops old manifests (time travel stops there);
    vacuum with the same keep_versions then reclaims their files."""
    tbl = SnapshotTable(str(tmp_path / "exp"))
    for v in range(1, 4):
        tbl.overwrite_partitions(
            spark.createDataFrame([("a", v)], "source string, x int"), ["source"]
        )
    assert [h["version"] for h in tbl.history()] == [1, 2, 3]
    doomed = tbl.expire_snapshots(keep_versions=1)
    assert doomed == [1, 2]
    assert tbl.snapshot(1) is None and tbl.snapshot(2) is None
    assert tbl.read(spark, version=2) is None
    assert {r["x"] for r in tbl.read(spark).collect()} == {3}
    # vacuum now reclaims the two replaced files (one per expired commit)
    assert vacuum(tbl, min_age_secs=0, keep_versions=1) == 2
    assert {r["x"] for r in tbl.read(spark).collect()} == {3}
    with pytest.raises(ValueError, match="keep_versions"):
        tbl.expire_snapshots(keep_versions=0)


def test_time_travel_rollback_and_versioned_vacuum(spark, tmp_path):
    """Iceberg-style VERSION AS OF reads, append-only rollback, and
    vacuum(keep_versions) as the time-travel retention contract."""
    from timeseriesvectordbpattermatcher_spark.operators.retention import (
        compact_partitions,
    )

    tbl = SnapshotTable(str(tmp_path / "tt"))
    mk = lambda v: spark.createDataFrame(
        [("a", "2024-07-01", v), ("b", "2024-07-01", v + 10)],
        "source string, day string, x int",
    )
    tbl.overwrite_partitions(mk(1), ["source", "day"], run_id="r1")
    tbl.overwrite_partitions(
        mk(2).filter(F.col("source") == "a"), ["source", "day"], run_id="r2"
    )
    # pinned version reads reproduce exactly what each commit saw
    assert {r["x"] for r in tbl.read(spark, version=1).collect()} == {1, 11}
    assert {r["x"] for r in tbl.read(spark, version=2).collect()} == {2, 11}
    assert {r["x"] for r in tbl.read(spark).collect()} == {2, 11}
    hist = tbl.history()
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["run_id"] == "r1"

    # rollback: new commit restoring v1; only the partition v2 changed is
    # re-stamped, so incremental consumers recompute exactly that key
    snap = tbl.rollback(1)
    assert snap.version == 3
    assert {r["x"] for r in tbl.read(spark).collect()} == {1, 11}
    assert snap.changed_partitions(2) == ["a/2024-07-01"]
    assert snap.meta["rolled_back_to"] == 1
    # the bad commit is still readable (append-only history, forensics)
    assert {r["x"] for r in tbl.read(spark, version=2).collect()} == {2, 11}

    # keep_versions=3 protects every manifest's files -> pinned reads work
    assert vacuum(tbl, min_age_secs=0, keep_versions=3) == 0
    assert {r["x"] for r in tbl.read(spark, version=2).collect()} == {2, 11}
    # keep_versions=1 reclaims v2's orphaned file; current read unaffected
    assert vacuum(tbl, min_age_secs=0, keep_versions=1) == 1
    assert {r["x"] for r in tbl.read(spark).collect()} == {1, 11}
    with pytest.raises(ValueError):
        vacuum(tbl, keep_versions=0)
    with pytest.raises(ValueError):
        tbl.rollback(99)
    # maintenance composes: nothing fragmented here, compaction is a no-op
    assert compact_partitions(tbl, spark, ["source", "day"])["compacted"] == []


def test_apply_retention_auto_guard(spark, tmp_path):
    """RollupJob.apply_retention derives absorbed_through from the coarser
    tier's committed watermark: in-horizon and unabsorbed days survive,
    old absorbed days drop, and a lagging cascade skips the tier."""
    # spread the single-day synth span across 5 days so retention has
    # multiple day-partitions to reason about
    seqs = derive_event_ts(synth_seqs(spark, 1500, seed=41)).withColumn(
        "event_ts",
        F.col("event_ts")
        + F.make_interval(days=F.pmod(F.xxhash64("doc_id"), F.lit(5)).cast("int")),
    )
    job = RollupJob(str(tmp_path / "retjob"))
    job.run(spark, seqs)
    snap_1m = job.tables["1m"].current_snapshot()
    days = sorted({pk.rsplit("/", 1)[1] for pk in snap_1m.partitions})
    assert len(days) >= 3, days
    wm_day = dt.date.fromisoformat(job.tables["1h"].current_snapshot().watermark[:10])
    absorbed = wm_day - dt.timedelta(days=1)

    # clock far past every day: everything absorbed AND old drops; days
    # beyond the absorption guard survive even though age-expired
    far = dt.date.fromisoformat(days[-1]) + dt.timedelta(days=400)
    dropped = job.apply_retention(as_of=far, horizon_days={"1m": 7, "1h": None})
    got = set(dropped["rollup"]["1m"])
    want = {
        pk for pk in snap_1m.partitions
        if dt.date.fromisoformat(pk.rsplit("/", 1)[1]) <= absorbed
    }
    assert got == want and got, (got, want)
    left = set(job.tables["1m"].current_snapshot().partitions)
    assert left == set(snap_1m.partitions) - got
    # reads now fall back to the intact 1h tier
    assert job.tables["1h"].read(spark).count() > 0

    # a job whose cascade lags (fresh 1m commit, no cascade) must skip
    lag = RollupJob(str(tmp_path / "retlag"))
    lag.run(spark, seqs)
    extra = derive_event_ts(synth_seqs(spark, 300, seed=43))
    # commit new 1m data WITHOUT cascading by calling the tier commit path
    import pyspark.sql.functions as F2

    from timeseriesvectordbpattermatcher_spark.operators.rollup import rollup_1m

    later = extra.withColumn(
        "event_ts", F2.col("event_ts") + F2.expr("interval 400 days")
    )
    lag._commit_tier(
        spark, "1m", rollup_1m(later), "2099-01-01T00:00:00", "t", 0.0
    )
    out = lag.apply_retention(as_of=far, horizon_days={"1m": 7, "1h": None})
    assert "1m" not in out["rollup"]  # skipped: upstream_version lags


def test_run_from_snapshot_incremental_and_late_data(spark, tmp_path):
    """Input-snapshot-incremental ingest: (1) first consume == direct run;
    (2) a merge_into of LATE rows into days far behind the watermark
    propagates through every tier WITHOUT full_refresh — the gap run()'s
    event-time watermark cannot close; (3) rerun over an unchanged input
    is a no-op; (4) only the late-touched partitions recompute."""
    seqs = derive_event_ts(synth_seqs(spark, 2000, seed=23)).filter(
        F.col("event_ts").isNotNull()
    )
    seqs = seqs.withColumn("bucket_day", F.to_date("event_ts")).cache()
    late = seqs.filter(F.xxhash64("doc_id") % 11 == 0).cache()
    first = seqs.subtract(late)
    assert late.count() > 0

    inp = SnapshotTable(str(tmp_path / "input"))
    inp.overwrite_partitions(first, ["source", "bucket_day"])

    job = RollupJob(str(tmp_path / "snapjob"))
    job.run_from_snapshot(spark, inp, quantile_hist=True)
    want_first = _tiers_as_sets(
        RollupJob(str(tmp_path / "direct1")).run(spark, first.drop("bucket_day"))
    )
    got_first = {t: job.tables[t].read(spark).drop("bucket_day") for t in ("1m", "1h", "1d")}
    assert _tiers_as_sets(got_first) == want_first

    # late rows land via row-level MERGE into old (source, day) partitions
    inp.merge_into(spark, late, key_cols=["doc_id"],
                   partition_cols=["source", "bucket_day"])
    v1m_before = job.tables["1m"].current_snapshot().version
    job.run_from_snapshot(spark, inp, quantile_hist=True)

    want_all = _tiers_as_sets(
        RollupJob(str(tmp_path / "direct2")).run(spark, seqs.drop("bucket_day"))
    )
    got_all = {t: job.tables[t].read(spark).drop("bucket_day") for t in ("1m", "1h", "1d")}
    assert _tiers_as_sets(got_all) == want_all

    # hist plane followed along through the same cursor
    hist_direct = RollupJob(str(tmp_path / "direct3")).run(
        spark, seqs.drop("bucket_day"), quantile_hist=True
    )
    from timeseriesvectordbpattermatcher_spark.operators.quantiles import hist_quantile

    def _hq(df):
        return {
            tuple(r)
            for r in df.select(
                "source", "bucket_ts", hist_quantile("hist", 0.95).alias("p95")
            ).collect()
        }

    job3 = RollupJob(str(tmp_path / "direct3"))
    assert _hq(job.hist_tables["1d"].read(spark)) == _hq(job3.hist_tables["1d"].read(spark))

    # minimal recompute: only partitions the late rows touched were rewritten
    snap = job.tables["1m"].current_snapshot()
    rewritten = set(snap.changed_partitions(v1m_before))
    touched = {
        f"{r['source']}/{r['bucket_day']}"
        for r in late.select("source", "bucket_day").distinct().collect()
    }
    assert rewritten == touched

    # unchanged input -> no-op on every plane
    v = {p: t["1m"].current_snapshot().version
         for p, t in (("rollup", job.tables), ("hist", job.hist_tables))}
    job.run_from_snapshot(spark, inp, quantile_hist=True)
    assert job.tables["1m"].current_snapshot().version == v["rollup"]
    assert job.hist_tables["1m"].current_snapshot().version == v["hist"]
    seqs.unpersist(), late.unpersist()


def test_run_from_snapshot_crash_between_planes_resumes(spark, tmp_path):
    seqs = derive_event_ts(synth_seqs(spark, 1200, seed=29)).filter(
        F.col("event_ts").isNotNull()
    ).withColumn("bucket_day", F.to_date("event_ts"))
    inp = SnapshotTable(str(tmp_path / "input"))
    inp.overwrite_partitions(seqs, ["source", "bucket_day"])

    job = RollupJob(str(tmp_path / "crash"))
    with pytest.raises(RuntimeError, match="hist_1m"):
        job.run_from_snapshot(spark, inp, quantile_hist=True, fail_after="hist_1m")
    assert job.tables["1h"].current_snapshot() is None  # cascade never ran
    job.run_from_snapshot(spark, inp, quantile_hist=True)

    want = _tiers_as_sets(
        RollupJob(str(tmp_path / "direct")).run(spark, seqs.drop("bucket_day"))
    )
    got = {t: job.tables[t].read(spark).drop("bucket_day") for t in ("1m", "1h", "1d")}
    assert _tiers_as_sets(got) == want
