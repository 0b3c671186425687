"""Manifest file-stats skipping + range-clustered writes (SnapshotTable).

Iceberg's data-file skipping, emulated on the plain-parquet snapshot store:
``overwrite_partitions(stats_cols=..., cluster_by=...)`` records per-file
column min/max from the footers the inventory pass already opens, and
``read_where`` scans only the files whose range can match — with the exact
residual filter re-applied, so skipping can never change results. The
oracle here is DuckDB running the same range predicate over ALL data files
(no pruning), plus direct footer re-reads asserting the recorded stats and
the clustered layout's near-disjoint per-file ranges.
"""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import (
    SnapshotTable,
    _stat_json,
)


def _mk_events(spark, n=4000, days=4):
    """Deterministic (source, ts, value) with unique ts per source."""
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"),
            (
                F.to_timestamp(F.lit("2024-03-01 00:00:00"))
                + F.make_interval(secs=(F.col("id") * (days * 86400 / n)))
            ).alias("ts"),
            (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double") / 10).alias("value"),
            F.col("id"),
        )
    )


@pytest.fixture(scope="module")
def stats_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snap_stats"))
    t = SnapshotTable(root)
    df = _mk_events(spark)
    t.overwrite_partitions(
        df,
        ["source"],
        stats_cols=["ts", "value", "id"],
        cluster_by=["ts"],
        target_file_rows=500,
    )
    return t, df


def test_stats_recorded_per_file(stats_table):
    t, _ = stats_table
    snap = t.current_snapshot()
    assert set(snap.partitions) == {"s0", "s1"}
    for pk, p in snap.partitions.items():
        # 2000 rows/source at 500/file -> fanout happened
        assert len(p["files"]) >= 2, (pk, p["files"])
        stats = p.get("stats", {})
        assert set(stats) == set(p["files"])
        for f, fs in stats.items():
            assert set(fs) == {"ts", "value", "id"}
            lo, hi = fs["ts"]
            assert lo <= hi and lo.startswith("2024-03-")


def test_cluster_by_yields_disjoint_file_ranges(stats_table):
    t, _ = stats_table
    snap = t.current_snapshot()
    for pk, p in snap.partitions.items():
        ranges = sorted(p["stats"][f]["ts"] for f in p["files"])
        for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
            # ts unique per source + range clustering -> strictly ordered files
            assert hi_a <= lo_b, (pk, ranges)


def test_prune_files_skips_most_files(stats_table):
    t, _ = stats_table
    lo = dt.datetime(2024, 3, 1, 6, 0, 0)
    hi = dt.datetime(2024, 3, 1, 12, 0, 0)
    kept, total = t.prune_files({"ts": (lo, hi)})
    assert total >= 4
    assert 0 < len(kept) < total, (len(kept), total)


def test_read_where_equals_full_scan_filter_and_duckdb(stats_table, duck, spark):
    t, _ = stats_table
    lo = dt.datetime(2024, 3, 1, 6, 0, 0)
    hi = dt.datetime(2024, 3, 2, 3, 0, 0)
    full = (
        t.read(spark)
        .filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
        .select("source", "ts", "value", "id")
    )
    pruned = t.read_where(spark, {"ts": (lo, hi)}).select(
        "source", "ts", "value", "id"
    )
    a = full.toPandas().sort_values("id").reset_index(drop=True)
    b = pruned.toPandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b), (len(a), len(b))
    # independent oracle: DuckDB over ALL files, no pruning
    snap = t.current_snapshot()
    files = [
        os.path.join(t.root, f) for p in snap.partitions.values() for f in p["files"]
    ]
    want = duck.sql(
        f"""SELECT count(*) AS n, sum(id) AS s FROM read_parquet({files!r})
            WHERE ts >= TIMESTAMP '{lo}' AND ts <= TIMESTAMP '{hi}'"""
    ).fetchone()
    assert want[0] == len(b)
    assert want[1] == int(b["id"].sum())


def test_multi_predicate_conjunction(stats_table, spark):
    t, _ = stats_table
    lo = dt.datetime(2024, 3, 2, 0, 0, 0)
    out = t.read_where(spark, {"ts": (lo, None), "value": (None, 40.0)})
    full = (
        t.read(spark)
        .filter((F.col("ts") >= F.lit(lo)) & (F.col("value") <= 40.0))
        .count()
    )
    assert out.count() == full


def test_no_stats_table_never_skips(spark, tmp_path, duck):
    t = SnapshotTable(str(tmp_path / "nostats"))
    df = _mk_events(spark, n=500, days=1)
    t.overwrite_partitions(df, ["source"])  # no stats_cols
    kept, total = t.prune_files({"ts": (dt.datetime(2030, 1, 1), None)})
    assert len(kept) == total  # cannot prove emptiness without stats -> keep all
    out = t.read_where(spark, {"ts": (dt.datetime(2030, 1, 1), None)})
    assert out is not None and out.count() == 0  # residual filter still exact


def test_prune_empty_when_disjoint(stats_table, spark):
    t, _ = stats_table
    kept, total = t.prune_files({"ts": (dt.datetime(2030, 1, 1), None)})
    assert kept == [] and total > 0
    assert t.read_where(spark, {"ts": (dt.datetime(2030, 1, 1), None)}) is None


def test_rollup_job_read_range_skips_and_matches(spark, tmp_path, duck):
    """RollupJob wiring: fanned-out 1m commits carry per-file bucket_ts
    stats; read_range == full-tier filter (DuckDB-checked) while opening
    strictly fewer files."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    seqs = derive_event_ts(synth_seqs(spark, 3000, seed=23))
    job = RollupJob(str(tmp_path / "rangejob"))
    job.run(spark, seqs, target_file_rows=200)
    snap = job.tables["1m"].current_snapshot()
    # fanout happened and every file has bucket_ts stats
    multi = [pk for pk, p in snap.partitions.items() if len(p["files"]) > 1]
    assert multi, "expected at least one fanned-out partition"
    for p in snap.partitions.values():
        assert set(p.get("stats", {})) == set(p["files"])
    # pick a mid-corpus 6h window
    bounds = job.tables["1m"].read(spark).agg(
        F.min("bucket_ts"), F.max("bucket_ts")
    ).first()
    lo = bounds[0] + (bounds[1] - bounds[0]) / 3
    hi = lo + dt.timedelta(hours=6)
    kept, total = job.tables["1m"].prune_files({"bucket_ts": (lo, hi)})
    assert len(kept) < total, (len(kept), total)
    got = (
        job.read_range(spark, "1m", lo, hi)
        .select("source", "bucket_ts", "cnt")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    full = (
        job.tables["1m"]
        .read(spark)
        .filter((F.col("bucket_ts") >= F.lit(lo)) & (F.col("bucket_ts") <= F.lit(hi)))
        .select("source", "bucket_ts", "cnt")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert got.equals(full) and len(got) > 0
    # independent DuckDB recount over ALL tier files
    files = [
        os.path.join(job.tables["1m"].root, f)
        for p in snap.partitions.values()
        for f in p["files"]
    ]
    n = duck.sql(
        f"""SELECT count(*) FROM read_parquet({files!r}, union_by_name=true)
            WHERE bucket_ts >= TIMESTAMP '{lo}' AND bucket_ts <= TIMESTAMP '{hi}'"""
    ).fetchone()[0]
    assert n == len(got)


def test_cascade_recomputes_only_changed_sources(spark, tmp_path):
    """The snapshot-incremental cascade reads exactly the changed (source,
    day) partitions: an increment touching ONE source must not bump the
    other sources' 1h/1d partition versions (write-amplification guard)."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    seqs = derive_event_ts(synth_seqs(spark, 2000, seed=29))
    job = RollupJob(str(tmp_path / "amp"))
    job.run(spark, seqs)
    v1 = {pk: p["v"] for pk, p in job.tables["1h"].current_snapshot().partitions.items()}
    # a later-day increment confined to one source
    one_src = seqs.agg(F.first("source")).first()[0]
    wm = job.tables["1m"].current_snapshot().watermark
    late = (
        seqs.filter(F.col("source") == one_src)
        .withColumn("event_ts", F.col("event_ts") + F.expr("INTERVAL 30 DAYS"))
    )
    job.run(spark, late)
    snap2 = job.tables["1h"].current_snapshot()
    v2 = {pk: p["v"] for pk, p in snap2.partitions.items()}
    changed = {pk for pk in v1 if v2.get(pk) != v1[pk]}
    assert not changed, f"pre-existing 1h partitions rewritten: {sorted(changed)[:5]}"
    new_keys = set(v2) - set(v1)
    assert new_keys and all(pk.split("/", 1)[0] == one_src or "/" not in pk for pk in new_keys)
    assert wm is not None


def test_stat_json_order_preserving():
    a = dt.datetime(2024, 3, 1, 12, 0, 0)
    b = dt.datetime(2024, 3, 1, 12, 0, 0, 1)
    c = dt.datetime(2024, 3, 1, 12, 0, 1)
    xs = [a, b, c]
    enc = [_stat_json(x) for x in xs]
    assert enc == sorted(enc)
    assert _stat_json(dt.date(2024, 3, 1)) == "2024-03-01"
    assert _stat_json(True) is None  # bools untracked
    assert _stat_json(b"\x00") is None  # unsupported -> untracked, never unsafe
