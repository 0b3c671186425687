"""Mergeable regression/correlation tiers (operators/stats2d.py).

Oracles:
- accessor semantics: DuckDB's own builtin SQL-standard aggregates
  (``regr_slope/intercept/r2/count``, ``corr``, ``covar_pop/samp``,
  ``avg``, ``stddev_pop/samp``) computed straight from the raw points at
  every tier granularity — no moment sums anywhere on the oracle side.
- skewness/kurtosis: explicit DuckDB moment SQL (population method;
  DuckDB's builtin ``skewness`` is the sample-corrected variant, a
  different published formula, so the oracle spells the population one
  out from raw).
- merge exactness: 1h/1d summaries built ONLY from 1m summaries must be
  bit-equal to summaries built directly from raw at that tier (power
  sums of ints < 2^53 add exactly in any order).
- rolling read: a DuckDB self-join re-aggregates the raw rows of each
  trailing-k bucket window per key with ``regr_slope``/``corr``.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts
from timeseriesvectordbpattermatcher_spark.operators.stats2d import (
    stats2_bucket,
    stats2_cascade,
    stats2_read,
    stats2_rolling_read,
)

TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}


@pytest.fixture(scope="module")
def points(spark, seqs_2k):
    # int y with real spread; int x decorrelated from y but deterministic;
    # both small enough that every power sum's addend stays < 2^53
    df = (
        derive_event_ts(seqs_2k)
        .filter(F.col("event_ts").isNotNull())
        .withColumn("y", F.col("n_tok"))
        .withColumn("x", (F.col("n_tok") * 7 + F.crc32(F.col("doc_id")) % 89) % 101)
        .select("source", "event_ts", "x", "y")
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def raw_pdf(points):
    return points.toPandas()


@pytest.fixture(scope="module")
def tiers(points):
    t1m = stats2_bucket(points, tier="1m", y_col="y", x_col="x").cache()
    t1h = stats2_cascade(t1m, "1h").cache()
    t1d = stats2_cascade(t1h, "1d", from_tier="1h").cache()
    t1m.count(), t1h.count(), t1d.count()
    yield {"1m": t1m, "1h": t1h, "1d": t1d}
    for t in t1m, t1h, t1d:
        t.unpersist()


def _sorted(df):
    out = df.toPandas().sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    return out[sorted(out.columns)]


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_cascade_equals_direct_bitwise(points, tiers, tier):
    direct = stats2_bucket(points, tier=tier, y_col="y", x_col="x")
    pd.testing.assert_frame_equal(_sorted(tiers[tier]), _sorted(direct), check_exact=True)


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_accessors_match_duckdb_builtins(duck, raw_pdf, tiers, tier):
    duck.register("raw_s2", raw_pdf)
    oracle = duck.sql(f"""
        SELECT source,
               date_trunc('{TRUNC[tier]}', event_ts) AS bucket_ts,
               regr_count(y, x)::BIGINT AS n,
               avg(x)          AS avg_x,
               avg(y)          AS avg_y,
               stddev_pop(x)   AS stddev_pop_x,
               stddev_samp(x)  AS stddev_samp_x,
               stddev_pop(y)   AS stddev_pop_y,
               stddev_samp(y)  AS stddev_samp_y,
               regr_slope(y, x)     AS slope,
               regr_intercept(y, x) AS intercept,
               corr(y, x)           AS corr,
               regr_r2(y, x)        AS r2,
               covar_pop(y, x)      AS covar_pop,
               covar_samp(y, x)     AS covar_samp
        FROM raw_s2 GROUP BY 1, 2
    """).df()
    got = stats2_read(tiers[tier]).select(
        "source", "bucket_ts", "n", "avg_x", "avg_y",
        "stddev_pop_x", "stddev_samp_x", "stddev_pop_y", "stddev_samp_y",
        "slope", "intercept", "corr", "r2", "covar_pop", "covar_samp",
    )
    left = _sorted(got)
    right = oracle.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    right = right[sorted(right.columns)]
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("tier", ["1m", "1d"])
def test_skew_kurt_match_explicit_moment_sql(duck, raw_pdf, tiers, tier):
    duck.register("raw_s2", raw_pdf)
    oracle = duck.sql(f"""
        WITH b AS (
          SELECT source, date_trunc('{TRUNC[tier]}', event_ts) AS bucket_ts,
                 y::DOUBLE AS y, avg(y::DOUBLE) OVER (PARTITION BY source,
                 date_trunc('{TRUNC[tier]}', event_ts)) AS mu
          FROM raw_s2)
        SELECT source, bucket_ts,
               CASE WHEN var_pop(y) = 0 THEN NULL
                    ELSE avg(pow(y - mu, 3)) / pow(var_pop(y), 1.5) END AS skewness_y,
               CASE WHEN var_pop(y) = 0 THEN NULL
                    ELSE avg(pow(y - mu, 4)) / pow(var_pop(y), 2) END AS kurtosis_y
        FROM b GROUP BY 1, 2
    """).df()
    got = stats2_read(tiers[tier], accessors=("skewness_y", "kurtosis_y")).select(
        "source", "bucket_ts", "skewness_y", "kurtosis_y"
    )
    left = _sorted(got)
    right = oracle.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    right = right[sorted(right.columns)]
    # binomial-expanded moments lose more bits than the centered two-pass
    # oracle; 1e-6 relative is the honest contract for int y up to ~2^11
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=1e-6, atol=1e-6)


def test_trend_over_time_recovers_planted_slope(spark):
    # y = 5 + 3 * (seconds since the day bucket's start), sampled
    # irregularly across two minutes -> slope exactly 3, intercept = the
    # fit's value at the bucket start (x0)
    rows = [
        ("s", f"2024-01-01 00:0{m}:{s:02d}", 5.0 + 3.0 * (60 * m + s))
        for m, s in [(0, 1), (0, 7), (0, 44), (1, 3), (1, 59)]
    ]
    df = spark.createDataFrame(rows, "source string, ts string, y double").select(
        "source", F.col("ts").cast("timestamp").alias("event_ts"), "y"
    )
    day = stats2_bucket(df, tier="1d", y_col="y")
    out = stats2_read(day, accessors=("slope", "intercept", "r2")).first()
    assert str(out["x0"]) == "2024-01-01 00:00:00"
    assert out["slope"] == pytest.approx(3.0, rel=1e-12)
    assert out["intercept"] == pytest.approx(5.0, rel=1e-9)
    assert out["r2"] == pytest.approx(1.0, rel=1e-12)
    # the same plant cascaded from per-minute summaries: the shift
    # identities must re-origin exactly (bit-equal to the direct build)
    m1 = stats2_bucket(df, tier="1m", y_col="y")
    casc = stats2_cascade(m1, "1d")
    pd.testing.assert_frame_equal(_sorted(casc), _sorted(day), check_exact=True)


@pytest.fixture(scope="module")
def tiers_time(points):
    """Time-mode summaries (x = seconds since each bucket's own start)."""
    t1m = stats2_bucket(points, tier="1m", y_col="y").cache()
    t1h = stats2_cascade(t1m, "1h").cache()
    t1d = stats2_cascade(t1h, "1d", from_tier="1h").cache()
    t1m.count(), t1h.count(), t1d.count()
    yield {"1m": t1m, "1h": t1h, "1d": t1d}
    for t in t1m, t1h, t1d:
        t.unpersist()


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_time_mode_cascade_equals_direct_bitwise(points, tiers_time, tier):
    direct = stats2_bucket(points, tier=tier, y_col="y")
    pd.testing.assert_frame_equal(
        _sorted(tiers_time[tier]), _sorted(direct), check_exact=True
    )


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_time_mode_accessors_match_duckdb(duck, raw_pdf, tiers_time, tier):
    """The regression verify-drive caught in round 4: raw-epoch x makes
    naive power sums cancel past 20 digits (|corr| > 1). Bucket-origin
    x must agree with DuckDB's stable regr_* on the SAME axis."""
    duck.register("raw_s2", raw_pdf)
    oracle = duck.sql(f"""
        SELECT source,
               date_trunc('{TRUNC[tier]}', event_ts) AS bucket_ts,
               regr_count(y, epoch(event_ts))::BIGINT AS n,
               regr_slope(y, epoch(event_ts) - epoch(date_trunc('{TRUNC[tier]}', event_ts))) AS slope,
               regr_intercept(y, epoch(event_ts) - epoch(date_trunc('{TRUNC[tier]}', event_ts))) AS intercept,
               corr(y, epoch(event_ts)) AS corr,
               regr_r2(y, epoch(event_ts)) AS r2
        FROM raw_s2 GROUP BY 1, 2
    """).df()
    got = stats2_read(tiers_time[tier]).select(
        "source", "bucket_ts", "n", "slope", "intercept", "corr", "r2"
    )
    left = _sorted(got)
    right = oracle.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    right = right[sorted(right.columns)]
    # both sides round differently on the epoch axis (DuckDB's running
    # co-moments vs the bucket-origin sums); ~1e-9 agreement observed,
    # 1e-6 is the honest cross-engine contract
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=1e-6, atol=1e-9)
    # sanity the guarantee the old scheme violated
    assert (left["corr"].abs().dropna() <= 1.0 + 1e-12).all()


def test_time_mode_rolling_read_matches_duckdb(duck, raw_pdf, tiers_time):
    """Rolling slope/corr over trailing-K minute buckets in time mode:
    oracle re-aggregates the window's raw rows against raw epoch
    seconds (slope/corr are shift-invariant, so the continuous axis the
    expansion reconstructs must agree)."""
    K = 5
    duck.register("raw_s2", raw_pdf)
    oracle = duck.sql(f"""
        WITH b AS (
          SELECT DISTINCT source, date_trunc('minute', event_ts) AS bucket_ts
          FROM raw_s2),
        rn AS (
          SELECT source, bucket_ts,
                 row_number() OVER (PARTITION BY source ORDER BY bucket_ts) AS rn
          FROM b),
        win AS (
          SELECT a.source, a.bucket_ts, w.bucket_ts AS src_bucket, a.rn
          FROM rn a JOIN rn w
            ON w.source = a.source AND w.rn BETWEEN a.rn - {K - 1} AND a.rn)
        SELECT win.source, win.bucket_ts,
               CASE WHEN max(win.rn) >= {K}
                    THEN regr_slope(r.y, epoch(r.event_ts)) END AS slope,
               CASE WHEN max(win.rn) >= {K}
                    THEN corr(r.y, epoch(r.event_ts)) END AS corr
        FROM win JOIN raw_s2 r
          ON r.source = win.source
         AND date_trunc('minute', r.event_ts) = win.src_bucket
        GROUP BY 1, 2
    """).df()
    got = stats2_rolling_read(
        tiers_time["1m"], window_buckets=K, accessors=("slope", "corr")
    ).select("source", "bucket_ts", "slope", "corr")
    left = _sorted(got)
    right = oracle.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    right = right[sorted(right.columns)]
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=1e-6, atol=1e-9)


def test_degenerate_buckets_follow_sql_null_semantics(spark):
    rows = [
        # constant x, varying y -> slope/intercept/r2/corr NULL, covar 0
        ("cx", "2024-01-01 00:00:01", 2.0, 1.0),
        ("cx", "2024-01-01 00:00:02", 2.0, 3.0),
        ("cx", "2024-01-01 00:00:03", 2.0, 5.0),
        # varying x, constant y -> slope 0, r2 1, corr NULL
        ("cy", "2024-01-01 00:00:01", 1.0, 2.0),
        ("cy", "2024-01-01 00:00:02", 3.0, 2.0),
        ("cy", "2024-01-01 00:00:03", 5.0, 2.0),
        # single point -> every pair stat NULL except covar_pop=0
        ("one", "2024-01-01 00:00:01", 1.0, 2.0),
    ]
    df = spark.createDataFrame(rows, "source string, ts string, x double, y double").select(
        "source", F.col("ts").cast("timestamp").alias("event_ts"), "x", "y"
    )
    got = {
        r["source"]: r
        for r in stats2_read(stats2_bucket(df, tier="1m", y_col="y", x_col="x")).collect()
    }
    cx, cy, one = got["cx"], got["cy"], got["one"]
    assert cx["slope"] is None and cx["intercept"] is None
    assert cx["r2"] is None and cx["corr"] is None
    assert cx["covar_pop"] == 0.0 and cx["covar_samp"] == 0.0
    assert cy["slope"] == 0.0 and cy["intercept"] == 2.0
    assert cy["r2"] == 1.0 and cy["corr"] is None
    assert one["slope"] is None and one["covar_samp"] is None
    assert one["stddev_samp_y"] is None and one["stddev_pop_y"] == 0.0
    assert one["covar_pop"] == 0.0


def test_null_rows_dropped_like_regr_family(spark):
    rows = [
        ("s", "2024-01-01 00:00:01", 1.0, 10.0),
        ("s", "2024-01-01 00:00:02", None, 20.0),
        ("s", "2024-01-01 00:00:03", 3.0, None),
        ("s", None, 4.0, 40.0),
        ("s", "2024-01-01 00:00:05", 5.0, 50.0),
    ]
    df = spark.createDataFrame(rows, "source string, ts string, x double, y double").select(
        "source", F.col("ts").cast("timestamp").alias("event_ts"), "x", "y"
    )
    row = stats2_bucket(df, tier="1d", y_col="y", x_col="x").first()
    assert row["n"] == 2
    assert row["sx"] == 6.0 and row["sy"] == 60.0


def test_salted_build_is_identical(points):
    plain = stats2_bucket(points, tier="1m", y_col="y", x_col="x")
    salted = stats2_bucket(points, tier="1m", y_col="y", x_col="x", salt_buckets=8)
    pd.testing.assert_frame_equal(_sorted(plain), _sorted(salted), check_exact=True)


def test_rolling_read_matches_duckdb_rewindow(duck, raw_pdf, tiers):
    K = 5
    duck.register("raw_s2", raw_pdf)
    oracle = duck.sql(f"""
        WITH b AS (
          SELECT DISTINCT source, date_trunc('minute', event_ts) AS bucket_ts
          FROM raw_s2),
        rn AS (
          SELECT source, bucket_ts,
                 row_number() OVER (PARTITION BY source ORDER BY bucket_ts) AS rn
          FROM b),
        win AS (
          SELECT a.source, a.bucket_ts, w.bucket_ts AS src_bucket, a.rn
          FROM rn a JOIN rn w
            ON w.source = a.source AND w.rn BETWEEN a.rn - {K - 1} AND a.rn)
        SELECT win.source, win.bucket_ts,
               CASE WHEN max(win.rn) >= {K}
                    THEN regr_slope(r.y, r.x) END AS slope,
               CASE WHEN max(win.rn) >= {K}
                    THEN corr(r.y, r.x) END AS corr
        FROM win JOIN raw_s2 r
          ON r.source = win.source
         AND date_trunc('minute', r.event_ts) = win.src_bucket
        GROUP BY 1, 2
    """).df()
    got = stats2_rolling_read(
        tiers["1m"], window_buckets=K, accessors=("slope", "corr")
    ).select("source", "bucket_ts", "slope", "corr")
    left = _sorted(got)
    right = oracle.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    right = right[sorted(right.columns)]
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_build_plan_is_one_exchange(spark, seqs_2k):
    # uncached input: an InMemoryRelation would embed its own build plan's
    # text (and any Exchange in it) into the string being counted
    pts = (
        derive_event_ts(seqs_2k)
        .filter(F.col("event_ts").isNotNull())
        .withColumn("y", F.col("n_tok"))
        .withColumn("x", F.col("n_tok") % 101)
        .select("source", "event_ts", "x", "y")
    )
    df = stats2_bucket(pts, tier="1m", y_col="y", x_col="x")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one hash-partition Exchange on (key, bucket): partial map-side sums,
    # final agg after the shuffle — the minimal shape for a grouped build
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_rollup_job_stats2_plane_end_to_end(spark, seqs_2k, tmp_path):
    """stats2=True maintains the moment tiers alongside stats with the
    same watermark/resume semantics; cascaded 1d is bit-equal to a
    direct 1d build over raw, reruns are no-ops, and a crash between
    the stats2 1m commit and the cascade resumes exactly."""
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob

    # small-int x keeps every power-sum addend < 2^53 so the bitwise
    # cascade==direct pin is honest (module docstring's float caveat)
    seqs = (
        derive_event_ts(seqs_2k)
        .filter(F.col("event_ts").isNotNull())
        .withColumn("xv", F.col("n_tok") % 101)
    )
    direct = _sorted(stats2_bucket(seqs, tier="1d", x_col="xv"))

    job = RollupJob(str(tmp_path / "s2job"))
    job.run(spark, seqs, stats2=True, stats2_x="xv")
    got = _sorted(job.stats2_tables["1d"].read(spark).drop("bucket_day"))
    pd.testing.assert_frame_equal(got, direct, check_exact=True)

    v = job.stats2_tables["1m"].current_snapshot().version
    job.run(spark, seqs, stats2=True, stats2_x="xv")
    assert job.stats2_tables["1m"].current_snapshot().version == v

    crashed = RollupJob(str(tmp_path / "s2crash"))
    with pytest.raises(RuntimeError, match="stats2_1m"):
        crashed.run(spark, seqs, stats2=True, stats2_x="xv", fail_after="stats2_1m")
    assert crashed.stats2_tables["1h"].current_snapshot() is None
    crashed.run(spark, seqs, stats2=True, stats2_x="xv")
    got2 = _sorted(crashed.stats2_tables["1d"].read(spark).drop("bucket_day"))
    pd.testing.assert_frame_equal(got2, direct, check_exact=True)


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_realtime_stats2_equals_full_recompute(spark, seqs_2k, tmp_path, tier):
    """The real-time view at a mid-corpus cut equals a full one-pass
    build at every tier, bit for bit; the committed side is genuinely
    stale (the tail holds rows past the watermark)."""
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
    from timeseriesvectordbpattermatcher_spark.plans.realtime import realtime_stats2

    corpus = (
        derive_event_ts(seqs_2k)
        .filter(F.col("event_ts").isNotNull())
        .withColumn("xv", F.col("n_tok") % 101)
    )
    ts = sorted(r[0] for r in corpus.select("event_ts").distinct().collect())
    cut = ts[int(len(ts) * 0.7)]
    head = corpus.filter(F.col("event_ts") <= F.lit(cut.isoformat()))
    assert corpus.count() > head.count() > 0

    job = RollupJob(str(tmp_path / "rt2"))
    job.run(spark, head, stats2=True, stats2_x="xv")

    full_1m = stats2_bucket(corpus, tier="1m", x_col="xv")
    full = full_1m if tier == "1m" else stats2_cascade(
        full_1m if tier == "1h" else stats2_cascade(full_1m, "1h"), tier
    )
    view = realtime_stats2(job, spark, corpus, tier=tier, x_col="xv")
    pd.testing.assert_frame_equal(_sorted(view), _sorted(full), check_exact=True)


@pytest.mark.parametrize("tier", ["1m", "1d"])
def test_slope_inference_matches_explicit_sql(duck, raw_pdf, tiers, tier):
    """slope_stderr / slope_t (classical OLS inference): DuckDB computes
    sigma^2 = (Myy - Mxy^2/Mxx)/(n-2), se = sigma/sqrt(Mxx) from raw
    with its own centered aggregates."""
    duck.register("raw_s2", raw_pdf)
    oracle = duck.sql(f"""
        SELECT source, date_trunc('{TRUNC[tier]}', event_ts) AS bucket_ts,
               CASE WHEN count(*) > 2 AND var_pop(x) > 0 THEN
                 sqrt(greatest(0,
                     (var_pop(y) - pow(covar_pop(y, x), 2) / var_pop(x))
                     * count(*))
                   / ((count(*) - 2) * var_pop(x) * count(*)))
               END AS slope_stderr,
               CASE WHEN count(*) > 2 AND var_pop(x) > 0 THEN
                 regr_slope(y, x) /
                 nullif(sqrt(greatest(0,
                     (var_pop(y) - pow(covar_pop(y, x), 2) / var_pop(x))
                     * count(*))
                   / ((count(*) - 2) * var_pop(x) * count(*))), 0)
               END AS slope_t
        FROM raw_s2 GROUP BY 1, 2
    """).df()
    got = stats2_read(
        tiers[tier], accessors=("slope_stderr", "slope_t")
    ).select("source", "bucket_ts", "slope_stderr", "slope_t")
    left = _sorted(got)
    right = oracle.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    right = right[sorted(right.columns)]
    pd.testing.assert_frame_equal(left, right, check_dtype=False, rtol=1e-6, atol=1e-9)


def test_slope_inference_degenerate(spark):
    # perfect line: residuals 0 -> stderr 0 -> t NULL (division guard);
    # n=2 line: saturated -> stderr NULL
    rows = [
        ("line", "2024-01-01 00:00:01", 1.0, 3.0),
        ("line", "2024-01-01 00:00:02", 2.0, 5.0),
        ("line", "2024-01-01 00:00:03", 3.0, 7.0),
        ("two", "2024-01-01 00:00:01", 1.0, 3.0),
        ("two", "2024-01-01 00:00:02", 2.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "source string, ts string, x double, y double").select(
        "source", F.col("ts").cast("timestamp").alias("event_ts"), "x", "y"
    )
    got = {
        r["source"]: r
        for r in stats2_read(
            stats2_bucket(df, tier="1d", y_col="y", x_col="x"),
            accessors=("slope", "slope_stderr", "slope_t"),
        ).collect()
    }
    assert got["line"]["slope"] == 2.0
    assert got["line"]["slope_stderr"] == 0.0
    assert got["line"]["slope_t"] is None
    assert got["two"]["slope_stderr"] is None and got["two"]["slope_t"] is None
