"""Real-time continuous aggregates (plans/realtime.py).

Oracle: the view must equal a FULL recompute over all raw rows — built
with the same operators but over the whole corpus in one pass (no
committed/fresh split anywhere), plus a DuckDB recount of the seam
bucket. The cut is chosen mid-minute so the watermark bucket is
genuinely partial in the committed tier: the test fails if the seam
merge double-counts or drops either side.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.quantiles import hist_rollup
from timeseriesvectordbpattermatcher_spark.operators.rollup import (
    TIER_TRUNC,
    derive_event_ts,
    rollup_all_tiers,
)
from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
from timeseriesvectordbpattermatcher_spark.plans.realtime import (
    realtime_hist,
    realtime_stats,
)


@pytest.fixture(scope="module")
def corpus(spark, seqs_2k):
    df = derive_event_ts(seqs_2k).filter(F.col("event_ts").isNotNull()).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def cut(corpus):
    """A timestamp strictly inside a populated minute bucket, so the
    committed watermark bucket is partial."""
    ts = [r[0] for r in corpus.select("event_ts").orderBy("event_ts").collect()]
    n = len(ts)
    for i in range(int(n * 0.6), n - 1):
        if ts[i + 1] > ts[i] and ts[i].replace(second=0) == ts[i + 1].replace(second=0):
            return ts[i]
    raise RuntimeError("no mid-minute cut found in corpus")


@pytest.fixture(scope="module")
def job(spark, corpus, cut, tmp_path_factory):
    j = RollupJob(str(tmp_path_factory.mktemp("rt") / "job"))
    head = corpus.filter(F.col("event_ts") <= F.lit(cut.isoformat()))
    j.run(spark, head, quantile_hist=True)
    return j


def _sorted(df, cols=("source", "bucket_ts")):
    out = df.toPandas().sort_values(list(cols)).reset_index(drop=True)
    return out[sorted(out.columns)]


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_realtime_stats_equals_full_recompute(spark, corpus, job, cut, tier):
    want = _sorted(rollup_all_tiers(corpus)[tier])
    got = _sorted(realtime_stats(job, spark, corpus, tier=tier))
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # the committed side really is stale (cut excluded some rows), so
    # equality above proves the fresh-tail merge did the work
    committed = job.tables[tier].read(spark)
    assert committed.count() <= len(want)
    assert committed.agg(F.sum("cnt")).first()[0] < corpus.count()


def test_seam_bucket_merges_not_duplicates(spark, corpus, job, cut):
    """The watermark minute itself: committed holds rows <= cut, the
    fresh tail the rest; the view's bucket must equal a DuckDB recount
    of ALL rows in that minute (and appear exactly once)."""
    wm_bucket = cut.replace(second=0)
    got = (
        realtime_stats(job, spark, corpus, tier="1m")
        .filter(F.col("bucket_ts") == F.lit(wm_bucket.isoformat()))
        .toPandas()
    )
    import duckdb

    con = duckdb.connect()
    con.register(
        "raw_rt",
        corpus.select("source", "event_ts", "n_tok").toPandas(),
    )
    want = con.sql(f"""
        SELECT source, count(*) AS cnt, sum(n_tok) AS sum_n_tok
        FROM raw_rt
        WHERE date_trunc('minute', event_ts) = TIMESTAMP '{wm_bucket}'
        GROUP BY 1 ORDER BY 1
    """).df()
    got = got.sort_values("source").reset_index(drop=True)
    assert not got["source"].duplicated().any()
    assert (got["cnt"].to_numpy() == want["cnt"].to_numpy()).all()
    assert (got["sum_n_tok"].to_numpy() == want["sum_n_tok"].to_numpy()).all()
    # and the committed side alone disagrees (it is genuinely partial)
    comm = (
        job.tables["1m"].read(spark)
        .filter(F.col("bucket_ts") == F.lit(wm_bucket.isoformat()))
        .toPandas()
    )
    assert comm["cnt"].sum() < got["cnt"].sum()


@pytest.mark.parametrize("tier", ["1m", "1d"])
def test_realtime_hist_equals_full_recompute(spark, corpus, job, tier):
    keyed = corpus.withColumn(
        "bucket_ts", F.date_trunc(TIER_TRUNC[tier], F.col("event_ts"))
    )
    want = hist_rollup(keyed, ["source", "bucket_ts"]).selectExpr(
        "source", "bucket_ts", "explode_outer(hist) as (v, c)"
    )
    got = realtime_hist(job, spark, corpus, tier=tier).selectExpr(
        "source", "bucket_ts", "explode_outer(hist) as (v, c)"
    )
    w = _sorted(want, ("source", "bucket_ts", "v"))
    g = _sorted(got, ("source", "bucket_ts", "v"))
    pd.testing.assert_frame_equal(g, w, check_exact=True)


def test_realtime_before_any_commit_is_plain_rollup(spark, corpus, tmp_path):
    empty_job = RollupJob(str(tmp_path / "fresh"))
    got = _sorted(realtime_stats(empty_job, spark, corpus, tier="1h"))
    want = _sorted(rollup_all_tiers(corpus)["1h"])
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    with pytest.raises(ValueError):
        realtime_stats(empty_job, spark, corpus, tier="5m")


# ---------------- sketch planes (dds / cms / topk) ----------------

from timeseriesvectordbpattermatcher_spark.plans.realtime import (  # noqa: E402
    realtime_cms,
    realtime_dds,
    realtime_topk,
)

W, D, CAP = 256, 3, 6


@pytest.fixture(scope="module")
def job_sketch(spark, corpus, cut, tmp_path_factory):
    j = RollupJob(str(tmp_path_factory.mktemp("rts") / "job"))
    head = corpus.filter(F.col("event_ts") <= F.lit(cut.isoformat()))
    j.run(spark, head, dds=True, cms=True, cms_width=W, cms_depth=D,
          topk=True, topk_cap=CAP)
    return j


def _map_flat(df, col):
    out = (
        df.selectExpr("source", "bucket_ts", f"explode_outer({col}) as (k, c)")
        .toPandas()
        .sort_values(["source", "bucket_ts", "k"])
        .reset_index(drop=True)
    )
    return out


def test_realtime_dds_equals_full_recompute(spark, corpus, job_sketch):
    from timeseriesvectordbpattermatcher_spark.operators.ddsketch import (
        dds_bucket,
        dds_cascade,
    )

    want = _map_flat(dds_cascade(dds_bucket(corpus), "1h"), "dds")
    got = _map_flat(realtime_dds(job_sketch, spark, corpus, tier="1h"), "dds")
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_realtime_cms_equals_full_recompute(spark, corpus, job_sketch):
    from timeseriesvectordbpattermatcher_spark.operators.cms import cms_bucket

    want = _map_flat(cms_bucket(corpus, tier="1m", width=W, depth=D), "cms")
    got = _map_flat(
        realtime_cms(job_sketch, spark, corpus, tier="1m", width=W, depth=D),
        "cms",
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_realtime_topk_bounds_and_exact_regime(spark, corpus, job_sketch, duck):
    # bounds at the build cap: est <= true <= est + hh_err everywhere
    view = realtime_topk(job_sketch, spark, corpus, tier="1m", cap=CAP)
    got = (
        view.selectExpr(
            "source", "bucket_ts", "explode(hh) as (token, est)", "hh_err"
        ).toPandas()
    )
    duck.register("raw_rtk", corpus.select("source", "event_ts", "tokens").toPandas())
    exact = duck.sql("""
        SELECT source, bucket_ts, tok AS token, count(*) AS c FROM (
          SELECT source, date_trunc('minute', event_ts) AS bucket_ts,
                 unnest(tokens) AS tok FROM raw_rtk
        ) GROUP BY 1, 2, 3
    """).df()
    got["bucket_ts"] = got["bucket_ts"].astype(exact["bucket_ts"].dtype)
    m = got.merge(exact, on=["source", "bucket_ts", "token"], how="left")
    assert m["c"].notna().all()
    assert (m["est"] <= m["c"]).all()
    assert (m["c"] <= m["est"] + m["hh_err"]).all()
    # exact regime (cap >= distinct tokens): the seam adds no error and
    # the view equals a direct build bit for bit
    from timeseriesvectordbpattermatcher_spark.operators.heavyhitters import (
        topk_bucket,
    )

    big_job = job_sketch  # committed summaries are CAP-compressed, so the
    # exact-regime check must run against a job built at the big cap
    import tempfile

    j2 = RollupJob(tempfile.mkdtemp(prefix="rtk_"))
    cut_expr = job_sketch.tables["1m"].current_snapshot().watermark
    head = corpus.filter(F.col("event_ts") <= F.lit(cut_expr))
    j2.run(spark, head, topk=True, topk_cap=10**6)
    want = _map_flat(topk_bucket(corpus, cap=10**6), "hh")
    got2 = _map_flat(realtime_topk(j2, spark, corpus, tier="1m", cap=10**6), "hh")
    pd.testing.assert_frame_equal(
        got2[["source", "bucket_ts", "k", "c"]],
        want[["source", "bucket_ts", "k", "c"]],
        check_exact=True,
    )


# ---------------- bridge planes (tw / distinct / hb) ----------------

from timeseriesvectordbpattermatcher_spark.plans.realtime import (  # noqa: E402
    realtime_distinct,
    realtime_hb,
    realtime_tw,
)

LGK, HB_PERIOD = 12, 120.0


@pytest.fixture(scope="module")
def job_bridge(spark, corpus, cut, tmp_path_factory):
    j = RollupJob(str(tmp_path_factory.mktemp("rtb") / "job"))
    head = corpus.filter(F.col("event_ts") <= F.lit(cut.isoformat()))
    j.run(spark, head, time_weight=True, distinct=True, distinct_lgk=LGK,
          heartbeat=True, hb_period_sec=HB_PERIOD)
    return j


@pytest.mark.parametrize("tier", ["1m", "1h"])
def test_realtime_tw_equals_full_recompute(spark, corpus, job_bridge, tier):
    """Bitwise on this int-valued second-aligned corpus: every segment
    area is an integer-valued double, so addition order (committed +
    fresh + seam bridge vs one pass) cannot differ."""
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        time_weight_bucket,
        time_weight_cascade,
    )

    pts = corpus.groupBy("source", "event_ts").agg(F.max("n_tok").alias("_twv"))
    direct_1m = time_weight_bucket(pts, tier="1m", val_col="_twv")
    want_df = direct_1m if tier == "1m" else time_weight_cascade(direct_1m, tier)
    want = _sorted(want_df)
    got = _sorted(realtime_tw(job_bridge, spark, corpus, tier=tier))
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # committed side genuinely stale
    assert job_bridge.tw_tables[tier].read(spark).agg(F.sum("n")).first()[0] < \
        pts.count()


def test_realtime_hb_equals_full_recompute(spark, corpus, job_bridge):
    from timeseriesvectordbpattermatcher_spark.operators.stateagg import (
        heartbeat_bucket,
        heartbeat_cascade,
    )

    want = _sorted(
        heartbeat_cascade(heartbeat_bucket(corpus, HB_PERIOD, tier="1m"), "1h")
    )
    got = _sorted(realtime_hb(job_bridge, spark, corpus, tier="1h",
                              period_sec=HB_PERIOD))
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_realtime_distinct_within_published_bound(spark, corpus, job_bridge, duck):
    from timeseriesvectordbpattermatcher_spark.operators.distinct import (
        distinct_estimate,
    )

    got = distinct_estimate(
        realtime_distinct(job_bridge, spark, corpus, tier="1h", lgk=LGK)
    ).toPandas()
    duck.register("raw_rd", corpus.select("source", "event_ts", "doc_id").toPandas())
    want = duck.sql("""
        SELECT source, date_trunc('hour', event_ts) AS bucket_ts,
               count(DISTINCT doc_id) AS d
        FROM raw_rd GROUP BY 1, 2
    """).df()
    got["bucket_ts"] = got["bucket_ts"].astype(want["bucket_ts"].dtype)
    m = got.merge(want, on=["source", "bucket_ts"])
    assert len(m) == len(want)
    rse = 1.04 / (2 ** (LGK / 2))
    bad = (m["approx_distinct"] - m["d"]).abs() > 5 * rse * m["d"] + 1
    assert not bad.any(), m[bad]


def test_same_tier_cascade_on_full_buckets_is_identity(spark, corpus):
    """The relaxed guard: cascading a tier onto ITSELF with one complete
    summary per bucket must return the same rows (no partials to merge,
    no spurious bridges)."""
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        time_weight_bucket,
        time_weight_cascade,
    )

    pts = corpus.groupBy("source", "event_ts").agg(F.max("n_tok").alias("_twv"))
    t1m = time_weight_bucket(pts, tier="1m", val_col="_twv")
    again = time_weight_cascade(t1m, "1m", from_tier="1m")
    pd.testing.assert_frame_equal(_sorted(again), _sorted(t1m), check_exact=True)
    with pytest.raises(ValueError, match="coarsen"):
        time_weight_cascade(t1m, "1m", from_tier="1h")
