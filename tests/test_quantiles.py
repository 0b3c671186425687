"""Tiered exact quantiles (operators/quantiles.py).

Oracle: DuckDB recomputes the inverted-CDF (type 1) quantile DIRECTLY from
the raw rows at every tier granularity via a window cumulative — a
different algorithm with no histogram anywhere — and every tier's
histogram-derived quantile must equal it exactly (ints, no tolerance).
Merge exactness is the whole point: 1h/1d histograms are built ONLY from
the 1m histograms, never from raw.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.quantiles import (
    add_hist_quantiles,
    hist_1m,
    hist_cascade,
    hist_quantile,
    hist_rollup,
)
from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts


QS = {"p50": 0.50, "p95": 0.95, "p99": 0.99}


def _oracle(duck, raw_pdf, trunc, q):
    """Smallest value whose cumulative count reaches ceil(q * n), per
    (source, bucket) — pure window SQL, no histograms."""
    duck.register("raw_q", raw_pdf)
    return duck.sql(f"""
        WITH c AS (
          SELECT source, date_trunc('{trunc}', event_ts) AS bucket_ts,
                 n_tok, count(*) AS c
          FROM raw_q WHERE n_tok IS NOT NULL AND event_ts IS NOT NULL
          GROUP BY 1, 2, 3
        ), w AS (
          SELECT source, bucket_ts, n_tok,
                 sum(c) OVER (PARTITION BY source, bucket_ts ORDER BY n_tok) AS cum,
                 sum(c) OVER (PARTITION BY source, bucket_ts) AS tot
          FROM c
        )
        SELECT source, bucket_ts, min(n_tok) AS want
        FROM w WHERE cum >= greatest(1, ceil({q} * tot))
        GROUP BY 1, 2
    """).df()


@pytest.fixture(scope="module")
def tiers(spark, seqs_2k):
    seqs = derive_event_ts(seqs_2k).select("source", "event_ts", "n_tok")
    t1m = hist_1m(seqs).cache()
    t1h = hist_cascade(t1m, "1h").cache()
    t1d = hist_cascade(t1h, "1d").cache()
    t1m.count(), t1h.count(), t1d.count()
    yield seqs, {"minute": t1m, "hour": t1h, "day": t1d}
    for t in (t1m, t1h, t1d):
        t.unpersist()


@pytest.mark.parametrize("trunc", ["minute", "hour", "day"])
@pytest.mark.parametrize("qname,q", sorted(QS.items()))
def test_tier_quantiles_match_raw_recompute(tiers, duck, trunc, qname, q):
    seqs, tier_dfs = tiers
    got = (
        tier_dfs[trunc]
        .select("source", "bucket_ts", hist_quantile("hist", q).alias("got"))
        .toPandas()
    )
    want = _oracle(duck, seqs.toPandas(), trunc, q)
    m = got.merge(want, on=["source", "bucket_ts"], how="outer", indicator=True)
    assert (m["_merge"] == "both").all(), m[m._merge != "both"].head()
    bad = m[m.got != m.want]
    assert bad.empty, bad.head(10)


def test_hist_n_equals_row_count(tiers, duck):
    seqs, tier_dfs = tiers
    out = add_hist_quantiles(tier_dfs["day"]).select("source", "bucket_ts", "hist_n")
    duck.register("raw_q", seqs.toPandas())
    want = duck.sql("""
        SELECT source, date_trunc('day', event_ts) AS bucket_ts, count(*) AS n
        FROM raw_q WHERE n_tok IS NOT NULL AND event_ts IS NOT NULL GROUP BY 1, 2
    """).df()
    m = out.toPandas().merge(want, on=["source", "bucket_ts"])
    assert len(m) == len(want) and (m.hist_n == m.n).all()


def test_merge_vs_direct_build_identical(spark, seqs_2k):
    """hist at 1d built by cascading 1m->1h->1d == hist built directly from
    raw at day granularity (associativity of histogram addition)."""
    seqs = derive_event_ts(seqs_2k).select("source", "event_ts", "n_tok")
    cascaded = hist_cascade(hist_cascade(hist_1m(seqs), "1h"), "1d")
    direct = hist_rollup(
        seqs.withColumn("bucket_ts", F.date_trunc("day", "event_ts")),
        ["source", "bucket_ts"],
    )
    a = {
        (r["source"], r["bucket_ts"]): sorted(r["hist"].items())
        for r in cascaded.collect()
    }
    b = {
        (r["source"], r["bucket_ts"]): sorted(r["hist"].items())
        for r in direct.collect()
    }
    assert a == b


def test_null_values_and_empty_hist(spark):
    import datetime as dt

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 0, 30), 5),
        ("a", dt.datetime(2024, 1, 1, 0, 0, 40), None),
        ("b", dt.datetime(2024, 1, 1, 0, 1, 0), None),  # all-null group
    ]
    df = spark.createDataFrame(rows, "source string, event_ts timestamp, n_tok int")
    h = hist_1m(df)
    got = {(r["source"]): dict(r["hist"]) for r in h.collect()}
    assert got == {"a": {5: 1}, "b": {}}
    q = add_hist_quantiles(h).select("source", "p50", "hist_n").collect()
    by = {r["source"]: (r["p50"], r["hist_n"]) for r in q}
    assert by["a"] == (5, 1)
    assert by["b"] == (None, 0)  # empty hist -> NULL quantile, not a crash
    # cascade keeps the empty group alive
    c = hist_cascade(h, "1h")
    got_c = {r["source"]: dict(r["hist"]) for r in c.collect()}
    assert got_c == {"a": {5: 1}, "b": {}}


def test_bucketized_float_domain(spark, duck):
    """Float/unbounded domains pass an explicit quantizer; quantiles are
    then exact over the chosen buckets (pinned vs DuckDB on the bucketed
    values)."""
    df = spark.range(5000).select(
        F.lit("s").alias("source"),
        (F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(secs=F.col("id"))).alias("event_ts"),
        (F.pmod(F.xxhash64("id"), F.lit(100000)).cast("double") / 7.0).alias("lat"),
    )
    h = hist_1m(df, value_col="lat", bucket=F.ceil(F.log2(F.col("lat") + 1)))
    got = (
        add_hist_quantiles(hist_cascade(h, "1d"), {"p95": 0.95})
        .select("source", "p95")
        .first()
    )
    duck.register("raw_f", df.select("source", "lat").toPandas())
    want = duck.sql("""
        WITH c AS (
          SELECT source, CAST(ceil(log2(lat + 1)) AS INT) AS b, count(*) AS c
          FROM raw_f GROUP BY 1, 2
        ), w AS (
          SELECT source, b, sum(c) OVER (PARTITION BY source ORDER BY b) AS cum,
                 sum(c) OVER (PARTITION BY source) AS tot FROM c
        )
        SELECT min(b) FROM w WHERE cum >= greatest(1, ceil(0.95 * tot))
    """).fetchone()[0]
    assert got["p95"] == want


def _hist_sets(job, spark):
    out = {}
    for t in ("1m", "1h", "1d"):
        df = job.hist_tables[t].read(spark)
        out[t] = (
            None
            if df is None
            else {
                (r["source"], r["bucket_ts"]): tuple(sorted(r["hist"].items()))
                for r in df.collect()
            }
        )
    return out


def test_rollup_job_hist_plane_end_to_end(spark, seqs_2k, tmp_path, duck):
    """quantile_hist=True maintains the histogram tiers alongside stats;
    day-tier p95 from the CASCADED histograms == DuckDB raw recompute."""
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob

    seqs = derive_event_ts(seqs_2k)
    job = RollupJob(str(tmp_path / "hjob"))
    job.run(spark, seqs, quantile_hist=True)
    day = job.hist_tables["1d"].read(spark)
    got = (
        add_hist_quantiles(day, {"p95": 0.95})
        .select("source", "bucket_ts", "p95")
        .toPandas()
    )
    want = _oracle(duck, seqs.select("source", "event_ts", "n_tok").toPandas(), "day", 0.95)
    m = got.merge(want, on=["source", "bucket_ts"], how="outer", indicator=True)
    assert (m["_merge"] == "both").all() and (m.p95 == m.want).all()
    # rerun over same input is a no-op on the hist plane too
    v = job.hist_tables["1m"].current_snapshot().version
    job.run(spark, seqs, quantile_hist=True)
    assert job.hist_tables["1m"].current_snapshot().version == v


def test_hist_plane_resumes_after_crash_between_planes(spark, tmp_path):
    """Crash AFTER the stats 1m commit but BEFORE the hist 1m commit: the
    per-plane watermarks make the rerun converge to the clean-run state."""
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    seqs = derive_event_ts(synth_seqs(spark, 1200, seed=31))
    clean = RollupJob(str(tmp_path / "hclean"))
    clean.run(spark, seqs, quantile_hist=True)
    want = _hist_sets(clean, spark)

    crashed = RollupJob(str(tmp_path / "hcrash"))
    with pytest.raises(RuntimeError, match="injected failure after 1m"):
        crashed.run(spark, seqs, quantile_hist=True, fail_after="1m")
    assert crashed.hist_tables["1m"].current_snapshot() is None
    crashed.run(spark, seqs, quantile_hist=True)  # resume
    assert _hist_sets(crashed, spark) == want

    crashed2 = RollupJob(str(tmp_path / "hcrash2"))
    with pytest.raises(RuntimeError, match="hist_1m"):
        crashed2.run(spark, seqs, quantile_hist=True, fail_after="hist_1m")
    assert crashed2.hist_tables["1h"].current_snapshot() is None
    crashed2.run(spark, seqs, quantile_hist=True)
    assert _hist_sets(crashed2, spark) == want


def test_fold_expression_equals_window_path(tiers):
    """hist_quantile (interpreted fold, for ad-hoc expressions) and
    add_hist_quantiles (codegen'd explode+window, the fast path) are two
    algorithms for the same definition — pinned equal on every tier."""
    _, tier_dfs = tiers
    for trunc in ("minute", "day"):
        df = tier_dfs[trunc]
        a = (
            df.select(
                "source", "bucket_ts", hist_quantile("hist", 0.95).alias("p95")
            )
            .toPandas()
            .sort_values(["source", "bucket_ts"])
            .reset_index(drop=True)
        )
        b = (
            add_hist_quantiles(df, {"p95": 0.95})
            .select("source", "bucket_ts", "p95")
            .toPandas()
            .sort_values(["source", "bucket_ts"])
            .reset_index(drop=True)
        )
        assert a.equals(b), trunc


def test_bad_inputs():
    with pytest.raises(ValueError, match="tier"):
        hist_cascade(None, "5m")
    with pytest.raises(ValueError, match="q must be"):
        hist_quantile("hist", 0.0)
    with pytest.raises(ValueError, match="q must be"):
        hist_quantile("hist", 1.5)


def test_plan_is_udf_free_and_bounded(spark, seqs_2k):
    """No Python anywhere: BatchEvalPython/ArrowEvalPython absent from the
    full 1m->1d plan including quantile extraction."""
    seqs = derive_event_ts(seqs_2k).select("source", "event_ts", "n_tok")
    out = add_hist_quantiles(hist_cascade(hist_cascade(hist_1m(seqs), "1h"), "1d"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "*(" in plan  # whole-stage codegen spans present (AQE star form)
