"""Mergeable HLL distinct tiers (operators/distinct.py).

Oracles: DuckDB exact COUNT(DISTINCT ...) bounds the estimate at 5-sigma of
the published HLL error at EVERY tier — direct-built and cascaded — plus a
determinism pin (same cascade re-run == identical estimates). Bitwise
grouping-independence is deliberately NOT pinned: HIP-vs-composite
estimators and sparse->dense promotion make 1m->1h->1d, 1m->1d, and a
direct rebuild each legitimately different inside the band (see module
docstring).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.distinct import (
    distinct_bucket,
    distinct_cascade,
    distinct_estimate,
)
from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts

TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
LGK = 12
RSE = 1.04 / math.sqrt(2**LGK)


@pytest.fixture(scope="module")
def rows(spark, seqs_2k):
    df = derive_event_ts(seqs_2k).select("source", "event_ts", "doc_id").cache()
    df.count()
    yield df
    df.unpersist()


def _tier_estimates(rows, tier):
    if tier == "1m":
        df = distinct_bucket(rows, tier="1m", lgk=LGK)
    elif tier == "1h":
        df = distinct_cascade(distinct_bucket(rows, tier="1m", lgk=LGK), "1h")
    else:
        df = distinct_cascade(
            distinct_cascade(distinct_bucket(rows, tier="1m", lgk=LGK), "1h"),
            "1d",
            from_tier="1h",
        )
    return distinct_estimate(df).select("source", "bucket_ts", "approx_distinct")


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_cascaded_estimate_within_hll_error_of_exact(rows, duck, tier):
    got = _tier_estimates(rows, tier).toPandas()
    duck.register("dst_rows", rows.toPandas())
    want = duck.sql(f"""
        SELECT source, date_trunc('{TRUNC[tier]}', event_ts) AS bucket_ts,
               count(DISTINCT doc_id) AS exact
        FROM dst_rows WHERE event_ts IS NOT NULL GROUP BY 1, 2
    """).df()
    m = got.merge(want, on=["source", "bucket_ts"], how="outer", indicator=True)
    assert (m["_merge"] == "both").all()
    rel = (m["approx_distinct"] - m["exact"]).abs() / m["exact"].clip(lower=1)
    assert (rel <= 5 * RSE).all(), m[rel > 5 * RSE].head()


def test_cascade_is_deterministic(rows):
    """The same cascade plan re-run yields identical estimates — callers can
    cache/compare tier tables across runs."""
    a = _tier_estimates(rows, "1d").toPandas().sort_values(["source", "bucket_ts"])
    b = _tier_estimates(rows, "1d").toPandas().sort_values(["source", "bucket_ts"])
    assert (a.reset_index(drop=True) == b.reset_index(drop=True)).all().all()


def test_merge_groupings_agree_within_band(rows):
    """1m->1h->1d and 1m->1d may differ bitwise (sparse->dense promotion)
    but both must stay within the 5-sigma band of each other's estimate."""
    d1m = distinct_bucket(rows, tier="1m", lgk=LGK)
    via_1h = distinct_estimate(
        distinct_cascade(distinct_cascade(d1m, "1h"), "1d", from_tier="1h"), "e_a"
    ).select("source", "bucket_ts", "e_a")
    straight = distinct_estimate(distinct_cascade(d1m, "1d"), "e_b").select(
        "source", "bucket_ts", "e_b"
    )
    m = via_1h.join(straight, ["source", "bucket_ts"], "full").toPandas()
    assert m.notna().all().all()
    rel = (m["e_a"] - m["e_b"]).abs() / m[["e_a", "e_b"]].min(axis=1).clip(lower=1)
    assert (rel <= 10 * RSE).all(), m[rel > 10 * RSE].head()


def test_direct_rebuild_may_differ_but_stays_in_band(rows, duck):
    """Documents the HIP-vs-composite estimator split: the direct 1h build
    need not equal the cascade, but BOTH stay inside the 5-sigma band (the
    accuracy test above covers the cascaded side)."""
    direct = (
        distinct_estimate(distinct_bucket(rows, tier="1h", lgk=LGK))
        .select("source", "bucket_ts", "approx_distinct")
        .toPandas()
    )
    duck.register("dst_rows", rows.toPandas())
    want = duck.sql("""
        SELECT source, date_trunc('hour', event_ts) AS bucket_ts,
               count(DISTINCT doc_id) AS exact
        FROM dst_rows WHERE event_ts IS NOT NULL GROUP BY 1, 2
    """).df()
    m = direct.merge(want, on=["source", "bucket_ts"], how="outer", indicator=True)
    assert (m["_merge"] == "both").all()
    rel = (m["approx_distinct"] - m["exact"]).abs() / m["exact"].clip(lower=1)
    assert (rel <= 5 * RSE).all(), m[rel > 5 * RSE].head()


def test_union_overlap_corrected(spark):
    # two 1m buckets sharing most ids: the 1h distinct must NOT be the sum
    ids = [(f"d{i}", "2024-01-01 00:00:30") for i in range(500)] + [
        (f"d{i}", "2024-01-01 00:01:30") for i in range(400, 900)
    ]
    df = spark.createDataFrame(ids, "doc_id string, ts string").selectExpr(
        "'a' as source", "cast(ts as timestamp) as event_ts", "doc_id"
    )
    d1m = distinct_bucket(df, lgk=LGK)
    est_1h = (
        distinct_estimate(distinct_cascade(d1m, "1h")).collect()[0]["approx_distinct"]
    )
    assert abs(est_1h - 900) <= 5 * RSE * 900  # not ~1000
    assert est_1h < 980


def test_tier_guards(rows):
    with pytest.raises(ValueError, match="coarsen"):
        distinct_cascade(distinct_bucket(rows), "1m", from_tier="1h")
    with pytest.raises(ValueError, match="tier"):
        distinct_bucket(rows, tier="5m")


# --- RollupJob distinct plane (plans/checkpoint.py) -------------------------


def test_rollup_job_distinct_plane_end_to_end(spark, seqs_2k, rows, duck, tmp_path):
    """distinct=True maintains the HLL tiers alongside stats; the CASCADED
    1d estimates stay inside the 5-sigma band of DuckDB's exact COUNT
    DISTINCT, and a rerun over the same input is a no-op."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        derive_event_ts as _dts,
    )
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob

    seqs = _dts(seqs_2k)
    job = RollupJob(str(tmp_path / "djob"))
    job.run(spark, seqs, distinct=True)
    got = (
        distinct_estimate(job.distinct_tables["1d"].read(spark))
        .select("source", "bucket_ts", "approx_distinct")
        .toPandas()
    )
    duck.register("dst_rows", rows.toPandas())
    want = duck.sql("""
        SELECT source, date_trunc('day', event_ts) AS bucket_ts,
               count(DISTINCT doc_id) AS exact
        FROM dst_rows WHERE event_ts IS NOT NULL GROUP BY 1, 2
    """).df()
    m = got.merge(want, on=["source", "bucket_ts"], how="outer", indicator=True)
    assert (m["_merge"] == "both").all()
    rel = (m["approx_distinct"] - m["exact"]).abs() / m["exact"].clip(lower=1)
    assert (rel <= 5 * RSE).all(), m[rel > 5 * RSE].head()
    v = job.distinct_tables["1m"].current_snapshot().version
    job.run(spark, seqs, distinct=True)
    assert job.distinct_tables["1m"].current_snapshot().version == v


def test_distinct_plane_resumes_after_crash(spark, tmp_path, duck):
    """Crash after the distinct 1m commit: the rerun must converge — the
    sketch plane's partition keys and row counts equal the clean run's, and
    both runs' estimates stay in-band vs exact (sketch bytes are stream-
    order dependent, so byte equality is deliberately not asserted)."""
    import pytest as _pytest

    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        derive_event_ts as _dts,
    )
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    seqs = _dts(synth_seqs(spark, 1000, seed=37))
    clean = RollupJob(str(tmp_path / "dclean"))
    clean.run(spark, seqs, distinct=True)

    crashed = RollupJob(str(tmp_path / "dcrash"))
    with _pytest.raises(RuntimeError, match="distinct_1m"):
        crashed.run(spark, seqs, distinct=True, fail_after="distinct_1m")
    assert crashed.distinct_tables["1h"].current_snapshot() is None
    crashed.run(spark, seqs, distinct=True)  # resume

    for t in ("1m", "1h", "1d"):
        a = clean.distinct_tables[t].read(spark)
        b = crashed.distinct_tables[t].read(spark)
        ka = {(r["source"], r["bucket_ts"]) for r in a.select("source", "bucket_ts").collect()}
        kb = {(r["source"], r["bucket_ts"]) for r in b.select("source", "bucket_ts").collect()}
        assert ka == kb and len(ka) > 0, t
        ea = distinct_estimate(a).toPandas().set_index(["source", "bucket_ts"])
        eb = distinct_estimate(b).toPandas().set_index(["source", "bucket_ts"])
        rel = (
            (ea["approx_distinct"] - eb["approx_distinct"]).abs()
            / ea["approx_distinct"].clip(lower=1)
        )
        assert (rel <= 10 * RSE).all(), t


def test_rolling_estimate_within_band_and_overlap_corrected(rows, duck):
    """Rolling trailing-K calendar union: every slot's estimate sits in
    the HLL band of DuckDB's exact distinct over the window's raw rows;
    a doc active in several slots of one window counts once."""
    from timeseriesvectordbpattermatcher_spark.operators.distinct import (
        distinct_rolling_estimate,
    )

    K = 5
    sk = distinct_bucket(rows, tier="1m", lgk=LGK)
    got = distinct_rolling_estimate(sk, K, "1m", min_buckets=1).select(
        "source", "bucket_ts", "win_buckets", "approx_distinct"
    ).toPandas()
    duck.register("dst_rows", rows.toPandas())
    want = duck.sql(f"""
        WITH r AS (
          SELECT source, date_trunc('minute', event_ts) AS b, doc_id
          FROM dst_rows WHERE event_ts IS NOT NULL),
        slots AS (SELECT DISTINCT source, b FROM r)
        SELECT s.source, s.b AS bucket_ts,
               count(DISTINCT r.doc_id) AS exact,
               count(DISTINCT r.b) AS wb
        FROM slots s JOIN r ON r.source = s.source
         AND epoch(s.b) - epoch(r.b) BETWEEN 0 AND {(K - 1) * 60}
        GROUP BY 1, 2
    """).df()
    m = got.merge(want, on=["source", "bucket_ts"], how="outer", indicator=True)
    assert (m["_merge"] == "both").all()
    assert (m["win_buckets"] == m["wb"]).all()
    rel = (m["approx_distinct"] - m["exact"]).abs() / m["exact"].clip(lower=1)
    assert (rel <= 5 * RSE).all(), m[rel > 5 * RSE].head()


def test_rolling_estimate_warmup_and_overlap(spark):
    from timeseriesvectordbpattermatcher_spark.operators.distinct import (
        distinct_rolling_estimate,
    )

    # same single doc in every minute: rolling distinct stays 1 (overlap
    # union, not addition); warm-up NULLs until 3 slots seen
    rows = [("s", f"2024-01-01 00:0{m}:00", "docA") for m in range(5)]
    df = spark.createDataFrame(rows, "source string, ts string, doc_id string").select(
        "source", F.col("ts").cast("timestamp").alias("event_ts"), "doc_id"
    )
    sk = distinct_bucket(df, tier="1m", lgk=LGK)
    out = {
        str(r["bucket_ts"]): r
        for r in distinct_rolling_estimate(sk, 3, "1m").collect()
    }
    assert out["2024-01-01 00:00:00"]["approx_distinct"] is None
    assert out["2024-01-01 00:01:00"]["approx_distinct"] is None
    for m in (2, 3, 4):
        assert out[f"2024-01-01 00:0{m}:00"]["approx_distinct"] == 1.0
