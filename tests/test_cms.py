"""Count-Min token-frequency tiers (operators/cms.py).

Oracles:
- map parity: an engine-free python CMS built with the standalone XXH64
  chain from tests/oracle/xxh64_pure.py (public-spec reimplementation,
  zero engine imports) over the raw pandas token arrays — the 1m sparse
  maps must match entry for entry.
- estimate bounds: DuckDB recomputes EXACT per-(bucket, token) occurrence
  counts by exploding the arrays; every CMS estimate must be >= exact
  (one-sided error is structural, not probabilistic), and the fraction
  exceeding exact + (e/width)*N must stay under the published e^-depth
  failure probability.
- merge exactness: 1h/1d maps built ONLY from 1m maps must be bit-equal
  to maps built directly from raw at that tier.
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.cms import (
    cms_bucket,
    cms_cascade,
    cms_error_bound,
    cms_estimate,
    cms_n,
)
from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts

from tests.oracle.xxh64_pure import spark_xxhash64_long_int

WIDTH, DEPTH = 512, 4
TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}


def _cells(token: int) -> list[int]:
    return [
        j * WIDTH + (spark_xxhash64_long_int(token, j) % WIDTH) for j in range(DEPTH)
    ]


@pytest.fixture(scope="module")
def seqs(spark, seqs_2k):
    df = (
        derive_event_ts(seqs_2k)
        .filter(F.col("event_ts").isNotNull())
        .select("source", "event_ts", "tokens")
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def tiers(seqs):
    t1m = cms_bucket(seqs, tier="1m", width=WIDTH, depth=DEPTH).cache()
    t1h = cms_cascade(t1m, "1h").cache()
    t1d = cms_cascade(t1h, "1d").cache()
    t1m.count(), t1h.count(), t1d.count()
    yield {"1m": t1m, "1h": t1h, "1d": t1d}
    for t in t1m, t1h, t1d:
        t.unpersist()


def _flat(df):
    return (
        df.select("source", "bucket_ts", F.explode_outer("cms").alias("k", "c"))
        .toPandas()
        .sort_values(["source", "bucket_ts", "k"])
        .reset_index(drop=True)
    )


def test_1m_map_parity_vs_engine_free_oracle(tiers, seqs):
    raw = seqs.toPandas()
    counts: dict[tuple, dict[int, int]] = {}
    for _, r in raw.iterrows():
        b = (r["source"], r["event_ts"].floor("min"))
        grid = counts.setdefault(b, {})
        toks = r["tokens"]
        for t in [] if toks is None else toks:
            for cell in _cells(int(t)):
                grid[cell] = grid.get(cell, 0) + 1
    want = pd.DataFrame(
        [
            (s, b, k, c)
            for (s, b), grid in counts.items()
            for k, c in sorted(grid.items())
        ],
        columns=["source", "bucket_ts", "k", "c"],
    ).sort_values(["source", "bucket_ts", "k"]).reset_index(drop=True)
    got = _flat(tiers["1m"])
    for col, d in want.dtypes.items():
        got[col] = got[col].astype(d)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_cascade_bitexact_vs_direct(tiers, seqs, tier):
    direct = _flat(cms_bucket(seqs, tier=tier, width=WIDTH, depth=DEPTH))
    got = _flat(tiers[tier])
    pd.testing.assert_frame_equal(got, direct, check_exact=True)


def test_estimates_bounded(tiers, seqs, duck):
    # exact per-(source, day, token) counts from DuckDB explode — a
    # different algorithm with no sketch anywhere
    duck.register("raw_cms", seqs.select("source", "event_ts", "tokens").toPandas())
    exact = duck.sql("""
        SELECT source, bucket_ts, tok, count(*) AS c FROM (
          SELECT source, date_trunc('day', event_ts) AS bucket_ts,
                 unnest(tokens) AS tok
          FROM raw_cms
        ) GROUP BY 1, 2, 3
    """).df()
    # total N per bucket for the epsilon*N bound
    totals = duck.sql("""
        SELECT source, date_trunc('day', event_ts) AS bucket_ts,
               sum(len(tokens)) AS n
        FROM raw_cms GROUP BY 1, 2
    """).df()

    toks = sorted(exact["tok"].unique())[:200]
    sk = tiers["1d"]
    est_cols = [
        cms_estimate("cms", int(t), WIDTH, DEPTH).alias(f"e{t}") for t in toks
    ]
    got = sk.select("source", "bucket_ts", *est_cols).toPandas()
    est = got.melt(
        id_vars=["source", "bucket_ts"], var_name="tok", value_name="est"
    )
    est["tok"] = est["tok"].str.slice(1).astype(exact["tok"].dtype)
    m = est.merge(exact, on=["source", "bucket_ts", "tok"], how="left").merge(
        totals, on=["source", "bucket_ts"]
    )
    m["c"] = m["c"].fillna(0)

    eps, delta = cms_error_bound(WIDTH, DEPTH)
    assert (m["est"] >= m["c"]).all(), m[m.est < m.c].head()
    over = (m["est"] > m["c"] + eps * m["n"]).mean()
    assert over <= delta, (over, delta)


def test_cms_n_equals_token_total(tiers, seqs, duck):
    duck.register("raw_cms", seqs.select("source", "event_ts", "tokens").toPandas())
    want = duck.sql("""
        SELECT source, date_trunc('day', event_ts) AS bucket_ts,
               sum(len(tokens)) AS n
        FROM raw_cms GROUP BY 1, 2
    """).df()
    got = tiers["1d"].select(
        "source", "bucket_ts", cms_n("cms", WIDTH).alias("n")
    ).toPandas()
    m = got.merge(want, on=["source", "bucket_ts"], suffixes=("_g", "_w"))
    assert len(m) == len(want) and (m.n_g == m.n_w).all()


def test_null_and_empty_token_rows(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a", "a", "b", "b"],
            "event_ts": pd.to_datetime(["2024-01-01 00:00:05"] * 4),
            "tokens": [[1, 1, 2], [], None, None],
        }
    )
    df = spark.createDataFrame(pdf, "source string, event_ts timestamp, tokens array<int>")
    out = cms_bucket(df, width=WIDTH, depth=DEPTH)
    rows = {r["source"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["b"]["cms"] == {}  # token-less bucket keeps an empty sketch
    a = out.filter(F.col("source") == "a")
    got = a.select(
        cms_estimate("cms", 1, WIDTH, DEPTH).alias("e1"),
        cms_estimate("cms", 2, WIDTH, DEPTH).alias("e2"),
        cms_n("cms", WIDTH).alias("n"),
    ).collect()[0]
    assert got["e1"] >= 2 and got["e2"] >= 1 and got["n"] == 3


def test_dim_validation():
    with pytest.raises(ValueError):
        cms_error_bound(1, 4)
    with pytest.raises(ValueError):
        cms_error_bound(512, 0)


def test_build_plan_shapes(spark):
    """expr: explode + two hash aggregations (2 Exchanges). arrow: ONE
    Exchange (the co-locating repartition) feeding the accumulating
    kernel — no map-entry shuffle exists in the plan at all."""
    pdf = pd.DataFrame(
        {
            "source": ["a"],
            "event_ts": pd.to_datetime(["2024-01-01"]),
            "tokens": [[1, 2, 3]],
        }
    )
    df = spark.createDataFrame(
        pdf, "source string, event_ts timestamp, tokens array<int>"
    )
    expr_plan = (
        cms_bucket(df, width=WIDTH, depth=DEPTH, engine="expr")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert expr_plan.count("Exchange") == 2, expr_plan
    arrow_plan = (
        cms_bucket(df, width=WIDTH, depth=DEPTH, engine="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert arrow_plan.count("Exchange") == 1, arrow_plan
    assert "MapInArrow" in arrow_plan, arrow_plan


def test_engine_parity_build_and_cascade(seqs):
    """The arrow engine (deployment default) is map-for-map identical to
    the expr plan at every tier — same xxhash64 chain, different physical
    strategy. Transitively extends every expr-era oracle pin to arrow."""
    e1m = _flat(cms_bucket(seqs, tier="1m", width=WIDTH, depth=DEPTH, engine="expr"))
    a1m = _flat(cms_bucket(seqs, tier="1m", width=WIDTH, depth=DEPTH, engine="arrow"))
    pd.testing.assert_frame_equal(a1m, e1m, check_exact=True)
    base = cms_bucket(seqs, tier="1m", width=WIDTH, depth=DEPTH, engine="arrow")
    eh = _flat(cms_cascade(base, "1h", width=WIDTH, depth=DEPTH, engine="expr"))
    ah = _flat(cms_cascade(base, "1h", width=WIDTH, depth=DEPTH, engine="arrow"))
    pd.testing.assert_frame_equal(ah, eh, check_exact=True)


def test_arrow_cascade_widens_stride_past_configured_dims(seqs):
    """A cascade invoked with SMALLER dims than the build (run_cascade
    doesn't carry the build config) must not collide cells: the merge
    kernel widens its per-batch stride to max cell + 1."""
    big = cms_bucket(seqs, tier="1m", width=4 * WIDTH, depth=DEPTH, engine="arrow")
    got = _flat(cms_cascade(big, "1h", width=WIDTH, depth=DEPTH, engine="arrow"))
    want = _flat(
        cms_bucket(seqs, tier="1h", width=4 * WIDTH, depth=DEPTH, engine="expr")
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_rollup_job_cms_plane_end_to_end(spark, seqs_2k, tmp_path):
    """cms=True maintains the sketch tiers alongside stats with the same
    watermark/resume semantics; cascaded 1d maps are bit-equal to a direct
    1d build over raw, reruns are no-ops, and a crash between the cms 1m
    commit and the cascade resumes exactly."""
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob

    seqs = derive_event_ts(seqs_2k).filter(F.col("event_ts").isNotNull())
    direct = _flat(cms_bucket(seqs, tier="1d", width=WIDTH, depth=DEPTH))

    job = RollupJob(str(tmp_path / "cmsjob"))
    job.run(spark, seqs, cms=True, cms_width=WIDTH, cms_depth=DEPTH)
    got = _flat(job.cms_tables["1d"].read(spark).drop("bucket_day"))
    pd.testing.assert_frame_equal(got, direct, check_exact=True)

    v = job.cms_tables["1m"].current_snapshot().version
    job.run(spark, seqs, cms=True, cms_width=WIDTH, cms_depth=DEPTH)
    assert job.cms_tables["1m"].current_snapshot().version == v

    crashed = RollupJob(str(tmp_path / "cmscrash"))
    with pytest.raises(RuntimeError, match="cms_1m"):
        crashed.run(spark, seqs, cms=True, cms_width=WIDTH, cms_depth=DEPTH,
                    fail_after="cms_1m")
    assert crashed.cms_tables["1h"].current_snapshot() is None
    crashed.run(spark, seqs, cms=True, cms_width=WIDTH, cms_depth=DEPTH)
    got2 = _flat(crashed.cms_tables["1d"].read(spark).drop("bucket_day"))
    pd.testing.assert_frame_equal(got2, direct, check_exact=True)


def test_all_tiers_fused_bitexact_vs_sequential(tiers, seqs):
    """cms_all_tiers: one scan + one shuffle emits every tier, map-for-map
    equal to the sequential build/cascade chain — including the sorted-
    partition blocked kernel path and an UNSORTED caller-partitioned
    fallback (monotonicity guard)."""
    from timeseriesvectordbpattermatcher_spark.operators.cms import (
        cms_all_tiers,
    )

    fused = cms_all_tiers(seqs, width=WIDTH, depth=DEPTH).cache()
    try:
        for t in ("1m", "1h", "1d"):
            got = fused.filter(F.col("tier") == t).drop("tier")
            a = {(r["source"], r["bucket_ts"]): dict(r["cms"])
                 for r in got.collect()}
            b = {(r["source"], r["bucket_ts"]): dict(r["cms"])
                 for r in tiers[t].collect()}
            assert a == b, (t, len(a), len(b))
    finally:
        fused.unpersist()

    # subset of tiers works; guards reject junk
    sub = cms_all_tiers(seqs, tiers=("1h", "1d"), width=WIDTH, depth=DEPTH)
    n_1h = sub.filter(F.col("tier") == "1h").count()
    assert n_1h == tiers["1h"].count()
    with pytest.raises(ValueError, match="tiers"):
        cms_all_tiers(seqs, tiers=())
    with pytest.raises(ValueError, match="tiers"):
        cms_all_tiers(seqs, tiers=("1d", "1m"))  # coarse before fine
    with pytest.raises(ValueError, match="tiers"):
        cms_all_tiers(seqs, tiers=("1m", "1m"))


def test_all_tiers_null_and_empty_rows(spark):
    """NULL ts rows drop; null/empty token arrays keep their bucket alive
    with an empty sketch at EVERY tier — same contract as cms_bucket."""
    import pandas as pd

    from timeseriesvectordbpattermatcher_spark.operators.cms import (
        cms_all_tiers,
    )

    pdf = pd.DataFrame({
        "source": ["a", "a", "b", "b"],
        "event_ts": pd.to_datetime(
            ["2024-01-01 00:00:30", None,
             "2024-01-01 00:01:10", "2024-01-01 02:00:00"]
        ),
        "tokens": [[1, 2, 2], [3], None, []],
    })
    out = cms_all_tiers(spark.createDataFrame(pdf), width=16, depth=2)
    rows = {(r["tier"], r["source"], str(r["bucket_ts"])): dict(r["cms"])
            for r in out.collect()}
    assert len([k for k in rows if k[0] == "1m"]) == 3  # null-ts row gone
    assert rows[("1m", "b", "2024-01-01 00:01:00")] == {}  # null tokens
    assert rows[("1d", "b", "2024-01-01 00:00:00")] == {}  # both b rows empty
    a_day = rows[("1d", "a", "2024-01-01 00:00:00")]
    assert sum(a_day.values()) == 2 * 3  # 3 occurrences x depth 2
