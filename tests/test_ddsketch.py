"""DDSketch approx-quantile tiers (operators/ddsketch.py).

Oracles:
- alpha guarantee: DuckDB computes the EXACT inverted-CDF (type 1)
  quantile directly from the raw float values at every tier granularity
  (no sketch anywhere); every tier's decoded sketch quantile must land
  within relative error alpha of it.
- map parity: DuckDB rebuilds the encoded log-gamma bucket counts with
  its own ln()/ceil() and the 1m maps must match entry for entry.
- merge exactness: 1h/1d maps built ONLY from 1m maps must be bit-equal
  to maps built directly from raw at that tier (count addition is exact;
  alpha enters at decode only).
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.ddsketch import (
    dds_bucket,
    dds_cascade,
    dds_decode,
    dds_gamma,
    dds_index,
    dds_quantiles,
)
from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts

ALPHA = 0.01
TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
QS = {"p50": 0.50, "p95": 0.95, "p99": 0.99}


@pytest.fixture(scope="module")
def float_points(spark, seqs_2k):
    # a float metric with wide dynamic range, negatives, and exact zeros:
    # signed log-scaled sequence length (deterministic from the corpus)
    df = (
        derive_event_ts(seqs_2k)
        .filter(F.col("event_ts").isNotNull())
        .withColumn(
            "val",
            F.when(F.col("n_tok") % 17 == 0, F.lit(0.0)).otherwise(
                F.signum(F.col("n_tok") % 3 - 1)
                * F.pow(F.lit(10.0), (F.col("n_tok") % 13) - 6)
                * (F.col("n_tok") + 1)
            ),
        )
        .select("source", "event_ts", "val")
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def tiers(float_points):
    t1m = dds_bucket(float_points, alpha=ALPHA, value_col="val").cache()
    t1h = dds_cascade(t1m, "1h").cache()
    t1d = dds_cascade(t1h, "1d").cache()
    t1m.count(), t1h.count(), t1d.count()
    yield {"1m": t1m, "1h": t1h, "1d": t1d}
    for t in t1m, t1h, t1d:
        t.unpersist()


def _exact_quantile(duck, raw_pdf, trunc, q):
    duck.register("raw_dds", raw_pdf)
    return duck.sql(f"""
        WITH w AS (
          SELECT source, date_trunc('{trunc}', event_ts) AS bucket_ts, val,
                 row_number() OVER (PARTITION BY source, date_trunc('{trunc}', event_ts)
                                    ORDER BY val) AS rnk,
                 count(*) OVER (PARTITION BY source, date_trunc('{trunc}', event_ts)) AS tot
          FROM raw_dds WHERE val IS NOT NULL AND event_ts IS NOT NULL
        )
        SELECT source, bucket_ts, min(val) AS want
        FROM w WHERE rnk >= greatest(1, ceil({q} * tot))
        GROUP BY 1, 2
    """).df()


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
@pytest.mark.parametrize("qname,q", sorted(QS.items()))
def test_tier_quantiles_within_alpha(tiers, float_points, duck, tier, qname, q):
    got = (
        dds_quantiles(tiers[tier], alpha=ALPHA, qs={qname: q})
        .select("source", "bucket_ts", qname)
        .toPandas()
    )
    want = _exact_quantile(duck, float_points.toPandas(), TRUNC[tier], q)
    m = got.merge(want, on=["source", "bucket_ts"], how="outer", indicator=True)
    assert (m["_merge"] == "both").all(), m[m._merge != "both"].head()
    # relative error <= alpha (tiny fp slack for boundary-bucket flips)
    denom = m["want"].abs().clip(lower=1e-300)
    rel = (m[qname] - m["want"]).abs() / denom
    rel[m["want"] == 0.0] = m.loc[m["want"] == 0.0, qname].abs()  # exact zero must decode to zero
    bad = m[rel > ALPHA * 1.0001]
    assert bad.empty, bad.head(10)


def _flat(df):
    return (
        df.select("source", "bucket_ts", F.explode_outer("dds").alias("k", "c"))
        .toPandas()
        .sort_values(["source", "bucket_ts", "k"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_cascade_bitexact_vs_direct(tiers, float_points, tier):
    direct = _flat(dds_bucket(float_points, alpha=ALPHA, value_col="val", tier=tier))
    got = _flat(tiers[tier])
    pd.testing.assert_frame_equal(got, direct, check_exact=True)


def test_1m_map_parity_duckdb(tiers, float_points, duck):
    lg = math.log(dds_gamma(ALPHA))
    duck.register("raw_dds", float_points.toPandas())
    want = duck.sql(f"""
        SELECT source, date_trunc('minute', event_ts) AS bucket_ts,
               CASE WHEN val > 0 THEN 1073741824 + CAST(ceil(ln(val) / {lg!r}) AS INT)
                    WHEN val < 0 THEN -1073741824 - CAST(ceil(ln(-val) / {lg!r}) AS INT)
                    ELSE 0 END AS k,
               count(*) AS c
        FROM raw_dds WHERE val IS NOT NULL AND event_ts IS NOT NULL
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df()
    got = _flat(tiers["1m"])
    for col, d in want.dtypes.items():
        got[col] = got[col].astype(d)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_null_nan_inf_excluded_and_empty_groups_survive(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 4 + ["b"] * 2,
            "event_ts": pd.to_datetime(["2024-01-01 00:00:05"] * 6),
            "val": [1.5, float("nan"), float("inf"), None, None, float("nan")],
        }
    )
    out = dds_bucket(spark.createDataFrame(pdf), alpha=ALPHA, value_col="val")
    rows = {r["source"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert len(rows["a"]["dds"]) == 1 and sum(rows["a"]["dds"].values()) == 1
    assert rows["b"]["dds"] == {}  # all-null group keeps an empty sketch
    q = dds_quantiles(out, alpha=ALPHA).toPandas().set_index("source")
    assert q.loc["b", "dds_n"] == 0 and pd.isna(q.loc["b", "p50"])


def test_decode_within_alpha_roundtrip(spark):
    # property: decode(index(x)) is within alpha of x across the full
    # dynamic range, both signs
    vals = [10.0**e for e in range(-300, 301, 7)]
    vals += [-v for v in vals]
    df = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in vals])).alias("x")
    )
    out = df.select(
        "x", dds_decode(dds_index(F.col("x"), ALPHA), ALPHA).alias("d")
    ).toPandas()
    rel = ((out.d - out.x).abs() / out.x.abs()).max()
    assert rel <= ALPHA * 1.0001, rel


def test_alpha_validation():
    with pytest.raises(ValueError):
        dds_gamma(0.0)
    with pytest.raises(ValueError):
        dds_gamma(1.0)


def test_build_plan_two_exchanges(spark):
    # hist-style build: one Exchange for the (keys, bucket-index) counts,
    # one for the map rebuild on keys — nothing data-sized beyond those
    # (pinned on a lineage-clean input so only the operator's own shuffles
    # count)
    pdf = pd.DataFrame(
        {
            "source": ["a", "b"],
            "event_ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "val": [1.0, 2.0],
        }
    )
    df = dds_bucket(spark.createDataFrame(pdf), alpha=ALPHA, value_col="val")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan


def test_rollup_job_dds_plane_end_to_end(spark, seqs_2k, tmp_path):
    """dds=True maintains the sketch tiers alongside stats with the same
    watermark/resume semantics; cascaded 1d maps are bit-equal to a direct
    1d build over raw, reruns are no-ops, and a crash between the dds 1m
    commit and the cascade resumes exactly."""
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob

    seqs = derive_event_ts(seqs_2k).filter(F.col("event_ts").isNotNull())
    direct = _flat(dds_bucket(seqs, alpha=ALPHA, value_col="n_tok", tier="1d"))

    job = RollupJob(str(tmp_path / "ddsjob"))
    job.run(spark, seqs, dds=True, dds_alpha=ALPHA)
    got = _flat(job.dds_tables["1d"].read(spark).drop("bucket_day"))
    pd.testing.assert_frame_equal(got, direct, check_exact=True)

    v = job.dds_tables["1m"].current_snapshot().version
    job.run(spark, seqs, dds=True, dds_alpha=ALPHA)
    assert job.dds_tables["1m"].current_snapshot().version == v

    crashed = RollupJob(str(tmp_path / "ddscrash"))
    with pytest.raises(RuntimeError, match="dds_1m"):
        crashed.run(spark, seqs, dds=True, dds_alpha=ALPHA, fail_after="dds_1m")
    assert crashed.dds_tables["1h"].current_snapshot() is None
    crashed.run(spark, seqs, dds=True, dds_alpha=ALPHA)
    got2 = _flat(crashed.dds_tables["1d"].read(spark).drop("bucket_day"))
    pd.testing.assert_frame_equal(got2, direct, check_exact=True)
