"""Distribution drift from hist tiers (quantiles.hist_merge_all /
hist_drift).

Oracles:
- KS: DuckDB recomputes max |CDF_a - CDF_b| over the union grid with
  its own full-outer join + window cumsums, straight from raw values.
- PSI: a pure-python replay of the smoothed-probability formula.
- planted: identical windows -> ks 0 / psi ~0; a shifted window ->
  both rise; one-sided key -> NULL stats.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.quantiles import (
    hist_1m,
    hist_drift,
    hist_merge_all,
)
from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts


@pytest.fixture(scope="module")
def halves(spark, seqs_2k):
    raw = derive_event_ts(seqs_2k).filter(F.col("event_ts").isNotNull())
    mid = raw.agg(
        F.percentile_approx("event_ts", 0.5, 10000).alias("m")
    ).first()["m"]
    a = raw.filter(F.col("event_ts") <= F.lit(mid.isoformat()))
    # drift plant: the late half reports n_tok doubled for one source
    b = raw.filter(F.col("event_ts") > F.lit(mid.isoformat())).withColumn(
        "n_tok",
        F.when(F.col("source") == "web", F.col("n_tok") * 2).otherwise(
            F.col("n_tok")
        ),
    )
    return a.cache(), b.cache()


def test_ks_matches_duckdb(duck, halves):
    a, b = halves
    got = hist_drift(
        hist_merge_all(hist_1m(a)), hist_merge_all(hist_1m(b))
    ).toPandas().set_index("source")
    duck.register("dr_a", a.select("source", "n_tok").toPandas())
    duck.register("dr_b", b.select("source", "n_tok").toPandas())
    want = duck.sql("""
        WITH ca AS (SELECT source, n_tok v, count(*) c FROM dr_a GROUP BY 1,2),
        cb AS (SELECT source, n_tok v, count(*) c FROM dr_b GROUP BY 1,2),
        g AS (SELECT coalesce(ca.source, cb.source) source,
                     coalesce(ca.v, cb.v) v,
                     coalesce(ca.c, 0) ca, coalesce(cb.c, 0) cb
              FROM ca FULL OUTER JOIN cb
                ON ca.source = cb.source AND ca.v = cb.v
              WHERE coalesce(ca.source, cb.source) IN
                    (SELECT source FROM dr_a INTERSECT SELECT source FROM dr_b)),
        cum AS (SELECT source, v,
                       sum(ca) OVER w / sum(ca) OVER t AS fa,
                       sum(cb) OVER w / sum(cb) OVER t AS fb
                FROM g WINDOW w AS (PARTITION BY source ORDER BY v
                                    ROWS UNBOUNDED PRECEDING),
                             t AS (PARTITION BY source))
        SELECT source, max(abs(fa - fb)) AS ks FROM cum GROUP BY 1
    """).df().set_index("source")
    for k in want.index:
        assert got.loc[k, "ks"] == pytest.approx(want.loc[k, "ks"], rel=1e-9), k
    # the planted doubling must dominate the CDF gap; PSI is pinned by
    # the replay test instead — eps-smoothed sparse integer bins make
    # its cross-key ordering legitimately support-size-dependent
    assert got.loc["web", "ks"] == got["ks"].max()


def test_psi_matches_python_replay(halves):
    a, b = halves
    EPS = 1e-6
    got = hist_drift(
        hist_merge_all(hist_1m(a)), hist_merge_all(hist_1m(b)), psi_eps=EPS
    ).toPandas().set_index("source")
    pa = a.select("source", "n_tok").toPandas()
    pb = b.select("source", "n_tok").toPandas()
    for k in got.index:
        ca = pa[pa["source"] == k]["n_tok"].value_counts().to_dict()
        cb = pb[pb["source"] == k]["n_tok"].value_counts().to_dict()
        grid = sorted(set(ca) | set(cb))
        na, nb, m = sum(ca.values()), sum(cb.values()), len(grid)
        psi = 0.0
        for v in grid:
            p = (ca.get(v, 0) + EPS) / (na + m * EPS)
            q = (cb.get(v, 0) + EPS) / (nb + m * EPS)
            psi += (p - q) * math.log(p / q)
        assert got.loc[k, "psi"] == pytest.approx(psi, rel=1e-9), k
        assert got.loc[k, "n_a"] == na and got.loc[k, "n_b"] == nb


def test_identical_and_one_sided(spark):
    rows = [("s", f"2024-01-01 00:00:{i:02d}", 5 + i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "source string, ts string, n_tok int").select(
        "source", F.col("ts").cast("timestamp").alias("event_ts"), "n_tok"
    )
    h = hist_merge_all(hist_1m(df))
    same = hist_drift(h, h).first()
    assert same["ks"] == 0.0
    assert abs(same["psi"]) < 1e-12
    other = hist_merge_all(hist_1m(df.withColumn("source", F.lit("t"))))
    out = hist_drift(h, other).count()
    assert out == 0  # no shared keys -> nothing comparable


def test_embedding_drift_matches_numpy(spark):
    """Exact numpy replay of centroid cosine + dispersion on planted
    clusters: a rotated source drifts, a stable source does not, a
    one-sided key emits nothing, zero-norm centroids go NULL."""
    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        embedding_drift,
    )

    rng = np.random.default_rng(9)

    def cloud(center, n, spread):
        return center + rng.normal(0, spread, (n, len(center)))

    ca = np.array([1.0, 0.0, 0.0, 0.5])
    cb = np.array([0.0, 1.0, 0.0, 0.5])       # rotated centroid for "mov"
    rows_a, rows_b = [], []
    for v in cloud(ca, 40, 0.05):
        rows_a.append(("mov", [float(x) for x in v]))
        rows_b.append(("sta", [float(x) for x in v]))
    for v in cloud(cb, 50, 0.05):
        rows_b.append(("mov", [float(x) for x in v]))
    for v in cloud(ca, 45, 0.05):
        rows_a.append(("sta", [float(x) for x in v]))
    rows_a.append(("only_a", [1.0, 2.0, 3.0, 4.0]))
    # zero-norm plant: two cancelling vectors
    rows_a += [("zero", [1.0, 0.0, 0.0, 0.0]), ("zero", [-1.0, 0.0, 0.0, 0.0])]
    rows_b += [("zero", [0.0, 1.0, 0.0, 0.0])]
    schema = "source string, embedding array<double>"
    da = spark.createDataFrame(rows_a, schema)
    db = spark.createDataFrame(rows_b, schema)
    got = {r["source"]: r for r in embedding_drift(da, db).collect()}

    assert "only_a" not in got
    for k in ("mov", "sta"):
        va = np.array([v for s, v in rows_a if s == k])
        vb = np.array([v for s, v in rows_b if s == k])
        ma, mb = va.mean(0), vb.mean(0)
        cos = ma @ mb / (np.linalg.norm(ma) * np.linalg.norm(mb))
        disp_a = float(np.mean(1 - (va @ ma) / (np.linalg.norm(va, axis=1)
                                                * np.linalg.norm(ma))))
        disp_b = float(np.mean(1 - (vb @ mb) / (np.linalg.norm(vb, axis=1)
                                                * np.linalg.norm(mb))))
        r = got[k]
        assert r["n_a"] == len(va) and r["n_b"] == len(vb)
        assert r["centroid_cos"] == pytest.approx(cos, rel=1e-12)
        assert r["disp_a"] == pytest.approx(disp_a, rel=1e-9)
        assert r["disp_b"] == pytest.approx(disp_b, rel=1e-9)
    # sta's two windows are different DRAWS around the same center, so
    # its drift is tiny but not zero
    assert got["mov"]["drift"] > 0.3 > got["sta"]["drift"]
    assert got["sta"]["drift"] < 1e-3
    assert got["zero"]["centroid_cos"] is None  # zero-norm a-centroid


def test_embedding_drift_on_driver_table(spark):
    """Smoke over the real embeddings.parquet surface: same table both
    sides -> drift exactly 0 per key."""
    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        embedding_drift,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = emb.select(
        (F.col("vec_id") % 4).alias("source"),
        F.col("embedding"),
    )
    out = embedding_drift(df, df).toPandas()
    assert len(out) == 4
    assert (out["drift"].abs() < 1e-12).all()
    assert (out["disp_a"] == out["disp_b"]).all()
