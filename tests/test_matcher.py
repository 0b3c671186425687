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
