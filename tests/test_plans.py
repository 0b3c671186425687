"""Physical-plan regression tests — the scale contract, not just results.

These pin the plan properties that make the engine viable at 100 TB:
map-side partial aggregation, single-shuffle rollups, filter/column
pushdown into the parquet scan, broadcast (not cartesian) matcher joins,
and shuffle-free token segmentation. If a refactor silently breaks one,
results stay right but the 1000-executor run dies — these tests catch it
at sf0.001.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.matcher import cosine_topk_join
from timeseriesvectordbpattermatcher_spark.operators.rollup import (
    cascade,
    derive_event_ts,
    rollup_1m,
)
from timeseriesvectordbpattermatcher_spark.operators.segmentation import segment_tokens


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rollup_single_shuffle_with_partial_agg(spark, seqs_2k):
    plan = _plan(rollup_1m(derive_event_ts(seqs_2k)))
    assert plan.count("Exchange") == 1, "rollup must shuffle exactly once"
    assert plan.count("HashAggregate") == 2, "map-side partial agg missing"


def test_cascade_no_rescan_of_raw(spark, seqs_2k):
    r1m = rollup_1m(derive_event_ts(seqs_2k))
    plan = _plan(cascade(r1m, "1h"))
    # the cascade adds one more shuffle over the (small) 1m relation only
    assert plan.count("Exchange") == 2


def test_parquet_filter_and_column_pushdown(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    q = ev.filter(F.col("event_type") == "click").select("event_id", "value")
    plan = _plan(q)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "EqualTo(event_type,click)" in m.group(1), plan[:500]
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"event_id", "event_type", "value"}, "column pruning failed"


def test_matcher_join_is_broadcast_not_cartesian(spark):
    refs = spark.createDataFrame([("a", [1.0, 2.0])], "segment_id string, features array<float>")
    qs = spark.createDataFrame([("q", [1.0, 2.0])], "query_id string, q_features array<float>")
    plan = _plan(cosine_topk_join(qs, refs))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_segmentation_is_shuffle_free(spark, seqs_2k):
    plan = _plan(segment_tokens(seqs_2k))
    assert "Exchange" not in plan, "token segmentation must stay partition-local"


def test_salted_rollup_two_phase(spark, seqs_2k):
    plan = _plan(rollup_1m(derive_event_ts(seqs_2k), salt_buckets=8))
    # salted: partial agg on (key, bucket, salt), exchange, merge agg on (key, bucket)
    assert plan.count("HashAggregate") >= 3


def test_gapfill_linear_uses_running_frames_only(spark, seqs_2k):
    """Regression: unbounded-FOLLOWING frames are O(n^2) per partition in
    Spark's WindowExec (the remainder is rescanned per row); the linear
    gap-fill must express 'next observed' as a reverse-ordered RUNNING
    frame instead."""
    from timeseriesvectordbpattermatcher_spark.operators.gapfill import gap_fill
    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        derive_event_ts,
        rollup_1m,
    )

    r1m = rollup_1m(derive_event_ts(seqs_2k))
    plan = _plan(gap_fill(r1m, ["cnt"], tier="1m", method="linear"))
    assert "unboundedfollowing" not in plan.lower().replace(" ", ""), plan[:2000]


def test_jaccard_prefix_filter_no_cartesian(spark):
    from timeseriesvectordbpattermatcher_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [("d1", "a b c d e f"), ("d2", "a b c d e g")], "doc_id string, text string"
    )
    plan = _plan(ngram_jaccard_pairs(docs, threshold=0.3))
    assert "CartesianProduct" not in plan
