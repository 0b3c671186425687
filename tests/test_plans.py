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


def test_bucketed_join_eliminates_shuffle(spark, seqs_2k, tmp_path_factory):
    """Co-located join evidence: two tables bucketed on the same key with
    the same bucket count must sort-merge-join with NO Exchange on either
    side (the bucketing contract that co-locates repeated 100 TB joins)."""
    from timeseriesvectordbpattermatcher_spark.sources.tables import write_bucketed

    left = seqs_2k.select("doc_id", "n_tok")
    right = seqs_2k.select("doc_id", "source")
    write_bucketed(left, "bkt_left", ["doc_id"], n_buckets=8)
    write_bucketed(right, "bkt_right", ["doc_id"], n_buckets=8)
    try:
        # force sort-merge (broadcast would win on tiny test tables and
        # proves nothing about bucketing)
        j = spark.table("bkt_left").hint("merge").join(spark.table("bkt_right"), "doc_id")
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan[:2000]
        assert j.count() == 2000
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


@pytest.fixture(scope="module")
def seqs_parquet(spark, seqs_2k, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("seqs_pq") / "seqs")
    seqs_2k.write.mode("overwrite").parquet(path)
    yield path


def _read_schema_cols(plan: str) -> set[str]:
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:1000]
    return {c.split(":")[0] for c in m.group(1).split(",") if c}


def test_token_scan_pruned_when_stats_unused(spark, seqs_parquet):
    """When a consumer only wants n_tok rollups, Catalyst must prune the
    tok_* aggregates down to the scan so token arrays are never decoded."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        derive_event_ts,
        rollup_all_tiers,
    )

    seqs = spark.read.parquet(seqs_parquet)
    tiers = rollup_all_tiers(derive_event_ts(seqs))
    plan = _plan(tiers["1d"].agg({"sum_n_tok": "sum"}))
    assert "tokens" not in _read_schema_cols(plan), plan[:1000]


def test_token_scan_present_when_stats_requested(spark, seqs_parquet):
    """...and when token-level stats ARE requested, the scan must read the
    arrays (the bench job depends on this — tokens/sec must scan tokens)."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        derive_event_ts,
        rollup_all_tiers,
    )

    seqs = spark.read.parquet(seqs_parquet)
    tiers = rollup_all_tiers(derive_event_ts(seqs))
    plan = _plan(tiers["1d"].agg(F.sum("tok_sum"), F.min("tok_min")))
    assert "tokens" in _read_schema_cols(plan), plan[:1000]


def test_ta_indicators_single_exchange(spark):
    """W17 family: OBV/AD/MFI window exprs + EMA grouped map must share ONE
    series-key Exchange — a second shuffle here doubles network cost of the
    hottest per-series pass at scale."""
    from timeseriesvectordbpattermatcher_spark.operators.indicators import ta_indicators
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    plan = _plan(ta_indicators(synth_ohlcv(spark, n_tickers=2, n_days=60)))
    assert plan.count("Exchange ") == 1, plan[:1500]


def test_multi_stop_single_exchange(spark):
    """W19 composite: window exprs run BEFORE the recursive grouped map so
    the applyInPandas reuses the window's hash partitioning (grouped-map
    first would force a second Exchange)."""
    from timeseriesvectordbpattermatcher_spark.operators.stops import multi_stop_frame
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    plan = _plan(multi_stop_frame(synth_ohlcv(spark, n_tickers=2, n_days=60)))
    assert plan.count("Exchange ") == 1, plan[:1500]


def test_box_forecast_single_exchange(spark):
    """X13 forecast + buy/sell rules: the fallback window and the rule-input
    windows all run BEFORE the ATR grouped map (which reports unknown output
    partitioning), so the whole composition shares ONE series-key Exchange.
    The contract query adds exactly one more for the bars aggregation."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["box_forecast"](spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange ") == 2, plan[:2000]  # bars agg + series key


def test_gapfill_single_exchange(spark):
    """W20 round-3 rewrite: gap rows come from each anchor's lead(bucket_ts)
    — no min-to-max spine aggregation and no spine-join, so the asc window,
    the desc running window, and the leads all reuse ONE key Exchange (same
    partitioning, per-window sorts only). The old spine plan paid three."""
    from timeseriesvectordbpattermatcher_spark.operators.gapfill import gap_fill

    rollup = spark.createDataFrame(
        [("s1", "2024-01-01 00:00:00", 1.0), ("s1", "2024-01-01 00:03:00", 4.0)],
        "source string, bucket_ts string, cnt double",
    ).withColumn("bucket_ts", F.col("bucket_ts").cast("timestamp"))
    for method in ("locf", "linear"):
        plan = _plan(gap_fill(rollup, ["cnt"], tier="1m", method=method))
        assert plan.count("Exchange ") == 1, (method, plan[:1500])


def test_minhash_signature_plans(spark):
    """The arrow signature stage must be NARROW (MapInArrow directly over
    the projected scan, zero Exchange — a shuffle here would move raw text
    at corpus scale) and the expr engine must stay pure-JVM (no Python
    nodes). The string shingle hash stays JVM-side on BOTH engines."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import (
        minhash_signature,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    arrow = _plan(minhash_signature(df))
    assert "MapInArrow" in arrow
    assert arrow.count("Exchange") == 0, "signature stage must be narrow"
    assert "xxhash64" in arrow, "shingle string hashing must stay JVM-side"
    expr = _plan(minhash_signature(df, engine="expr"))
    assert "MapInArrow" not in expr and "Python" not in expr
    assert expr.count("Exchange") == 0


def test_exact_dedup_shuffles_digest_not_text(spark):
    """exact_dedup's scale contract: the dedup DECISION shuffles only the
    16-byte md5 digest + id (map-side partial_min, no text column in the
    aggregate exchange). The survivor-row recovery is an id semi join —
    the one shuffle that carries text, elidable by bucketing the corpus
    on doc_id (test_bucketed_join_eliminates_shuffle)."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y")], "doc_id string, text string"
    )
    plan = _plan(exact_dedup(docs))
    assert re.search(r"Exchange hashpartitioning\(_h#\d+", plan), plan
    assert "partial_min(doc_id" in plan, plan
    # the digest exchange's input aggregate projects ONLY (_h, min) — text
    # must not ride the dedup-decision shuffle
    assert re.search(r"output=\[_h#\d+, min#\d+\]", plan), plan


def test_asof_match_uses_running_frames_only(spark):
    """asof_match_exit must take its following-exit min via a reverse-ordered
    RUNNING frame — an unbounded-FOLLOWING frame rescans the partition
    remainder per row (O(n^2) per series in WindowExec)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import asof_match_exit

    e = spark.createDataFrame([("a", 1)], "series_id string, entry_ts long")
    x = spark.createDataFrame([("a", 2)], "series_id string, exit_ts long")
    plan = _plan(asof_match_exit(e, x))
    assert "unboundedfollowing" not in plan.lower().replace(" ", ""), plan[:2000]


def test_paragraph_dedup_text_never_rides_digest_shuffle(spark):
    """paragraph_dedup's scale contract: winner selection shuffles only the
    slim (doc_id, _pidx, _digest) stream — document text stays out of the
    digest Exchange (it moves once, in the final doc_id join) — and Spark
    plants a map-side WindowGroupLimit so rank-1 filtering shrinks the slim
    shuffle before it even happens. Three Exchanges total: text by doc_id
    (join), keep-lists by doc_id (agg), slim stream by _digest."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [("a", "x\n\ny"), ("b", "x\n\nz"), ("c", None)],
        "doc_id string, text string",
    )
    plan = _plan(paragraph_dedup(df))
    assert plan.count("Exchange hashpartitioning") == 3, plan[:3000]
    seg = plan.split("Exchange hashpartitioning(_digest")[1]
    proj = next(l for l in seg.splitlines() if "Project [" in l)
    # slim projection: doc_id + _pidx + the digest; _para appears only
    # INSIDE the xxhash64 expression, never as a carried column
    assert "Project [doc_id#" in proj and "AS _digest#" in proj, proj
    assert ", _para#" not in proj.split("xxhash64")[0], proj
    assert "WindowGroupLimit" in seg, seg[:2000]


def test_tokenizer_broadcast_encode_zero_shuffle(spark):
    """The scale claim of the default encode path: vocab ships as a python
    broadcast, the document row never moves — NO Exchange anywhere in the
    encode plan (the doc payload would be the thing shuffled)."""
    from timeseriesvectordbpattermatcher_spark.operators.tokenizer import (
        build_vocab,
        encode_text,
    )

    docs = spark.createDataFrame(
        [(f"d{i}", f"alpha beta gamma {i}") for i in range(50)],
        "doc_id string, text string",
    )
    vocab = build_vocab(docs, vocab_size=10)
    plan = _plan(encode_text(docs, vocab, method="broadcast"))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan


def test_tokenizer_join_encode_broadcasts_vocab(spark):
    """The all-JVM path must broadcast the vocab (never shuffle it against
    the exploded words) and regroup ints only — the text column must not
    appear in any Exchange."""
    from timeseriesvectordbpattermatcher_spark.operators.tokenizer import (
        build_vocab,
        encode_text,
    )

    docs = spark.createDataFrame(
        [(f"d{i}", f"alpha beta gamma {i}") for i in range(50)],
        "doc_id string, text string",
    )
    vocab = build_vocab(docs, vocab_size=10)
    plan = _plan(
        encode_text(docs, vocab, method="join").select(
            "doc_id", "tokens", "n_tok"
        )
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    # every Exchange block must be free of the raw text payload
    for block in plan.split("Exchange")[1:]:
        first_line = block.splitlines()[0]
        assert "text#" not in first_line, first_line


def test_timeweight_one_exchange_per_step_and_bucket_local_windows(spark):
    """The time-weight build must (a) window over (key, bucket) — never bare
    key, so a hot key can't serialize into one sort partition — and (b) pay
    exactly ONE Exchange per step, reused by the window and its groupBy."""
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        time_weight_bucket,
        time_weight_cascade,
    )

    pts = spark.createDataFrame(
        [("a", "2024-01-01 00:00:05", 1.0)], "source string, ts string, val double"
    ).selectExpr("source", "cast(ts as timestamp) as event_ts", "val")
    t1m = time_weight_bucket(pts)
    plan_1m = _plan(t1m)
    assert plan_1m.count("Exchange") == 1, plan_1m
    plan_casc = _plan(time_weight_cascade(t1m, "1h"))
    assert plan_casc.count("Exchange") == 2, plan_casc  # 1m step + merge step
    # every window partitions by two keys (source + a bucket column)
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan_casc):
        keys = spec.split(" ASC")[0]
        assert keys.count("#") >= 2, f"window not bucket-local: {spec}"


def test_incremental_dedup_auto_routes_by_store_size(spark, tmp_path):
    """probe='auto' (the default) must pick the plan whose cost does not
    grow with history: a store above AUTO_SMALL_STORE_MAX_BYTES takes the
    broadcast probe — the store is scanned but NEVER hash-partitioned —
    while a small parquet store takes the single-join shuffle plan. A
    naive caller folding increments against a huge digest store can no
    longer re-shuffle it by accident."""
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        AUTO_SMALL_STORE_MAX_BYTES,
        _plan_size_bytes,
        choose_probe,
        incremental_exact_dedup,
    )

    # pure routing rule
    assert choose_probe(None) == "broadcast"          # unsized -> scale-safe
    assert choose_probe(AUTO_SMALL_STORE_MAX_BYTES) == "shuffle"
    assert choose_probe(AUTO_SMALL_STORE_MAX_BYTES + 1) == "broadcast"

    batch = spark.createDataFrame(
        [("x", "some text"), ("y", "other text")], "doc_id string, text string"
    )
    big = spark.range(1_500_000).select(
        F.md5(F.col("id").cast("string")).alias("digest")
    )
    assert _plan_size_bytes(big) > AUTO_SMALL_STORE_MAX_BYTES
    small_dir = str(tmp_path / "small_store")
    spark.createDataFrame([("a" * 32,)], "digest string").write.parquet(small_dir)
    small = spark.read.parquet(small_dir)
    assert _plan_size_bytes(small) <= AUTO_SMALL_STORE_MAX_BYTES

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fresh, _ = incremental_exact_dedup(batch, big)  # default probe
        plan = _plan(fresh)
        assert "Exchange hashpartitioning(digest" not in plan, plan[:3000]
        assert "Exchange hashpartitioning(_dg" not in plan, plan[:3000]
        assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]

        fresh_s, _ = incremental_exact_dedup(batch, small)  # default probe
        plan_s = _plan(fresh_s)
        # the small store took the plain anti join (one _dg join, no
        # broadcast-probe double hop)
        assert "Exchange hashpartitioning(_dg" in plan_s, plan_s[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
