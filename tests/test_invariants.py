"""FIXTURES.md F5 invariants 1-3: token-array byte-equality through the
pipeline, tier-exactness (covered in test_rollup too), and matcher parity
against a committed golden fixture."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.dedup import exact_dedup
from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts
from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import SnapshotTable
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden")


def _tok_hash(df):
    """Order-insensitive digest of (doc_id, tokens) — tokens hashed element-exact."""
    return (
        df.select(F.xxhash64("doc_id", F.col("tokens").cast("array<int>")).alias("h"))
        .agg(F.expr("bit_xor(h)"))  # order-insensitive, overflow-free
        .collect()[0][0]
    )


def test_token_equality_through_write_read(spark, seqs_2k, tmp_path):
    """input_hint invariant: every surviving row's token array is byte-equal
    after a write/read roundtrip through the snapshot table layer."""
    before = _tok_hash(seqs_2k)
    tbl = SnapshotTable(str(tmp_path / "seqs_tbl"))
    tbl.overwrite_partitions(derive_event_ts(seqs_2k).withColumn(
        "d", F.to_date("event_ts")), ["source", "d"])
    back = tbl.read(spark)
    assert back.count() == seqs_2k.count()
    assert _tok_hash(back) == before


def test_token_equality_through_dedup(spark, seqs_2k):
    """Surviving rows of a dedup pass carry unmodified token arrays."""
    survivors = exact_dedup(
        seqs_2k.withColumn("text", F.col("doc_id")), text_col="text"
    ).drop("text")
    joined = survivors.alias("s").join(
        seqs_2k.alias("o"), "doc_id"
    ).filter(F.col("s.tokens") != F.col("o.tokens"))
    assert joined.count() == 0


def test_token_equality_through_repartition(spark, seqs_2k):
    before = _tok_hash(seqs_2k)
    assert _tok_hash(seqs_2k.repartition(17, "source")) == before


def _build_matches(spark):
    """The full E1+E2 pipeline on the committed fixture settings."""
    from timeseriesvectordbpattermatcher_spark.operators.matcher import match_pipeline
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
        ma_normalize,
        segment_series,
    )
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=6, n_days=900, seed=42)
    refs = segment_series(ma_normalize(ohlcv))
    qseg = (
        segment_series(ma_normalize(ohlcv.filter("series_id = 'TK00'")))
        .orderBy(F.desc("end_ts"))
        .limit(1)
        .select(
            F.col("segment_id").alias("query_id"),
            F.col("features").alias("q_features"),
            F.to_date("start_ts").alias("query_start"),
        )
    )
    return match_pipeline(qseg, refs, strategy="join").select(
        "query_id", "rank", "segment_id", F.round("score", 6).alias("score")
    )


def test_matcher_parity_golden(spark):
    """F4 golden_matches: end-to-end matcher output pinned to a committed
    golden table (ids + ranks exact, scores to 1e-6). Regenerate ONLY by
    deleting tests/golden/matches.parquet and re-running (the oracle is the
    pipeline itself at a pinned commit — any semantic drift fails here)."""
    golden_path = os.path.join(GOLDEN_DIR, "matches.parquet")
    got = _build_matches(spark)
    if not os.path.exists(golden_path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        got.coalesce(1).write.parquet(golden_path)
        pytest.skip("golden matcher fixture generated — rerun to compare")
    want = spark.read.parquet(golden_path)
    g = [(r["query_id"], r["rank"], r["segment_id"], r["score"])
         for r in got.orderBy("query_id", "rank").collect()]
    w = [(r["query_id"], r["rank"], r["segment_id"], r["score"])
         for r in want.orderBy("query_id", "rank").collect()]
    assert [x[:3] for x in g] == [x[:3] for x in w], "matcher ids/ranks drifted"
    for (gq, gr, gs, gsc), (_, _, _, wsc) in zip(g, w):
        assert abs(gsc - wsc) <= 1e-6, (gq, gr, gs, gsc, wsc)
