"""Streaming matcher (streaming/matcher_stream.py): micro-batches of query
segments match against a static ref set (E2 pipeline) or a persisted IVF
index; results equal the batch run over the same queries."""

from __future__ import annotations

import time as _time

import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.matcher import match_pipeline
from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
    ma_normalize,
    segment_series,
)
from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import SnapshotTable
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv
from timeseriesvectordbpattermatcher_spark.streaming.matcher_stream import (
    matcher_sink,
    read_matches,
)


@pytest.fixture(scope="module")
def refs_and_queries(spark):
    ohlcv = synth_ohlcv(spark, n_tickers=6, n_days=900)
    refs = segment_series(ma_normalize(ohlcv)).localCheckpoint(eager=True)
    qsegs = (
        segment_series(ma_normalize(ohlcv.filter("series_id in ('TK00','TK01')")))
        .orderBy(F.desc("end_ts"))
        .limit(4)
        .select(
            F.col("segment_id").alias("query_id"),
            F.col("features").alias("q_features"),
            F.to_date("start_ts").alias("query_start"),
        )
        .localCheckpoint(eager=True)
    )
    return refs, qsegs


def _stream_queries(spark, tmp_path, qsegs):
    """Two arrival waves of query segments (written via Spark so dates and
    feature arrays round-trip exactly)."""
    ids = sorted(r["query_id"] for r in qsegs.select("query_id").collect())
    inbox = str(tmp_path / "q_inbox")
    for wave in (ids[:2], ids[2:]):
        qsegs.filter(F.col("query_id").isin(wave)).coalesce(1).write.mode(
            "append"
        ).parquet(inbox)
        _time.sleep(1.2)
    return inbox


def _run_stream(spark, inbox, ckpt, sink, schema):
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_matcher_pipeline_equals_batch(spark, tmp_path, refs_and_queries):
    refs, qsegs = refs_and_queries
    inbox = _stream_queries(spark, tmp_path, qsegs)
    results = SnapshotTable(str(tmp_path / "matches"))
    _run_stream(
        spark, inbox, str(tmp_path / "ckpt"),
        matcher_sink(results, refs=refs, strategy="join"), qsegs.schema,
    )
    got = sorted(
        map(tuple, read_matches(spark, results)
            .select("query_id", "rank", "segment_id").collect())
    )
    want = sorted(
        map(tuple, match_pipeline(qsegs, refs, strategy="join")
            .select("query_id", "rank", "segment_id").collect())
    )
    assert got == want and len(got) > 0
    # one partition per non-empty micro-batch, replay guard recorded
    snap = results.current_snapshot()
    assert int(snap.meta["stream_batch_id"]) >= 1

    # a no-new-data restart changes nothing
    v = snap.version
    _run_stream(
        spark, inbox, str(tmp_path / "ckpt"),
        matcher_sink(results, refs=refs, strategy="join"), qsegs.schema,
    )
    assert results.current_snapshot().version == v


def test_stream_matcher_ivf_index_probe(spark, tmp_path):
    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    index = SnapshotTable(str(tmp_path / "ivf"))
    build_ivf_index(emb, index, n_lists=8, seed=37)
    queries = emb.limit(4).select(
        F.concat(F.lit("q"), F.col("vec_id").cast("string")).alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    inbox = str(tmp_path / "q_inbox")
    pdf = queries.toPandas()
    for half in (pdf.iloc[:2], pdf.iloc[2:]):
        spark.createDataFrame(half, queries.schema).coalesce(1).write.mode(
            "append"
        ).parquet(inbox)
        _time.sleep(1.2)
    results = SnapshotTable(str(tmp_path / "matches"))
    _run_stream(
        spark, inbox, str(tmp_path / "ckpt"),
        matcher_sink(results, index_table=index, k=5, nprobe=3,
                     query_vec="q_embedding"),
        queries.schema,
    )
    got = sorted(
        map(tuple, read_matches(spark, results)
            .select("query_id", "rank", "vec_id").collect())
    )
    want = sorted(
        map(tuple, ivf_probe_index(queries, index, k=5, nprobe=3,
                                   query_vec="q_embedding")
            .select("query_id", "rank", "vec_id").collect())
    )
    assert got == want and len(got) == 4 * 5


def test_matcher_sink_validates_modes(spark, tmp_path):
    results = SnapshotTable(str(tmp_path / "m"))
    with pytest.raises(ValueError):
        matcher_sink(results)
    with pytest.raises(ValueError):
        matcher_sink(results, refs=spark.range(1), index_table=results)


def test_stream_matcher_dtw_equals_batch(spark, tmp_path, refs_and_queries):
    """dtw_refs mode: streamed micro-batches produce exactly the batch
    dtw_topk result over the same queries (elastic matcher parity)."""
    from timeseriesvectordbpattermatcher_spark.operators.dtw import dtw_topk

    refs, qsegs = refs_and_queries
    drefs = refs.select(
        F.col("segment_id").alias("ref_id"), F.col("features").alias("vec")
    ).localCheckpoint(eager=True)
    inbox = _stream_queries(spark, tmp_path, qsegs)
    results = SnapshotTable(str(tmp_path / "dtw_res"))
    sink = matcher_sink(
        results, dtw_refs=drefs, k=5, dtw_band=6,
        query_id="query_id", query_vec="q_features",
        ref_id="ref_id", ref_vec="vec",
    )
    _run_stream(
        spark, inbox, str(tmp_path / "dtw_ckpt"), sink,
        qsegs.schema,
    )
    got = (
        read_matches(spark, results)
        .orderBy("query_id", "rank")
        .collect()
    )
    want = (
        dtw_topk(
            qsegs, drefs, k=5, band=6,
            query_id="query_id", query_vec="q_features",
        )
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [
        (r["query_id"], r["ref_id"], r["rank"]) for r in got
    ] == [(r["query_id"], r["ref_id"], r["rank"]) for r in want]
    assert all(
        abs(g["dtw"] - w["dtw"]) < 1e-9 for g, w in zip(got, want)
    )


def test_matcher_sink_rejects_two_modes(spark, tmp_path, refs_and_queries):
    refs, _ = refs_and_queries
    results = SnapshotTable(str(tmp_path / "two_modes"))
    with pytest.raises(ValueError, match="exactly one"):
        matcher_sink(results, refs=refs, dtw_refs=refs)
    with pytest.raises(ValueError, match="exactly one"):
        matcher_sink(results)


def test_stream_matcher_index_e2_equals_batch(spark, tmp_path, refs_and_queries):
    """e2_filters=True over a persisted IVF index: streamed results equal
    a batch match_pipeline(index_table=...) run over the union of the
    micro-batches — the full E2 filter chain, not the raw probe."""
    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        build_ivf_index,
    )

    refs, qsegs = refs_and_queries
    index = SnapshotTable(str(tmp_path / "seg_ivf"))
    build_ivf_index(
        refs, index, n_lists=4, seed=37,
        ref_id="segment_id", ref_vec="features",
    )
    inbox = _stream_queries(spark, tmp_path, qsegs)
    results = SnapshotTable(str(tmp_path / "matches_e2"))
    _run_stream(
        spark, inbox, str(tmp_path / "ckpt_e2"),
        matcher_sink(results, index_table=index, nprobe=4, e2_filters=True),
        qsegs.schema,
    )
    got = sorted(
        map(tuple, read_matches(spark, results)
            .select("query_id", "rank", "segment_id").collect())
    )
    want = sorted(
        map(tuple, match_pipeline(qsegs, None, index_table=index, nprobe=4)
            .select("query_id", "rank", "segment_id").collect())
    )
    assert got == want and len(got) > 0
    with pytest.raises(ValueError, match="e2_filters"):
        matcher_sink(results, refs=refs, e2_filters=True)
