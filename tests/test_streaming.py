from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.rollup import (
    derive_event_ts,
    rollup_1m,
)
from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs
from timeseriesvectordbpattermatcher_spark.streaming.rollup_stream import (
    stream_derive_event_ts,
    stream_rollup_1m,
    stream_running_stats,
)


@pytest.fixture(scope="module")
def seqs_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in") / "seqs")
    synth_seqs(spark, 1500, seed=23).write.parquet(path)
    return path


def _run_bounded(spark, stream_df, checkpoint, complete=True):
    q = (
        stream_df.writeStream.format("memory")
        .queryName("t_out")
        .outputMode("complete" if complete else "update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("select * from t_out")


def test_stream_rollup_matches_batch(spark, seqs_dir, tmp_path):
    batch_schema = spark.read.parquet(seqs_dir).schema
    stream = spark.readStream.schema(batch_schema).parquet(seqs_dir)
    out = _run_bounded(
        spark,
        stream_rollup_1m(stream_derive_event_ts(stream)),
        str(tmp_path / "ckpt1"),
    )
    got = {
        (r["source"], r["bucket_ts"], r["cnt"], r["sum_n_tok"], r["tok_sum"])
        for r in out.collect()
    }
    batch = rollup_1m(derive_event_ts(spark.read.parquet(seqs_dir)))
    want = {
        (r["source"], r["bucket_ts"], r["cnt"], r["sum_n_tok"], r["tok_sum"])
        for r in batch.collect()
    }
    assert got == want  # streaming output == batch tier, row for row


def test_stream_running_stats(spark, seqs_dir, tmp_path):
    batch_schema = spark.read.parquet(seqs_dir).schema
    stream = spark.readStream.schema(batch_schema).parquet(seqs_dir)
    out = _run_bounded(
        spark,
        stream_running_stats(stream),
        str(tmp_path / "ckpt2"),
        complete=False,
    )
    # final state per source equals the batch totals
    got = {(r["source"], r["cnt"], r["sum_n_tok"]) for r in out.collect()}
    want = {
        (r["source"], r["cnt"], r["s"])
        for r in spark.read.parquet(seqs_dir)
        .groupBy("source")
        .agg(F.count("*").alias("cnt"), F.sum("n_tok").alias("s"))
        .collect()
    }
    assert got == want


def test_stream_late_data_dropped_by_watermark(spark, tmp_path):
    """Append-mode watermark semantics: a window is emitted once the
    watermark passes it, and rows arriving later than the watermark delay
    are DROPPED (the engine's late-data policy, SURVEY §2.10)."""
    import time as _time

    d = str(tmp_path / "late_in")

    def write(rows):
        spark.createDataFrame(
            rows, "doc_id string, n_tok int, source string"
        ).coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.2)  # distinct mtimes -> deterministic file order

    def doc(ts, i):
        return (f"web_{ts}_{i:08d}", 10, "web")

    ckpt = str(tmp_path / "ckpt_late")
    out_dir = str(tmp_path / "late_out")

    def run():
        # parquet sink (memory sink cannot recover from a checkpoint)
        batch_schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(batch_schema)
            .option("maxFilesPerTrigger", 1)  # one file per micro-batch, mtime order
            .parquet(d)
        )
        q = (
            stream_rollup_1m(stream_derive_event_ts(stream), watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r["source"], str(r["bucket_ts"]), r["cnt"])
            for r in spark.read.parquet(out_dir).collect()
        }

    write([doc("20240101000030", i) for i in range(5)])   # on time, bucket 00:00
    write([doc("20240101010030", i) for i in range(3)])   # advances watermark ~1h
    # run 1: watermark passes 00:01 -> the 00:00 window finalizes with the
    # on-time count; 01:00 stays open (nothing later to close it)
    assert run() == {("web", "2024-01-01 00:00:00", 5)}

    write([doc("20240101000040", i) for i in range(2)])   # 1h late > 10min delay
    # run 2 (same checkpoint): the persisted watermark drops the late rows —
    # the already-emitted window is NOT re-opened or re-emitted
    assert run() == {("web", "2024-01-01 00:00:00", 5)}


def test_stream_tokenless_cascades_like_batch(spark, seqs_dir, tmp_path):
    """Token-less streams must emit the tok_* fallback columns so the
    downstream cascade() consumes streaming output exactly like batch
    output (used to raise UNRESOLVED_COLUMN tok_min)."""
    import pandas as pd

    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        cascade,
        derive_event_ts,
        rollup_1m,
    )

    batch_schema = spark.read.parquet(seqs_dir).schema
    stream = spark.readStream.schema(batch_schema).parquet(seqs_dir).drop("tokens")
    out = _run_bounded(
        spark,
        stream_rollup_1m(stream_derive_event_ts(stream)),
        str(tmp_path / "tl_ck"),
    )
    got = cascade(out, "1h").toPandas()
    want = cascade(
        rollup_1m(derive_event_ts(spark.read.parquet(seqs_dir).drop("tokens"))), "1h"
    ).toPandas()
    cols = sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
