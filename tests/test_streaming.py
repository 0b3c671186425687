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
