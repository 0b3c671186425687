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


def test_stream_snapshot_sink_cascade_parity_and_resume(spark, tmp_path):
    """Stream micro-batches committed through snapshot_sink, then
    RollupJob.run_cascade over the stream-written 1m table, must
    hash-match the all-batch pipeline on every tier — including across a
    kill-and-restart of the availableNow run (the replayed micro-batch is
    skipped by the batch-id guard, not double-committed)."""
    import shutil
    import time as _time

    import pandas as pd

    from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
    from timeseriesvectordbpattermatcher_spark.streaming.rollup_stream import (
        snapshot_sink,
    )

    # ---- shared input: TIME-ORDERED files (arrival order == event order,
    # like real ingestion) so the watermark advances progressively, several
    # micro-batches each finalize windows, and nothing is late-dropped; a
    # final far-future sentinel flushes the remaining open windows
    batch_dir = str(tmp_path / "in_batch")
    synth_seqs(spark, 800, seed=31).write.parquet(batch_dir)
    base = spark.read.parquet(batch_dir)
    pdf = (
        derive_event_ts(base)
        .orderBy("event_ts")
        .drop("event_ts")
        .toPandas()
    )
    stream_dir = str(tmp_path / "in_stream")
    bands = [pdf.iloc[: len(pdf) // 3], pdf.iloc[len(pdf) // 3 : 2 * len(pdf) // 3],
             pdf.iloc[2 * len(pdf) // 3 :]]
    for band in bands:
        spark.createDataFrame(band, base.schema).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)
        _time.sleep(1.2)  # distinct mtimes: file order == event-time order
    spark.createDataFrame(
        [("web_20400101000000_99999999", [1], 1, "web")],
        base.schema,
    ).coalesce(1).write.mode("append").parquet(stream_dir)

    # ---- batch reference pipeline
    job_b = RollupJob(str(tmp_path / "tbl_batch"))
    job_b.run(spark, derive_event_ts(spark.read.parquet(batch_dir)))

    # ---- streaming pipeline with an injected crash after the 1st commit
    job_s = RollupJob(str(tmp_path / "tbl_stream"))
    sink = snapshot_sink(job_s.tables["1m"])
    commits = {"n": 0}

    def crashing_sink(df, bid):
        sink(df, bid)
        # early micro-batches finalize no windows (watermark warm-up) and
        # commit nothing — crash right after the FIRST real commit
        if commits["n"] == 0 and job_s.tables["1m"].current_snapshot() is not None:
            commits["n"] = 1
            raise RuntimeError("injected crash after first snapshot commit")

    ckpt = str(tmp_path / "ckpt_sink")
    schema = spark.read.parquet(stream_dir).schema

    def start(fn):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        return (
            stream_rollup_1m(stream_derive_event_ts(stream))
            .writeStream.foreachBatch(fn)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start(crashing_sink)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)
    v_after_crash = job_s.tables["1m"].current_snapshot().version
    # restart from the same checkpoint: the crashed micro-batch replays and
    # must be SKIPPED (its commit already published), then the rest commits
    q2 = start(sink)
    q2.awaitTermination(180)
    versions = job_s.tables["1m"]._versions()
    assert v_after_crash in versions and len(versions) > v_after_crash

    # ---- cascade from the stream-written 1m snapshots
    job_s.run_cascade(spark)

    for tier in ("1m", "1h", "1d"):
        got_df = job_s.tables[tier].read(spark)
        want_df = job_b.tables[tier].read(spark)
        cols = sorted(set(want_df.columns) & set(got_df.columns))
        assert "bucket_ts" in cols and "cnt" in cols and "tok_sum" in cols
        g = got_df.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
        w = want_df.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False), tier
