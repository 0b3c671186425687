"""Structured Streaming variants of the rollup (SURVEY.md §2.10).

The reference has no streaming engine — its incrementality is a shell
respawn loop (/root/reference/loop_daemon.sh:7-20) plus a RabbitMQ pump
(/root/reference/bot/rqSessionService.py:30-110). The north star's primary
mode is batch-incremental (plans/checkpoint.py); this module provides the
true-streaming equivalents for pipelines that want them:

- ``stream_rollup_1m``    event-time tumbling window + watermark (late rows
                          beyond the watermark are dropped by the engine;
                          within it, state updates incrementally).
- ``stream_running_stats`` ``applyInPandasWithState`` custom stateful
                          operator: running per-source totals across
                          micro-batches (the state-store path).

Both read any streaming source; tests use a file source with
``trigger(availableNow=True)`` so they run bounded and deterministic.
Checkpointing: pass ``checkpoint`` to ``writeStream`` callers — resume is
the engine's own offset/state tracking (the streaming analog of our
snapshot checkpoints).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.rollup import derive_event_ts as stream_derive_event_ts  # noqa: F401
# (the batch doc_id -> event_ts parse is pure column expressions, which work
# unchanged on streaming frames — one implementation, re-exported)


def stream_rollup_1m(
    stream: DataFrame,
    watermark: str = "10 minutes",
    key_col: str = "source",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Windowed continuous aggregate with late-data watermark.

    Same associative stats as the batch tier, so downstream cascading
    (1h from 1m) re-aggregates streaming output exactly like batch output.
    """
    has_tokens = "tokens" in stream.columns
    aggs = [
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_tok").alias("sum_n_tok"),
        F.min("n_tok").alias("min_n_tok"),
        F.max("n_tok").alias("max_n_tok"),
    ]
    if has_tokens:
        stream = (
            stream.withColumn("tok_min", F.array_min("tokens"))
            .withColumn("tok_max", F.array_max("tokens"))
            .withColumn(
                "tok_sum",
                F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")),
            )
        )
    else:
        # token-less fallback, mirroring batch rollup_1m: the docstring's
        # "cascade re-aggregates streaming output exactly like batch"
        # claim requires the tok_* columns to exist on BOTH paths
        stream = (
            stream.withColumn("tok_min", F.col("n_tok"))
            .withColumn("tok_max", F.col("n_tok"))
            .withColumn("tok_sum", F.col("n_tok").cast("long"))
        )
    aggs += [
        F.min("tok_min").alias("tok_min"),
        F.max("tok_max").alias("tok_max"),
        F.sum("tok_sum").alias("tok_sum"),
    ]
    # group on the window STRUCT, not window(...).start — extracting the
    # field before the agg severs the event-time/watermark linkage and
    # Spark then rejects append mode ("aggregation without watermark"),
    # which is exactly the late-data-dropping mode
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col, F.window(ts_col, "1 minute").alias("_w"))
        .agg(*aggs)
        .withColumn("bucket_ts", F.col("_w.start"))
        .drop("_w")
    )
    return out.withColumn("avg_n_tok", F.col("sum_n_tok") / F.col("cnt"))


_STATE_SCHEMA = "cnt long, sum_n_tok long"
_OUT_SCHEMA = "source string, cnt long, sum_n_tok long, avg_n_tok double"


def _update_running(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (source,) = key
    cnt, sum_n = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        cnt += len(pdf)
        sum_n += int(pdf["n_tok"].sum())
    state.update((cnt, sum_n))
    yield pd.DataFrame(
        {"source": [source], "cnt": [cnt], "sum_n_tok": [sum_n],
         "avg_n_tok": [sum_n / cnt if cnt else 0.0]}
    )


def stream_running_stats(stream: DataFrame, key_col: str = "source") -> DataFrame:
    """Custom stateful operator: running totals per source across
    micro-batches via the state store (applyInPandasWithState)."""
    return (
        stream.select(key_col, "n_tok")
        .groupBy(key_col)
        .applyInPandasWithState(
            _update_running,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def snapshot_sink(table, run_prefix: str = "stream"):
    """``foreachBatch`` writer committing stream micro-batches through a
    :class:`~..sources.snapshot_table.SnapshotTable`, so the 1h/1d cascade
    (``RollupJob.run_cascade``) consumes streaming 1m output through the
    SAME snapshot/changed-partition protocol as batch-written tiers.

    Exactly-once across restarts: Structured Streaming re-runs the last
    unfinished micro-batch after a crash, so each commit records its
    ``batch_id`` in the snapshot meta and a replayed batch whose id is
    already committed is skipped — the batch's output is deterministic for
    a given checkpoint, making skip-on-replay safe.

    Merge-on-write: append-mode windowed aggregation emits each finalized
    window exactly once, but a (source, day) PARTITION accumulates windows
    across many micro-batches — a blind ``overwrite_partitions`` of just
    the batch rows would erase the day's earlier windows. The sink unions
    the already-committed rows of the touched partitions with the batch
    before overwriting; only watermark-hot days rewrite, closed days are
    never touched.

    Usage::

        q = (stream_rollup_1m(ts).writeStream
             .foreachBatch(snapshot_sink(job.tables["1m"]))
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        snap = table.current_snapshot()
        last = -1
        if snap is not None and snap.meta:
            last = int(snap.meta.get("stream_batch_id", -1))
        if batch_id <= last:
            # Replay after restart: the snapshot commit already published,
            # but the engine still requires this batch's stateful operators
            # to execute and commit their state stores (Spark 4.x validates
            # per-batch state commits) — run the plan, discard the rows.
            batch_df.count()
            return
        out = batch_df.withColumn("bucket_day", F.to_date("bucket_ts"))
        touched = [
            (r["source"], r["bucket_day"])
            for r in out.select("source", "bucket_day").distinct().collect()
        ]
        if not touched:
            return
        spark = batch_df.sparkSession
        keys = sorted(f"{s}/{d.isoformat()}" for s, d in touched)
        prior = table.read_partitions(spark, keys)  # manifest-pruned scan
        if prior is not None:
            out = prior.unionByName(out.select(*prior.columns))
        # new watermark = max finalized window start so far (monotone with
        # the previous snapshot's — replays are skipped above, and append
        # mode only ever finalizes forward)
        wm_row = out.agg(F.max("bucket_ts").alias("wm")).first()
        wm = wm_row["wm"].isoformat() if wm_row and wm_row["wm"] else None
        if snap is not None and snap.watermark and wm is not None:
            wm = max(wm, snap.watermark)
        table.overwrite_partitions(
            out,
            ["source", "bucket_day"],
            run_id=f"{run_prefix}_b{batch_id}",
            watermark=wm,
            # merge, don't replace: other writers' meta keys (and a batch
            # RollupJob's) must survive, and the replay guard must survive
            # a later batch-mode commit that carries its own meta
            meta=dict((snap.meta or {}) if snap else {}, stream_batch_id=batch_id),
        )

    return write_batch
