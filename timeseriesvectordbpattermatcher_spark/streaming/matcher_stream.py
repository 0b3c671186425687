"""Streaming matcher: match each arriving micro-batch of query segments
against the reference corpus and commit results through a SnapshotTable —
the Structured-Streaming replacement for the reference's agent daemon loop
(/root/reference/agent/pineconeSession.py:45-79 polls a queue, embeds the
request window, queries Pinecone, posts results; ``loop_daemon.sh``
restarts it forever).

Engine shape: the daemon's queue becomes a ``readStream`` source (files,
Kafka, ...), the Pinecone probe becomes either the E2 ``match_pipeline``
against a static ref DataFrame (broadcast/side-file/LSH — auto-routed) or
a manifest-pruned probe of a PERSISTED IVF index
(``similarity.build_ivf_index``), and the result post becomes an atomic
snapshot commit with the same batch-id replay guard as the other sinks —
crash/restart resumes exactly-once from the checkpoint instead of a shell
loop re-running from scratch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def matcher_sink(
    results_table,
    refs: DataFrame | None = None,
    index_table=None,
    dtw_refs: DataFrame | None = None,
    k: int | None = None,
    strategy: str = "auto",
    nprobe: int = 4,
    e2_filters: bool = False,
    dtw_band: int = 8,
    dtw_znorm: bool = True,
    run_prefix: str = "match",
    query_id: str = "query_id",
    query_vec: str = "q_features",
    store_dir: str | None = None,
    **pipeline_kw,
):
    """Build a ``foreachBatch`` writer matching query-segment micro-batches.

    Exactly one of:

    - ``refs``: a static reference-segment DataFrame — each batch runs the
      full E2 ``match_pipeline`` (top-k -> keep-first-per-series ->
      historical-only -> re-rank) under the auto-routed strategy; the
      batch must carry (query_id, q_features, query_start).
    - ``index_table``: a SnapshotTable holding a persisted IVF index —
      each batch probes only its ``nprobe`` lists' files (raw cosine
      top-k; the batch carries (query_id, <query_vec>)). A rebuild of
      the index between batches is picked up atomically. With
      ``e2_filters=True`` the probe instead routes through the full E2
      ``match_pipeline(index_table=...)`` (keep-first -> historical-only
      -> re-rank -> display head); the batch must then carry
      (query_id, q_features, query_start) and the index must be built
      over (segment_id, features) — streamed results equal a batch
      ``match_pipeline`` run over the union of batches (parity-pinned).
    - ``dtw_refs``: a static reference-segment DataFrame matched by
      banded DTW (operators/dtw.py — exact elastic top-k with LB_Keogh
      pruning, ``dtw_band``/``dtw_znorm``); extra kwargs flow to
      ``dtw_topk`` (e.g. ``ref_id``/``ref_vec`` column names). The
      bounded-ref broadcast contract applies per batch.

    Results land one ``_batch=<id>`` partition per micro-batch with the
    standard replay guard (a replayed batch is skipped; its commit already
    published). ``fold_stream_batches`` + ``vacuum`` maintain the results
    table like any other streaming sink output.
    """
    n_modes = sum(x is not None for x in (refs, index_table, dtw_refs))
    if n_modes != 1:
        raise ValueError("pass exactly one of refs / index_table / dtw_refs")
    if e2_filters and index_table is None:
        raise ValueError("e2_filters=True requires index_table (the refs "
                         "path already runs the full E2 pipeline)")

    def _last(table) -> int:
        snap = table.current_snapshot()
        if snap is not None and snap.meta:
            return int(snap.meta.get("stream_batch_id", -1))
        return -1

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last(results_table):
            batch_df.count()  # replay: run the plan, discard
            return
        if refs is not None:
            from ..operators.matcher import match_pipeline

            # k=None keeps E2's own TOP_K default — overriding the search
            # width here would silently change which rows survive the
            # keep-first/historical filters vs a batch run
            kw = dict(pipeline_kw)
            if k is not None:
                kw["k"] = k
            out = match_pipeline(
                batch_df, refs, strategy=strategy, store_dir=store_dir, **kw
            )
        elif dtw_refs is not None:
            from ..operators.dtw import dtw_topk

            out = dtw_topk(
                batch_df, dtw_refs, k=k or 20, band=dtw_band,
                znorm=dtw_znorm, query_id=query_id, query_vec=query_vec,
                **pipeline_kw,
            )
        elif e2_filters:
            from ..operators.matcher import match_pipeline

            kw = dict(pipeline_kw)
            if k is not None:
                kw["k"] = k
            out = match_pipeline(
                batch_df, None, index_table=index_table, nprobe=nprobe, **kw
            )
        else:
            from ..operators.similarity import ivf_probe_index

            out = ivf_probe_index(
                batch_df, index_table, k=k or 10, nprobe=nprobe,
                query_id=query_id, query_vec=query_vec,
            )
        snap = results_table.current_snapshot()
        results_table.overwrite_partitions(
            out.withColumn("_batch", F.lit(int(batch_id))),
            ["_batch"],
            run_id=f"{run_prefix}_b{batch_id}",
            meta=dict((snap.meta or {}) if snap else {}, stream_batch_id=batch_id),
        )

    return write_batch


def read_matches(spark, results_table) -> DataFrame | None:
    """All committed match results (minus the bookkeeping column)."""
    df = results_table.read(spark)
    return None if df is None else df.drop("_batch")
