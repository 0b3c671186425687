"""Streaming incremental curation: dedup each arriving micro-batch against
the persisted survivor store and grow the curated corpus through snapshot
commits — the streaming face of ``operators/curation.py``.

The batch curation job (``scripts/corpus_job.py``) recurates a corpus in
place; at 100 TB the steady state is instead "a crawl increment lands every
few minutes and must be deduped against everything already kept WITHOUT
rescanning it". This sink composes the pieces that already exist:

- ``readStream`` delivers increments (files, Kafka, ...) as micro-batches;
- ``incremental_exact_dedup`` / ``incremental_minhash_dedup`` dedup the
  batch against the store — an anti join on 16-byte digests (or a banded
  signature join), never a scan of the curated corpus;
- two :class:`~..sources.snapshot_table.SnapshotTable` commits publish the
  batch's survivors and its store delta atomically per table.

Exactly-once across restarts: each batch writes its OWN partition
(``_batch=<id>``), so a replayed batch overwrites the same partition with
the same deterministic rows (the store the replay reads is the pre-batch
version — the store commit happens last, so a crash between the two
commits replays into an unchanged dedup input). The ``stream_batch_id``
meta guard additionally skips fully-committed replays without rewriting.
Same protocol as ``rollup_stream.snapshot_sink``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.curation import (
    bloom_words_from_b64,
    bloom_words_to_b64,
    digest_bloom_words,
    incremental_exact_dedup,
    incremental_minhash_dedup,
    merge_bloom_words,
)


def curation_sink(
    corpus_table,
    store_table,
    method: str = "exact",
    text_col: str = "text",
    id_col: str = "doc_id",
    run_prefix: str = "curate",
    bloom_m_bits: int | None = None,
    bloom_k: int = 5,
    **dedup_kw,
):
    """Build a ``foreachBatch`` writer for streaming incremental curation.

    ``corpus_table`` / ``store_table`` are :class:`SnapshotTable` roots for
    the curated rows and the survivor store (digests for ``method='exact'``,
    minhash signatures for ``method='minhash'``). ``dedup_kw`` forwards to
    the incremental dedup operator (threshold/num_perm/... for minhash;
    the exact store probe defaults to ``probe='auto'``, which routes
    big stores to the store-shuffle-free broadcast form by size — see
    ``curation.choose_probe``).

    ``bloom_m_bits`` (exact method only) maintains a bloom filter over the
    store ACROSS micro-batches: each batch's store delta contributes its
    OR-merged words, serialized into the store commit's snapshot metadata
    (``bloom_b64``) — so the bloom is exactly as crash-consistent as the
    store itself (committed atomically with the delta; a replay reads the
    pre-batch bloom alongside the pre-batch store). Implies
    ``probe='broadcast'``; bloom-negative rows skip the store probe, and
    ``skip_scan_when_clean=True`` (forwarded) additionally skips the store
    scan for history-disjoint batches — the steady-state win when most
    increments are new content. Enabling the bloom mid-stream is handled:
    a store without ``bloom_b64`` gets one built from the full store once.
    Changing ``bloom_m_bits``/``bloom_k`` mid-stream raises (the stored
    words are not convertible).

    Usage::

        q = (spark.readStream.schema(s).parquet(inbox)
             .writeStream.foreachBatch(
                 curation_sink(SnapshotTable(corpus), SnapshotTable(store)))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    """
    if bloom_m_bits is not None:
        if method != "exact":
            raise ValueError("bloom_m_bits requires method='exact'")
        if dedup_kw.setdefault("probe", "broadcast") not in ("auto", "broadcast"):
            raise ValueError("bloom_m_bits requires probe='broadcast'")
    if method == "exact":
        dedup = incremental_exact_dedup
        store_cols = None  # whole store schema is the digest column
    elif method == "minhash":
        dedup = incremental_minhash_dedup
        store_cols = [id_col, "n_shingles", "minhash"]
    else:
        raise ValueError(f"method must be exact|minhash, got {method!r}")

    def _last(table) -> int:
        snap = table.current_snapshot()
        if snap is not None and snap.meta:
            return int(snap.meta.get("stream_batch_id", -1))
        return -1

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # per-TABLE replay guards: the corpus commits first, so after any
        # crash corpus_last >= store_last. A replay that finds the corpus
        # committed but the store lagging recomputes the (deterministic —
        # the store read is still the pre-batch version) dedup and commits
        # only the store delta; guarding on the corpus alone would skip the
        # whole batch and lose the store delta forever.
        corpus_last, store_last = _last(corpus_table), _last(store_table)
        if batch_id <= store_last:
            batch_df.count()  # full replay: run the plan, discard (see snapshot_sink)
            return
        spark = batch_df.sparkSession
        store = store_table.read(spark)
        if store is not None and store_cols is not None:
            store = store.select(*store_cols)
        kw = dict(dedup_kw)
        prev_words = None
        if bloom_m_bits is not None and store is not None:
            meta = (store_table.current_snapshot().meta or {})
            if "bloom_b64" in meta:
                if (
                    int(meta.get("bloom_m_bits", -1)) != bloom_m_bits
                    or int(meta.get("bloom_k", -1)) != bloom_k
                ):
                    raise ValueError(
                        "stored bloom sizing "
                        f"(m_bits={meta.get('bloom_m_bits')}, k={meta.get('bloom_k')}) "
                        f"differs from requested ({bloom_m_bits}, {bloom_k}); "
                        "bloom words are not convertible across sizings"
                    )
                prev_words = bloom_words_from_b64(meta["bloom_b64"], bloom_m_bits)
            else:
                # bloom enabled mid-stream: one full-store build, then
                # incremental OR-merges from here on
                prev_words = digest_bloom_words(store, m_bits=bloom_m_bits, k=bloom_k)
            kw["bloom_words"] = prev_words
            kw["bloom_m_bits"] = bloom_m_bits
            kw["bloom_k"] = bloom_k
        survivors, delta = dedup(
            batch_df, store, text_col=text_col, id_col=id_col, **kw
        )
        bloom_meta = {}
        if bloom_m_bits is not None:
            delta_words = digest_bloom_words(delta, m_bits=bloom_m_bits, k=bloom_k)
            merged = (
                merge_bloom_words(prev_words, delta_words)
                if prev_words is not None
                else delta_words
            )
            bloom_meta = {
                "bloom_b64": bloom_words_to_b64(merged),
                "bloom_m_bits": bloom_m_bits,
                "bloom_k": bloom_k,
            }
        if batch_id > corpus_last:
            snap = corpus_table.current_snapshot()
            corpus_table.overwrite_partitions(
                survivors.withColumn("_batch", F.lit(int(batch_id))),
                ["_batch"],
                run_id=f"{run_prefix}_b{batch_id}",
                meta=dict((snap.meta or {}) if snap else {}, stream_batch_id=batch_id),
            )
        store_snap = store_table.current_snapshot()
        store_table.overwrite_partitions(
            delta.withColumn("_batch", F.lit(int(batch_id))),
            ["_batch"],
            run_id=f"{run_prefix}_store_b{batch_id}",
            meta=dict(
                (store_snap.meta or {}) if store_snap else {},
                stream_batch_id=batch_id,
                **bloom_meta,
            ),
        )

    return write_batch


def read_curated(spark, corpus_table) -> DataFrame | None:
    """The curated corpus across all committed batches (minus the
    bookkeeping column)."""
    df = corpus_table.read(spark)
    return None if df is None else df.drop("_batch")
