"""Streaming incremental curation (streaming/curation_stream.py): stream
micro-batches dedup against the persisted survivor store, survive a
kill-and-restart (including a crash BETWEEN the corpus and store commits),
and the final corpus matches a batch full-rerun."""

from __future__ import annotations

import time as _time

import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.dedup import exact_dedup
from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import SnapshotTable
from timeseriesvectordbpattermatcher_spark.streaming.curation_stream import (
    curation_sink,
    read_curated,
)

SCHEMA = "doc_id string, text string"


def _waves(spark, tmp_path):
    """Three arrival waves with ascending ids: wave 2 repeats wave 1 texts
    (cross-batch dups), wave 3 repeats waves 1+2 and itself."""
    def text_of(i):
        # large modulus: distinct i -> distinct text (with %23 the corpus
        # held only 23 distinct texts and waves 2-3 were accidental full
        # dups, committing EMPTY partitions)
        return " ".join(f"w{(i * 13 + j) % 997}" for j in range(12))

    waves = [
        [(f"d{i:05d}", text_of(i)) for i in range(0, 40)],
        [(f"d{i:05d}", text_of(i - 40 if i < 55 else i)) for i in range(40, 80)],
        [(f"d{i:05d}", text_of(i - 80 if i < 95 else (100 if i in (101, 103) else i)))
         for i in range(80, 110)],
    ]
    stream_dir = str(tmp_path / "inbox")
    for w in waves:
        spark.createDataFrame(w, SCHEMA).coalesce(1).write.mode("append").parquet(stream_dir)
        _time.sleep(1.2)  # distinct mtimes: file order == id order
    return stream_dir, [r for w in waves for r in w]


def _start(spark, stream_dir, ckpt, sink):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def test_stream_curation_matches_batch_rerun_across_crashes(spark, tmp_path):
    stream_dir, all_rows = _waves(spark, tmp_path)
    corpus = SnapshotTable(str(tmp_path / "corpus"))
    store = SnapshotTable(str(tmp_path / "store"))
    sink = curation_sink(corpus, store)

    # crash INSIDE the first committing batch, between the corpus commit
    # and the store commit — the lost store delta must be recovered on
    # replay, not skipped
    orig_overwrite = store.overwrite_partitions
    state = {"crashed": False}

    def crashing_store_commit(*a, **kw):
        if not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash between corpus and store commits")
        return orig_overwrite(*a, **kw)

    store.overwrite_partitions = crashing_store_commit
    q = _start(spark, stream_dir, str(tmp_path / "ckpt"), sink)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)
    assert corpus.current_snapshot() is not None  # corpus committed first
    assert store.current_snapshot() is None       # store commit crashed

    # restart from the same checkpoint: the replayed batch re-commits the
    # store delta (corpus partition untouched), then the rest streams in
    q2 = _start(spark, stream_dir, str(tmp_path / "ckpt"), sink)
    q2.awaitTermination(180)

    got = read_curated(spark, corpus)
    batch_ref = exact_dedup(spark.createDataFrame(all_rows, SCHEMA))
    got_ids = sorted(r["doc_id"] for r in got.collect())
    want_ids = sorted(r["doc_id"] for r in batch_ref.collect())
    assert got_ids == want_ids
    # the store holds each digest exactly once
    digests = [r["digest"] for r in store.read(spark).select("digest").collect()]
    assert len(digests) == len(set(digests)) == len(want_ids)
    # per-table guards both caught up
    assert int(corpus.current_snapshot().meta["stream_batch_id"]) == int(
        store.current_snapshot().meta["stream_batch_id"]
    )

    # a no-new-data restart replays nothing and changes nothing
    v_corpus = corpus.current_snapshot().version
    q3 = _start(spark, stream_dir, str(tmp_path / "ckpt"), sink)
    q3.awaitTermination(180)
    assert corpus.current_snapshot().version == v_corpus


def test_stream_curation_bloom_broadcast_probe(spark, tmp_path):
    """Bloom-maintained broadcast store probe: same final corpus as the
    default sink, and the store snapshot's bloom metadata replays exactly
    from the engine-free oracle over ALL store digests (i.e. the
    per-batch OR-merge fold == a from-scratch build)."""
    from tests.oracle.dedup_oracle import bloom_words_oracle

    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        bloom_words_from_b64,
    )

    stream_dir, all_rows = _waves(spark, tmp_path)
    corpus = SnapshotTable(str(tmp_path / "corpus_bl"))
    store = SnapshotTable(str(tmp_path / "store_bl"))
    m_bits, k = 1 << 14, 5
    sink = curation_sink(
        corpus, store, bloom_m_bits=m_bits, bloom_k=k, skip_scan_when_clean=True
    )
    q = _start(spark, stream_dir, str(tmp_path / "ckpt_bl"), sink)
    q.awaitTermination(180)

    got_ids = sorted(r["doc_id"] for r in read_curated(spark, corpus).collect())
    want = exact_dedup(spark.createDataFrame(all_rows, SCHEMA))
    assert got_ids == sorted(r["doc_id"] for r in want.collect())

    meta = store.current_snapshot().meta
    assert int(meta["bloom_m_bits"]) == m_bits and int(meta["bloom_k"]) == k
    words = bloom_words_from_b64(meta["bloom_b64"], m_bits)
    digests = [r["digest"] for r in store.read(spark).select("digest").collect()]
    assert words == bloom_words_oracle(digests, m_bits, k)

    # resizing the bloom mid-stream is refused, not silently misread
    bad = curation_sink(corpus, store, bloom_m_bits=m_bits * 2, bloom_k=k)
    newer = spark.createDataFrame([("n1", "post-hoc text")], SCHEMA)
    with pytest.raises(ValueError, match="sizing"):
        bad(newer, batch_id=99)
    with pytest.raises(ValueError, match="method"):
        curation_sink(corpus, store, method="minhash", bloom_m_bits=m_bits)


def test_stream_curation_minhash_near_dups(spark, tmp_path):
    """The minhash flavor: a later wave's NEAR-copy of a stored survivor is
    dropped without rescanning the corpus (the store ships signatures)."""
    base = " ".join(f"q{j}" for j in range(40))
    ws = base.split()
    near = " ".join(ws[:20] + ["zzz"] + ws[21:])
    uniq = " ".join(f"u{j * 13 % 97}" for j in range(40))
    stream_dir = str(tmp_path / "inbox")
    spark.createDataFrame([("a1", base), ("a2", uniq)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)
    _time.sleep(1.2)
    spark.createDataFrame(
        [("b1", near), ("b2", " ".join(f"v{j * 11 % 89}" for j in range(40)))], SCHEMA
    ).coalesce(1).write.mode("append").parquet(stream_dir)

    corpus = SnapshotTable(str(tmp_path / "corpus_mh"))
    store = SnapshotTable(str(tmp_path / "store_mh"))
    q = _start(
        spark, stream_dir, str(tmp_path / "ckpt_mh"),
        curation_sink(corpus, store, method="minhash",
                      threshold=0.5, num_perm=32, bands=8),
    )
    q.awaitTermination(180)
    got = sorted(r["doc_id"] for r in read_curated(spark, corpus).collect())
    assert got == ["a1", "a2", "b2"]  # b1 near-dups stored a1
    assert sorted(r["doc_id"] for r in store.read(spark).select("doc_id").collect()) == got


def test_fold_stream_batches_compacts_partitions(spark, tmp_path):
    """The per-batch partitions the sink accumulates fold into coarse
    buckets in ONE atomic snapshot (adds + drops together), rows and the
    replay-guard meta unchanged; vacuum reclaims the replaced files."""
    import os

    from timeseriesvectordbpattermatcher_spark.operators.retention import (
        fold_stream_batches,
        vacuum,
    )

    stream_dir, all_rows = _waves(spark, tmp_path)
    corpus = SnapshotTable(str(tmp_path / "corpus_f"))
    store = SnapshotTable(str(tmp_path / "store_f"))
    q = _start(spark, stream_dir, str(tmp_path / "ckpt_f"), curation_sink(corpus, store))
    q.awaitTermination(180)

    before = read_curated(spark, corpus).toPandas()
    snap0 = corpus.current_snapshot()
    assert len([k for k in snap0.partitions if k.isdigit()]) == 3  # one per wave

    stats = fold_stream_batches(corpus, spark, every=100, keep_last=0)
    assert stats["folded"] and stats["partitions_after"] < stats["partitions_before"]
    snap1 = corpus.current_snapshot()
    assert [k for k in snap1.partitions if k.isdigit()] == ["0"]
    assert snap1.version == snap0.version + 1  # ONE commit for adds+drops
    assert snap1.meta == snap0.meta            # replay guard survives

    after = read_curated(spark, corpus).toPandas()
    cols = sorted(before.columns)
    a = before[cols].sort_values(cols).reset_index(drop=True)
    b = after[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    # the old batch files are unreferenced now; vacuum reclaims them
    n_files_before = sum(
        len(files) for _, _, files in os.walk(corpus.root)
    )
    vacuum(corpus, min_age_secs=0, keep_versions=1)
    n_files_after = sum(len(files) for _, _, files in os.walk(corpus.root))
    assert n_files_after < n_files_before
    assert read_curated(spark, corpus).count() == len(before)

    # idempotent: a second fold has nothing to do
    stats2 = fold_stream_batches(corpus, spark, every=100, keep_last=0)
    assert stats2["folded"] == []


def test_curation_stream_job_cli(spark, tmp_path):
    """The spark-submit entry drains an inbox, reports stats, and a second
    run with new files continues from the checkpoint (no recuration)."""
    import json
    import os
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inbox = str(tmp_path / "inbox")
    spark.createDataFrame(
        [(f"a{i}", f"cli text {i} alpha") for i in range(20)]
        + [("a_dup", "cli text 3 alpha")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(inbox)

    def run():
        env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "curation_stream_job.py"),
             "--inbox", inbox, "--corpus", str(tmp_path / "c"),
             "--store", str(tmp_path / "s"),
             "--checkpoint", str(tmp_path / "ckpt"),
             "--fold-every", "100", "--cpus", "8"],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        return json.loads([l for l in p.stdout.splitlines() if l.startswith("{")][-1])

    s1 = run()
    assert s1["curated_rows"] == 20  # a_dup deduped in-batch

    spark.createDataFrame(
        [("b1", "cli text 3 alpha"), ("b2", "brand new doc")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(inbox)
    s2 = run()
    assert s2["curated_rows"] == 21          # b1 dropped against the store
    assert s2["last_batch_id"] > s1["last_batch_id"]
