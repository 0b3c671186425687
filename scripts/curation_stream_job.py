"""spark-submit entrypoint for STREAMING incremental curation: watch an
inbox of parquet crawl increments, dedup each micro-batch against the
persisted survivor store, and grow the curated corpus through snapshot
commits — the always-on shape of ``corpus_job.py``.

    inbox/*.parquet (doc_id, text, ...)
      -> readStream (maxFilesPerTrigger bounds batch size)
      -> incremental exact/minhash dedup vs the survivor store
         (anti join on digests / banded signature join — the curated
         corpus itself is never rescanned)
      -> snapshot commits: corpus + store, per-table replay guards
      -> [--fold-every] maintenance: rebucket the accumulated per-batch
         partitions and vacuum replaced files

Exactly-once across restarts comes from the checkpoint + the snapshot
batch-id guards (see streaming/curation_stream.py); a crash between the
corpus and store commits replays into an unchanged dedup input and
re-commits only the lagging store.

Cluster:
    scripts/make_pyfiles_zip.sh
    spark-submit --py-files engine.zip scripts/curation_stream_job.py \
        --inbox /landing/crawl --corpus /tables/curated \
        --store /tables/curated_digests --checkpoint /ckpt/curate \
        [--method minhash --threshold 0.5] [--continuous]

Local smoke (what the sandbox runs): availableNow over a small inbox.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inbox", required=True, help="parquet dir watched for increments")
    ap.add_argument("--corpus", required=True, help="SnapshotTable root for curated rows")
    ap.add_argument("--store", required=True, help="SnapshotTable root for the survivor store")
    ap.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    ap.add_argument("--method", default="exact", choices=["exact", "minhash"])
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="minhash signature-jaccard threshold")
    ap.add_argument("--max-files-per-trigger", type=int, default=16)
    ap.add_argument("--continuous", action="store_true",
                    help="keep running (default: availableNow — drain the "
                         "inbox and exit, the batch-cron shape)")
    ap.add_argument("--fold-every", type=int, default=0,
                    help="after an availableNow drain, fold the accumulated "
                         "micro-batch partitions into buckets of this many "
                         "batch ids and vacuum (0 = skip)")
    ap.add_argument("--schema", default="doc_id string, text string",
                    help="inbox schema DDL")
    ap.add_argument("--cpus", type=int, default=0, help="local[] width (0 = all)")
    ap.add_argument("--bloom-bits", type=int, default=0,
                    help="maintain a store bloom filter of this many bits "
                         "(exact method; implies the broadcast store probe + "
                         "scan skip on clean batches; 0 = off)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from timeseriesvectordbpattermatcher_spark.session import get_spark
    from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import SnapshotTable
    from timeseriesvectordbpattermatcher_spark.streaming.curation_stream import (
        curation_sink,
        read_curated,
    )

    spark = get_spark(app_name="curation_stream_job", cpus=args.cpus or None)
    t0 = time.time()
    corpus = SnapshotTable(args.corpus)
    store = SnapshotTable(args.store)
    kw = {"threshold": args.threshold} if args.method == "minhash" else {}
    if args.bloom_bits:
        kw.update(bloom_m_bits=args.bloom_bits, skip_scan_when_clean=True)
    writer = (
        spark.readStream.schema(args.schema)
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.inbox)
        .writeStream.foreachBatch(
            curation_sink(corpus, store, method=args.method, **kw)
        )
        .option("checkpointLocation", args.checkpoint)
    )
    if args.continuous:
        writer.start().awaitTermination()
        return 0  # unreachable without an external stop
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()

    stats: dict = {"method": args.method}
    snap = corpus.current_snapshot()
    stats["last_batch_id"] = int((snap.meta or {}).get("stream_batch_id", -1)) if snap else -1
    cur = read_curated(spark, corpus)
    stats["curated_rows"] = cur.count() if cur is not None else 0
    if args.fold_every:
        from timeseriesvectordbpattermatcher_spark.operators.retention import (
            fold_stream_batches,
            vacuum,
        )

        # the store fragments exactly like the corpus (one partition per
        # batch delta) — fold and vacuum both
        fold = fold_stream_batches(corpus, spark, every=args.fold_every)
        fold_s = fold_stream_batches(store, spark, every=args.fold_every)
        stats["folded"] = len(fold["folded"]) + len(fold_s["folded"])
        stats["partitions"] = fold["partitions_after"]
        stats["store_partitions"] = fold_s["partitions_after"]
        vacuum(corpus, min_age_secs=0, keep_versions=2)
        vacuum(store, min_age_secs=0, keep_versions=2)
    stats["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
