"""sf1 (10x sf0.1) bench: cascade + the slowest driver queries at two scales.

sf0.1 is the per-round bench scale; super-linear regressions (candidate-join
blowups, quadratic windows) are invisible there. This script synthesizes a
DETERMINISTIC sf1-shaped corpus (10x sf0.1, no external data), times the
heaviest queries at BOTH scales in the same process, and reports the
per-query scale ratio — linear operators should land near 10x, and the
ratio is host-independent because both scales run in the same window.

Replica construction (seedless, reproducible):
- documents: 10 replicas; replica k re-keys ``doc_id + k*1_000_000`` and
  TAGS every word with a ``q{k}`` suffix (replica 0 keeps the original
  text verbatim, so sf0.1 is a strict subset). Suffixing a per-replica
  constant to every word is an injective word renaming, so each replica's
  internal near-dup structure (Jaccard over word n-grams) is preserved
  EXACTLY while replicas share zero n-grams — near-dup pairs and
  candidate volume both grow linearly with corpus size, and the reported
  scale_ratio measures the ENGINE, not output blow-up. (An earlier
  rotation-based construction failed this goal: the synthetic word
  vocabulary is small enough that rotated replicas still collided on most
  grams — distinct 3-grams grew only 27.2k -> 27.6k for 10x docs, gram
  doc-frequency grew 10x, and true >= 0.25 pairs exploded 256 -> 250,600,
  making the wall ratio measure the corpus artifact. The lowercase 'q' +
  digit suffix survives the tokenizer's [^a-z0-9] normalization.)
  The JSON block records ``pairs_small``/``pairs_big`` for the dedup
  queries so output growth is auditable next to the wall ratio.
- events: replica k shifts the stream k*31 days forward and re-keys
  ``event_id`` — per-minute bucket structure (what the codec segments)
  is preserved per replica and never collides across replicas, so
  segment count and compression work grow linearly.
- embeddings: replica k rotates the vector by k positions (norm-preserving,
  direction-changing) and re-keys ``vec_id + k*1_000_000``; the cosine_topk
  query set (vec_id < 200) stays fixed while the searched corpus grows 10x.
- cascade: ``synth_seqs`` at 10x the bench default (20M rows, ~5.4B tokens),
  written once and scanned from parquet like bench.py.

Writes BENCH/sf1_latest.json; bench.py embeds that block into its own JSON
line so the per-round BENCH_r{N}.json carries the sf1 evidence.

Usage: python scripts/sf1_bench.py [--rows 20000000] [--skip-build]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "sf1_synth")
REPLICAS = 10


def _tag_words_expr(col, rep, sep):
    """Suffix every word with ``q{rep}`` — an injective per-replica word
    renaming (SQL-side): Jaccard/minhash structure within a replica is
    identical to the base corpus, across replicas disjoint."""
    from pyspark.sql import functions as F

    tagged = F.transform(
        F.split(col, sep), lambda w: F.concat(w, F.lit("q"), rep.cast("string"))
    )
    return F.array_join(tagged, " ")


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1_DIR, exist_ok=True)
    docs_out = os.path.join(SF1_DIR, "documents.parquet")
    if not os.path.exists(docs_out):
        docs = spark.read.parquet(f"{SF01}/documents.parquet")
        reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("rep"))
        rep = F.col("rep")
        out = (
            docs.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + rep.cast("long") * 1_000_000).alias("doc_id"),
                F.when(rep == 0, F.col("text"))
                .otherwise(_tag_words_expr(F.col("text"), rep, r"\s+"))
                .alias("text"),
                "lang",
                "source",
                F.length("text").alias("n_chars"),
            )
        )
        out.repartition(8).write.mode("overwrite").parquet(docs_out)
    ev_out = os.path.join(SF1_DIR, "events.parquet")
    if not os.path.exists(ev_out):
        # replica k shifts the whole event stream k x 31 days forward and
        # re-keys event_id: per-minute bucket structure (what the codec
        # segments) is preserved per replica, buckets never collide across
        # replicas -> segment count and compression work grow linearly
        ev = spark.read.parquet(f"{SF01}/events.parquet")
        reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("rep"))
        rep = F.col("rep")
        out = ev.crossJoin(F.broadcast(reps)).select(
            (F.col("event_id") + rep.cast("long") * 100_000_000).alias("event_id"),
            (F.col("ts") + F.make_interval(days=rep * 31)).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        out.repartition(8).write.mode("overwrite").parquet(ev_out)
    emb_out = os.path.join(SF1_DIR, "embeddings.parquet")
    if not os.path.exists(emb_out):
        emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
        reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("rep"))
        rep = F.col("rep")
        v = F.col("embedding")
        k = F.pmod(rep, F.greatest(F.size(v), F.lit(1)))
        rotated = F.concat(F.slice(v, k + 1, F.size(v) - k), F.slice(v, F.lit(1), k))
        out = emb.crossJoin(F.broadcast(reps)).select(
            (F.col("vec_id") + rep.cast("long") * 1_000_000).alias("vec_id"),
            F.when(rep == 0, v).otherwise(rotated).alias("embedding"),
            "label",
        )
        out.repartition(4).write.mode("overwrite").parquet(emb_out)


_GC_SPARK = None  # set by main(); lets _drain_shuffles find the session


def _drain_shuffles() -> None:
    """Force a driver GC so ContextCleaner releases the dead shuffles of
    finished queries. One session runs ~1000 jobs here; without this the
    accumulated shuffle files outlive their jobs until a natural full GC
    — which a large heap may never trigger — and the run dies on
    transient disk (observed: ENOSPC at the tail of the r5 window, ~59 GB
    real headroom). Timed sections call it OUTSIDE the timed region."""
    if _GC_SPARK is not None:
        _GC_SPARK.sparkContext._jvm.System.gc()


def _best_of(fn, k: int = 2, warmup: bool = True) -> float:
    if warmup:
        fn()
    best = None
    for _ in range(k):
        _drain_shuffles()
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    _drain_shuffles()
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000,
                    help="sf1 cascade corpus rows (10x the bench default)")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import bench as benchmod

    cpu_calib = benchmod._cpu_calibration()
    cpu_calib_mc = benchmod._cpu_calibration_mc()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from timeseriesvectordbpattermatcher_spark.operators.matcher import match_pipeline
    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        derive_event_ts,
        rollup_all_tiers,
    )
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
        ma_normalize,
        segment_series,
    )
    from timeseriesvectordbpattermatcher_spark.session import get_spark
    from timeseriesvectordbpattermatcher_spark.sources.synth import (
        synth_ohlcv,
        synth_seqs,
    )

    spark = get_spark(app_name="sf1_bench")
    global _GC_SPARK
    _GC_SPARK = spark
    build_sf1(spark)

    qs = entrymod.queries()
    result: dict = {
        "cpu_calib_mops": cpu_calib,
        "cpu_calib_mops_mc8": cpu_calib_mc,
        "replicas": REPLICAS,
        "queries": {},
    }

    # ---- driver-table queries at both scales ------------------------------
    for name in ("ngram_jaccard", "minhash_dedup", "cosine_topk", "codec_roundtrip"):
        n_small = qs[name](spark, SF01).count()
        n_big = qs[name](spark, SF1_DIR).count()
        t_small = _best_of(lambda: qs[name](spark, SF01).count(), k=args.runs,
                           warmup=False)
        t_big = _best_of(lambda: qs[name](spark, SF1_DIR).count(), k=args.runs,
                         warmup=False)
        result["queries"][name] = {
            "sf0.1_sec": t_small,
            "sf1_sec": t_big,
            "scale_ratio": round(t_big / t_small, 2),
            # output rows at each scale — a wall ratio is only meaningful
            # next to how much the RESULT grew (linear-by-construction for
            # the dedup queries since the word-tagged replica build)
            "rows_small": n_small,
            "rows_big": n_big,
        }

    # ---- decontamination at both scales (not a driver query) ---------------
    from pyspark.sql import functions as F  # noqa: shadowing-safe local use
    from timeseriesvectordbpattermatcher_spark.operators.dedup import decontaminate

    def decon_run(sf_dir: str) -> int:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
        # 50 verbatim docs as the planted test set — selected by id value
        # (a bare limit() takes whatever rows arrive first: layout-dependent)
        bench = docs.filter(F.col("doc_id").cast("long") < 50)
        return decontaminate(docs, bench, n=13, mode="drop").count()

    n_small, n_big = decon_run(SF01), decon_run(SF1_DIR)
    t_small = _best_of(lambda: decon_run(SF01), k=args.runs, warmup=False)
    t_big = _best_of(lambda: decon_run(SF1_DIR), k=args.runs, warmup=False)
    print("[sf1-done] decontaminate", flush=True)
    result["queries"]["decontaminate"] = {
        "sf0.1_sec": t_small,
        "sf1_sec": t_big,
        "scale_ratio": round(t_big / t_small, 2),
        "rows_small": n_small,
        "rows_big": n_big,
    }

    # ---- paragraph dedup at both scales (not a driver query) ---------------
    from timeseriesvectordbpattermatcher_spark.operators.dedup import paragraph_dedup

    def para_run(sf_dir: str) -> int:
        # give every doc 3 paragraphs: its own text, a corpus-wide shared
        # boilerplate line (dedups to ONE survivor — the hot-digest case),
        # and its 60-char prefix (collides within near-dup families only)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.concat_ws(
                "\n\n", F.col("text"),
                F.lit("This corpus row carries a shared boilerplate notice."),
                F.substring("text", 1, 60),
            ).alias("text"),
        )
        return paragraph_dedup(docs).count()

    n_small, n_big = para_run(SF01), para_run(SF1_DIR)
    t_small = _best_of(lambda: para_run(SF01), k=args.runs, warmup=False)
    t_big = _best_of(lambda: para_run(SF1_DIR), k=args.runs, warmup=False)
    print("[sf1-done] paragraph_dedup", flush=True)
    result["queries"]["paragraph_dedup"] = {
        "sf0.1_sec": t_small,
        "sf1_sec": t_big,
        "scale_ratio": round(t_big / t_small, 2),
        "rows_small": n_small,
        "rows_big": n_big,
    }

    # ---- LM perplexity scoring at both scales (not a driver query) ----------
    from timeseriesvectordbpattermatcher_spark.operators.lm import (
        add_perplexity,
        train_bigram_counts,
    )

    # train ONCE on the sf0.1 corpus (the held-out-reference shape); time
    # only the scoring pass at each scale. The replica word-tagging makes
    # replicas 1..9 fully OOV — realistic for the gate's reject path.
    lm_counts = train_bigram_counts(
        spark.read.parquet(f"{SF01}/documents.parquet")
    ).persist()
    lm_counts.count()

    def ppl_run(sf_dir: str) -> int:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        )
        return int(add_perplexity(docs, lm_counts).agg(F.count("ppl")).collect()[0][0])

    n_small, n_big = ppl_run(SF01), ppl_run(SF1_DIR)
    t_small = _best_of(lambda: ppl_run(SF01), k=args.runs, warmup=False)
    t_big = _best_of(lambda: ppl_run(SF1_DIR), k=args.runs, warmup=False)
    print("[sf1-done] lm_perplexity", flush=True)
    result["queries"]["lm_perplexity"] = {
        "sf0.1_sec": t_small,
        "sf1_sec": t_big,
        "scale_ratio": round(t_big / t_small, 2),
        "rows_small": n_small,
        "rows_big": n_big,
    }
    lm_counts.unpersist()

    # ---- CUSUM changepoints at both scales (not a driver query) -------------
    # input = the cascade's seqs corpus (2M / 20M rows — the events tables
    # are overhead-dominated at <=1M rows on this host): detect per-source
    # n_tok mean shifts over the raw token stream, the natural monitoring
    # composition with the rollup tiers. Uses the same cached parquet the
    # cascade timing writes, so the probe times the detector, not synth.
    from timeseriesvectordbpattermatcher_spark.operators.changepoints import (
        cusum_changepoints,
    )

    def _seqs_path(n_rows: int) -> str:
        import tempfile

        corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_rows}")
        if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
            synth_seqs(spark, n_rows, seed=42).write.mode("overwrite").parquet(corpus)
        return corpus

    def cusum_run(n_rows: int, chunked: bool = True) -> int:
        seqs = derive_event_ts(
            spark.read.parquet(_seqs_path(n_rows))
        ).select("source", "event_ts", "n_tok")
        return cusum_changepoints(
            seqs, value_col="n_tok", series_col="source", ts_col="event_ts",
            kappa=0.5, h=5.0, baseline_n=30,
            chunk_by=F.to_date("event_ts") if chunked else None,
        ).count()

    n_small, n_big = cusum_run(2_000_000), cusum_run(args.rows)
    t_small = _best_of(lambda: cusum_run(2_000_000), k=args.runs, warmup=False)
    t_big = _best_of(lambda: cusum_run(args.rows), k=args.runs, warmup=False)
    # single-partition contrast at the big size (one reading): the 70%-web
    # series serializes into one task there — the number the chunked
    # prefix-scan exists to beat
    t0 = time.time()
    cusum_run(args.rows, chunked=False)
    t_single_big = round(time.time() - t0, 3)
    print("[sf1-done] cusum_changepoints", flush=True)
    result["queries"]["cusum_changepoints"] = {
        "rows_in_small": 2_000_000,
        "rows_in_big": args.rows,
        "sf0.1_sec": t_small,
        "sf1_sec": t_big,
        "scale_ratio": round(t_big / t_small, 2),
        "single_partition_sec_big": t_single_big,
        "rows_small": n_small,
        "rows_big": n_big,
    }

    # ---- incremental dedup: FIXED batch vs a 10x digest store ---------------
    # the realistic steady-state shape (store >> batch): the store grows 10x
    # (1M -> 10M digests — the sf-corpus stores are too small to cost
    # anything) while the 5k-row increment stays constant. probe='shuffle'
    # re-shuffles the whole store, so its wall should track store size;
    # probe='broadcast' (+bloom) only scans it, so its wall should stay
    # near-flat — THE scale claim of the broadcast probe, measured rather
    # than just plan-pinned. Store build + one-time bloom build (the
    # amortized-per-increment costs) are excluded from the timings;
    # autoBroadcastJoinThreshold is pinned to -1 so Catalyst can't
    # auto-broadcast the small store at 1M either.
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        digest_bloom_words,
        incremental_exact_dedup,
    )

    INC_SMALL, INC_BIG = 10_000_000, 100_000_000
    BLOOM_SMALL, BLOOM_BIG = 1_000_000, 10_000_000  # 2^27-bit bloom sizing regime

    def _inc_store(n_rows: int):
        path = os.path.join(SF1_DIR, f"incstore_{n_rows}.parquet")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            (
                spark.range(n_rows)
                .select(
                    F.md5(F.concat(F.lit("store text "), F.col("id"))).alias("digest")
                )
                .write.mode("overwrite")
                .parquet(path)
            )
        return spark.read.parquet(path)

    # fixed increment: 2.5k texts present in BOTH stores + 2.5k unseen
    batch = spark.range(2500).select(
        F.concat(F.lit("old"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("store text "), F.col("id")).alias("text"),
    ).unionByName(
        spark.range(2500).select(
            F.concat(F.lit("new"), F.col("id")).alias("doc_id"),
            F.concat(F.lit("unseen increment text "), F.col("id")).alias("text"),
        )
    )
    inc_blooms = {
        n: digest_bloom_words(_inc_store(n), m_bits=1 << 27, k=5)
        for n in (BLOOM_SMALL, BLOOM_BIG)
    }

    def inc_run(n_rows: int, mode: str) -> int:
        kw = (
            {"probe": "broadcast", "bloom_words": inc_blooms[n_rows],
             "bloom_m_bits": 1 << 27, "bloom_k": 5}
            if mode == "bloom"
            else {"probe": mode}
        )
        surv, _ = incremental_exact_dedup(batch, _inc_store(n_rows), **kw)
        return surv.count()

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # shuffle vs pure broadcast at 10M -> 100M digests (the store-shuffle
        # cost only becomes visible past ~10M rows on this host); the bloom
        # variant at 1M -> 10M, where a 2^27-bit bloom is correctly sized
        # (a 100M-key bloom needs ~2^31 bits — batch-job territory, sized by
        # the caller)
        for mode, qname, sizes in (
            ("shuffle", "inc_dedup_shuffle", (INC_SMALL, INC_BIG)),
            ("broadcast", "inc_dedup_broadcast", (INC_SMALL, INC_BIG)),
            ("bloom", "inc_dedup_bloom", (BLOOM_SMALL, BLOOM_BIG)),
        ):
            small, big = sizes
            n_small = inc_run(small, mode)
            n_big = inc_run(big, mode)
            t_small = _best_of(lambda: inc_run(small, mode), k=args.runs,
                               warmup=False)
            t_big = _best_of(lambda: inc_run(big, mode), k=args.runs,
                             warmup=False)
            result["queries"][qname] = {
                "store_small": small,
                "store_big": big,
                "sf0.1_sec": t_small,
                "sf1_sec": t_big,
                "scale_ratio": round(t_big / t_small, 2),
                "rows_small": n_small,
                "rows_big": n_big,
            }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    # ---- matcher pipeline at 10x reference segments ------------------------
    def matcher_run(n_tickers: int) -> None:
        ohlcv = synth_ohlcv(spark, n_tickers=n_tickers, n_days=900)
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
        match_pipeline(qseg, refs, strategy="join").count()

    t_small = _best_of(lambda: matcher_run(6), k=args.runs)
    t_big = _best_of(lambda: matcher_run(60), k=args.runs)
    print("[sf1-done] matcher_pipeline", flush=True)
    result["queries"]["matcher_pipeline"] = {
        "sf0.1_sec": t_small,
        "sf1_sec": t_big,
        "scale_ratio": round(t_big / t_small, 2),
    }

    # ---- cascade at 2M and 10x rows ----------------------------------------
    import tempfile

    def cascade_timing(n_rows: int) -> tuple[float, int]:
        corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_rows}")
        if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
            synth_seqs(spark, n_rows, seed=42).write.mode("overwrite").parquet(corpus)
        seqs = derive_event_ts(spark.read.parquet(corpus))

        def once():
            tiers = rollup_all_tiers(seqs, token_engine="arrow_drop")
            return tiers["1d"].agg(
                F.sum("sum_n_tok"), F.sum("tok_sum"),
                F.min("tok_min"), F.max("tok_max"),
            ).collect()[0][0]

        total = once()
        best = None
        for _ in range(args.runs):
            _drain_shuffles()  # 20M-row runs spill ~20G each; see _drain_shuffles
            t0 = time.time()
            once()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        _drain_shuffles()
        return round(best, 3), int(total)

    t2m, tok2m = cascade_timing(2_000_000)
    tbig, tokbig = cascade_timing(args.rows)
    print("[sf1-done] cascade", flush=True)
    result["cascade"] = {
        "rows_small": 2_000_000,
        "rows_big": args.rows,
        "sf0.1_sec": t2m,
        "sf1_sec": tbig,
        "tokens_small": tok2m,
        "tokens_big": tokbig,
        "scale_ratio": round(tbig / t2m, 2),
        "tokens_per_sec_small": round(tok2m / t2m, 1),
        "tokens_per_sec_big": round(tokbig / tbig, 1),
    }

    # ---- exact-quantile histogram plane at 2M and 10x rows ------------------
    # 1m build + two exact merges + codegen'd p50/p95/p99 fold over the same
    # cached corpora as the cascade (so this times the plane, not synth/IO)
    from timeseriesvectordbpattermatcher_spark.operators.quantiles import (
        add_hist_quantiles,
        hist_1m,
        hist_cascade,
    )

    def hist_timing(n_rows: int) -> float:
        corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_rows}")
        seqs = derive_event_ts(spark.read.parquet(corpus))

        def once():
            day = hist_cascade(hist_cascade(hist_1m(seqs), "1h"), "1d")
            return add_hist_quantiles(day).agg(
                F.sum("hist_n"), F.max("p99")
            ).collect()[0][0]

        return _best_of(once, k=args.runs)

    th_small = hist_timing(2_000_000)
    th_big = hist_timing(args.rows)
    print("[sf1-done] hist_quantiles_1d", flush=True)
    result["queries"]["hist_quantiles_1d"] = {
        "rows_small": 2_000_000,
        "rows_big": args.rows,
        "sf0.1_sec": th_small,
        "sf1_sec": th_big,
        "scale_ratio": round(th_big / th_small, 2),
    }

    # ---- time-weight + distinct planes at 2M and 10x rows -------------------
    # same cached corpora; times the 1m build + two summary merges + the read
    # accessor for each plane (operators/timeweight.py, operators/distinct.py)
    from timeseriesvectordbpattermatcher_spark.operators.distinct import (
        distinct_bucket,
        distinct_cascade,
        distinct_estimate,
    )
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        time_weight_bucket,
        time_weight_cascade,
        tw_average,
    )

    def tw_timing(n_rows: int) -> float:
        corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_rows}")
        seqs = derive_event_ts(spark.read.parquet(corpus))
        pts = seqs.groupBy("source", "event_ts").agg(F.max("n_tok").alias("_twv"))

        def once():
            t1m = time_weight_bucket(pts, val_col="_twv")
            day = time_weight_cascade(
                time_weight_cascade(t1m, "1h"), "1d", from_tier="1h"
            )
            return tw_average(day).agg(F.sum("area"), F.max("twa")).collect()[0][0]

        return _best_of(once, k=args.runs)

    ttw_small = tw_timing(2_000_000)
    ttw_big = tw_timing(args.rows)
    print("[sf1-done] tw_plane_1d", flush=True)
    result["queries"]["tw_plane_1d"] = {
        "rows_small": 2_000_000,
        "rows_big": args.rows,
        "sf0.1_sec": ttw_small,
        "sf1_sec": ttw_big,
        "scale_ratio": round(ttw_big / ttw_small, 2),
    }

    def distinct_timing(n_rows: int) -> float:
        corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_rows}")
        seqs = derive_event_ts(spark.read.parquet(corpus))

        def once():
            day = distinct_cascade(
                distinct_cascade(distinct_bucket(seqs), "1h"), "1d", from_tier="1h"
            )
            return distinct_estimate(day).agg(
                F.sum("approx_distinct")
            ).collect()[0][0]

        return _best_of(once, k=args.runs)

    td_small = distinct_timing(2_000_000)
    td_big = distinct_timing(args.rows)
    print("[sf1-done] distinct_plane_1d", flush=True)
    result["queries"]["distinct_plane_1d"] = {
        "rows_small": 2_000_000,
        "rows_big": args.rows,
        "sf0.1_sec": td_small,
        "sf1_sec": td_big,
        "scale_ratio": round(td_big / td_small, 2),
    }

    # ---- state + heartbeat planes at 2M and 10x rows -------------------------
    # (operators/stateagg.py): 1m build + two cascade merges + read accessor
    from timeseriesvectordbpattermatcher_spark.operators.stateagg import (
        duration_in,
        heartbeat_bucket,
        heartbeat_cascade,
        heartbeat_read,
        state_bucket,
        state_cascade,
    )

    def state_timing(n_rows: int) -> float:
        corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_rows}")
        seqs = derive_event_ts(spark.read.parquet(corpus))
        pts = (
            seqs.groupBy("source", "event_ts")
            .agg(F.max("n_tok").alias("_nt"))
            .withColumn(
                "state",
                F.when(F.col("_nt") < 600, F.lit("low"))
                .when(F.col("_nt") < 1200, F.lit("mid"))
                .otherwise(F.lit("high")),
            )
        )

        def once():
            day = state_cascade(
                state_cascade(state_bucket(pts), "1h"), "1d", from_tier="1h"
            )
            return duration_in(day, "mid").agg(
                F.sum("dur"), F.sum("n")
            ).collect()[0][0]

        return _best_of(once, k=args.runs)

    ts_small = state_timing(2_000_000)
    ts_big = state_timing(args.rows)
    print("[sf1-done] state_plane_1d", flush=True)
    result["queries"]["state_plane_1d"] = {
        "rows_small": 2_000_000,
        "rows_big": args.rows,
        "sf0.1_sec": ts_small,
        "sf1_sec": ts_big,
        "scale_ratio": round(ts_big / ts_small, 2),
    }

    def heartbeat_timing(n_rows: int) -> float:
        corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_rows}")
        seqs = derive_event_ts(spark.read.parquet(corpus))
        hb = seqs.select("source", "event_ts").distinct()

        def once():
            day = heartbeat_cascade(
                heartbeat_cascade(heartbeat_bucket(hb, 120.0), "1h"),
                "1d",
                from_tier="1h",
            )
            return heartbeat_read(day, "1d").agg(
                F.sum("uptime"), F.sum("num_gaps")
            ).collect()[0][0]

        return _best_of(once, k=args.runs)

    thb_small = heartbeat_timing(2_000_000)
    thb_big = heartbeat_timing(args.rows)
    print("[sf1-done] heartbeat_plane_1d", flush=True)
    result["queries"]["heartbeat_plane_1d"] = {
        "rows_small": 2_000_000,
        "rows_big": args.rows,
        "sf0.1_sec": thb_small,
        "sf1_sec": thb_big,
        "scale_ratio": round(thb_big / thb_small, 2),
    }

    # ---- ddsketch plane at 2M and 10x rows -----------------------------------
    # (operators/ddsketch.py): 1m build + two cascade merges + decoded p95
    from timeseriesvectordbpattermatcher_spark.operators.ddsketch import (
        dds_bucket,
        dds_cascade,
        dds_quantiles,
    )

    def dds_timing(n_rows: int) -> float:
        corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_rows}")
        seqs = derive_event_ts(spark.read.parquet(corpus))

        def once():
            day = dds_cascade(dds_cascade(dds_bucket(seqs), "1h"), "1d")
            return dds_quantiles(day, qs={"p95": 0.95}).agg(
                F.sum("p95"), F.sum("dds_n")
            ).collect()[0][0]

        return _best_of(once, k=args.runs)

    tdd_small = dds_timing(2_000_000)
    tdd_big = dds_timing(args.rows)
    print("[sf1-done] dds_plane_1d", flush=True)
    result["queries"]["dds_plane_1d"] = {
        "rows_small": 2_000_000,
        "rows_big": args.rows,
        "sf0.1_sec": tdd_small,
        "sf1_sec": tdd_big,
        "scale_ratio": round(tdd_big / tdd_small, 2),
    }

    # ---- count-min token-frequency plane at 2M and 10x rows ------------------
    # (operators/cms.py): explode-heavy build (every token occurrence fans
    # into depth cells before map-side combine) + two cascade merges + a
    # 16-token point-estimate read off the 1d tier
    from timeseriesvectordbpattermatcher_spark.operators.cms import (
        cms_all_tiers,
        cms_estimate,
    )

    def cms_timing(n_rows: int) -> float:
        corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_rows}")
        seqs = derive_event_ts(spark.read.parquet(corpus))

        def once():
            # fused build (operators/cms.cms_all_tiers): at 20M rows the
            # minute tier is ~3.5M buckets x ~5k cells — sequential
            # build+cascade ships those entries through two exchanges and
            # needs more transient disk than this box HAS (3 runs died
            # ENOSPC at ~52G); the fused kernel streams every tier's
            # sketches through the Arrow boundary once with zero
            # entry-level exchange, which is also the shipping shape
            # bench.py times at sf0.1
            day = cms_all_tiers(seqs).filter(F.col("tier") == "1d")
            probes = [
                cms_estimate("cms", t).alias(f"e{t}") for t in range(0, 160, 10)
            ]
            return day.select(*probes).agg(
                *[F.sum(f"e{t}") for t in range(0, 160, 10)]
            ).collect()[0][0]

        return _best_of(once, k=args.runs)

    tcm_small = cms_timing(2_000_000)
    tcm_big = cms_timing(args.rows)
    print("[sf1-done] cms_plane_1d", flush=True)
    result["queries"]["cms_plane_1d"] = {
        "rows_small": 2_000_000,
        "rows_big": args.rows,
        "sf0.1_sec": tcm_small,
        "sf1_sec": tcm_big,
        "scale_ratio": round(tcm_big / tcm_small, 2),
    }

    # ---- heavy-hitter (Misra-Gries) plane at 2M and 10x rows -----------------
    # (operators/heavyhitters.py): explode + exact counts + compression at
    # 1m, two counter-addition merges, top-3 read off the 1d tier
    from timeseriesvectordbpattermatcher_spark.operators.heavyhitters import (
        topk_bucket,
        topk_cascade,
        topk_read,
    )

    def topk_timing(n_rows: int) -> float:
        corpus = os.path.join(tempfile.gettempdir(), f"seqs_bench_{n_rows}")
        seqs = derive_event_ts(spark.read.parquet(corpus))

        def once():
            day = topk_cascade(
                topk_cascade(topk_bucket(seqs, cap=64), "1h", cap=64),
                "1d",
                cap=64,
            )
            return topk_read(day, n=3).agg(
                F.sum("est"), F.max("hh_err")
            ).collect()[0][0]

        return _best_of(once, k=args.runs)

    thh_small = topk_timing(2_000_000)
    thh_big = topk_timing(args.rows)
    print("[sf1-done] topk_plane_1d", flush=True)
    result["queries"]["topk_plane_1d"] = {
        "rows_small": 2_000_000,
        "rows_big": args.rows,
        "sf0.1_sec": thh_small,
        "sf1_sec": thh_big,
        "scale_ratio": round(thh_big / thh_small, 2),
    }

    out_path = os.path.join(REPO, "BENCH", "sf1_latest.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
