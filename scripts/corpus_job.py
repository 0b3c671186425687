"""spark-submit entrypoint for the end-to-end training-data curation
pipeline: the LLM-data operators composed the way a 100 TB corpus job
would run them.

    raw docs
      -> [--html-input]       (regex HTML->text extraction, narrow)
      -> [--normalize]        (unicode intake fix-up: strip controls /
                               zero-width chars, exotic spaces -> plain,
                               CRLF -> LF, then NFC — the codegen'd regex
                               chain plus an ASCII-prefiltered pandas_udf;
                               runs FIRST so dedup hashes, C4 line rules
                               and token counts all see canonical text)
      -> [--c4-clean]         (C4 line cleanup: rebuild docs from lines
                               ending in terminal punctuation with enough
                               words and no 'javascript'; runs BEFORE
                               dedup, the C4 order)
      -> [--block-domains]    (canonical-host block filter; zero shuffle)
      -> [--url-dedup]        (keep-first per canonical URL — the cheap
                               crawl pre-filter; needs a url column)
      -> exact dedup          (shuffle: 16-byte md5 per row, never text)
      -> [--paragraph-dedup]  (CCNet-style: corpus-wide first occurrence
                               per normalized paragraph; boilerplate-only
                               docs drop, others reassemble in order)
      -> [--span-dedup N]     (ExactSubstr: corpus-wide duplicate word
                               spans >= N removed, first occurrence kept)
      -> MinHash-LSH near-dup (banded signature bucket join + fixpoint
                               closure over edge nodes only)
      -> text analysis        (lang-id, quality score, token counts,
                               fingerprint — one pass, pure codegen exprs;
                               + Gopher repetition signals when any
                               --max-*-frac cap is set)
      -> quality/lang/repetition filter (pushed to the curated write scan)
      -> [--gopher-rules]     (Gopher word-level rule set: word-count
                               band, symbol/bullet/ellipsis/alpha
                               fractions, required stopwords)
      -> [--clf-weights]      (hashed linear classifier gate: broadcast
                               weight join + per-doc mean pool, all JVM)
      -> [--max-ppl]          (CCNet-style LM gate: hashed-bigram
                               perplexity vs --lm-ref, broadcast count
                               joins; high-ppl docs drop)
      -> [--ppl-buckets]      (CCNet head/middle/tail split per language
                               over the survivors — approx-percentile
                               cut points, no per-language window;
                               --keep-ppl-buckets head,middle drops the
                               rest with its own attribution bucket)
      -> [--redact-pii]       (emails/SSNs/cards/IPs/phones -> typed
                               placeholder tokens; pure regex projection,
                               docs counted, rows never dropped)
      -> [--sample]           (deterministic per-source keep fractions —
                               hash of doc_id, zero shuffle)
      -> [--mix-alpha]        (temperature mixing toward q_i ∝ p_i^alpha:
                               downsample mode thins large sources, epoch
                               mode replicates small ones; factors audited
                               in the stats line)
      -> [--dsir-target/-k]   (DSIR importance resampling toward a target
                               corpus: hashed n-gram log-weights, Gumbel
                               top-k — selects exactly k docs)
      -> [--vocab-size]       (learn a top-N word vocab from the
                               survivors, encode tokens/n_tok with
                               unk=0 + eos=1 — the output becomes the
                               engine's native pre-tokenized table;
                               OOV rate audited in the stats line)
      -> [--pack-budget]      (fixed-token training packs: one window
                               cumsum per source shard; uses true token
                               counts when --vocab-size ran)
      -> [--shuffle-seed]     (reproducible global training order via a
                               range exchange, no single-reducer sort)
      -> curated parquet + one JSON stats line

Every stage reports its row count — a curation job that silently drops
data is indistinguishable from a broken one, so the stats line is the
contract ("no silent caps"). Stage boundaries are localCheckpoints on the
sandbox (single node); on a fault-tolerant cluster persist each stage to a
durable table instead (same idea — see operators/dedup._materialize).

Cluster:
    scripts/make_pyfiles_zip.sh
    spark-submit --driver-memory 8g --py-files engine.zip scripts/corpus_job.py \
        --input /data/docs --output /tables/curated [--threshold 0.4]
        [--min-quality 0.5] [--langs en]

Local smoke (what the sandbox runs):
    python scripts/corpus_job.py --synthetic-docs 2000 --output /tmp/curated
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def synth_docs(spark, n_rows: int, seed: int = 42):
    """Deterministic synthetic corpus with planted exact and near
    duplicates: ids 0..n-1; every 100th doc repeats doc i-50's text
    verbatim (exact dup), every 100th+1 repeats it with one word changed
    (near dup). Pure Spark exprs — no driver-side text."""
    from pyspark.sql import functions as F

    df = spark.range(0, n_rows, 1, spark.sparkContext.defaultParallelism)
    # ~40-word documents from a hashed vocabulary; word w of doc d is
    # vocab[xxhash64(seed, base_doc(d), w) % 500]. base_doc folds the
    # planted duplicates: d % 100 == 0/1 -> reuse doc d-50's words.
    base = (
        F.when((F.col("id") % 100 == 0) & (F.col("id") >= 50), F.col("id") - 50)
        .when((F.col("id") % 100 == 1) & (F.col("id") >= 51), F.col("id") - 51)
        .otherwise(F.col("id"))
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda w: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.lit(seed), base, w), F.lit(500)).cast("string"),
        ),
    )
    # the near-dup variant flips word 0 to a doc-unique token
    words = F.when(
        (F.col("id") % 100 == 1) & (F.col("id") >= 51),
        F.concat(
            F.array(F.concat(F.lit("u"), F.col("id").cast("string"))),
            F.slice(words, 2, 39),
        ),
    ).otherwise(words)
    return df.select(
        F.concat(F.lit("doc"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
        # deterministic source mix so --sample has a stratum column
        F.element_at(
            F.array(F.lit("web"), F.lit("web"), F.lit("books"), F.lit("code")),
            (F.pmod(F.xxhash64(F.lit(seed), F.lit("src"), F.col("id")), F.lit(4)) + 1).cast("int"),
        ).alias("source"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir of docs(doc_id, text, ...)")
    ap.add_argument("--synthetic-docs", type=int, default=0,
                    help="generate a deterministic corpus instead of reading --input")
    ap.add_argument("--output", required=True, help="curated corpus parquet dir")
    ap.add_argument("--threshold", type=float, default=0.4,
                    help="MinHash-LSH jaccard threshold for near-dup removal")
    ap.add_argument("--min-quality", type=float, default=0.5,
                    help="minimum composite quality score to keep")
    ap.add_argument("--langs", default="",
                    help="comma-separated lang_pred allowlist, e.g. en,und "
                         "(empty = keep all)")
    ap.add_argument("--cpus", type=int, default=0, help="local[] width (0 = all)")
    ap.add_argument("--sample", default="",
                    help="deterministic per-source keep fractions, e.g. "
                         "'web=0.3,books=1.0' (needs a source column; "
                         "unlisted sources keep --sample-default)")
    ap.add_argument("--sample-default", type=float, default=1.0,
                    help="keep fraction for sources not named in --sample")
    ap.add_argument("--vocab-size", type=int, default=0,
                    help="tokenize the curated corpus: learn a top-N word "
                         "vocab from the survivors, write it to "
                         "<output>_vocab, and add tokens/n_tok columns "
                         "(unk=0, eos=1 appended) — the output becomes "
                         "the engine's native pre-tokenized table shape; "
                         "packing then uses true token counts (0 = skip)")
    ap.add_argument("--pack-budget", type=int, default=0,
                    help="pack curated docs into fixed-token training packs "
                         "of this budget (0 = skip); adds pack_shard/pack_id "
                         "columns to the output")
    ap.add_argument("--decontaminate", default="",
                    help="parquet dir of a benchmark/test set (doc_id, text): "
                         "drop curated docs sharing any --decon-n-gram with it")
    ap.add_argument("--decon-n", type=int, default=13,
                    help="decontamination n-gram length (GPT-3 convention: 13)")
    ap.add_argument("--paragraph-dedup", action="store_true",
                    help="CCNet-style paragraph-level exact dedup between "
                         "the exact and near-dup stages (keeps the "
                         "corpus-wide first occurrence of each normalized "
                         "paragraph)")
    ap.add_argument("--html-input", action="store_true",
                    help="input docs carry an html column: extract text "
                         "from it before any other stage")
    ap.add_argument("--normalize", action="store_true",
                    help="unicode intake fix-up before any other text "
                         "stage: strip control/zero-width chars, map "
                         "exotic spaces to plain, CRLF->LF, NFC-compose")
    ap.add_argument("--span-dedup", type=int, default=0,
                    help="ExactSubstr-style duplicate-span removal between "
                         "the paragraph and near-dup stages: remove word "
                         "spans of this length occurring elsewhere in the "
                         "corpus, keeping the first occurrence (0 = skip; "
                         "the paper's convention is 50)")
    ap.add_argument("--max-dup-line-frac", type=float, default=None,
                    help="drop docs whose duplicate-line fraction exceeds "
                         "this (Gopher uses 0.30; unset = no cap)")
    ap.add_argument("--max-top-ngram-frac", type=float, default=None,
                    help="drop docs whose top-2-gram char mass fraction "
                         "exceeds this (Gopher uses 0.20; unset = no cap)")
    ap.add_argument("--max-dup-ngram-frac", type=float, default=None,
                    help="drop docs whose duplicated-5-gram char fraction "
                         "exceeds this (Gopher uses 0.15; unset = no cap)")
    ap.add_argument("--clf-weights", default="",
                    help="parquet of (bucket, weight) rows: score docs with "
                         "the hashed linear classifier and keep "
                         "clf_score >= --min-clf-score")
    ap.add_argument("--min-clf-score", type=float, default=0.5,
                    help="classifier keep threshold (with --clf-weights)")
    ap.add_argument("--clf-bias", type=float, default=0.0,
                    help="classifier bias term (with --clf-weights)")
    ap.add_argument("--clf-buckets", type=int, default=1 << 15,
                    help="feature-hash bucket count (must match training)")
    ap.add_argument("--gopher-rules", action="store_true",
                    help="apply the Gopher word-level rule set (word count "
                         "band, symbol/bullet/ellipsis/alpha fractions, "
                         "required stopwords) and keep gopher_pass rows")
    ap.add_argument("--gopher-min-words", type=int, default=50,
                    help="Gopher word-count lower bound (with --gopher-rules)")
    ap.add_argument("--c4-clean", action="store_true",
                    help="C4 line-level cleanup before any dedup: rebuild "
                         "each doc from lines that end in terminal "
                         "punctuation, have >= --c4-min-line-words words, "
                         "and don't mention javascript")
    ap.add_argument("--c4-min-line-words", type=int, default=5,
                    help="C4 per-line word minimum (with --c4-clean)")
    ap.add_argument("--c4-rules", action="store_true",
                    help="apply the C4 document-level drops (sentence "
                         "count, lorem ipsum, curly brace, badword list) "
                         "and keep c4_pass rows")
    ap.add_argument("--c4-min-sentences", type=int, default=3,
                    help="C4 sentence-count lower bound (with --c4-rules)")
    ap.add_argument("--c4-badwords", default="",
                    help="comma-separated whole-word blocklist for "
                         "--c4-rules (C4 uses the public badwords list; "
                         "none ships here)")
    ap.add_argument("--max-ppl", type=float, default=None,
                    help="drop docs whose hashed-bigram LM perplexity "
                         "exceeds this (CCNet-style gate; unset = off; "
                         "NULL-perplexity docs — no words — also drop)")
    ap.add_argument("--lm-ref", default="",
                    help="LM training corpus: a parquet path with a text "
                         "column; must be held-out from the input (with "
                         "--max-ppl)")
    ap.add_argument("--lm-buckets", type=int, default=1 << 18,
                    help="LM hash-bucket count (train and score share it)")
    ap.add_argument("--ppl-buckets", action="store_true",
                    help="annotate curated docs with CCNet head/middle/"
                         "tail perplexity buckets per predicted language "
                         "(needs --lm-ref; approx-percentile scale mode)")
    ap.add_argument("--keep-ppl-buckets", default="",
                    help="comma list of buckets to keep (e.g. "
                         "head,middle — CCNet's training choice); empty "
                         "= annotate only, drop nothing")
    ap.add_argument("--lm-lambda", type=float, default=0.9,
                    help="Jelinek-Mercer bigram interpolation weight")
    ap.add_argument("--url-dedup", action="store_true",
                    help="keep-first dedup per canonical URL before content "
                         "dedup (input must carry a url column)")
    ap.add_argument("--block-domains", default="",
                    help="comma-separated domain blocklist applied to the "
                         "canonical host (parent-domain suffixes match)")
    ap.add_argument("--redact-pii", action="store_true",
                    help="scrub emails/SSNs/cards/IPs/phones to typed "
                         "placeholder tokens after filtering/decontam "
                         "(stats report affected docs + match count)")
    ap.add_argument("--mix-alpha", type=float, default=None,
                    help="temperature-alpha source mixing toward "
                         "q_i ∝ p_i^alpha (needs a source column; "
                         "alpha in (0,1], 1 = natural mix)")
    ap.add_argument("--mix-mode", default="downsample",
                    choices=["downsample", "epoch"],
                    help="mix by thinning large sources (downsample) or "
                         "replicating small ones (epoch; adds an epoch "
                         "column and the shuffle salts on it)")
    ap.add_argument("--dsir-target", default="",
                    help="parquet dir of target-domain docs(text); "
                         "enables DSIR importance resampling toward it")
    ap.add_argument("--dsir-k", type=int, default=0,
                    help="number of documents DSIR selects (required "
                         "with --dsir-target)")
    ap.add_argument("--dsir-buckets", type=int, default=1 << 18,
                    help="hashed n-gram vocabulary size for DSIR")
    ap.add_argument("--shuffle-seed", type=int, default=None,
                    help="write the curated corpus in a deterministic "
                         "hash-shuffled training order (omit = keep "
                         "natural order)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from timeseriesvectordbpattermatcher_spark.operators.dedup import (
        _materialize,
        exact_dedup,
        minhash_lsh_dedup,
    )
    from timeseriesvectordbpattermatcher_spark.operators.textstats import (
        add_fingerprint,
        add_lang_id,
        add_quality_score,
        add_token_counts,
    )
    from timeseriesvectordbpattermatcher_spark.session import get_spark

    spark = get_spark(app_name="corpus_job", cpus=args.cpus or None)
    t0 = time.time()

    if args.synthetic_docs:
        docs = synth_docs(spark, args.synthetic_docs)
    elif args.input:
        docs = spark.read.parquet(args.input).withColumn(
            "doc_id", F.col("doc_id").cast("string")
        )
    else:
        ap.error("one of --input / --synthetic-docs is required")

    if args.html_input:
        from timeseriesvectordbpattermatcher_spark.operators.html import (
            extract_text,
        )

        if "html" not in docs.columns:
            ap.error("--html-input needs an html column in the input")
        docs = extract_text(docs).drop("html")

    stats: dict = {"stages": {}}
    if args.normalize:
        # a transform, not a drop — rows are unchanged, so per the
        # no-silent-caps contract it reports docs whose TEXT changed
        from timeseriesvectordbpattermatcher_spark.operators.normalize import (
            normalize_text,
        )

        normed = _materialize(normalize_text(docs, out_col="text_norm"))
        stats["normalize_docs_changed"] = int(
            normed.filter(
                ~F.col("text_norm").eqNullSafe(F.col("text"))
            ).count()
        )
        docs = normed.drop("text").withColumnRenamed("text_norm", "text")
    if args.c4_clean:
        # C4's order: clean lines FIRST, then dedup/filter the cleaned
        # text. A transform, not a drop — row count is unchanged, so it
        # reports docs touched + lines removed instead of a stage count.
        from timeseriesvectordbpattermatcher_spark.operators.textstats import (
            c4_line_clean,
        )

        cleaned = _materialize(
            c4_line_clean(docs, min_line_words=args.c4_min_line_words)
        )
        agg = cleaned.agg(
            F.sum("c4_lines_removed").alias("lines"),
            F.sum((F.col("c4_lines_removed") > 0).cast("long")).alias("docs"),
        ).collect()[0]
        stats["c4_lines_removed"] = int(agg["lines"] or 0)
        stats["c4_docs_cleaned"] = int(agg["docs"] or 0)
        docs = (
            cleaned.drop("text", "c4_lines_kept", "c4_lines_removed")
            .withColumnRenamed("text_c4", "text")
        )
    keep_cols = ["doc_id", "text"] + [
        c for c in ("source", "url") if c in docs.columns
    ]
    if args.sample and "source" not in docs.columns:
        ap.error("--sample needs a source column in the input")
    if (args.url_dedup or args.block_domains) and "url" not in docs.columns:
        ap.error("--url-dedup/--block-domains need a url column in the input")
    docs = _materialize(docs.select(*keep_cols))
    stats["stages"]["raw"] = docs.count()

    if args.block_domains:
        from timeseriesvectordbpattermatcher_spark.operators.urls import (
            filter_domains,
        )

        docs = _materialize(
            filter_domains(docs, args.block_domains.split(","))
        )
        stats["stages"]["domain_filter"] = docs.count()
    if args.url_dedup:
        from timeseriesvectordbpattermatcher_spark.operators.urls import (
            url_dedup,
        )

        docs = _materialize(url_dedup(docs))
        stats["stages"]["url_dedup"] = docs.count()

    exact = _materialize(exact_dedup(docs))
    stats["stages"]["exact_dedup"] = exact.count()

    if args.paragraph_dedup:
        from timeseriesvectordbpattermatcher_spark.operators.dedup import (
            paragraph_dedup,
        )

        # paragraph removal changes CONTENT, not just rows — count both so
        # the stats line keeps the "no silent caps" contract at paragraph
        # granularity too
        def n_paras(df):
            return df.select(
                F.sum(
                    F.size(
                        F.filter(
                            F.split(F.coalesce(F.col("text"), F.lit("")), "\n\n"),
                            lambda p: F.trim(p) != "",
                        )
                    )
                )
            ).collect()[0][0] or 0

        paras_before = n_paras(exact)
        exact = _materialize(paragraph_dedup(exact))
        stats["stages"]["para_dedup"] = exact.count()
        stats["paragraphs_dropped"] = int(paras_before - n_paras(exact))

    if args.span_dedup:
        from timeseriesvectordbpattermatcher_spark.operators.dedup import (
            duplicate_span_removal,
            words_col,
        )

        def n_words(df):
            return df.select(F.sum(F.size(words_col("text")))).collect()[0][0] or 0

        words_before = n_words(exact)
        exact = _materialize(
            duplicate_span_removal(exact, min_len=args.span_dedup)
        )
        stats["stages"]["span_dedup"] = exact.count()
        stats["span_words_removed"] = int(words_before - n_words(exact))

    # minhash_lsh_dedup already returns the surviving ROWS (anti join of
    # losers) — no recovery join needed
    near = _materialize(minhash_lsh_dedup(exact, threshold=args.threshold))
    stats["stages"]["near_dedup"] = near.count()

    analyzed = add_fingerprint(add_token_counts(add_lang_id(add_quality_score(near))))
    keep = F.col("quality") >= args.min_quality
    langs = [s for s in args.langs.split(",") if s]
    if langs:
        keep = keep & F.col("lang_pred").isin(langs)
    rep_caps = [
        ("dup_line_frac", args.max_dup_line_frac),
        ("top_ngram_char_frac", args.max_top_ngram_frac),
        ("dup_ngram_char_frac", args.max_dup_ngram_frac),
    ]
    rep_ok = None
    if any(v is not None for _, v in rep_caps):
        from timeseriesvectordbpattermatcher_spark.operators.textstats import (
            add_repetition_signals,
        )

        analyzed = add_repetition_signals(analyzed)
        rep_ok = F.lit(True)
        for col, cap in rep_caps:
            if cap is not None:
                rep_ok = rep_ok & (F.col(col) <= cap)
        keep = keep & rep_ok
    gopher_ok = None
    if args.gopher_rules:
        from timeseriesvectordbpattermatcher_spark.operators.textstats import (
            add_gopher_rules,
        )

        analyzed = add_gopher_rules(
            analyzed, min_words=args.gopher_min_words
        )
        gopher_ok = F.col("gopher_pass")  # already null-safe (False on NULL)
        keep = keep & gopher_ok
    c4_ok = None
    if args.c4_rules:
        from timeseriesvectordbpattermatcher_spark.operators.textstats import (
            add_c4_rules,
        )

        analyzed = add_c4_rules(
            analyzed,
            min_sentences=args.c4_min_sentences,
            badwords=[w for w in args.c4_badwords.split(",") if w],
        )
        c4_ok = F.col("c4_pass")  # already null-safe (False on NULL)
        keep = keep & c4_ok
    clf_ok = None
    if args.clf_weights:
        from timeseriesvectordbpattermatcher_spark.operators.classifier import (
            score_linear_model,
        )

        weights = spark.read.parquet(args.clf_weights)
        analyzed = score_linear_model(
            analyzed, weights, bias=args.clf_bias, n_buckets=args.clf_buckets
        )
        clf_ok = F.col("clf_score") >= args.min_clf_score
        keep = keep & clf_ok
    ppl_ok = None
    if args.max_ppl is not None or args.ppl_buckets:
        from timeseriesvectordbpattermatcher_spark.operators.lm import (
            add_perplexity,
            train_bigram_counts,
        )

        # the reference MUST be external/held-out (the CCNet shape).
        # Training on the corpus itself is a footgun this job refuses:
        # a bigram count model contains every document's own bigrams, so
        # even one-off gibberish predicts itself with probability ~lambda
        # and scores ppl ~1/lambda — the gate would pass everything.
        if not args.lm_ref:
            ap.error("--max-ppl/--ppl-buckets need --lm-ref (a held-out "
                     "reference corpus parquet with a text column)")
        ref = spark.read.parquet(args.lm_ref)
        counts = train_bigram_counts(ref, n_buckets=args.lm_buckets)
        analyzed = add_perplexity(
            analyzed, counts, n_buckets=args.lm_buckets, lam=args.lm_lambda
        )
        if args.max_ppl is not None:
            ppl_ok = F.col("ppl") <= args.max_ppl
            keep = keep & ppl_ok
    curated = analyzed.filter(keep)
    if args.ppl_buckets:
        from timeseriesvectordbpattermatcher_spark.operators.lm import (
            ppl_buckets,
        )

        # buckets are quantiles of the SURVIVORS per predicted language
        # (the CCNet shape: split what you'd train on, not what you
        # dropped), scale mode — no per-language window
        curated = ppl_buckets(curated, by="lang_pred", exact=False)
        stats["ppl_bucket_counts"] = {
            (r["ppl_bucket"] or "null"): r["n"]
            for r in curated.groupBy("ppl_bucket")
            .agg(F.count("*").alias("n")).collect()
        }
        kept_buckets = [b for b in args.keep_ppl_buckets.split(",") if b]
        if kept_buckets:
            curated = curated.filter(F.col("ppl_bucket").isin(kept_buckets))
            # drops derived from the (already collected) bucket counts —
            # NULL buckets (NULL ppl) fail isin and drop too
            stats["ppl_bucket_filtered"] = sum(
                n for b, n in stats["ppl_bucket_counts"].items()
                if b not in kept_buckets
            )

    # optional late stages: source-mix sampling -> token-budget packing ->
    # deterministic training-order shuffle (operators/curation.py). All
    # three are deterministic functions of doc_id, so a job re-run (or a
    # task retry) writes byte-identical rows.
    final = curated
    if args.decontaminate:
        from timeseriesvectordbpattermatcher_spark.operators.dedup import (
            decontaminate,
        )

        bench = spark.read.parquet(args.decontaminate)
        n_before = final.count()
        final = _materialize(
            decontaminate(final, bench, n=args.decon_n, mode="drop")
        )
        stats["decontaminated"] = n_before - final.count()
    if args.redact_pii:
        from timeseriesvectordbpattermatcher_spark.operators.pii import (
            add_pii_signals,
            redact_pii,
        )

        # redaction never drops rows, but it DOES change content — report
        # how much, per the no-silent-caps contract (decontamination runs
        # first so benchmark n-grams match against raw text)
        hit = add_pii_signals(final).agg(
            F.sum((F.col("pii_total") > 0).cast("long")).alias("docs"),
            F.sum("pii_total").alias("matches"),
        ).collect()[0]
        stats["pii_docs_redacted"] = int(hit["docs"] or 0)
        stats["pii_matches_redacted"] = int(hit["matches"] or 0)
        final = redact_pii(final)
    if args.sample:
        from timeseriesvectordbpattermatcher_spark.operators.curation import (
            sample_stratified,
        )

        fractions = {}
        for kv in args.sample.split(","):
            k, v = kv.split("=")
            fractions[k.strip()] = float(v)
        final = sample_stratified(
            final, fractions, key_col="source",
            default_fraction=args.sample_default,
        )
    if args.mix_alpha is not None:
        from timeseriesvectordbpattermatcher_spark.operators.curation import (
            temperature_mix,
            temperature_mix_factors,
        )

        if "source" not in final.columns:
            ap.error("--mix-alpha needs a source column in the input")
        # record the factors the mix applied — they're the audit trail
        # for "why did web shrink 4x" questions
        anchor = "min" if args.mix_mode == "downsample" else "max"
        stats["mix_factors"] = {
            k: round(v, 6)
            for k, v in temperature_mix_factors(
                final, alpha=args.mix_alpha, anchor=anchor
            ).items()
        }
        final = temperature_mix(
            final, alpha=args.mix_alpha, mode=args.mix_mode
        )
    if bool(args.dsir_target) != bool(args.dsir_k):
        ap.error("--dsir-target and --dsir-k go together")
    if args.dsir_target:
        from timeseriesvectordbpattermatcher_spark.operators.dsir import (
            dsir_log_weight,
            dsir_resample,
        )
        from timeseriesvectordbpattermatcher_spark.operators.lm import (
            train_bigram_counts,
        )

        target = spark.read.parquet(args.dsir_target)
        tc = train_bigram_counts(target, n_buckets=args.dsir_buckets)
        # q is the distribution of the corpus being selected FROM — for
        # importance weights that self-training is the definition, unlike
        # the ppl gate where it is a footgun
        qc = train_bigram_counts(final, n_buckets=args.dsir_buckets)
        final = dsir_resample(
            dsir_log_weight(final, tc, qc, n_buckets=args.dsir_buckets),
            args.dsir_k,
        ).drop("dsir_logw", "dsir_key")
    if args.vocab_size:
        from timeseriesvectordbpattermatcher_spark.operators.tokenizer import (
            UNK_ID,
            build_vocab,
            encode_text,
        )

        # vocab from the SURVIVORS (what training sees), committed before
        # encoding so a re-run scores against the identical table
        vocab = build_vocab(final, args.vocab_size)
        vocab.write.mode("overwrite").parquet(args.output + "_vocab")
        vocab = spark.read.parquet(args.output + "_vocab")
        final = _materialize(encode_text(final, vocab, add_eos=True))
        tok_agg = final.agg(
            F.sum(
                F.size(F.filter("tokens", lambda t: t == F.lit(UNK_ID)))
            ).alias("unk"),
            F.sum("n_tok").alias("tok"),
        ).collect()[0]
        stats["vocab_size"] = vocab.count()
        stats["tokens_written"] = int(tok_agg["tok"] or 0)
        stats["oov_rate"] = round(
            (tok_agg["unk"] or 0) / tok_agg["tok"], 6
        ) if tok_agg["tok"] else None
    if args.pack_budget:
        from timeseriesvectordbpattermatcher_spark.operators.curation import (
            pack_sequences,
        )

        final = pack_sequences(
            final, budget=args.pack_budget,
            # true vocab token counts when tokenization ran, else the
            # whitespace proxy from add_token_counts
            n_tok_col="n_tok" if args.vocab_size else "n_tokens_ws",
            key_col="source" if "source" in final.columns else None,
        )
    if args.shuffle_seed is not None:
        from timeseriesvectordbpattermatcher_spark.operators.curation import (
            shuffle_deterministic,
        )

        final = shuffle_deterministic(
            final,
            seed=args.shuffle_seed,
            # epoch-mode mixing replicates doc_ids — salt the order hash
            # so a doc's copies spread instead of clumping adjacent
            salt_cols=["epoch"] if "epoch" in final.columns else None,
        )

    final.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    # "curated" is always the post-filter count (the quality/lang
    # reconciliation below depends on it); "sampled" is the written count
    # when a sampling stage ran (pack/shuffle never change row counts,
    # decontamination drops are counted separately above)
    row_changing = bool(
        args.sample or args.decontaminate
        or args.mix_alpha is not None or args.dsir_k
    )
    stats["stages"]["curated"] = curated.count() if row_changing else out.count()
    if args.sample or args.mix_alpha is not None or args.dsir_k:
        stats["stages"]["sampled"] = out.count()
    # split the filter attribution: quality drops vs language drops (an
    # operator tuning --min-quality must not be shown language casualties).
    # Null-inclusive: a NULL quality (null-text rows ride through exact
    # dedup by design) fails `quality >= min` in `keep` and must be counted
    # as a quality drop. NOTE `~(quality >= min)` alone is NOT enough —
    # three-valued logic makes it NULL (not TRUE) for NULL quality and the
    # row would vanish from every bucket; the explicit isNull() arm keeps
    # the stage counts reconciling.
    stats["quality_filtered"] = int(
        analyzed.filter(
            ~(F.col("quality") >= args.min_quality) | F.col("quality").isNull()
        ).count()
    )
    # attribution precedence: quality, then language among quality-passers,
    # then repetition among quality+language passers — each doc is counted
    # by exactly one bucket, so the buckets + curated sum back to near_dedup
    qual_lang_ok = F.col("quality") >= args.min_quality
    if langs:
        qual_lang_ok = qual_lang_ok & F.col("lang_pred").isin(langs)
    if rep_ok is not None:
        stats["repetition_filtered"] = int(
            analyzed.filter(qual_lang_ok & ~rep_ok).count()
        )
    prior_ok = qual_lang_ok if rep_ok is None else qual_lang_ok & rep_ok
    # Gopher-rule drops attributed next (among quality+lang+repetition
    # passers); gopher_pass is already False (never NULL) on NULL text
    if gopher_ok is not None:
        stats["gopher_filtered"] = int(
            analyzed.filter(prior_ok & ~gopher_ok).count()
        )
        prior_ok = prior_ok & gopher_ok
    # C4 document drops attributed next (among all prior passers);
    # c4_pass is already False (never NULL) on NULL text
    if c4_ok is not None:
        stats["c4_filtered"] = int(
            analyzed.filter(prior_ok & ~c4_ok).count()
        )
        prior_ok = prior_ok & c4_ok
    # classifier drops attributed next, keeping each doc in exactly one
    # bucket
    if clf_ok is not None:
        stats["clf_filtered"] = int(analyzed.filter(prior_ok & ~clf_ok).count())
        prior_ok = prior_ok & clf_ok
    # perplexity drops attributed last; NULL ppl (docs with no words that
    # survived the quality gate — possible only if --min-quality is 0)
    # needs the explicit isNull() arm, same three-valued-logic trap as
    # quality above
    if ppl_ok is not None:
        stats["ppl_filtered"] = int(
            analyzed.filter(
                prior_ok & (~ppl_ok | F.col("ppl").isNull())
            ).count()
        )
    stats["lang_filtered"] = (
        stats["stages"]["near_dedup"] - stats["stages"]["curated"]
        - stats["quality_filtered"] - stats.get("repetition_filtered", 0)
        - stats.get("clf_filtered", 0) - stats.get("ppl_filtered", 0)
        - stats.get("gopher_filtered", 0) - stats.get("c4_filtered", 0)
        - stats.get("ppl_bucket_filtered", 0)
        if langs else 0
    )
    stats["wall_sec"] = round(time.time() - t0, 2)
    stats["output"] = args.output
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
