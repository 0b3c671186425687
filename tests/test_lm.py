"""Hashed bigram-LM perplexity vs a pure-python oracle (standalone XXH64
from tests/oracle — no engine imports in the recompute)."""

import math
import re

from pyspark.sql import functions as F

from tests.oracle.xxh64_pure import SPARK_SEED, hash_bytes, to_i64
from timeseriesvectordbpattermatcher_spark.operators.lm import (
    add_perplexity,
    train_bigram_counts,
)

REF = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox sleeps",
    "a lazy dog sleeps over the fence",
    "the dog jumps and the fox jumps",
    None,
    "",
    "!!! ...",  # normalizes to no words: contributes nothing
]

DOCS = [
    (0, "the quick brown fox"),           # in-domain
    (1, "fox the brown quick"),           # same words, unseen order
    (2, "zxqv wvut kjih gfed"),           # fully out-of-vocabulary
    (3, "the"),                           # single word: unigram-only
    (4, ""),                              # no words -> NULL ppl
    (5, None),                            # NULL text -> NULL ppl
    (6, "--- !!!"),                       # punctuation-only -> NULL ppl
    (7, "the quick brown fox jumps over the lazy dog"),  # exact ref line
]

B = 1 << 12
LAM = 0.9


def _words(text):
    if text is None:
        return []
    cleaned = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
    return cleaned.split(" ") if cleaned else []


def _b(s):
    return to_i64(hash_bytes(s.encode(), SPARK_SEED)) % B


def _oracle_counts(texts):
    uni, big = {}, {}
    for t in texts:
        ws = _words(t)
        for w in ws:
            uni[_b(w)] = uni.get(_b(w), 0) + 1
        for i in range(len(ws) - 1):
            g = " ".join(ws[i:i + 2])
            big[_b(g)] = big.get(_b(g), 0) + 1
    return uni, big


def _oracle_ppl(text, uni, big, n_total, lam=LAM):
    ws = _words(text)
    if not ws:
        return None
    lps = []
    for i, w in enumerate(ws):
        pu = (uni.get(_b(w), 0) + 1) / (n_total + B)
        if i == 0:
            lps.append(math.log(pu))
        else:
            cp = uni.get(_b(ws[i - 1]), 0)
            r = min(big.get(_b(ws[i - 1] + " " + w), 0) / cp, 1.0) if cp else 0.0
            lps.append(math.log(lam * r + (1 - lam) * pu))
    return math.exp(-sum(lps) / len(lps))


def test_counts_match_pure_python_oracle(spark):
    ref = spark.createDataFrame([(t,) for t in REF], "text string")
    got = {
        r.bucket: (r.uni, r.big)
        for r in train_bigram_counts(ref, n_buckets=B).collect()
    }
    uni, big = _oracle_counts(REF)
    want = {
        b: (uni.get(b, 0), big.get(b, 0)) for b in set(uni) | set(big)
    }
    assert got == want


def test_perplexity_matches_pure_python_oracle(spark):
    ref = spark.createDataFrame([(t,) for t in REF], "text string")
    counts = train_bigram_counts(ref, n_buckets=B)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        add_perplexity(df, counts, n_buckets=B, lam=LAM)
        .orderBy("doc_id")
        .toPandas()
    )
    uni, big = _oracle_counts(REF)
    n_total = sum(uni.values())
    for _, r in got.iterrows():
        want = _oracle_ppl(DOCS[int(r.doc_id)][1], uni, big, n_total)
        if want is None:
            assert r.ppl != r.ppl or r.ppl is None  # NaN/None both count
        else:
            assert abs(r.ppl - want) <= 1e-9 * want, (r.doc_id, r.ppl, want)
    # all rows and columns survive
    assert len(got) == len(DOCS) and {"doc_id", "text", "ppl"} == set(got.columns)


def test_in_domain_scores_below_gibberish(spark):
    ref = spark.createDataFrame([(t,) for t in REF], "text string")
    counts = train_bigram_counts(ref, n_buckets=B)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    ppl = {
        r.doc_id: r.ppl
        for r in add_perplexity(df, counts, n_buckets=B).collect()
    }
    assert ppl[7] < ppl[0] < ppl[1] < ppl[2]  # exact < in-domain < shuffled < OOV


def test_collision_heavy_buckets_stay_oracle_exact(spark):
    # B=16 forces heavy collisions: the bigram ratio cap (min(.., 1)) and
    # cross-word count merging must mirror the oracle bit-for-bit
    small_b = 16
    ref = spark.createDataFrame([(t,) for t in REF], "text string")
    counts = train_bigram_counts(ref, n_buckets=small_b)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.ppl
        for r in add_perplexity(df, counts, n_buckets=small_b).collect()
    }

    def bb(s):
        return to_i64(hash_bytes(s.encode(), SPARK_SEED)) % small_b

    uni, big = {}, {}
    for t in REF:
        ws = _words(t)
        for w in ws:
            uni[bb(w)] = uni.get(bb(w), 0) + 1
        for i in range(len(ws) - 1):
            big[bb(" ".join(ws[i:i + 2]))] = big.get(bb(" ".join(ws[i:i + 2])), 0) + 1
    n_total = sum(uni.values())
    capped = False
    for doc_id, text in DOCS:
        ws = _words(text)
        if not ws:
            assert got[doc_id] is None or got[doc_id] != got[doc_id]
            continue
        lps = []
        for i, w in enumerate(ws):
            pu = (uni.get(bb(w), 0) + 1) / (n_total + small_b)
            if i == 0:
                lps.append(math.log(pu))
            else:
                cp = uni.get(bb(ws[i - 1]), 0)
                raw = big.get(bb(ws[i - 1] + " " + w), 0) / cp if cp else 0.0
                capped = capped or raw > 1.0
                lps.append(math.log(LAM * min(raw, 1.0) + (1 - LAM) * pu))
        want = math.exp(-sum(lps) / len(lps))
        assert abs(got[doc_id] - want) <= 1e-9 * want, (doc_id, got[doc_id], want)


def test_plan_is_broadcast_and_python_free(spark):
    ref = spark.createDataFrame([("x y z",)], "text string")
    counts = train_bigram_counts(ref, n_buckets=B)
    df = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    plan = (
        add_perplexity(df, counts, n_buckets=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 4
    assert "EvalPython" not in plan
    train_plan = (
        train_bigram_counts(ref, n_buckets=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in train_plan


def test_filter_composes_null_inclusive(spark):
    ref = spark.createDataFrame([(t,) for t in REF], "text string")
    counts = train_bigram_counts(ref, n_buckets=B)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = add_perplexity(df, counts, n_buckets=B)
    cap = 2000.0
    kept = out.filter(F.col("ppl") <= cap)
    # NULL-inclusive drop predicate: a bare ~(ppl <= cap) is NULL for NULL
    # ppl and the row vanishes from BOTH counts — the job stats use this form
    dropped = out.filter(~(F.col("ppl") <= cap) | F.col("ppl").isNull())
    assert kept.count() + dropped.count() == len(DOCS)  # nulls counted once
    assert {r.doc_id for r in dropped.collect()} >= {4, 5, 6}  # NULL ppl drops


def test_ppl_buckets_exact_matches_duckdb(spark, duck):
    """Exact head/middle/tail split (weighted, grouped, straddler goes
    where its mass begins, id tiebreak, NULL-ppl excluded from the mass)
    vs a DuckDB window recompute."""
    import pandas as pd

    from timeseriesvectordbpattermatcher_spark.operators.lm import ppl_buckets

    rows = [
        # lang en: weights force a straddling doc — e1 starts below the
        # 1/3 cut and crosses it with its own mass: stays in head
        ("e0", "en", 1.0, 1.0),
        ("e1", "en", 2.0, 3.0),
        ("e2", "en", 3.0, 2.0),
        ("e3", "en", 4.0, 3.0),
        ("e4", "en", 4.0, 3.0),   # tie on ppl with e3: id order decides
        ("e5", "en", None, 9.0),  # NULL ppl: NULL bucket, zero mass
        # lang de: single doc -> everything head
        ("d0", "de", 7.0, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, lang string, ppl double, w double"
    )
    got = (
        ppl_buckets(df, by="lang", weight_col="w")
        .select("doc_id", "ppl_bucket")
        .toPandas().set_index("doc_id").sort_index()
    )

    duck.register("pb_docs", pd.DataFrame(
        rows, columns=["doc_id", "lang", "ppl", "w"]
    ))
    want = duck.sql("""
      WITH m AS (
        SELECT doc_id, lang, ppl,
          CASE WHEN ppl IS NULL THEN 0.0 ELSE w END mass
        FROM pb_docs),
      c AS (
        SELECT doc_id, ppl,
          sum(mass) OVER (PARTITION BY lang ORDER BY ppl ASC NULLS LAST,
                          doc_id ASC) - mass AS before,
          sum(mass) OVER (PARTITION BY lang) tot
        FROM m)
      SELECT doc_id,
        CASE WHEN ppl IS NULL THEN NULL
             WHEN before < tot / 3 THEN 'head'
             WHEN before < tot * 2 / 3 THEN 'middle'
             ELSE 'tail' END ppl_bucket
      FROM c
    """).df().set_index("doc_id").sort_index()
    for d in got.index:
        g, w = got.loc[d, "ppl_bucket"], want.loc[d, "ppl_bucket"]
        assert (pd.isna(g) and pd.isna(w)) or g == w, (d, g, w)
    # spot-pin the semantics the oracle encodes
    assert got.loc["e1", "ppl_bucket"] == "head"      # straddler starts in head
    assert got.loc["e3", "ppl_bucket"] == "middle"    # starts at 6 < 8
    assert got.loc["e4", "ppl_bucket"] == "tail"      # ppl tie, id order
    assert pd.isna(got.loc["e5", "ppl_bucket"])       # NULL ppl
    assert got.loc["d0", "ppl_bucket"] == "head"      # singleton group


def test_ppl_buckets_approx_agrees_on_separated_corpus(spark):
    """The percentile_approx scale mode agrees with the exact window mode
    when groups are well separated, and its plan has no per-group window
    (the skew-safety property it exists for)."""
    from timeseriesvectordbpattermatcher_spark.operators.lm import ppl_buckets

    rows = [(f"d{i:03d}", "en", float(i)) for i in range(90)]
    rows += [(f"g{i:02d}", "de", float(100 + i)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, ppl double")
    ex = {r["doc_id"]: r["ppl_bucket"]
          for r in ppl_buckets(df, by="lang").collect()}
    ap = ppl_buckets(df, by="lang", exact=False)
    got = {r["doc_id"]: r["ppl_bucket"] for r in ap.collect()}
    assert got == ex
    for name in ("head", "middle", "tail"):
        assert sum(v == name for v in got.values()) > 0
    plan = ap._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "percentile_approx" in plan


def test_ppl_buckets_validation(spark):
    import pytest

    from timeseriesvectordbpattermatcher_spark.operators.lm import ppl_buckets

    df = spark.createDataFrame([("a", 1.0)], "doc_id string, ppl double")
    with pytest.raises(ValueError, match="cuts"):
        ppl_buckets(df, cuts=(0.5, 0.4))
    with pytest.raises(ValueError, match="weight_col"):
        ppl_buckets(df, weight_col="ppl", exact=False)
