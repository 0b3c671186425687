"""Hashed linear classifier inference vs a pure-python oracle (standalone
XXH64 from tests/oracle — no engine imports in the recompute)."""

import math
import re

from pyspark.sql import functions as F

from tests.oracle.xxh64_pure import SPARK_SEED, hash_bytes, to_i64
from timeseriesvectordbpattermatcher_spark.operators.classifier import (
    demo_weights,
    score_linear_model,
)

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "the the the the"),  # heavy repeat: one word bucket dominates
    (2, "word"),  # single word, no bigram
    (3, ""),  # empty -> sigmoid(bias)
    (4, None),  # null text -> sigmoid(bias)
    (5, "!!! ... ---"),  # punctuation-only -> no features
    (6, "Mixed CASE and 123 numbers, with punctuation!"),
]

N_BUCKETS = 1 << 15
BIAS = -0.25


def _oracle_score(text, wts):
    if text is None:
        feats = []
    else:
        cleaned = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
        words = cleaned.split(" ") if cleaned else []
        feats = words + [" ".join(words[i:i + 2]) for i in range(len(words) - 1)]
    hs = [to_i64(hash_bytes(f.encode(), SPARK_SEED)) % N_BUCKETS for f in feats]
    mean = sum(wts.get(b, 0.0) for b in hs) / len(hs) if hs else 0.0
    return 1.0 / (1.0 + math.exp(-(BIAS + mean)))


def test_scores_match_pure_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    w = demo_weights(spark, N_BUCKETS)
    got = (
        score_linear_model(df, w, bias=BIAS, n_buckets=N_BUCKETS)
        .orderBy("doc_id")
        .toPandas()
    )
    # oracle weights re-derived from the demo_weights formula, not the DF
    wts = {
        b: ((b * 2654435761) % 2001 - 1000) / 1000.0 for b in range(N_BUCKETS)
    }
    for _, r in got.iterrows():
        want = _oracle_score(DOCS[int(r.doc_id)][1], wts)
        assert abs(r.clf_score - want) < 1e-12, (r.doc_id, r.clf_score, want)
    # featureless docs all land exactly on sigmoid(bias)
    base = 1.0 / (1.0 + math.exp(-BIAS))
    for d in (3, 4, 5):
        assert abs(got.clf_score[got.doc_id == d].iloc[0] - base) < 1e-12
    # all rows and columns survive
    assert len(got) == len(DOCS) and {"doc_id", "text", "clf_score"} == set(got.columns)


def test_sparse_weights_default_to_zero(spark):
    df = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
    w = spark.createDataFrame([(1, 99.0)], "bucket long, weight double")
    # none of the 3 features (2 words + 1 bigram) will hit bucket 1 with
    # realistic probability; score must be sigmoid(0 + bias)
    h = [to_i64(hash_bytes(s.encode(), SPARK_SEED)) % 4096
         for s in ("alpha", "beta", "alpha beta")]
    assert 1 not in h  # planted assumption, fails loudly if the hash moves
    got = score_linear_model(df, w, bias=0.5, n_buckets=4096).collect()[0]
    assert abs(got.clf_score - 1 / (1 + math.exp(-0.5))) < 1e-12


def test_plan_is_broadcast_and_python_free(spark):
    df = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    plan = (
        score_linear_model(df, demo_weights(spark, 1 << 10), n_buckets=1 << 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_filtering_composes(spark):
    df = spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(50)],
        "doc_id long, text string",
    )
    out = score_linear_model(df, demo_weights(spark), bias=0.0)
    scored = out.filter(F.col("clf_score") >= 0.5)
    n = scored.count()
    assert 0 <= n <= 50
    vals = [r.clf_score for r in out.collect()]
    assert all(0.0 < v < 1.0 for v in vals)
