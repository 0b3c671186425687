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


# ---------------------------------------------------------------------------
# closed-form NB trainer


def _feat_buckets(text, n_buckets=N_BUCKETS):
    if text is None:
        return []
    cleaned = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
    words = cleaned.split(" ") if cleaned else []
    feats = words + [" ".join(words[i:i + 2]) for i in range(len(words) - 1)]
    return [to_i64(hash_bytes(f.encode(), SPARK_SEED)) % n_buckets for f in feats]


LABELED = [
    (0, "good clean prose with many fine words", 1),
    (1, "more good prose here with fine words too", 1),
    (2, "fine words and clean structure again", 1),
    (3, "spam spam buy now click here spam", 0),
    (4, "click buy spam now now now", 0),
    (5, "", 1),        # featureless positive: counted in prior only
    (6, None, 0),      # featureless negative: counted in prior only
]


def _oracle_train(rows, smoothing=1.0, n_buckets=N_BUCKETS):
    c1, c0 = {}, {}
    n1 = n0 = nf1 = nf0 = 0
    for _, text, y in rows:
        bs = _feat_buckets(text, n_buckets)
        if y == 1:
            n1 += 1
            nf1 += len(bs)
            for b in bs:
                c1[b] = c1.get(b, 0) + 1
        else:
            n0 += 1
            nf0 += len(bs)
            for b in bs:
                c0[b] = c0.get(b, 0) + 1
    a = smoothing
    wts = {
        b: math.log(c1.get(b, 0) + a) - math.log(c0.get(b, 0) + a)
        for b in set(c1) | set(c0)
    }
    bias = math.log(n1 / n0) + math.log(
        (nf0 + a * n_buckets) / (nf1 + a * n_buckets)
    )
    return wts, bias


def test_train_nb_matches_pure_python_oracle(spark):
    from timeseriesvectordbpattermatcher_spark.operators.classifier import (
        train_nb_weights,
    )

    df = spark.createDataFrame(LABELED, "doc_id long, text string, label int")
    w_df, bias = train_nb_weights(df, n_buckets=N_BUCKETS)
    got = {r["bucket"]: r["weight"] for r in w_df.collect()}
    want, want_bias = _oracle_train(LABELED)
    assert abs(bias - want_bias) < 1e-12
    assert set(got) == set(want)
    for b in want:
        assert abs(got[b] - want[b]) < 1e-12, b


def test_train_nb_sparse_equals_dense(spark):
    """The centering contract: scoring with the sparse trained table must
    equal scoring with the DENSE model (every bucket carrying its
    uncentered NB log-odds, bias = doc prior alone)."""
    from timeseriesvectordbpattermatcher_spark.operators.classifier import (
        train_nb_weights,
    )

    nb = 1 << 10  # small space so the dense table is cheap
    df = spark.createDataFrame(LABELED, "doc_id long, text string, label int")
    w_df, bias = train_nb_weights(df, n_buckets=nb)

    # dense oracle weights: w(b) = log((c1+a)/(N1+aB)) - log((c0+a)/(N0+aB))
    c1, c0 = {}, {}
    nf1 = nf0 = 0
    for _, text, y in LABELED:
        for b in _feat_buckets(text, nb):
            (c1 if y == 1 else c0)[b] = (c1 if y == 1 else c0).get(b, 0) + 1
        nf1 += len(_feat_buckets(text, nb)) if y == 1 else 0
        nf0 += len(_feat_buckets(text, nb)) if y == 0 else 0
    a = 1.0
    dense = {
        b: (math.log(c1.get(b, 0) + a) - math.log(nf1 + a * nb))
        - (math.log(c0.get(b, 0) + a) - math.log(nf0 + a * nb))
        for b in range(nb)
    }
    dense_bias = math.log(5 / 2) * 0 + math.log(
        sum(1 for r in LABELED if r[2] == 1) / sum(1 for r in LABELED if r[2] == 0)
    )

    test_docs = spark.createDataFrame(
        [(0, "good prose with spam inside"), (1, "unseen vocabulary entirely"),
         (2, ""), (3, None)],
        "doc_id long, text string",
    )
    dense_df = spark.createDataFrame(
        [(b, w) for b, w in dense.items()], "bucket long, weight double"
    )
    got = (
        score_linear_model(test_docs, w_df, bias=bias, n_buckets=nb)
        .orderBy("doc_id").toPandas().clf_score
    )
    want = (
        score_linear_model(test_docs, dense_df, bias=dense_bias, n_buckets=nb)
        .orderBy("doc_id").toPandas().clf_score
    )
    # docs WITH features (incl. all-unseen vocab): sparse == dense exactly
    assert (abs(got.values[:2] - want.values[:2]) < 1e-12).all(), (got, want)
    # featureless docs: documented corner — they score sigmoid(bias) =
    # prior + unseen default ("one unseen feature"), NOT the bare prior
    d = bias - dense_bias  # the unseen-bucket default the centering moved
    for i in (2, 3):
        assert abs(got.values[i] - 1 / (1 + math.exp(-(dense_bias + d)))) < 1e-12
        assert abs(want.values[i] - 1 / (1 + math.exp(-dense_bias))) < 1e-12


def test_train_nb_separates_and_gates(spark):
    """End to end: train on a labeled synth corpus, score held-out docs,
    positives outrank negatives and a threshold gates correctly."""
    from timeseriesvectordbpattermatcher_spark.operators.classifier import (
        train_nb_weights,
    )

    train = [(i, f"quality essay prose chapter {i % 7} insight", 1)
             for i in range(40)] + \
            [(100 + i, f"viagra casino {i % 7} winner click prize", 0)
             for i in range(40)]
    df = spark.createDataFrame(train, "doc_id long, text string, label int")
    w_df, bias = train_nb_weights(df)
    held = spark.createDataFrame(
        [(0, "an essay of insight and prose"), (1, "casino prize click winner")],
        "doc_id long, text string",
    )
    s = score_linear_model(held, w_df, bias=bias).orderBy("doc_id").toPandas()
    assert s.clf_score[0] > 0.5 > s.clf_score[1], list(s.clf_score)


def test_train_nb_validates(spark):
    import pytest as _pt

    from timeseriesvectordbpattermatcher_spark.operators.classifier import (
        train_nb_weights,
    )

    bad = spark.createDataFrame(
        [(0, "x", 2)], "doc_id long, text string, label int")
    with _pt.raises(ValueError, match="outside"):
        train_nb_weights(bad)
    one_class = spark.createDataFrame(
        [(0, "x", 1), (1, "y", 1)], "doc_id long, text string, label int")
    with _pt.raises(ValueError, match="both classes"):
        train_nb_weights(one_class)
    with _pt.raises(ValueError, match="smoothing"):
        train_nb_weights(one_class, smoothing=0.0)
