"""Hashed-feature linear text classifier — inference only, JVM-side.

Modern curation pipelines filter on a learned quality/domain classifier
(a fastText-style linear model over hashed word/bigram features) rather
than heuristics alone. This module runs that *inference* as a pure
DataFrame plan: tokenize with the engine's word normalizer, hash each
word and bigram with ``xxhash64`` into ``n_buckets``, broadcast-join the
(bucket, weight) table, and mean-pool per document —

    score(doc) = sigmoid( bias + mean_f weights[h(f) % n_buckets] )

Plan shape at 100 TB: the explode is narrow (stays in the scan stage),
the weight join is a broadcast hash join (the model is n_buckets rows —
a few MB), and the per-doc mean is one hash aggregation whose map-side
partial combine ships two longs per (task, doc). No Python anywhere —
the whole thing is codegen'd — and no training loop (train offline; this
engine scores).

The oracle is engine-free: the standalone XXH64 in ``tests/oracle``
(re-derived from the public spec, parity with ``F.xxhash64`` pinned
separately) recomputes every score in pure python/numpy.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, ngrams_col, words_col


def hashed_features_col(text_col: str, bigrams: bool = True):
    """Array of xxhash64 feature hashes for a document: one per word,
    plus one per space-joined bigram (fastText's wordNgrams=2 shape)."""
    words = words_col(text_col)
    feats = F.transform(words, lambda w: F.xxhash64(w))
    if bigrams:
        bi = F.transform(
            ngrams_col(words, 2), lambda g: F.xxhash64(g)
        )
        feats = F.concat(feats, bi)
    return feats


def score_linear_model(
    df: DataFrame,
    weights: DataFrame,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clf_score",
    n_buckets: int = 1 << 15,
    bigrams: bool = True,
) -> DataFrame:
    """Append ``out_col`` = sigmoid(bias + mean feature weight) per doc.

    ``weights`` is a (bucket:long, weight:double) DataFrame — buckets not
    present are implicitly 0 (sparse models stay sparse). Documents with
    no features (empty/NULL text) score ``sigmoid(bias)``, mirroring
    fastText's empty-line behavior. The output keeps every input row and
    column — one broadcast join plus one shuffle keyed on ``id_col``.
    """
    # spread ONLY the (id, text) projection before the per-word parse — a
    # single-file input would otherwise tokenize+hash on one task (same
    # partition-starvation the dedup parsers guard against); the full row
    # set, with its other columns, never shuffles
    feats = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode_outer(hashed_features_col(text_col, bigrams)).alias("_h"),
    ).withColumn("_b", F.pmod(F.col("_h"), F.lit(n_buckets)))
    w = F.broadcast(
        weights.select(F.col("bucket").alias("_b"), F.col("weight").alias("_w"))
    )
    pooled = (
        feats.join(w, "_b", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("_h").isNotNull(), F.coalesce(F.col("_w"), F.lit(0.0)))).alias("_sum"),
            F.count(F.col("_h")).alias("_n"),
        )
        .withColumn(
            out_col,
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.lit(float(bias))
                        + F.coalesce(F.col("_sum") / F.nullif(F.col("_n"), F.lit(0)), F.lit(0.0))
                    )
                )
            ),
        )
        .select(id_col, out_col)
    )
    return df.join(pooled, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(1.0 / (1.0 + math.exp(-bias))))
    )


def demo_weights(spark, n_buckets: int = 1 << 15, scale: float = 1.0) -> DataFrame:
    """Deterministic dense 'pretrained' weight table for tests/demos:
    weight(b) = scale * (((b * 2654435761) mod 2001) - 1000) / 1000 —
    a Knuth-multiplicative spread over [-scale, scale], reproducible in
    any language without an RNG."""
    return spark.range(0, n_buckets).select(
        F.col("id").alias("bucket"),
        (
            ((F.col("id") * F.lit(2654435761)) % F.lit(2001) - F.lit(1000))
            / F.lit(1000.0)
            * F.lit(scale)
        ).alias("weight"),
    )
