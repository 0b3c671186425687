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


def train_nb_weights(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 1 << 15,
    bigrams: bool = True,
    smoothing: float = 1.0,
) -> tuple[DataFrame, float]:
    """Closed-form trainer for :func:`score_linear_model`: multinomial
    Naive Bayes log-odds over the SAME hashed word/bigram features, the
    fastText-style supervised baseline that needs no gradient loop.

    ``labeled`` carries ``label_col`` in {0, 1} (1 = keep/high-quality).
    Returns ``(weights, bias)`` ready to feed ``score_linear_model`` /
    ``corpus_job --clf-weights/--clf-bias``:

    - stored weight(b) = ``log((c1(b)+a) / (c0(b)+a))`` where ``cy(b)``
      is bucket b's occurrence count in class y and ``a`` is the
      Laplace ``smoothing``. The class totals cancel out of this CENTERED
      form, which is what makes the sparse table exact: a bucket never
      seen in training has ``c1 = c0 = 0``, weight exactly 0 — the
      missing-bucket convention of the scorer — so scoring with the
      sparse table equals scoring with the dense 2^k model bucket-for-
      bucket, independent of document length. One corner: a FEATURELESS
      doc (empty/NULL text) scores ``sigmoid(bias)`` = prior + unseen
      default — i.e. as if it held one unseen feature — rather than the
      bare prior; the constant-bias scorer cannot tell m=0 from
      all-unseen, and "empty doc ~ unknown content" is the conservative
      reading for a keep/drop gate.
    - bias = ``log(n1/n0) + log((N0 + a*B) / (N1 + a*B))`` — the doc
      prior plus the unseen-bucket default the centering removed from
      every weight (``Ny`` = total feature count in class y, ``B`` =
      ``n_buckets``).

    Under the scorer's fastText-style mean pooling the result is a
    length-normalized NB log-odds (the NB-feature linear model of
    NBSVM, Wang & Manning 2012) — per fixed length the decision is the
    exact NB posterior; across lengths it is length-invariant rather
    than length-amplified, which is what a keep/drop threshold wants.

    Plan: one narrow explode (spread like the scorer), one hash agg on
    the bucket — no shuffle wider than (distinct buckets x 2 longs). The
    only driver action is the O(1) totals row (4 longs), which also
    validates labels: non-{0,1}/NULL labels or a single-class corpus
    raise rather than silently training nonsense.
    """
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0")
    lab = F.col("_y")
    feats = _spread(
        labeled.select(
            F.col(label_col).cast("long").alias("_y"), F.col(text_col)
        )
    ).select(
        "_y",
        F.explode_outer(hashed_features_col(text_col, bigrams)).alias("_h"),
    ).withColumn("_b", F.pmod(F.col("_h"), F.lit(n_buckets)))

    tot = feats.agg(
        F.sum(F.when((lab == 1) & F.col("_h").isNotNull(), 1).otherwise(0)).alias("n1f"),
        F.sum(F.when((lab == 0) & F.col("_h").isNotNull(), 1).otherwise(0)).alias("n0f"),
        F.sum(F.when(lab.isNull() | ~lab.isin(0, 1), 1).otherwise(0)).alias("bad"),
    ).collect()[0]
    # doc-level priors need a second tiny agg on the un-exploded frame
    docs = labeled.agg(
        F.sum(F.when(F.col(label_col).cast("long") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col(label_col).cast("long") == 0, 1).otherwise(0)).alias("n0"),
    ).collect()[0]
    if tot["bad"]:
        raise ValueError(
            f"{tot['bad']} rows have labels outside {{0,1}} (or NULL)"
        )
    if not docs["n1"] or not docs["n0"]:
        raise ValueError(
            f"both classes required: n1={docs['n1']}, n0={docs['n0']}"
        )

    a, b_ = float(smoothing), float(n_buckets)
    weights = (
        feats.filter(F.col("_h").isNotNull())
        .groupBy(F.col("_b").alias("bucket"))
        .agg(
            F.sum(F.when(lab == 1, 1).otherwise(0)).alias("_c1"),
            F.sum(F.when(lab == 0, 1).otherwise(0)).alias("_c0"),
        )
        .select(
            "bucket",
            (
                F.log(F.col("_c1") + F.lit(a)) - F.log(F.col("_c0") + F.lit(a))
            ).alias("weight"),
        )
    )
    bias = math.log(docs["n1"] / docs["n0"]) + math.log(
        (tot["n0f"] + a * b_) / (tot["n1f"] + a * b_)
    )
    return weights, bias
