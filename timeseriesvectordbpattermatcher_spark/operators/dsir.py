"""DSIR-style data selection: hashed n-gram importance resampling.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", NeurIPS) selects pretraining documents that look
like a small target corpus: fit bag-of-hashed-n-gram unigram models over
a TARGET distribution ``p`` and the RAW distribution ``q``, weight every
raw document by its importance ratio ``w = p(doc)/q(doc)``, then sample
without replacement with probability proportional to ``w``. It is the
model-free sibling of the classifier gate (``operators/classifier.py``):
no labels, just two corpora.

Re-expressed on Spark with the engine's shared text machinery:

* **features** — the hashed unigram+bigram bag from
  ``lm.train_bigram_counts`` (same tokenizer as the dedup/LM family, same
  ``xxhash64 mod B`` bucket space). Train it twice: once on the target
  corpus, once on (a sample of) the raw corpus. Each is one narrow
  explode + one Exchange bounded by ``n_buckets``, and the resulting
  tables are a few MB — broadcast material.
* **log-weight scoring** (:func:`dsir_log_weight`) — per document,
  ``log w = sum_f [log p_hat(f) - log q_hat(f)]`` over every unigram and
  bigram occurrence ``f``, with add-``alpha`` smoothing over the
  ``n_buckets``-sized hashed vocabulary:
  ``p_hat(f) = (cnt_p[f] + alpha) / (N_p + alpha * B)``. The plan is one
  explode of per-doc bucket arrays, two broadcast hash joins (target and
  raw counts), and one per-doc sum that partial-aggregates to one double
  per (task, doc) — zero Python, no data-keyed shuffle besides the
  bounded per-doc mean.
* **Gumbel top-k resampling** (:func:`dsir_resample`) — sampling k items
  without replacement with probability proportional to ``w`` is exactly
  taking the top k of ``log w + Gumbel noise`` (the Gumbel-top-k trick;
  Kool et al. 2019). The noise is deterministic:
  ``g = -log(-log(u))`` with ``u`` drawn from ``xxhash64(seed, doc_id)``,
  so reruns and resumes pick the identical subset. Top-k is
  ``orderBy(key).limit(k)`` — Spark executes that as a per-partition
  heap TakeOrdered (k rows per task cross the wire, never a full sort),
  the same bounded pattern as the matcher's top-k.

At 100 TB: both count tables are bounded by ``B`` regardless of corpus
size; scoring touches each document once with broadcast lookups; the
only global step moves ``k`` rows per partition. Nothing is quadratic
and nothing collects.

Reference tie-in: the reference repo has no data-selection stage (its
corpus is price series); this belongs to the training-data-pipeline
family the engine adds on top — see SURVEY.md §2.12.

Oracle: ``tests/test_dsir.py`` recomputes counts, every per-document
log-weight, and the exact Gumbel keys in pure python over the standalone
XXH64 (``tests/oracle/xxh64_pure`` — no engine imports).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, ngrams_col, words_col
from .lm import DEFAULT_BUCKETS, _bucket

#: Hashed-uniform resolution for the Gumbel draw: 2^53 buckets keeps the
#: uniform exactly representable as a double (IEEE-754 mantissa width).
_GUMBEL_RES = 1 << 53


def dsir_log_weight(
    df: DataFrame,
    target_counts: DataFrame,
    raw_counts: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "dsir_logw",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """Append ``out_col`` = log importance weight ``log p(doc) - log q(doc)``.

    ``target_counts`` / ``raw_counts`` are :func:`lm.train_bigram_counts`
    tables over the target and raw corpora (``n_buckets`` must match the
    training value — buckets index the same hash space). Unigram and
    bigram counts merge into one bag per DSIR's formulation. ``alpha`` is
    the add-``alpha`` smoothing mass per hashed-vocabulary slot.

    Documents with no words (NULL/empty/punctuation-only text) get a NULL
    weight — an empty feature bag carries no evidence either way, and the
    NULL keeps them out of :func:`dsir_resample` by construction. Every
    input row and column survives.
    """
    words = words_col(text_col)
    feats = F.concat(
        F.transform(words, lambda t: _bucket(t, n_buckets)),
        F.transform(ngrams_col(words, 2), lambda g: _bucket(g, n_buckets)),
    )

    # spread ONLY the (id, text) projection before the per-word parse (a
    # single-file input would otherwise tokenize+hash on one task); the
    # full row set, with its other columns, never shuffles.
    ex = (
        _spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode(feats).alias("_f"))
    )

    def _model(counts: DataFrame, cnt_alias: str, tot_alias: str):
        bag = counts.select(
            F.col("bucket").alias("_f"),
            (F.col("uni") + F.col("big")).alias(cnt_alias),
        )
        tot = counts.agg(
            F.sum(F.col("uni") + F.col("big")).alias(tot_alias)
        )
        return F.broadcast(bag), F.broadcast(tot)

    p_bag, p_tot = _model(target_counts, "_cp", "_np")
    q_bag, q_tot = _model(raw_counts, "_cq", "_nq")

    j = ex.join(p_bag, "_f", "left").join(q_bag, "_f", "left")
    # the two 1-row totals ride in as broadcast cross joins — collect-free.
    j = j.crossJoin(p_tot).crossJoin(q_tot)

    denom = F.lit(float(alpha) * n_buckets)
    log_p = F.log(F.coalesce(F.col("_cp"), F.lit(0)) + F.lit(alpha)) - F.log(
        F.col("_np") + denom
    )
    log_q = F.log(F.coalesce(F.col("_cq"), F.lit(0)) + F.lit(alpha)) - F.log(
        F.col("_nq") + denom
    )

    per_doc = (
        j.select(F.col(id_col), (log_p - log_q).alias("_t"))
        .groupBy(id_col)
        .agg(F.sum("_t").alias(out_col))
    )
    return df.join(per_doc, id_col, "left")


def gumbel_key_col(
    logw_col: str, id_col: str, seed: int
):
    """The Gumbel-top-k sort key expression: ``logw - log(-log(u))`` with
    ``u`` a deterministic hashed uniform in (0, 1) drawn from
    ``xxhash64(seed, id)``. Exposed separately so tests and incremental
    consumers can pin the exact key."""
    u = (
        F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(_GUMBEL_RES))
        + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_RES))
    return F.col(logw_col) - F.log(-F.log(u))


def dsir_resample(
    df: DataFrame,
    k: int,
    *,
    logw_col: str = "dsir_logw",
    id_col: str = "doc_id",
    seed: int = 0,
    key_out_col: str = "dsir_key",
) -> DataFrame:
    """Select ``k`` documents without replacement with probability
    proportional to ``exp(logw_col)`` — the Gumbel-top-k trick, fully
    deterministic in ``seed``.

    Rows with a NULL log-weight (no-word documents from
    :func:`dsir_log_weight`) are excluded — they carry no evidence and a
    NULL sort key would order arbitrarily. The returned frame keeps every
    input column plus ``key_out_col`` (the realized Gumbel key, useful
    for auditing the draw), ordered by the key descending.

    Scale: ``orderBy + limit`` executes as TakeOrdered — each task keeps
    a k-row heap and ships only that; no global sort materializes.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key = gumbel_key_col(logw_col, id_col, seed)
    return (
        df.filter(F.col(logw_col).isNotNull())
        .withColumn(key_out_col, key)
        .orderBy(F.col(key_out_col).desc())
        .limit(k)
    )
