"""Hashed bigram language-model perplexity — the CCNet-style LM gate.

CCNet (Wenzek et al. 2020) filters web text by the perplexity of a
language model trained on a trusted reference corpus (they use KenLM on
Wikipedia); low-perplexity documents read like the reference, very high
perplexity flags gibberish, boilerplate, and wrong-language text that
heuristics miss. This module is that gate re-expressed as two pure
DataFrame plans — a one-shuffle count trainer and a broadcast-join
scorer — with the LM simplified to a *hashed interpolated bigram* model
so the whole thing stays JVM-side and byte-reproducible:

    p_uni(w)      = (uni[h(w)] + 1) / (N + B)                (add-one)
    p(w | v)      = lam * min(big[h(v w)] / uni[h(v)], 1)
                    + (1 - lam) * p_uni(w)                   (Jelinek-Mercer)
    ppl(doc)      = exp( - mean_i log p_i )   (first word scored by p_uni)

where ``h`` is ``xxhash64 mod B`` over the engine's word normalizer
(``dedup.words_col`` — same tokenizer as the dedup/classifier family),
``N`` = total reference tokens and ``B`` = ``n_buckets``. Hashing makes
the model a fixed-size table regardless of reference vocabulary: bucket
collisions merge counts, so the bigram ratio is capped at 1 (collision
mass could otherwise push it above — the cap keeps every log argument in
(0, 1]).

Plan shape at 100 TB:

* **train** — one narrow explode of per-row hash arrays (unigram and
  bigram streams concatenated pre-explode, tagged by kind) into a single
  hash aggregation keyed on the bucket. Map-side partial combine ships at
  most ``B`` rows per task; the one Exchange is bounded by ``B``
  (default 2^18), not by the corpus.
* **score** — the counts table is a few MB, so all three probability
  lookups (current-word unigram, previous-word context count, bigram)
  are broadcast hash joins against the exploded (doc, position) stream;
  the only shuffle keyed on data is the per-doc mean, which partial-
  aggregates to two doubles per (task, doc). No Python anywhere.

**The reference corpus must be held out from the corpus being scored.**
A bigram count model trained on the scored corpus itself contains every
document's own bigrams — a one-off gibberish doc whose bigrams appear
nowhere else gets ratio ``1/1`` at every position and scores
``ppl ~ 1/lam``, i.e. *better* than real text. CCNet trains on Wikipedia
for exactly this reason; ``corpus_job --max-ppl`` refuses to run without
an external ``--lm-ref``.

The oracle is engine-free: ``tests/oracle/xxh64_pure`` (standalone XXH64
from the public spec) recomputes counts and every document score in pure
python (tests/test_lm.py).

Reference tie-in: the reference repo has no LM gate (its corpus is price
series, not text); this belongs to the training-data-pipeline family the
engine adds on top — see SURVEY.md §2.12 and ``scripts/corpus_job.py``
(``--lm-ref`` / ``--max-ppl``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, ngrams_col, words_col

#: Default hash-bucket count — 2^18 buckets keeps the counts table ~6 MB
#: (bucket + two longs) while collisions stay rare for a reference corpus
#: of Wikipedia scale (~100M distinct uni+bigrams would load ~400x, so
#: raise B for such corpora; the table is broadcast either way).
DEFAULT_BUCKETS = 1 << 18


def _bucket(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets))


def train_bigram_counts(
    ref: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Count hashed unigrams and bigrams of a reference corpus.

    Returns a (``bucket:long``, ``uni:long``, ``big:long``) DataFrame —
    the entire LM. Both n-gram orders share one bucket space but count
    into separate columns, so a unigram can never contaminate a bigram
    ratio. One narrow projection + one Exchange keyed on the bucket
    (bounded by ``n_buckets``); NULL/empty/punctuation-only reference
    rows contribute nothing.
    """
    words = words_col(text_col)
    uni_stream = F.transform(
        words,
        lambda t: F.struct(
            _bucket(t, n_buckets).alias("b"), F.lit(0).alias("k")
        ),
    )
    big_stream = F.transform(
        ngrams_col(words, 2),
        lambda g: F.struct(
            _bucket(g, n_buckets).alias("b"), F.lit(1).alias("k")
        ),
    )
    return (
        ref.select(F.explode(F.concat(uni_stream, big_stream)).alias("_e"))
        .groupBy(F.col("_e.b").alias("bucket"))
        .agg(
            F.sum(F.when(F.col("_e.k") == 0, 1).otherwise(0)).alias("uni"),
            F.sum(F.when(F.col("_e.k") == 1, 1).otherwise(0)).alias("big"),
        )
    )


def add_perplexity(
    df: DataFrame,
    counts: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "ppl",
    n_buckets: int = DEFAULT_BUCKETS,
    lam: float = 0.9,
) -> DataFrame:
    """Append ``out_col`` = hashed-bigram perplexity per document.

    ``counts`` is the :func:`train_bigram_counts` table (``n_buckets``
    must match its training value — buckets are positions in the same
    hash space). ``lam`` is the Jelinek-Mercer weight on the bigram term.
    Documents with no words (NULL/empty/punctuation-only text) get a NULL
    perplexity — a downstream ``ppl <= max`` filter drops them and a
    null-inclusive ``~(ppl <= max)`` counts them (corpus_job does both).
    Every input row and column survives.
    """
    words = words_col(text_col)
    pair_t = "array<struct<cur:string,prev:string>>"
    pairs = F.when(
        F.size(words) > 0,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 1),
            lambda i: F.struct(
                F.get(words, i).alias("cur"),
                F.when(i > 0, F.get(words, i - 1)).alias("prev"),
            ),
        ),
    ).otherwise(F.array().cast(pair_t))

    # spread ONLY the (id, text) projection before the per-word parse —
    # a single-file input would otherwise tokenize+hash on one task (the
    # two-scale probe read a 10x corpus FASTER than the unspread small
    # one); the full row set, with its other columns, never shuffles
    ex_src = _spread(df.select(F.col(id_col), F.col(text_col)))
    ex = ex_src.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        id_col,
        _bucket(F.col("_p.cur"), n_buckets).alias("_bu"),
        F.when(
            F.col("_p.prev").isNotNull(), _bucket(F.col("_p.prev"), n_buckets)
        ).alias("_bp"),
        F.when(
            F.col("_p.prev").isNotNull(),
            _bucket(
                F.concat_ws(" ", F.col("_p.prev"), F.col("_p.cur")), n_buckets
            ),
        ).alias("_bb"),
    )

    cu = F.broadcast(
        counts.select(F.col("bucket").alias("_bu"), F.col("uni").alias("_cu"))
    )
    cp = F.broadcast(
        counts.select(F.col("bucket").alias("_bp"), F.col("uni").alias("_cp"))
    )
    cb = F.broadcast(
        counts.select(F.col("bucket").alias("_bb"), F.col("big").alias("_cb"))
    )
    # total reference tokens: a 1-row agg of the (tiny, broadcast) counts
    # table cross-joined in — keeps the plan collect-free.
    tot = F.broadcast(counts.agg(F.sum("uni").alias("_N")))

    j = (
        ex.join(cu, "_bu", "left")
        .join(cp, "_bp", "left")
        .join(cb, "_bb", "left")
        .crossJoin(tot)
    )
    p_uni = (F.coalesce(F.col("_cu"), F.lit(0)) + F.lit(1)) / (
        F.col("_N") + F.lit(n_buckets)
    )
    ratio = F.when(
        F.coalesce(F.col("_cp"), F.lit(0)) > 0,
        F.least(
            F.coalesce(F.col("_cb"), F.lit(0)) / F.col("_cp"), F.lit(1.0)
        ),
    ).otherwise(F.lit(0.0))
    logp = F.when(F.col("_bp").isNull(), F.log(p_uni)).otherwise(
        F.log(F.lit(lam) * ratio + F.lit(1.0 - lam) * p_uni)
    )

    per_doc = (
        j.select(F.col(id_col), logp.alias("_lp"))
        .groupBy(id_col)
        .agg(F.exp(-F.avg("_lp")).alias(out_col))
    )
    return df.join(per_doc, id_col, "left")


def ppl_buckets(
    df: DataFrame,
    *,
    ppl_col: str = "ppl",
    by: str | None = None,
    weight_col: str | None = None,
    cuts: tuple[float, float] = (1 / 3, 2 / 3),
    out_col: str = "ppl_bucket",
    id_col: str = "doc_id",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Append CCNet's head/middle/tail split (Wenzek et al. 2020 §4.4):
    per group (``by``, e.g. the language — None = whole corpus), order
    documents by perplexity and cut the cumulative ``weight_col`` mass
    (None = each doc counts 1; CCNet weights by size, pass a token
    count) at ``cuts``. The lowest-perplexity third is ``head`` — most
    like the reference corpus — then ``middle``, then ``tail``; CCNet
    keeps head+middle for training. NULL perplexity -> NULL bucket.

    A document straddling a boundary goes to the bucket where its mass
    BEGINS (cumulative mass *excluding itself* is compared against the
    cut — so each group's lowest-perplexity doc is always ``head``), and
    equal perplexities break ties by ``id_col`` — both choices pinned in
    the DuckDB oracle so the split is byte-deterministic.

    Two physical strategies:

    * ``exact=True`` (the CCNet-fidelity mode): one window over
      ``partitionBy(by) orderBy(ppl, id)`` — a per-group sort. Right for
      bounded corpora and oracles; at 100 TB a single language can be
      half the corpus and would land on ONE task, so use
    * ``exact=False`` (the scale mode): two cut points per group from
      ``percentile_approx(ppl, cuts, accuracy)`` — one bounded agg
      (2 doubles per group), broadcast back, bucket by comparison in a
      narrow projection. Unweighted (``weight_col`` must be None) and
      approximate at the boundary; agreement with the exact mode on
      well-separated corpora is pinned in tests/test_lm.py.
    """
    from pyspark.sql import Window

    c1, c2 = cuts
    if not (0 < c1 < c2 < 1):
        raise ValueError(f"cuts must satisfy 0 < c1 < c2 < 1, got {cuts}")
    ppl = F.col(ppl_col)
    keys = [by] if by else []
    if exact:
        w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
        win = Window.partitionBy(*keys).orderBy(
            F.col(ppl_col).asc(), F.col(id_col).asc()
        )
        # NULL ppl rows are excluded from both the running and the total
        # mass so they can't shift anyone's bucket
        mass = F.when(ppl.isNotNull(), w).otherwise(F.lit(0.0))
        before = F.sum(mass).over(win) - mass
        tot = F.sum(mass).over(Window.partitionBy(*keys))
        bucket = F.when(ppl.isNull(), F.lit(None).cast("string")).otherwise(
            F.when(before < tot * c1, "head")
            .when(before < tot * c2, "middle")
            .otherwise("tail")
        )
        return df.withColumn(out_col, bucket)
    if weight_col is not None:
        raise ValueError("weight_col needs exact=True (approx percentile "
                         "is unweighted)")
    agg = df.filter(ppl.isNotNull())
    qs = agg.groupBy(*keys).agg(
        F.percentile_approx(ppl, list(cuts), accuracy).alias("_q")
    )
    qs = F.broadcast(
        qs.select(*keys, F.get("_q", 0).alias("_q1"), F.get("_q", 1).alias("_q2"))
    )
    joined = df.join(qs, keys, "left") if keys else df.crossJoin(qs)
    bucket = F.when(ppl.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(ppl <= F.col("_q1"), "head")
        .when(ppl <= F.col("_q2"), "middle")
        .otherwise("tail")
    )
    return joined.withColumn(out_col, bucket).drop("_q1", "_q2")
