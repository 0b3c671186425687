"""Deduplication operators for large-scale training-data pipelines.

Five strategies over a ``documents(doc_id, text, ...)`` corpus, each chosen
for a different scale/recall trade-off at 100 TB:

- ``exact_dedup``           hash-groupBy; one shuffle on a 16-byte digest.
- ``ngram_jaccard_pairs``   exact n-gram Jaccard via self-join on shingles —
                            quadratic in the worst case, meant for verifying
                            candidates or small corpora; fully SQL-expressible
                            (the DuckDB oracle runs the same query).
- ``minhash_lsh_pairs``     shingle -> k minhashes -> b bands -> bucket
                            self-join: candidates only collide within a band
                            bucket, so the join is linear-ish in practice.
                            Collisions are verified by signature-estimated Jaccard.
- ``simhash_pairs``         64-bit SimHash + banded Hamming lookup.
- (embedding near-dup lives in operators/similarity.py — cosine ≥ τ pairs.)

All hashing is ``xxhash64``.  Shingle strings are hashed JVM-side
(codegen'd, one pass); the per-permutation re-mix + min runs either as pure
expressions (``engine="expr"``: ``array_min(transform(_h, h ->
xxhash64(h, seed_i)))``) or — the default — as a vectorized numpy kernel
over Arrow batches that reproduces Spark's xxhash64 bit-exactly
(``functions/xxhash.py``), because Catalyst evaluates nested HOF lambdas
interpreted, one Python-free but slow tree-walk per element per perm.

Dedup keeps the lexicographically smallest doc_id of each duplicate group —
mirroring the reference's keep-first convention in its result dedupe
(/root/reference/opkatsPatternMatcherUtil.py:182-195).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# tokenization / shingling (shared, pure Spark expressions)
# --------------------------------------------------------------------------


def words_col(text_col: str = "text"):
    """Lowercased alphanumeric word array."""
    cleaned = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "))
    return F.when(cleaned == "", F.array().cast("array<string>")).otherwise(
        F.split(cleaned, " ")
    )


def ngrams_col(words, n: int = 3):
    """Word n-gram array from a words array column (JVM-side)."""
    return F.when(F.size(words) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition the INPUT to cluster parallelism BEFORE an expensive
    per-row parse — a single-file input (one partition) would otherwise run
    the regexp/shingle/hash work on one task regardless of cores (measured
    ~6x on the sf0.1 documents table)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


#: Session conf key selecting how intermediates are materialized:
#: ``auto`` (default) = localCheckpoint on ``local[...]`` masters, reliable
#: ``checkpoint`` everywhere else; ``local`` / ``durable`` force one mode.
MATERIALIZE_CONF = "spark.timeseriesvectordbpattermatcher.materialize"


def _materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute an intermediate once: Catalyst does NOT share
    subtrees across self-join branches, so the expensive text-parse would
    re-run once per branch (up to ~6x in the prefix-filtered jaccard plan).
    Checkpointing computes the partitions once and truncates lineage so
    every downstream branch reads the materialized blocks. Measured
    (sf0.1 jaccard, round 3): 4.4 s materialized vs ~18 s with the shingle
    parse re-running per branch.

    Mode (``MATERIALIZE_CONF``, default ``auto``):

    - ``local``: ``localCheckpoint`` — fastest (executor block store), but
      NOT fault-tolerant: an executor loss makes the blocks unrecoverable
      and fails the job. Correct default only for ``local[...]`` masters,
      where driver and executor share one process anyway.
    - ``durable``: reliable ``checkpoint`` — partitions are written to the
      configured ``sparkContext.setCheckpointDir`` (shared storage on a
      real cluster), surviving executor loss. ``auto`` picks this on any
      non-local master; raises up front with guidance when no checkpoint
      dir is configured rather than failing mid-job.
    """
    spark = df.sparkSession
    mode = (spark.conf.get(MATERIALIZE_CONF, "auto") or "auto").lower()
    master = spark.conf.get("spark.master", "") or ""
    if mode not in ("auto", "local", "durable"):
        raise ValueError(f"{MATERIALIZE_CONF} must be auto|local|durable, got {mode!r}")
    if mode == "local" or (mode == "auto" and master.startswith("local")):
        return df.localCheckpoint(eager=True)
    if spark.sparkContext.getCheckpointDir() is None:
        raise ValueError(
            "durable materialization needs spark.sparkContext.setCheckpointDir "
            "on shared storage (HDFS/S3/DBFS): localCheckpoint blocks do not "
            f"survive executor loss on master {master!r}. Set it, or force "
            f"{MATERIALIZE_CONF}=local if you accept job restarts."
        )
    return df.checkpoint(eager=True)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id row of every exact-content group.

    The dedup DECISION shuffles md5(text) + id only (16 bytes/row
    regardless of document size, map-side partial_min — pinned by
    tests/test_plans.py::test_exact_dedup_shuffles_digest_not_text); the
    survivor rows are then recovered with an id semi join, the one
    shuffle that carries text — elidable at scale by bucketing the
    corpus on the id column.

    NULL texts are NOT duplicates of each other (md5(NULL) is NULL and
    groupBy equates NULL keys, which would collapse every unparsed doc
    into one survivor) — null-text rows pass through untouched, matching
    the minhash/simhash operators' null handling.
    """
    digest = F.md5(F.col(text_col))
    survivors = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), digest.alias("_h"))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.filter(F.col(text_col).isNull()).unionByName(
        df.join(survivors, id_col, "left_semi")
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs (oracle-friendly)
# --------------------------------------------------------------------------


def _ordered_prefix_stream(
    grams: DataFrame,
    threshold: float,
    prefix_k: int,
    id_col: str,
    materialize: bool,
):
    """(doc_ord, prefix) for the AllPairs/PPJoin candidate join.

    ``grams`` is the exploded (id, ng) stream of per-doc DISTINCT hashed
    n-grams. Returns ``doc_ord`` — one row per doc with the full
    frequency-ordered gram array ``_arr`` and its size ``_sz`` — and
    ``prefix`` — the exploded candidate stream restricted to each doc's
    k-extended AllPairs prefix, carrying (_sz, _omin, _pos) for the
    positional and k-count filters downstream.

    Factored out of :func:`ngram_jaccard_pairs` so skew probes can measure
    the candidate stream the join actually sees (hot-gram suppression,
    per-gram fanout) without duplicating the construction.

    One groupBy(doc) builds BOTH the frequency-ordered gram array (whose
    leading slice is the AllPairs prefix, with positions = array index)
    AND the verify-step gram array — the former per-doc window sort
    (an extra full shuffle + sort of the gram stream) and the separate
    collect_list pass for verify arrays collapsed into this single agg
    (sf0.1 documents corpus, same host window: best-of-5 3.8 s -> 2.9 s,
    and one fewer gram-stream shuffle + two fewer checkpoint barriers at
    scale). array_sort on struct(_dfg, ng) is the same (doc-frequency,
    hash) total order the window used; ng is distinct per doc, so the
    order is deterministic.
    """
    dfreq = grams.groupBy("ng").agg(F.count("*").alias("_dfg"))
    doc_ord = (
        grams.join(dfreq, "ng")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("_dfg", "ng"))).alias("_ords"))
        .select(
            id_col,
            F.transform("_ords", lambda s: s["ng"]).alias("_arr"),
            F.size("_ords").alias("_sz"),
        )
    )
    if materialize:
        # doc_ord sits under all four self-join branches (candidate a/b +
        # verify a/b); without this the doc-frequency agg + join + agg
        # re-runs per branch — Catalyst does not CSE across aliases. Same
        # rationale as the per_doc checkpoint in ngram_jaccard_pairs, one
        # level higher.
        doc_ord = _materialize(doc_ord)
    # minimal qualifying overlap o_min = smallest integer o with o/sz >= t
    # IN THE VERIFY STEP'S OWN DOUBLE ARITHMETIC (a pair at the boundary has
    # |B| = o and jaccard exactly o/sz). A bare ceil(t*sz) inflates at
    # exact-integer products (0.3*10 = 3.0000000000000004 -> ceil 4), which
    # SHORTENS the prefix by one gram and silently drops exact-threshold
    # pairs — the same FP class the positional filter below was fixed for.
    # The ±1 correction around the FP ceil makes the bound verify-exact.
    approx = F.ceil(F.lit(threshold) * F.col("_sz"))
    o_min = (
        F.when((approx - 1) / F.col("_sz") >= threshold, approx - 1)
        .when(approx / F.col("_sz") >= threshold, approx)
        .otherwise(approx + 1)
    )
    # k-extended AllPairs prefix (k = prefix_k): length sz - o_min + k,
    # capped at sz. Generalized prefix theorem: list the shared grams of a
    # qualifying pair in the global (frequency, hash) order as x1 < x2 < ...;
    # xi sits in doc A's EXTENDED prefix whenever at least sz_a - len_a =
    # o_a - k of A's grams lie above it, and the shared grams above xi
    # already number inter - i >= o_a - i >= o_a - k for i <= k (inter >=
    # o_a for a qualifying pair). So the k smallest shared grams land in
    # BOTH extended prefixes, and requiring >= min(k, o_min_a, o_min_b)
    # shared prefix grams per candidate pair is lossless (the min() handles
    # tiny docs whose guaranteed overlap is below k). Each +1 of k grows
    # the prefix stream by ~|docs| rows but multiplies the rarity of chance
    # collisions: measured on the sf1 documents corpus (t=0.25, 3-grams),
    # k=1 -> 6.81M candidate pairs, k=2 -> 466k (14.6x fewer), exact
    # verification 6.75 s -> 0.77 s, identical output pairs.
    prefix = (
        doc_ord.select(
            id_col,
            "_sz",
            o_min.alias("_omin"),
            F.posexplode(
                F.slice(
                    "_arr",
                    F.lit(1),
                    F.greatest(
                        F.least(F.col("_sz") - o_min + prefix_k, F.col("_sz")),
                        F.lit(0),
                    ),
                )
            ).alias("_pos0", "ng"),
        )
        .withColumn("_pos", F.col("_pos0") + 1)  # 1-based rank, as before
        .drop("_pos0")
    )
    return doc_ord, prefix


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_filter: bool = True,
    materialize: bool = True,
    prefix_k: int = 2,
) -> DataFrame:
    """All (doc_a < doc_b) pairs with Jaccard(ngram-set) >= threshold. Exact.

    ``prefix_filter=False`` is the classic shingle self-join: explode
    distinct n-grams, join on the n-gram, count intersections. Its join
    output is sum over grams of d_g^2/2 (d_g = docs containing gram g) —
    quadratic in the hottest gram's document frequency, which is exactly
    what blows up on near-natural-language corpora.

    ``prefix_filter=True`` (default) is the AllPairs/PPJoin prefix filter
    (Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06): order grams by
    global (doc-frequency, hash) ascending and keep only each doc's first
    ``sz - ceil(t*sz) + 1`` grams for candidate generation. Any pair with
    Jaccard >= t MUST share a prefix gram under a common total order, so the
    candidate set is a superset of the answer (lossless); candidates are
    verified exactly with ``array_intersect`` on the full gram sets. Hot
    grams are by construction high-frequency, i.e. LAST in the order — they
    drop out of the candidate join, killing the d_g^2 term. Candidates are
    additionally pruned with PPJoin's positional filter (Xiao et al.,
    WWW'08) before the verify join — see the inline bound derivation.

    ``prefix_k`` (default 2) extends each prefix by ``k-1`` grams and
    requires candidate pairs to share ``>= min(k, o_min_a, o_min_b)``
    prefix grams — the k-generalized prefix theorem (lossless; proof at
    the prefix construction below). At low thresholds, where prefixes
    cover most of each doc and single-gram chance collisions dominate,
    this is the filter that actually bites: measured 14.6x fewer
    candidates at t=0.25 on the sf1 documents corpus. ``prefix_k=1`` is
    the classic filter.
    """
    if prefix_k < 1:
        raise ValueError(f"prefix_k must be >= 1, got {prefix_k}")
    # join on a 64-bit shingle hash, not the string: shuffle rows shrink to
    # (hash, doc_id) and the join key compare is a long compare. Collisions
    # would need two distinct shingles in the corpus sharing an xxhash64
    # (~n^2/2^65 — immaterial); the per-doc set size uses the same hashed
    # space so intersection/union stay consistent.
    df = _spread(df)  # parallelize the parse regardless of materialization
    # no empty/null-gram filter here: explode() below drops those rows for
    # free, and a filter on the array expr makes Catalyst push it below the
    # projection, re-evaluating the whole parse per row (measured ~10x on
    # the materialization job)
    per_doc = df.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(ngrams_col(words_col(text_col), n), lambda g: F.xxhash64(g))
        ).alias("_grams"),
    )
    if materialize:
        per_doc = _materialize(per_doc)
    grams = per_doc.select(id_col, F.explode("_grams").alias("ng"))
    if not prefix_filter:
        sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
        a = grams.alias("a")
        b = grams.alias("b")
        inter = (
            a.join(b, (F.col("a.ng") == F.col("b.ng")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
            .agg(F.count("*").alias("inter"))
        )
        sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
        sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
        return (
            inter.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )

    doc_ord, prefix = _ordered_prefix_stream(
        grams, threshold, prefix_k, id_col, materialize
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin positional filter (Xiao et al., WWW'08): a shared gram at
    # 1-based ranks (pa, pb) of the common frequency order bounds the true
    # overlap by min(pa,pb) + min(sza-pa, szb-pb) — elements before the
    # gram contribute at most min(pa,pb) matches, elements after at most
    # min of the remainders. Jaccard >= t needs overlap >= t/(1+t)*(sza+szb),
    # so any pair whose TIGHTEST per-gram bound falls short is pruned
    # before the (expensive) exact array_intersect verify. Lossless:
    # the bound is an upper bound on overlap for every shared gram.
    ub = F.least(F.col("a._pos"), F.col("b._pos")) + F.least(
        F.col("a._sz") - F.col("a._pos"), F.col("b._sz") - F.col("b._pos")
    )
    # AllPairs length filter (Bayardo et al. companion bound), applied IN
    # the candidate join condition so incompatible sizes never reach the
    # groupBy shuffle: overlap <= min(sza, szb), so the best achievable
    # jaccard is min/(sza+szb-min) — below t, the pair cannot qualify.
    # Same verify-step arithmetic as the other bounds (J(x) = x/(s-x)
    # monotone), so the filter is lossless at FP threshold boundaries.
    # Measured on the sf0.1 documents corpus (t=0.3, 3-grams): candidate
    # join output 696k -> 642k rows (-7.7%) feeding the min/first agg — a
    # modest cut there because the prefix filter already suppresses most
    # size-skewed pairs, but it is free (no extra shuffle; evaluated inside
    # the join's row match) and grows with corpus length variance.
    least_sz = F.least(F.col("a._sz"), F.col("b._sz"))
    size_ok = (
        least_sz / (F.col("a._sz") + F.col("b._sz") - least_sz) >= F.lit(threshold)
    )
    cands = (
        a.join(
            b,
            (F.col("a.ng") == F.col("b.ng"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & size_ok,
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("_nshared"),
            F.min(ub).alias("_ub"),
            F.first("a._sz").alias("_sza"),
            F.first("b._sz").alias("_szb"),
            F.first("a._omin").alias("_omina"),
            F.first("b._omin").alias("_ominb"),
        )
        .filter(
            # k-prefix count filter (see prefix construction above) ...
            (
                F.col("_nshared")
                >= F.least(F.lit(prefix_k), F.col("_omina"), F.col("_ominb"))
            )
            # ... and the positional bound, compared in the SAME arithmetic
            # as the verify step's jaccard (J(x) = x/(s-x) is monotone in x,
            # so ub >= overlap gives J(ub) >= J(overlap)); the algebraic
            # form t/(1+t)*s suffers FP rounding that pruned
            # exact-threshold pairs (e.g. t=0.4, s=7:
            # 0.4/1.4*7 = 2.0000000000000004 > the true bound 2)
            & (
                F.col("_ub") / (F.col("_sza") + F.col("_szb") - F.col("_ub"))
                >= F.lit(threshold)
            )
        )
        .select("doc_a", "doc_b")
    )
    # candidate rows are tiny in bytes but heavy in downstream compute
    # (array_intersect per pair) — AQE would coalesce them to a handful of
    # tasks on byte size alone; spread them across the cluster explicitly
    cands = cands.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "doc_a"
    )
    # exact verification: sorted gram arrays per doc, JVM-side intersect
    # verify arrays come from the SAME materialized doc_ord — no second
    # collect_list pass over the gram stream (array_intersect is
    # order-insensitive, so frequency order serves as well as value order).
    # In lazy mode doc_ord would re-run its dfreq agg + join per verify
    # branch, so a plain collect_list over grams is the cheaper subtree.
    if materialize:
        arrs = doc_ord.select(id_col, F.col("_arr").alias("arr"))
    else:
        arrs = grams.groupBy(id_col).agg(F.collect_list("ng").alias("arr"))
    va = arrs.select(F.col(id_col).alias("doc_a"), F.col("arr").alias("arr_a"))
    vb = arrs.select(F.col(id_col).alias("doc_b"), F.col("arr").alias("arr_b"))
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    union = F.size("arr_a") + F.size("arr_b") - inter
    return (
        cands.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signature(df: DataFrame, num_perm: int = 32, n: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      seed: int = 7, engine: str = "arrow") -> DataFrame:
    """(doc_id, minhash array<long>) — one xxhash64 min per permutation.

    The shingle array is materialized ONCE (Catalyst does not CSE the
    ngram subtree across the num_perm expressions — inlining it made this
    32x more expensive), and each shingle is pre-hashed once; permutations
    re-mix the single base hash instead of re-hashing the string.

    ``engine``:

    - ``"arrow"`` (default): the string shingles are still hashed JVM-side
      (one codegen'd pass), but the ``num_perm`` re-mixes + per-doc mins run
      as numpy kernels over Arrow batches.  The expression plan evaluates
      the per-permutation ``transform`` lambdas with the *interpreted*
      higher-order-function path — measured ~12 s of the sf0.1 minhash run
      for 7.7M shingles x 32 perms vs <1 s vectorized.  Signatures are
      bit-identical to the expr engine (``functions/xxhash.py`` reproduces
      Spark's xxhash64 chaining exactly; parity is pinned in tests).
    - ``"expr"``: pure Catalyst expressions, fully JVM-side; the shape the
      DuckDB-free plan tests reason about and the fallback if an Arrow
      boundary is unwanted in a larger pipeline.
    """
    if not (-(2**31) <= seed and seed + num_perm - 1 <= 2**31 - 1):
        # F.lit(seed + p) must stay an int32 literal: past that Spark
        # silently switches the constant to the 8-byte hashLong kernel,
        # and the arrow engine (which emulates the 4-byte hashInt path)
        # would diverge bit-for-bit from the expr plan
        raise ValueError(
            f"minhash seed range [{seed}, {seed + num_perm - 1}] must fit int32"
        )
    base = df.select(
        F.col(id_col),
        F.transform(
            F.array_distinct(ngrams_col(words_col(text_col), n)),
            lambda s: F.xxhash64(s, F.lit(seed)),
        ).alias("_h"),
    )
    if engine == "expr":
        sig = F.array(
            *[
                F.array_min(F.transform(F.col("_h"), lambda h: F.xxhash64(h, F.lit(seed + p))))
                for p in range(num_perm)
            ]
        )
        return (
            base.withColumn("n_shingles", F.size("_h"))
            .filter(F.col("n_shingles") > 0)
            .select(id_col, "n_shingles", sig.alias("minhash"))
        )
    if engine != "arrow":
        raise ValueError(f"unknown minhash engine {engine!r}")
    return _minhash_signature_arrow(base, num_perm=num_perm, seed=seed, id_col=id_col)


def _minhash_signature_arrow(base: DataFrame, num_perm: int, seed: int,
                             id_col: str) -> DataFrame:
    """mapInArrow stage: (id, _h array<long>) -> (id, n_shingles, minhash).

    Per batch: one vectorized ``hashLong(h, 42)`` over every shingle hash
    (shared by all permutations), then per permutation a constant-key
    ``hashInt`` re-mix + ``np.minimum.reduceat`` over the list offsets.
    Offsets are sliced/rebased before reducing and segments of dropped
    (null/empty) docs are compacted away when they span a nonzero extent,
    so sliced ListArrays cannot leak foreign values into a doc's min."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            base.schema[id_col],
            T.StructField("n_shingles", T.IntegerType()),
            T.StructField("minhash", T.ArrayType(T.LongType())),
        ]
    )

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        from timeseriesvectordbpattermatcher_spark.functions.xxhash import (
            _SPARK_SEED,
            xxh64_int_const,
            xxh64_long,
        )

        for b in batches:
            ids, hs = b.column(0), b.column(1)
            offs = np.asarray(hs.offsets, dtype=np.int64)
            if len(offs) < 2:
                continue
            starts, ends = offs[:-1] - offs[0], offs[1:] - offs[0]
            vals = np.asarray(hs.values, dtype=np.int64)[offs[0]: offs[-1]]
            lengths = ends - starts
            nulls = np.asarray(hs.is_null(), dtype=bool)
            keep = (~nulls) & (lengths > 0)
            if not keep.any():
                continue
            dropped_extent = lengths[~keep].sum()
            if dropped_extent:
                # a dropped slot owns values (sliced/offset-sharing array):
                # gather only kept segments so reduceat boundaries stay exact
                sel = np.repeat(keep, lengths)
                vals = vals[sel]
                kept_len = lengths[keep]
                bounds = np.zeros(len(kept_len), dtype=np.int64)
                np.cumsum(kept_len[:-1], out=bounds[1:])
            else:
                bounds = starts[keep]
            inner = xxh64_long(vals.view(np.uint64), _SPARK_SEED)
            nk = int(keep.sum())
            sig = np.empty((nk, num_perm), dtype=np.int64)
            for p in range(num_perm):
                mixed = xxh64_int_const(seed + p, inner).view(np.int64)
                sig[:, p] = np.minimum.reduceat(mixed, bounds)
            idx = np.flatnonzero(keep)
            mh = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (nk + 1) * num_perm, num_perm, dtype=np.int32)),
                pa.array(sig.reshape(-1)),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(idx)),
                    pa.array(lengths[keep].astype(np.int32)),
                    mh,
                ],
                names=[id_col, "n_shingles", "minhash"],
            )

    return base.mapInArrow(gen, out_schema)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
    verify: bool = True,
    materialize: bool = True,
    engine: str = "arrow",
) -> DataFrame:
    """LSH candidate generation + signature-estimated-Jaccard verification
    (matches/num_perm — probabilistic, NOT the exact gram-set Jaccard;
    precision-sensitive dedup should use ngram_jaccard_pairs).

    b bands of r = num_perm/b rows; a pair collides if any band's slice of
    the signatures hashes equal. With b=8, r=4 the collision curve crosses
    ~(1/b)^(1/r) ≈ 0.59 — tune (bands, num_perm) to the target threshold.
    At scale the band self-join shuffles only (band_id, band_hash, doc_id).

    ``materialize=False`` keeps the plan lazy (no eager localCheckpoint —
    the signature subtree re-runs per self-join branch, but nothing blocks
    fault tolerance on a real cluster; swap in a durable table write there).
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs = minhash_signature(_spread(df), num_perm=num_perm, n=n, text_col=text_col,
                             id_col=id_col, seed=seed, engine=engine)
    if materialize:
        sigs = _materialize(sigs)
    band_rows = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("minhash").getItem(bi * r + j) for j in range(r)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "b.band", "b.bh")
    a, b_ = band_rows.alias("a"), band_rows.alias("b")
    cands = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    if not verify:
        return cands
    # verification via the signature-ESTIMATED jaccard (matches/num_perm)
    sa = sigs.select(F.col(id_col).alias("doc_a"), F.col("minhash").alias("mh_a"))
    sb = sigs.select(F.col(id_col).alias("doc_b"), F.col("minhash").alias("mh_b"))
    est = (
        F.size(F.filter(F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda v: v))
        / F.lit(float(num_perm))
    )
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard_est", est)
        .filter(F.col("jaccard_est") >= threshold)
        .select("doc_a", "doc_b", "jaccard_est")
    )


def minhash_lsh_dedup(
    df: DataFrame, threshold: float = 0.5, id_col: str = "doc_id",
    max_iters: int = 20, **kw
) -> DataFrame:
    """Drop near-duplicates: survivor = min doc_id reachable via pair edges.

    Min-id label propagation **to a fixpoint**: iterate until an iteration
    changes zero labels (one cheap limit(1) existence probe per iteration),
    capped at ``max_iters``. Neighbor-min propagation advances the min id
    one hop per iteration, so convergence takes the cluster *diameter*
    iterations — near-dup clusters are shallow in practice, and the cap
    bounds pathological chains (the previous fixed-3-iteration loop
    silently split clusters with diameter > 3). Each iteration is
    localCheckpointed: truncates the self-referential lineage that would
    otherwise grow the plan exponentially."""
    pairs = minhash_lsh_pairs(df, threshold=threshold, id_col=id_col, **kw).select(
        "doc_a", "doc_b"
    )
    edges = _materialize(
        pairs.unionByName(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
    )
    # propagate ONLY over nodes that appear in an edge: everything else can
    # never change label and survives by construction — at corpus scale the
    # duplicate subgraph is a tiny fraction of rows, so each iteration's
    # join/agg runs on |edge nodes|, not |corpus|
    labels = _materialize(
        edges.select(F.col("doc_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iters):
        prop = (
            edges.join(labels, edges.doc_b == labels.node)
            .groupBy(F.col("doc_a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry a per-row changed flag through the materialization so the
        # convergence probe is a filter/limit over already-checkpointed
        # blocks — not a labels⨝new_labels shuffle join per iteration
        new_labels = _materialize(
            labels.join(prop, "node", "left").select(
                "node",
                F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias("_chg"),
            )
        )
        changed = new_labels.filter("_chg").limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    losers = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_col(words, bits: int = 64, seed: int = 11):
    """64-bit SimHash of a words array as a Spark expression: for each bit,
    sign of the sum over tokens of ±1 by that token-hash bit.

    A NULL words array yields a NULL simhash (the doc drops out of the
    banded pair join) — without the guard the per-bit ``otherwise(0)``
    would silently coerce null docs to simhash 0 and pair every null-text
    doc with every empty-text doc (which legitimately IS 0: an empty vote
    sum). Mirrors minhash dropping null/shingle-less docs."""
    tok_hash = F.transform(words, lambda w: F.xxhash64(w, F.lit(seed)))
    bit_cols = []
    for i in range(bits):
        contrib = F.aggregate(
            tok_hash,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_cols.append(F.when(contrib > 0, F.lit(1).cast("long")).otherwise(F.lit(0)))
    out = F.lit(0).cast("long")
    for i, b in enumerate(bit_cols):
        out = out.bitwiseOR(F.shiftleft(b, i))
    return F.when(words.isNotNull(), out)


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 11,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Pigeonhole banding: split the 64 bits into ``bands`` chunks; any pair
    within distance < bands must agree on >= one whole chunk, so the
    candidate join is an equi-join on (chunk_id, chunk_bits). Verified with
    exact popcount. bands must be > max_hamming for completeness.

    ``materialize=False`` keeps the plan lazy for fault-tolerant clusters
    (see minhash_lsh_pairs) at the cost of recomputing the 64-aggregate
    simhash expression once per self-join branch.
    """
    assert bands > max_hamming, "pigeonhole completeness requires bands > max_hamming"
    width = 64 // bands
    # simhash_col expands to 64 aggregate() passes over the token hashes —
    # materialize so the self-join doesn't run it twice (and runs it
    # partition-parallel on single-file inputs)
    sh = _spread(df).select(
        F.col(id_col), simhash_col(words_col(text_col), seed=seed).alias("sh")
    )
    if materialize:
        sh = _materialize(sh)
    chunks = sh.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sh"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("cb"),
                    )
                    for c in range(bands)
                ]
            )
        ).alias("c"),
    ).select(id_col, "sh", "c.chunk", "c.cb")
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cb") == F.col("b.cb"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    mode: str = "drop",
) -> DataFrame:
    """Remove (or flag) training docs sharing ANY word ``n``-gram with a
    benchmark/test set — the GPT-3-style 13-gram decontamination pass a
    training corpus runs before release (distinct from dedup: the match is
    one-directional, against a small external set, and a single shared
    gram condemns the doc).

    ``mode='drop'`` returns the clean corpus; ``mode='flag'`` returns every
    row plus a ``contaminated`` boolean (for auditing what would drop).
    Docs shorter than ``n`` words have no n-grams and are never flagged;
    NULL texts pass through untouched.

    Scale: the benchmark gram set is tiny next to the corpus (benchmarks
    are thousands of docs), so the semi join broadcasts it — corpus grams
    are checked map-side and NEVER shuffle (plan-pinned in
    tests/test_dedup_textstats.py). Grams compare as xxhash64 longs, the
    same keying as ngram_jaccard_pairs.
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be drop|flag, got {mode!r}")
    bench_grams = F.broadcast(
        benchmark.select(
            F.explode(
                F.array_distinct(
                    F.transform(
                        ngrams_col(words_col(bench_text_col), n), lambda g: F.xxhash64(g)
                    )
                )
            ).alias("ng")
        ).distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(ngrams_col(words_col(text_col), n), lambda g: F.xxhash64(g))
            )
        ).alias("ng"),
    )
    dirty_ids = doc_grams.join(bench_grams, "ng", "left_semi").select(id_col).distinct()
    if mode == "drop":
        return corpus.join(dirty_ids, id_col, "left_anti")
    return corpus.join(
        dirty_ids.withColumn("contaminated", F.lit(True)), id_col, "left"
    ).withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    normalize: bool = True,
) -> DataFrame:
    """CCNet-style paragraph-level exact dedup (Wenzek et al. 2020): split
    each doc on ``sep``, keep only the corpus-wide FIRST occurrence of each
    distinct paragraph (first = lowest ``(doc_id, paragraph index)``),
    reassemble the surviving paragraphs in their original order, and drop
    docs left with no paragraphs. Web boilerplate (nav bars, cookie
    banners, footers) repeats across millions of pages — removing it at
    paragraph granularity keeps the unique prose exact_dedup would miss.

    ``normalize=True`` dedups on a lowercased, whitespace-collapsed copy
    (a light version of CCNet's normalization; digits and punctuation are
    kept so near-identical legal/numeric paragraphs stay distinct). The
    ORIGINAL paragraph text is what survives into the output.

    Docs with NULL text pass through untouched (same convention as
    exact_dedup). Blank paragraphs (empty after trim) are dropped from the
    reassembly regardless of duplication.

    Scale design: document text never rides the dedup shuffles at all.
    Winner selection runs on a slim ``(digest, doc_id, paragraph index)``
    stream — the digest Exchange and the per-doc keep-list aggregation
    move ~24 bytes/paragraph regardless of paragraph size — and each doc
    is rebuilt IN PLACE by re-splitting its own text and picking the kept
    indices, so the only shuffle that carries text is the final doc_id
    join of the keep lists back to the corpus (elidable by bucketing the
    corpus on ``id_col``).
    """
    with_text = df.filter(F.col(text_col).isNotNull())
    # sep is used as a java regex by split(); \n\n etc. are literal
    paras = with_text.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pidx", "_para"),
    ).filter(F.trim("_para") != "")
    norm = (
        F.regexp_replace(F.trim(F.lower(F.col("_para"))), r"\s+", " ")
        if normalize
        else F.col("_para")
    )
    slim = paras.select(id_col, "_pidx", F.xxhash64(norm).alias("_digest"))
    w = Window.partitionBy("_digest").orderBy(F.col(id_col), F.col("_pidx"))
    keep_idx = (
        slim.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_pidx")).alias("_keep"))
    )
    arr = F.split(F.col(text_col), sep)
    rebuilt = (
        with_text.join(keep_idx, id_col, "inner")
        .withColumn(
            text_col,
            F.concat_ws(
                sep, F.transform("_keep", lambda i: F.element_at(arr, i + 1))
            ),
        )
        .drop("_keep")
    )
    null_docs = df.filter(F.col(text_col).isNull())
    return rebuilt.select(df.columns).unionByName(null_docs)


def duplicate_span_removal(
    df: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    drop_empty: bool = True,
) -> DataFrame:
    """ExactSubstr-style duplicate-span removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): any word
    span of length ``min_len`` that occurs more than once in the corpus is
    removed from every occurrence EXCEPT the globally-first one (smallest
    ``(doc_id, position)`` — the engine-wide keep-first convention; the
    paper removes all copies, keeping one is the conservative variant).
    A duplicated region longer than ``min_len`` is covered by its
    overlapping ``min_len``-grams, so the whole region is removed at once
    via interval union.

    Word-level like the rest of the dedup family: text is normalized with
    ``words_col`` and touched docs are rebuilt as space-joined surviving
    words (untouched docs keep their original text verbatim). Docs whose
    every word is covered drop entirely when ``drop_empty`` (mirroring
    ``paragraph_dedup``'s boilerplate-only rule); NULL text passes
    through.

    Plan/scale: per-position span hashes are a chained fold of per-word
    ``xxhash64`` values over a sliding slice — O(min_len) longs per
    position, no 50-word string materialization — and the only wide ops
    are one Exchange on the span hash (where map-side combine does
    nothing, this is the honest cost of exact substring dedup — the
    shuffle IS the suffix-array analogue) and one tiny Exchange on the
    few docs carrying removals. Hash collisions across distinct spans are
    possible in principle (64-bit; corpus-wide birthday bound) and would
    remove a non-duplicate span — the paper's suffix array is exact, this
    is exact-at-64-bit, documented trade.
    """
    words = words_col(text_col)
    w_hash = F.transform(words, lambda w: F.xxhash64(w))
    # span_hash(i) = fold acc -> xxhash64(acc, word_hash[j]) over the slice,
    # acc0 = 0: mirrored bit-exactly by the spec-derived oracle in tests
    n_spans = F.size(words) - F.lit(min_len - 1)
    # guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty-span branch rather than an empty sequence
    spans = F.when(n_spans < 1, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_spans, F.lit(1))),
            lambda i: F.aggregate(
                F.slice(w_hash, i, min_len),
                F.lit(0).cast("long"),
                lambda acc, h: F.xxhash64(acc, h),
            ),
        )
    )
    occ = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.posexplode(spans).alias("_pos", "_h"))
    )
    w = Window.partitionBy("_h").orderBy(F.col(id_col), F.col("_pos"))
    cnt = Window.partitionBy("_h")
    removals = (
        occ.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(cnt))
        .filter((F.col("_n") > 1) & (F.col("_rk") > 1))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("_pos")).alias("_starts"))
    )
    # rebuild: word index i survives unless some start s covers it
    # (s <= i < s + min_len); starts are few per doc (dup occurrences)
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_starts"), lambda s: (s <= i) & (i < s + F.lit(min_len))
    )
    idx = F.sequence(F.lit(0), F.size(words) - 1)
    kept_words = F.filter(
        F.transform(idx, lambda i: F.when(~covered(i), F.element_at(words, i + 1))),
        lambda x: x.isNotNull(),
    )
    touched = (
        df.join(removals, id_col, "inner")
        .withColumn("_kept", kept_words)
        .withColumn(text_col, F.concat_ws(" ", F.col("_kept")))
        .withColumn("_empty", F.size("_kept") == 0)
        .drop("_starts", "_kept")
    )
    if drop_empty:
        touched = touched.filter(~F.col("_empty"))
    untouched = df.join(removals.select(id_col), id_col, "left_anti")
    return untouched.unionByName(touched.drop("_empty"))
