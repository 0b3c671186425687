"""Late-stage training-data curation operators: deterministic sampling,
training-order shuffle, token-budget packing, and incremental dedup against
a persisted survivor store.

These are the stages a 100 TB corpus job runs AFTER the dedup/quality
family (``operators/dedup.py``, ``operators/textstats.py``,
``scripts/corpus_job.py``): pick a source mix, dedup the new crawl
increment against the already-curated corpus instead of recomputing the
world, pack survivors into fixed-token training examples, and lay them out
in a reproducible shuffled order. The reference engine stops at the matcher
(its corpus is OHLCV series, /root/reference/katslib/opkatsDataUtil.py);
this module is part of the beyond-reference LLM-pipeline surface the
engine adds (same family as dedup/similarity/multimodal/textstats).

Design rules shared by every operator here:

- **Determinism is a function of the data, not an RNG stream.** Sampling
  and ordering decisions hash the row id (``xxhash64``) — task retries,
  different cluster sizes, and re-runs produce byte-identical outputs.
  ``df.sample`` explicitly does NOT have this property (per-task-attempt
  RNG), which is why it appears nowhere in this file.
- **Narrow where possible.** Sampling is a scan-and-drop (zero shuffle);
  packing is one hash Exchange on the shard key; the incremental dedups
  shuffle digests/signatures, never document text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import exact_dedup, minhash_signature, _materialize

#: sampling decisions quantize keep-fractions to 1/RESOLUTION steps
SAMPLE_RESOLUTION = 1_000_000


def sample_stratified(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    ``pmod(xxhash64(seed, id), RESOLUTION) < round(frac * RESOLUTION)``.

    The standard source-mix stage of a training-data pipeline ("keep 30%
    of web, all of books"). Strata absent from ``fractions`` keep
    ``default_fraction`` of their rows. Fractions are keep-probabilities
    in [0, 1]; upsampling (>1) is a different operator (explode+replicate)
    and raises here rather than silently clamping.

    Scale: zero shuffle (pinned in tests/test_curation.py) — the decision
    is a codegen'd hash per row, so this pushes through to the scan like
    any other filter. The same id always draws the same uniform, so
    nested samples are consistent: a 10% sample is a strict subset of the
    30% sample at the same seed (useful for held-out splits).
    """
    for k, frac in fractions.items():
        if not (0.0 <= frac <= 1.0):
            raise ValueError(f"fraction for stratum {k!r} must be in [0,1], got {frac}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")
    u = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(SAMPLE_RESOLUTION))
    thr = F.lit(int(round(default_fraction * SAMPLE_RESOLUTION)))
    for k, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(key_col) == F.lit(k), F.lit(int(round(frac * SAMPLE_RESOLUTION)))
        ).otherwise(thr)
    return df.filter(u < thr)


def shuffle_deterministic(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    num_partitions: int | None = None,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Reproducible global training order: total order by
    ``(xxhash64(seed, id, *salt_cols), id, *salt_cols)`` — the tiebreak
    makes the order unique even across hash collisions.

    ``salt_cols`` folds extra columns into the hash so rows SHARING an id
    spread apart — pass ``["epoch"]`` after :func:`upsample_stratified`,
    otherwise a doc's replicas hash identically and land adjacent in the
    training order (the exact clumping an epoch-aware shuffle must avoid).

    Implemented as ``repartitionByRange`` on the hash + in-partition sort —
    the same distributed range-exchange plan ``orderBy`` builds (sampled
    bounds, per-partition local sorts; there is no single-reducer stage in
    either), but with the output partition count EXPLICIT instead of
    inherited from ``spark.sql.shuffle.partitions``: training-shard files
    are a layout contract, not a shuffle tuning knob. Written files
    concatenate to the global order. Changing ``seed`` is a fresh
    epoch-level reshuffle.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    salts = [F.col(c) for c in (salt_cols or [])]
    h = F.xxhash64(F.lit(seed), F.col(id_col), *salts)
    ties = [F.col(id_col)] + salts
    return (
        df.withColumn("_ord", h)
        .repartitionByRange(n, F.col("_ord"), *ties)
        .sortWithinPartitions(F.col("_ord"), *ties)
        .drop("_ord")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    key_col: str | None = None,
    n_shards: int | None = None,
    seed: int = 0,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training packs
    (doc-preserving concat-then-chunk): lay the docs of each shard out in
    deterministic hash order and set
    ``pack_id = floor(tokens_before_this_doc / budget)``.

    Pack semantics (the doc-preserving variant of GPT-style concat+split
    packing): pack ``k`` owns exactly the docs whose FIRST token falls in
    ``[k*budget, (k+1)*budget)`` of the shard's concatenated token stream —
    a doc straddling a boundary joins the pack it starts in. Consequences
    (pinned in tests/test_curation.py): every non-final pack ends at or
    past its boundary (its last doc crosses ``(k+1)*budget``), overflow
    beyond the boundary is always less than that final doc, and a doc
    longer than ``budget`` absorbs the following boundaries (the skipped
    pack ids are simply absent — ids need not be contiguous). Downstream
    example writers truncate or roll each pack's tail instead of
    re-binning. Exact greedy reset-at-budget is inherently sequential;
    this formulation is one window cumsum — embarrassingly parallel and
    SQL-expressible (the DuckDB oracle runs the same window).

    Packs never span shards: with ``key_col`` the shard is that column
    (packs never mix sources/languages); without it rows are sharded by
    ``pmod(xxhash64(seed+1, id), n_shards)`` so the layout is distributed —
    a single global window would serialize 100 TB through one task. A
    window partition is ONE task's sort, so a hot ``key_col`` value (the
    'web' slice of a real corpus) is the same serial point in disguise:
    ``n_shards`` combined with ``key_col`` splits every key into
    ``key/0 .. key/n-1`` sub-shards by id hash — packs stay homogeneous
    (never mix keys; a pack lives inside one sub-shard) and the hot key's
    sort fans out across ``n_shards`` tasks.

    Scale: exactly ONE Exchange (hash on the shard key) + one in-partition
    sort (pinned in tests/test_curation.py). NULL token counts count 0.
    Output: input columns + ``pack_shard`` + ``pack_id`` (long).

    ``salt_cols`` folds extra columns into the layout hashes (order, and
    the id-hash shard when ``key_col`` is None) — after
    :func:`upsample_stratified`, pass ``["epoch"]`` so a doc's replicas
    scatter across packs instead of landing adjacent in one (same rule as
    :func:`shuffle_deterministic`).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    salts = [F.col(c) for c in (salt_cols or [])]
    if key_col is not None:
        shard = F.col(key_col).cast("string")
        if n_shards is not None:
            sub = F.pmod(
                F.xxhash64(F.lit(seed + 1), F.col(id_col), *salts), F.lit(n_shards)
            )
            shard = F.concat_ws("/", shard, sub.cast("string"))
        out = df.withColumn("pack_shard", shard)
    else:
        n = n_shards or df.sparkSession.sparkContext.defaultParallelism
        out = df.withColumn(
            "pack_shard",
            F.pmod(F.xxhash64(F.lit(seed + 1), F.col(id_col), *salts), F.lit(n)),
        )
    w = (
        Window.partitionBy("pack_shard")
        .orderBy(F.xxhash64(F.lit(seed), F.col(id_col), *salts), F.col(id_col), *salts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.coalesce(F.col(n_tok_col).cast("long"), F.lit(0))
    cum_before = F.sum(tok).over(w) - tok
    return out.withColumn("pack_id", F.floor(cum_before / F.lit(budget)))


def pack_sequences_bestfit(
    df: DataFrame,
    budget: int,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    key_col: str | None = None,
    n_shards: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """Assign documents to packs by best-fit-decreasing bin packing —
    the padding-minimizing alternative to :func:`pack_sequences`.

    :func:`pack_sequences` concatenates in hash order and chunks at
    budget boundaries: zero padding but docs straddle packs. Training
    setups that must NOT split documents (each pack is padded to
    ``budget`` instead) care about pad-token waste, and greedy layout
    wastes up to ~25% on heavy-tailed length distributions; best-fit
    decreasing (sort by length desc, place each doc in the fullest bin it
    fits) is the standard near-optimal packer (Krell et al. 2021 use the
    same family for BERT pretraining). Every pack total is <= ``budget``;
    docs longer than ``budget`` get a singleton pack (flagged oversized
    rather than silently truncated — the writer decides).

    Bin packing is inherently sequential, so it runs per shard as a
    grouped map (`applyInPandas`): the same sharding rule as
    :func:`pack_sequences` (``key_col`` and/or id-hash sub-shards, packs
    never span shards) bounds each task's working set, and within a shard
    the Arrow batch is one python pass with a bisect-maintained remaining-
    capacity list (O(n log n)). Scale: ONE Exchange on the shard key,
    shard rows must fit one task (pick ``n_shards`` so rows/shard is a
    few hundred thousand). Determinism: placement order is (n_tok desc,
    xxhash64(seed, id), id) — no RNG, replayable from the row set alone;
    the pytest oracle replays the exact packing engine-free via the
    standalone XXH64.

    Output: input columns + ``pack_shard`` + ``pack_id`` (long,
    contiguous per shard) + ``pack_fill`` (long: the pack's total tokens,
    same value on every row of a pack — ``budget - pack_fill`` is the pad
    waste the writer will add). NULL token counts count 0.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if key_col is not None:
        shard = F.col(key_col).cast("string")
        if n_shards is not None:
            sub = F.pmod(F.xxhash64(F.lit(seed + 1), F.col(id_col)), F.lit(n_shards))
            shard = F.concat_ws("/", shard, sub.cast("string"))
    else:
        n = n_shards or df.sparkSession.sparkContext.defaultParallelism
        shard = F.pmod(F.xxhash64(F.lit(seed + 1), F.col(id_col)), F.lit(n)).cast("string")
    out = df.withColumn("pack_shard", shard).withColumn(
        "_ord", F.xxhash64(F.lit(seed), F.col(id_col))
    )

    import pandas as pd  # noqa: deferred so module import stays lazy

    result_schema = out.drop("_ord").schema.add("pack_id", "long").add(
        "pack_fill", "long"
    )

    def _pack_one(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import bisect

        toks = pdf[n_tok_col].fillna(0).astype("int64").clip(lower=0)
        order = pdf.assign(_t=toks).sort_values(
            ["_t", "_ord", id_col], ascending=[False, True, True]
        ).index
        # rem holds (remaining_capacity, bin_id) sorted by remaining; best
        # fit = the smallest remaining >= tok, found by bisect
        rem: list[tuple[int, int]] = []
        assign: dict = {}
        fills: dict = {}
        next_bin = 0
        for idx in order:
            t = int(toks.loc[idx])
            if t >= budget:
                # oversized (or exactly full): singleton pack, never reopened
                assign[idx] = next_bin
                fills[next_bin] = t
                next_bin += 1
                continue
            pos = bisect.bisect_left(rem, (t,))
            if pos < len(rem):
                r, b = rem.pop(pos)
                assign[idx] = b
                fills[b] += t
                nr = r - t
                if nr > 0:
                    bisect.insort(rem, (nr, b))
            else:
                assign[idx] = next_bin
                fills[next_bin] = t
                bisect.insort(rem, (budget - t, next_bin))
                next_bin += 1
        res = pdf.drop(columns=["_ord"]).copy()
        res["pack_id"] = pd.Series(assign).reindex(pdf.index).astype("int64")
        res["pack_fill"] = res["pack_id"].map(fills).astype("int64")
        return res

    return out.groupBy("pack_shard").applyInPandas(_pack_one, schema=result_schema)


def materialize_packs(
    packed: DataFrame,
    budget: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    seed: int = 0,
    truncate: bool = True,
) -> DataFrame:
    """Turn pack ASSIGNMENTS (:func:`pack_sequences` output) into actual
    training examples: one row per pack with the concatenated token array.

    Docs inside a pack concatenate in the same deterministic layout order
    the packer used — ``(xxhash64(seed, id), id)`` — so the materialized
    stream is exactly the stream whose boundaries defined the packs; pass
    the packer's ``seed``. Output per (``pack_shard``, ``pack_id``):

    - ``tokens``       — the pack's token stream, sliced to ``budget``
      when ``truncate=True`` (the boundary-straddling tail doc loses its
      overflow; training setups that roll the tail instead can set
      ``truncate=False`` and split downstream);
    - ``doc_ids``      — member doc ids in stream order;
    - ``doc_offsets``  — each member's start index in the PRE-truncation
      stream (0-based) — the attention-boundary / loss-masking input;
    - ``n_tok_packed`` / ``n_tok_dropped`` — kept vs truncated tokens.

    Scale: ONE Exchange keyed on (pack_shard, pack_id); the per-group
    state is one pack's tokens (~budget + one doc by the packer's
    overflow bound), so ``collect_list`` here is bounded by construction,
    not by corpus size. NULL token arrays contribute nothing but their
    doc id still appears (offset equal to the previous boundary).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    member = F.struct(
        F.xxhash64(F.lit(seed), F.col(id_col)).alias("o"),
        F.col(id_col).alias("i"),
        F.coalesce(F.col(tokens_col), F.array().cast("array<int>")).alias("t"),
    )
    grouped = (
        packed.groupBy("pack_shard", "pack_id")
        .agg(F.sort_array(F.collect_list(member)).alias("_m"))
    )
    sizes = F.transform(F.col("_m"), lambda m: F.size(m["t"]))
    # 0-based start offsets: running sum over member sizes, last dropped
    offsets = F.slice(
        F.aggregate(
            sizes,
            F.array(F.lit(0).cast("long")),
            lambda acc, s: F.concat(
                acc, F.array(F.element_at(acc, -1) + s.cast("long"))
            ),
        ),
        1,
        F.size(F.col("_m")),
    )
    flat = F.flatten(F.transform(F.col("_m"), lambda m: m["t"]))
    total = F.size(flat)
    kept = F.least(total, F.lit(budget)) if truncate else total
    out_tokens = F.slice(flat, 1, kept) if truncate else flat
    return grouped.select(
        "pack_shard",
        "pack_id",
        out_tokens.alias("tokens"),
        F.transform(F.col("_m"), lambda m: m["i"]).alias("doc_ids"),
        offsets.alias("doc_offsets"),
        kept.cast("long").alias("n_tok_packed"),
        (total - kept).cast("long").alias("n_tok_dropped"),
    )


# --------------------------------------------------------------------------
# incremental dedup against a persisted survivor store
# --------------------------------------------------------------------------

#: double-hashing constants for the digest bloom filter:
#: h_i(d) = (xxhash64(d, H1) + i * xxhash64(d, H2)) mod m_bits
_BLOOM_H1 = 0
_BLOOM_H2 = 1


def digest_bloom_words(
    seen_digests: DataFrame,
    m_bits: int = 1 << 23,
    k: int = 5,
    digest_col: str = "digest",
) -> list[int]:
    """Build an ``m_bits``-bit bloom filter over a digest store, returned
    as ``m_bits/64`` signed int64 words (Spark's long convention).

    Kirsch-Mitzenmacher double hashing over two independent ``xxhash64``
    draws; all arithmetic is reduced mod ``m_bits`` BEFORE combining, so
    it never overflows a long under ANSI mode and a pure-Python oracle can
    replay it exactly (pinned in tests/test_curation.py against the
    standalone XXH64).

    Scale: k explode rows per digest, then ``bit_or`` with map-side
    partial aggregation — the shuffle is bounded by ``m_bits/64`` word
    keys (128 Ki rows at the default 8 Mi bits = 1 MiB on the driver),
    NOT by the store size. Size ``m_bits`` at ~10-15 bits per stored
    digest for ~1% false positives; blooms for successive store
    increments OR-merge (:func:`merge_bloom_words`), so the store's bloom
    is maintained incrementally — never rebuilt over history.
    """
    if m_bits <= 0 or m_bits % 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")
    m = F.lit(m_bits)
    rows = (
        seen_digests.where(F.col(digest_col).isNotNull())
        .select(
            F.pmod(F.xxhash64(F.col(digest_col), F.lit(_BLOOM_H1)), m).alias("_a"),
            F.pmod(F.xxhash64(F.col(digest_col), F.lit(_BLOOM_H2)), m).alias("_b"),
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.col("_a") + F.lit(i) * F.col("_b"), m)
                        for i in range(k)
                    ]
                )
            ).alias("_pos")
        )
        .selectExpr(
            "cast(_pos DIV 64 AS int) AS _w",
            "shiftleft(cast(1 AS bigint), cast(_pos % 64 AS int)) AS _m",
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(_m)").alias("_bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["_w"]] = r["_bits"]
    return words


_M64 = (1 << 64) - 1


def merge_bloom_words(*word_lists: list[int]) -> list[int]:
    """OR-merge bloom word arrays built with identical (m_bits, k) — the
    bloom of a union of digest sets. Raises on length mismatch (different
    m_bits blooms are not mergeable)."""
    if not word_lists:
        raise ValueError("need at least one word list")
    n = len(word_lists[0])
    if any(len(wl) != n for wl in word_lists):
        raise ValueError("bloom word lists have different lengths (m_bits mismatch)")
    out = []
    for i in range(n):
        u = 0
        for wl in word_lists:
            u |= wl[i] & _M64
        out.append(u - (1 << 64) if u >= (1 << 63) else u)
    return out


def bloom_words_to_b64(words: list[int]) -> str:
    """Serialize bloom words for snapshot metadata: little-endian int64
    pack + zlib + base64. A fresh (mostly-zero) bloom compresses to a few
    hundred bytes; a saturated 8 Mi-bit bloom to ~1.4 MB — both fine for
    a JSON commit manifest."""
    import base64
    import struct
    import zlib

    raw = struct.pack(f"<{len(words)}q", *words)
    return base64.b64encode(zlib.compress(raw, 6)).decode("ascii")


def bloom_words_from_b64(s: str, m_bits: int) -> list[int]:
    """Inverse of :func:`bloom_words_to_b64`; validates the decoded size
    against ``m_bits`` so a bloom stored under different sizing can't be
    silently misread (which would break the no-false-negative guarantee)."""
    import base64
    import struct
    import zlib

    raw = zlib.decompress(base64.b64decode(s))
    n = len(raw) // 8
    if n * 64 != m_bits:
        raise ValueError(f"stored bloom has {n * 64} bits, expected {m_bits}")
    return list(struct.unpack(f"<{n}q", raw))


def bloom_might_contain(
    df: DataFrame,
    words: list[int],
    m_bits: int,
    k: int,
    digest_col: str = "digest",
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Add a boolean ``out_col``: False -> digest is DEFINITELY not in the
    set the bloom summarizes; True -> probably in it (false-positive rate
    set by the bloom's sizing). NULL digests are False.

    Physical form: the two hash draws stay JVM-side (codegen'd
    ``xxhash64``), and the bit tests run in ONE vectorized ``pandas_udf``
    whose closure carries the words as a pickled numpy int64 array — a
    single compact binary transfer per query. (The previous form shipped
    the words as a one-row DataFrame: correct, but ``createDataFrame`` of
    an m/64-element Python list converts element-by-element through the
    JVM bridge — ~20 s flat overhead per call at 2^27 bits, measured in
    scripts/sf1_bench.py — a fixed cost the numpy closure doesn't pay.)
    The Python stage only ever sees the PROBING side (the new batch, small
    by definition in the incremental regime), never the store."""
    if len(words) * 64 != m_bits:
        raise ValueError(f"words has {len(words)} longs; m_bits={m_bits} needs {m_bits // 64}")
    from pyspark.sql.functions import pandas_udf

    w = np.asarray(words, dtype=np.int64)
    mk, kk = m_bits, k

    @pandas_udf("boolean")
    def _probe(a: pd.Series, b: pd.Series) -> pd.Series:
        av = a.to_numpy(dtype=np.int64)
        bv = b.to_numpy(dtype=np.int64)
        hit = np.ones(len(av), dtype=bool)
        for i in range(kk):
            p = (av + i * bv) % mk  # av/bv already in [0, m): no overflow
            hit &= ((w[p >> 6] >> (p & 63)) & 1).astype(bool)
        return pd.Series(hit)

    m = F.lit(m_bits)
    a = F.pmod(F.xxhash64(F.col(digest_col), F.lit(_BLOOM_H1)), m)
    b = F.pmod(F.xxhash64(F.col(digest_col), F.lit(_BLOOM_H2)), m)
    return df.withColumn(
        out_col,
        F.when(F.col(digest_col).isNotNull(), _probe(a, b)).otherwise(F.lit(False)),
    )


# Store size below which the plain anti join is fine: Spark's planner
# broadcasts the store side of the left_anti join under its own
# autoBroadcastJoinThreshold (default 10 MB), so the store never shuffles
# there either and the single-job plan wins. Mirrors Spark's default.
AUTO_SMALL_STORE_MAX_BYTES = 10 << 20


def choose_probe(
    store_size_bytes: int | None,
    small_store_max_bytes: int = AUTO_SMALL_STORE_MAX_BYTES,
) -> str:
    """Pick the store-probe strategy from the store's size (pure,
    unit-testable — the incremental-dedup analogue of
    ``matcher.choose_strategy``).

    shuffle   : small (or unsized) store — one plain anti join; under
                Spark's broadcast threshold the planner broadcasts the
                store side itself, so nothing big moves.
    broadcast : big store — two-phase probe that scans but NEVER shuffles
                the store; the broadcast is the batch's digests, whose
                size the caller controls.

    An unknown size (no plan stats) resolves to ``broadcast``: at the
    scales where this operator matters the store dwarfs the batch, and
    broadcast only risks an extra small job when the store was tiny —
    the safe default is the one whose cost does not grow with history."""
    if store_size_bytes is not None and store_size_bytes <= small_store_max_bytes:
        return "shuffle"
    return "broadcast"


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Optimizer size estimate for ``df`` (bytes) — file-listing cheap for
    parquet-backed stores, exact for local relations; None when the py4j
    surface is unavailable (then callers fall back to the scale-safe
    choice)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def incremental_exact_dedup(
    new_docs: DataFrame,
    seen_digests: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe: str = "auto",
    bloom_words: list[int] | None = None,
    bloom_m_bits: int = 1 << 23,
    bloom_k: int = 5,
    skip_scan_when_clean: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Exact-dedup a NEW batch against the digest store of everything
    already curated: returns ``(survivors, survivor_digests)``.

    ``seen_digests`` is a one-column ``digest`` DataFrame (md5 hex of
    text) the caller persists between increments — e.g. through
    ``SnapshotTable`` — and appends each call's second return value to.
    Pass ``None`` for the first increment.

    Semantics: a new row whose digest is already in the store is dropped
    (anti join on the 16-byte digest — document text never shuffles
    against the store); the remainder dedups within the batch with the
    same min-id survivor rule as ``exact_dedup``. Folding batches
    b1..bn through this equals ``exact_dedup`` over the union whenever
    ids are assigned in batch order (pinned in tests/test_curation.py) —
    the store-backed fold never rescans previous increments, which is the
    point at 100 TB.

    NULL-text rows pass through and contribute nothing to the store,
    matching ``exact_dedup``.

    ``probe`` picks the physical store-probe strategy (identical output,
    parity-pinned in tests/test_curation.py):

    - ``'auto'`` (default) — route by the store's optimizer size estimate
      via :func:`choose_probe`: stores at or under
      ``AUTO_SMALL_STORE_MAX_BYTES`` (Spark's own broadcast threshold)
      take the single-job ``shuffle`` plan — where the planner broadcasts
      the small store side itself — and anything larger (or unsized)
      takes ``broadcast``, whose cost does not grow with the store. The
      default is scale-safe: a naive caller folding increments against a
      100 TB-era digest store never re-shuffles history by accident.
    - ``'shuffle'`` — plain left-anti join. Spark cannot
      broadcast the LEFT side of an anti join, so this sort-merge joins:
      the ENTIRE digest store re-shuffles on every increment. Fine while
      the store is modest; the wrong shape once the store dwarfs the
      batch.
    - ``'broadcast'`` — two-phase probe for the big-store regime: the
      batch's distinct digests broadcast into a ``left_semi`` against the
      store (the store is scanned but NEVER shuffled), and the matched
      digests — at most the batch's dup count — broadcast back into the
      anti join. Store-side Exchange count: zero (plan-pinned). Use when
      the batch's distinct digests fit the broadcast budget (a 10 M-row
      increment is ~160 MB of md5s), which is exactly the regime where
      the store is too big to shuffle.

    ``bloom_words`` (broadcast mode only) further prunes the probe with a
    bloom filter over the store (:func:`digest_bloom_words`, OR-merged
    across increments with :func:`merge_bloom_words`): bloom-negative
    rows skip the store probe entirely — no false negatives, so this is
    lossless as long as the bloom covers EVERY digest in ``seen_digests``
    (it is the caller's contract to merge each increment's bloom; a stale
    bloom silently readmits duplicates). With
    ``skip_scan_when_clean=True`` a batch with zero bloom hits skips the
    store SCAN too (one extra driver action over the batch's digests —
    worth it when increments are usually disjoint from history).
    """
    digest = F.md5(F.col(text_col))
    batch = exact_dedup(new_docs, text_col=text_col, id_col=id_col)
    if probe not in ("auto", "shuffle", "broadcast"):
        raise ValueError(
            f"probe must be 'auto', 'shuffle' or 'broadcast', got {probe!r}"
        )
    if bloom_words is not None and probe == "shuffle":
        raise ValueError("bloom_words requires probe='broadcast'")
    if probe == "auto":
        if bloom_words is not None:
            probe = "broadcast"  # the bloom prunes the broadcast probe
        elif seen_digests is not None:
            probe = choose_probe(_plan_size_bytes(seen_digests))
    if seen_digests is not None and probe == "broadcast":
        tagged = batch.withColumn("_dg", digest)
        if bloom_words is not None:
            tagged = bloom_might_contain(
                tagged, bloom_words, bloom_m_bits, bloom_k,
                digest_col="_dg", out_col="_bh",
            )
            cand = tagged.filter(F.col("_bh")).select(F.col("_dg").alias("_probe_dg"))
        else:
            cand = tagged.filter(F.col("_dg").isNotNull()).select(
                F.col("_dg").alias("_probe_dg")
            )
        cand = cand.distinct()  # shrink the broadcast; bounded by the batch
        if bloom_words is not None and skip_scan_when_clean and cand.isEmpty():
            fresh = tagged.drop("_dg", "_bh")
        else:
            matched = (
                seen_digests.select("digest")
                .join(
                    F.broadcast(cand),
                    F.col("digest") == F.col("_probe_dg"),
                    "left_semi",
                )
                .select(F.col("digest").alias("_dg"))
            )
            fresh = tagged.join(
                F.broadcast(matched), "_dg", "left_anti"
            ).drop("_dg", "_bh")
    elif seen_digests is not None:
        # NULL-text rows have a NULL digest; a NULL key never matches in a
        # left_anti join, so they pass through it untouched — no special
        # branch needed
        fresh = (
            batch.withColumn("_dg", digest)
            .join(seen_digests.select(F.col("digest").alias("_dg")), "_dg", "left_anti")
            .drop("_dg")
        )
    else:
        fresh = batch
    new_digests = (
        fresh.filter(F.col(text_col).isNotNull())
        .select(digest.alias("digest"))
        .distinct()
    )
    return fresh, new_digests


def incremental_minhash_dedup(
    new_docs: DataFrame,
    store_sigs: DataFrame | None,
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
    engine: str = "arrow",
    max_iters: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Near-dedup a NEW batch against the signature store of already-kept
    documents: returns ``(survivors, survivor_sigs)``.

    ``store_sigs`` is the persisted ``(doc_id, n_shingles, minhash)``
    output of previous increments (append each call's second return value;
    ``None`` for the first increment). Signature parameters must match the
    store's (same ``num_perm``/``n``/``seed`` — signatures are only
    comparable within one parameterization).

    Two stages, both candidate-bounded by LSH banding (never all-pairs,
    and the store side ships signatures only — its text is long gone):

    1. new-vs-store: a new doc whose signature-estimated Jaccard against
       ANY stored survivor clears ``threshold`` is dropped.
    2. new-vs-new: the remainder dedups within the batch via the same
       banded pairs + min-id label propagation as ``minhash_lsh_dedup``.

    Incremental semantics (standard for store-backed near-dedup): the
    store holds SURVIVORS only, so a chain new->dropped_old->survivor
    prunes only if the new doc itself collides with the survivor —
    transitive closure through previously-DROPPED docs is not replayed.
    A full-corpus rerun is the compaction that restores it.
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    sig_cols = [id_col, "n_shingles", "minhash"]
    new_sigs = _materialize(
        minhash_signature(
            new_docs, num_perm=num_perm, n=n, text_col=text_col,
            id_col=id_col, seed=seed, engine=engine,
        ).select(*sig_cols)
    )

    def band_rows(sigs: DataFrame) -> DataFrame:
        return sigs.select(
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

    est = (
        F.size(F.filter(F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda v: v))
        / F.lit(float(num_perm))
    )
    surviving_sigs = new_sigs
    if store_sigs is not None:
        a = band_rows(new_sigs).alias("a")
        b = band_rows(store_sigs.select(*sig_cols)).alias("b")
        cand = (
            a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
            .select(
                F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
            )
            .distinct()
        )
        hits = (
            cand.join(
                new_sigs.select(F.col(id_col).alias("doc_a"), F.col("minhash").alias("mh_a")),
                "doc_a",
            )
            .join(
                store_sigs.select(F.col(id_col).alias("doc_b"), F.col("minhash").alias("mh_b")),
                "doc_b",
            )
            .filter(est >= threshold)
            .select(F.col("doc_a").alias(id_col))
            .distinct()
        )
        surviving_sigs = _materialize(new_sigs.join(hits, id_col, "left_anti"))

    # stage 2: in-batch dedup over the remaining new docs (band pairs +
    # min-id label propagation, same fixpoint loop as minhash_lsh_dedup)
    br = band_rows(surviving_sigs)
    a, b = br.alias("a"), br.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    sa = surviving_sigs.select(F.col(id_col).alias("doc_a"), F.col("minhash").alias("mh_a"))
    sb = surviving_sigs.select(F.col(id_col).alias("doc_b"), F.col("minhash").alias("mh_b"))
    edges0 = (
        pairs.join(sa, "doc_a").join(sb, "doc_b").filter(est >= threshold)
        .select("doc_a", "doc_b")
    )
    edges = _materialize(
        edges0.unionByName(
            edges0.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
    )
    labels = _materialize(
        edges.select(F.col("doc_a").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    for _ in range(max_iters):
        prop = (
            edges.join(labels, edges.doc_b == labels.node)
            .groupBy(F.col("doc_a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
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
    kept_sigs = surviving_sigs.join(losers, id_col, "left_anti")
    survivors = new_docs.join(kept_sigs.select(id_col), id_col, "left_semi").unionByName(
        # rows that produced no signature (null/short text) pass through,
        # matching minhash_lsh_dedup's behavior of never dropping them
        new_docs.join(new_sigs.select(id_col), id_col, "left_anti")
    )
    return survivors, kept_sigs


def sample_quota(
    df: DataFrame,
    quotas: dict[str, int],
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Take EXACTLY ``quotas[stratum]`` rows per stratum (all rows when a
    stratum holds fewer), chosen deterministically: rank by
    ``(xxhash64(seed, id), id)`` within the stratum, keep the first N.

    The companion to :func:`sample_stratified` for token-budgeted mixes
    ("exactly 2B tokens of code") where a fraction would drift with corpus
    growth. Strata absent from ``quotas`` are kept whole. The hash order
    makes quota draws nested too: the top-N of a stratum is a prefix of
    its top-2N at the same seed.

    Scale: one Exchange on the stratum key + an in-partition sort
    (row_number window); the filter drops rows before anything downstream.
    A stratum is one window partition — fine while every stratum's row
    count fits a task's sort spill; a single pathological stratum can be
    pre-thinned with ``sample_stratified`` first.
    """
    for k, q in quotas.items():
        if q < 0:
            raise ValueError(f"quota for stratum {k!r} must be >= 0, got {q}")
    w = Window.partitionBy(key_col).orderBy(
        F.xxhash64(F.lit(seed), F.col(id_col)), F.col(id_col)
    )
    cap = F.lit(None).cast("long")
    for k, q in sorted(quotas.items()):
        cap = F.when(F.col(key_col) == F.lit(k), F.lit(q)).otherwise(cap)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(cap.isNull() | (F.col("_rn") <= cap))
        .drop("_rn")
    )


def upsample_stratified(
    df: DataFrame,
    factors: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic replication for source-mix UPWEIGHTING ("2.5 epochs of
    books"): a row with factor ``f`` appears ``floor(f)`` times, plus one
    more iff ``pmod(xxhash64(seed, id), RESOLUTION) < frac(f) * RESOLUTION``
    — the same hash-uniform draw as :func:`sample_stratified`, so expected
    copies == f exactly and re-runs replicate identically. Strata absent
    from ``factors`` keep factor 1.0. Output adds an ``epoch`` column
    (0-based copy index) so downstream shuffles can spread the copies and
    training loaders can tell them apart.

    Scale: a narrow explode — no shuffle here; the copies multiply rows,
    so run this AFTER filters/dedup and feed it straight into
    :func:`shuffle_deterministic` with ``salt_cols=["epoch"]`` so the
    copies spread across the training order instead of clumping.
    """
    for k, f in factors.items():
        if f < 0:
            raise ValueError(f"factor for stratum {k!r} must be >= 0, got {f}")
    fac = F.lit(1.0)
    for k, f in sorted(factors.items()):
        fac = F.when(F.col(key_col) == F.lit(k), F.lit(float(f))).otherwise(fac)
    u = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(SAMPLE_RESOLUTION))
    base = F.floor(fac).cast("long")
    extra = (
        u < F.round((fac - F.floor(fac)) * SAMPLE_RESOLUTION).cast("long")
    ).cast("long")
    n_copies = base + extra
    # sequence(0, -1) would yield a DESCENDING [0, -1] (auto step -1), so a
    # zero-copy row must get an empty array (explode drops it), not a
    # backwards sequence; explode can't be nested in an expression, so the
    # epoch index comes straight out of sequence(0, n-1)
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(0).cast("long"), n_copies - 1)
    ).otherwise(F.array().cast("array<long>"))
    return df.withColumn("epoch", F.explode(copies))


def temperature_mix_factors(
    df: DataFrame,
    *,
    alpha: float = 0.3,
    source_col: str = "source",
    size_col: str | None = None,
    anchor: str = "min",
) -> dict[str, float]:
    """Per-source temperature-mixing factors ``(p_i / p_anchor)^(alpha-1)``.

    The multilingual-pretraining mix rule (exponentiated smoothing, used
    by mBERT/XLM-R and most data-mixture recipes): with natural source
    shares ``p_i``, sample so realized shares follow ``q_i ∝ p_i^alpha``
    — ``alpha=1`` keeps the natural mix, ``alpha→0`` approaches uniform,
    boosting small sources. Since ``q_i/p_i ∝ p_i^(alpha-1)``, the
    per-source factor anchored at source ``a`` is
    ``(p_i/p_a)^(alpha-1)``:

    - ``anchor="min"`` — the SMALLEST source gets factor 1.0 and every
      other factor is <= 1: a pure downsampling mix, feed to
      :func:`sample_stratified`.
    - ``anchor="max"`` — the LARGEST source gets 1.0 and every other
      factor is >= 1: an epoch-replication mix, feed to
      :func:`upsample_stratified` (small sources run multiple epochs,
      the standard trade when you can't afford to throw data away).

    ``size_col`` weights shares by that column's sum (pass ``"n_tok"``
    for token-weighted shares) instead of row counts. Sources with zero
    total size are excluded (no rows to sample anyway).

    Scale: one Exchange bounded by the number of sources, then a collect
    of one row per source — a training mix has tens of sources, so the
    driver holds a dict, same contract as every ``fractions``/``factors``
    argument in this module.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if anchor not in ("min", "max"):
        raise ValueError(f"anchor must be 'min' or 'max', got {anchor!r}")
    size = F.sum(size_col) if size_col else F.count(F.lit(1))
    sizes = {
        r["k"]: float(r["n"])
        for r in df.groupBy(F.col(source_col).alias("k"))
        .agg(size.cast("double").alias("n"))
        .collect()
        if r["n"] and r["n"] > 0
    }
    if not sizes:
        return {}
    ref = min(sizes.values()) if anchor == "min" else max(sizes.values())
    return {k: (n / ref) ** (alpha - 1.0) for k, n in sorted(sizes.items())}


def temperature_mix(
    df: DataFrame,
    *,
    alpha: float = 0.3,
    mode: str = "downsample",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    size_col: str | None = None,
) -> DataFrame:
    """Apply a temperature-``alpha`` source mix in one call.

    ``mode="downsample"`` thins large sources toward ``q_i ∝ p_i^alpha``
    via :func:`sample_stratified` (zero shuffle, no duplication);
    ``mode="epoch"`` replicates small sources instead via
    :func:`upsample_stratified` (adds the ``epoch`` column — spread the
    copies with :func:`shuffle_deterministic`, ``salt_cols=["epoch"]``).
    Both are deterministic in ``seed`` and corpus content.
    """
    if mode == "downsample":
        fr = temperature_mix_factors(
            df, alpha=alpha, source_col=source_col, size_col=size_col,
            anchor="min",
        )
        # factors are <=1 by construction; guard float dust
        fr = {k: min(1.0, v) for k, v in fr.items()}
        return sample_stratified(
            df, fr, key_col=source_col, id_col=id_col, seed=seed
        )
    if mode == "epoch":
        fac = temperature_mix_factors(
            df, alpha=alpha, source_col=source_col, size_col=size_col,
            anchor="max",
        )
        return upsample_stratified(
            df, fac, key_col=source_col, id_col=id_col, seed=seed
        )
    raise ValueError(f"mode must be 'downsample' or 'epoch', got {mode!r}")


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row draws the same
    hash-uniform ``u = pmod(xxhash64(seed, id), RESOLUTION)`` as the
    sampling operators and lands in the split whose cumulative-weight
    interval contains it (intervals follow ``weights``' insertion order).

    Splits are disjoint and exhaustive by construction, and — unlike
    ``randomSplit`` — a document keeps its split across re-runs, cluster
    sizes, and corpus growth: appending a new crawl never moves an old doc
    between train and test, the property that prevents silent cross-split
    leakage on incremental corpora. Weights must sum to 1 (±1e-9).

    Scale: zero shuffle — one codegen'd hash + chained comparisons per
    row; downstream writers can partition the output by ``split_col``.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"weight for split {k!r} must be >= 0, got {v}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(SAMPLE_RESOLUTION))
    # quantized cumulative bounds; the LAST split absorbs rounding residue
    # so coverage is exhaustive at every resolution
    names = list(weights)
    bounds, acc = [], 0.0
    for k in names[:-1]:
        acc += weights[k]
        bounds.append(int(round(acc * SAMPLE_RESOLUTION)))
    expr = F.lit(names[-1])
    for k, b in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(u < b, F.lit(k)).otherwise(expr)
    return df.withColumn(split_col, expr)


def token_histogram(
    seqs: DataFrame, token_col: str = "tokens", by: str | None = "source"
) -> DataFrame:
    """Corpus-wide token-id frequency table: (``by``, token, cnt).

    The distributed histogram is explode -> groupBy(token): the explode is
    narrow (stays in the scan stage), and hash aggregation's map-side
    partial combine collapses each task's stream to at most |vocab| rows
    BEFORE the exchange — shuffle volume is tasks x vocab (~50k rows/task),
    independent of corpus size, which is why this is the 100 TB shape and
    not a per-row UDF. NULL token arrays contribute nothing.
    """
    cols = ([F.col(by)] if by else []) + [
        F.explode(F.col(token_col)).alias("token")
    ]
    keys = ([by] if by else []) + ["token"]
    return seqs.select(*cols).groupBy(*keys).agg(F.count("*").alias("cnt"))


def vocab_coverage(
    hist: DataFrame, top_k: int = 1000, by: str | None = "source"
) -> DataFrame:
    """Per-``by`` vocabulary summary over a ``token_histogram`` result:
    distinct token count, total token mass, and the fraction of mass
    captured by the ``top_k`` most frequent tokens (ties broken by token
    id so the cut is deterministic). Input is already vocab-sized, so the
    rank window and final agg are trivial at any corpus scale."""
    part = Window.partitionBy(*([by] if by else [])).orderBy(
        F.col("cnt").desc(), F.col("token")
    )
    ranked = hist.withColumn("rk", F.row_number().over(part))
    keys = [by] if by else []
    agg = ranked.groupBy(*keys).agg(
        F.count("*").alias("n_distinct"),
        F.sum("cnt").alias("total_tokens"),
        F.sum(F.when(F.col("rk") <= top_k, F.col("cnt")).otherwise(0)).alias("_top"),
    )
    return agg.withColumn(
        "topk_mass_frac", F.col("_top") / F.col("total_tokens")
    ).drop("_top")


def oov_stats(
    seqs: DataFrame,
    vocab_size: int,
    token_col: str = "tokens",
    by: str | None = "source",
) -> DataFrame:
    """Out-of-vocabulary rate per ``by``: tokens outside [0, vocab_size)
    counted with a per-row array filter — a pure codegen'd projection, so
    the only exchange is the final tiny groupBy (one row per source).
    Rows with NULL token arrays are excluded from both numerator and
    denominator."""
    t = F.col(token_col)
    oov = F.size(F.filter(t, lambda x: (x < 0) | (x >= F.lit(vocab_size))))
    keys = [by] if by else []
    agg = (
        seqs.filter(t.isNotNull())
        .select(*keys, F.size(t).alias("_n"), oov.alias("_oov"))
        .groupBy(*keys)
        .agg(F.sum("_n").alias("total_tokens"), F.sum("_oov").alias("oov_tokens"))
    )
    return agg.withColumn(
        "oov_frac",
        F.when(F.col("total_tokens") > 0, F.col("oov_tokens") / F.col("total_tokens"))
        .otherwise(F.lit(0.0)),
    )
