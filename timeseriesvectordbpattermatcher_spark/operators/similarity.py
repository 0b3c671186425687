"""Similarity search over embedding columns (array<float>).

Three tiers, same output shape (query_id, rank, vec_id, score):

- ``brute_force_topk``   exact cosine top-k — reuses the matcher's two
                         strategies (SQL-expression join / broadcast matmul).
- ``lsh_topk``           random-hyperplane LSH: bucket by sign-bit prefix,
                         search only same-bucket candidates (multi-probe via
                         several independent hash tables). Approximate; scale
                         path when refs don't fit one executor.
- ``cosine_dup_pairs``   embedding near-duplicate detection: all pairs with
                         cosine >= tau via bucketed candidate join.

Hyperplanes are seeded-deterministic (numpy RNG broadcast as literals), so
results are stable across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .matcher import cosine_score_col, cosine_topk_bcast, cosine_topk_join


def brute_force_topk(
    queries: DataFrame,
    refs: DataFrame,
    k: int = 10,
    strategy: str = "join",
    query_id: str = "query_id",
    query_vec: str = "q_embedding",
    ref_id: str = "vec_id",
    ref_vec: str = "embedding",
) -> DataFrame:
    fn = cosine_topk_join if strategy == "join" else cosine_topk_bcast
    return fn(queries, refs, k=k, query_id=query_id, query_vec=query_vec,
              ref_id=ref_id, ref_vec=ref_vec)


def _empty_topk(queries: DataFrame, refs: DataFrame, query_id: str, ref_id: str) -> DataFrame:
    """Typed empty (query_id, rank, ref_id, score) result for an empty or
    all-null ref set — every approximate path degrades to zero matches the
    way the exact join does, instead of crashing on dim discovery."""
    qt = queries.schema[query_id].dataType.simpleString()
    rt = refs.schema[ref_id].dataType.simpleString()
    return refs.sparkSession.createDataFrame(
        [], f"{query_id} {qt}, rank int, {ref_id} {rt}, score double"
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_tables, n_bits, dim))


def _bucket_udf(planes: np.ndarray):
    """All hash tables' bucket ids in one Arrow-batched matmul.

    planes: (n_tables, n_bits, dim). Returns a pandas_udf mapping an
    array<float> column to array<long> of length n_tables — one
    (batch × dim) @ (dim × n_tables·n_bits) product per Arrow batch instead
    of thousands of codegen'd scalar ops.
    """
    n_tables, n_bits, dim = planes.shape
    flat = planes.reshape(n_tables * n_bits, dim).T  # (dim, T*B)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (mat @ flat) > 0  # (n, T*B)
        ids = bits.reshape(len(mat), n_tables, n_bits) @ weights  # (n, T)
        return pd.Series(list(ids.astype(np.int64)))

    return buckets


def _with_table_buckets(df: DataFrame, vec_col: str, planes: np.ndarray) -> DataFrame:
    """Explode to one row per (row, hash table) with its bucket id."""
    buckets = _bucket_udf(planes)
    return (
        df.withColumn("_bkts", buckets(F.col(vec_col)))
        .select(
            "*",
            F.posexplode("_bkts").alias("tbl", "bkt"),
        )
        .drop("_bkts")
    )


def lsh_topk(
    queries: DataFrame,
    refs: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 23,
    query_id: str = "query_id",
    query_vec: str = "q_embedding",
    ref_id: str = "vec_id",
    ref_vec: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = refs sharing any table's bucket with
    the query; exact cosine re-rank on candidates only.

    Shuffle volume is |rows| × n_tables bucket keys, never |Q|×|R|. Recall
    rises with n_tables (independent hash tables), precision of the bucket
    with n_bits. For 100 TB refs this is the partition-pruned path: bucket
    becomes a partition column and only matching partitions are scanned.

    Pass ``dim`` (the embedding dimensionality) to skip the one-row
    discovery probe — array columns don't carry their length in the schema,
    so without it a ``first()`` job runs per call.
    """
    refs = refs.filter(F.col(ref_vec).isNotNull())
    queries = queries.filter(F.col(query_vec).isNotNull())
    if dim is None:
        first = refs.select(ref_vec).first()
        if first is None:
            return _empty_topk(queries, refs, query_id, ref_id)
        dim = len(first[0])
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    q_b = _with_table_buckets(queries.select(query_id, query_vec), query_vec, planes)
    r_b = _with_table_buckets(refs.select(ref_id, ref_vec), ref_vec, planes)
    cands = (
        q_b.join(r_b, ["tbl", "bkt"])
        .select(query_id, query_vec, ref_id, ref_vec)
        .dropDuplicates([query_id, ref_id])
    )
    scored = cands.withColumn("score", cosine_score_col(query_vec, ref_vec))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(ref_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", ref_id, "score")
    )


def cosine_dup_pairs(
    df: DataFrame,
    tau: float = 0.95,
    n_bits: int = 8,
    n_tables: int = 6,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= tau).

    ``exact=True`` skips LSH and does the full self-join (oracle mode, for
    tests and small corpora); default uses bucketed candidates. Pass
    ``dim`` to skip the one-row dimensionality probe job.
    """
    # null embeddings can never be near-dups (the exact branch scores them
    # 0.0 and drops them at tau); filtering upfront also keeps the bucket
    # UDF's np.stack away from mixed null/non-null Arrow batches
    df = df.filter(F.col(vec_col).isNotNull())
    left = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    right = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    if exact:
        cands = left.join(right, F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            first = df.select(vec_col).first()
            if first is None:
                idt = df.schema[id_col].dataType.simpleString()
                return df.sparkSession.createDataFrame(
                    [], f"id_a {idt}, id_b {idt}, score double"
                )
            dim = len(first[0])
        planes = _hyperplanes(dim, n_bits, n_tables, seed)
        b = _with_table_buckets(df.select(id_col, vec_col), vec_col, planes)
        ba = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "tbl", "bkt")
        bb = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "tbl", "bkt")
        cands = (
            ba.join(bb, ["tbl", "bkt"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .select("id_a", "v_a", "id_b", "v_b")
        )
    return (
        cands.withColumn("score", cosine_score_col("v_a", "v_b"))
        .filter(F.col("score") >= tau)
        .select("id_a", "id_b", "score")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + nprobe search
# ---------------------------------------------------------------------------


def _ivf_sample_rows(
    refs: DataFrame, id_col: str, vec_col: str, sample: int, n_lists: int
) -> list:
    """Deterministic ~``sample``-row training draw with NO cluster-side sort
    and no per-partition top-k heaps (the round-3 ``orderBy(id).limit()``
    was a full-corpus TakeOrdered): keep rows whose ``xxhash64(id)`` lands
    in a 1/P slice with P = N // sample, collect (~``sample`` rows), and
    canonicalize the order driver-side by id. Two narrow jobs — a column-
    pruned count and a scan-and-drop filter — regardless of corpus size.
    Partitioning and task scheduling cannot change the result: membership
    is a pure function of the id, order is imposed after collect."""
    projected = refs.select(id_col, vec_col)
    mod = None
    rows: list = []
    while True:
        sliced = projected
        if mod is None:
            n = projected.count()
            mod = max(1, n // sample)
        if mod > 1:
            sliced = projected.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0
            )
        rows = sliced.collect()
        # binomial concentration makes a short draw vanishingly rare at
        # sample=10k; widen the slice deterministically if it happens
        if len(rows) >= min(n_lists, sample) or mod == 1:
            break
        mod //= 2
    rows.sort(key=lambda r: r[0])
    return rows[:sample]


def train_ivf_centroids(
    refs: DataFrame,
    n_lists: int = 16,
    iters: int = 10,
    sample: int = 10_000,
    seed: int = 37,
    vec_col: str = "embedding",
) -> np.ndarray | None:
    """Deterministic coarse quantizer: Lloyd iterations on a driver-side
    hash-slice sample (see ``_ivf_sample_rows``), centroids L2-normalized
    so nearest-centroid under dot product == cosine assignment. Returns
    ``None`` for an empty ref set.

    At 100 TB the sample stays O(n_lists * 1k) rows — training is always
    driver-cheap; only assignment scans the corpus (one Arrow matmul pass).
    """
    id_col = [c for c in refs.columns if c != vec_col][0]
    rows = _ivf_sample_rows(refs, id_col, vec_col, sample, n_lists)
    if not rows:
        return None
    x = np.array([r[1] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for k in range(len(cents)):
            members = x[assign == k]
            if len(members):
                c = members.mean(axis=0)
                cents[k] = c / max(np.linalg.norm(c), 1e-12)
    return cents


def ivf_topk(
    queries: DataFrame,
    refs: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    seed: int = 37,
    query_id: str = "query_id",
    query_vec: str = "q_embedding",
    ref_id: str = "vec_id",
    ref_vec: str = "embedding",
) -> DataFrame:
    """IVF search: refs are assigned to their nearest centroid list (one
    partition-prunable int column); each query probes its ``nprobe`` nearest
    lists and exact-cosine re-ranks only those candidates.

    Scale path: ``list_id`` becomes a partition column of the ref table, so
    a probe scans nprobe/n_lists of the corpus — with the equi-join below
    Catalyst shuffles candidates only. (No dimensionality probe here:
    training already collects a sample, whose emptiness doubles as the
    empty-refs check.)
    """
    refs = refs.filter(F.col(ref_vec).isNotNull())
    queries = queries.filter(F.col(query_vec).isNotNull())
    cents = train_ivf_centroids(refs, n_lists=n_lists, seed=seed, vec_col=ref_vec)
    if cents is None:
        return _empty_topk(queries, refs, query_id, ref_id)

    @F.pandas_udf(T.IntegerType())
    def assign_list(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype(np.int32))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_lists(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cents.T), axis=1)[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    r_assigned = refs.select(ref_id, ref_vec, assign_list(F.col(ref_vec)).alias("list_id"))
    q_probed = queries.select(
        query_id, query_vec, F.explode(probe_lists(F.col(query_vec))).alias("list_id")
    )
    cands = q_probed.join(r_assigned, "list_id").dropDuplicates([query_id, ref_id])
    scored = cands.withColumn("score", cosine_score_col(query_vec, ref_vec))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(ref_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", ref_id, "score")
    )


# --------------------------------------------------------------------------
# persisted IVF index (build once, probe many)
# --------------------------------------------------------------------------


def build_ivf_index(
    refs: DataFrame,
    table,
    n_lists: int = 16,
    seed: int = 37,
    ref_id: str = "vec_id",
    ref_vec: str = "embedding",
):
    """Train the coarse quantizer ONCE and persist the assigned corpus as a
    :class:`~..sources.snapshot_table.SnapshotTable` partitioned by
    ``list_id``, centroids in the snapshot meta.

    ``ivf_topk`` retrains per call — right for ad-hoc search, wrong for a
    serving corpus probed thousands of times. The persisted layout is the
    100 TB shape: each probe reads ONLY the data files of its ``nprobe``
    lists through the snapshot manifest (``read_partitions`` — no listing,
    no scan of the other ``n_lists - nprobe`` partitions), and rebuilds are
    atomic snapshot commits readers never observe half-done.

    Returns the committed :class:`Snapshot`.

    Centroids ride in the snapshot manifest as JSON — right up to
    ~hundreds of lists x hundreds of dims (a few MB). A billion-vector
    deployment with tens of thousands of lists should store the centroid
    matrix as its own small parquet next to the table and keep only its
    path in the meta.
    """
    refs = refs.filter(F.col(ref_vec).isNotNull())
    cents = train_ivf_centroids(refs, n_lists=n_lists, seed=seed, vec_col=ref_vec)
    if cents is None:
        raise ValueError("cannot build an IVF index over an empty ref set")

    @F.pandas_udf(T.IntegerType())
    def assign_list(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype(np.int32))

    assigned = refs.select(ref_id, ref_vec, assign_list(F.col(ref_vec)).alias("list_id"))
    return table.overwrite_partitions(
        assigned,
        ["list_id"],
        run_id=f"ivf_build_{seed}",
        meta={
            "ivf_centroids": cents.tolist(),
            "ivf_ref_id": ref_id,
            "ivf_ref_vec": ref_vec,
        },
    )


def ivf_probe_index(
    queries: DataFrame,
    table,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "q_embedding",
) -> DataFrame:
    """Probe a persisted IVF index: rank each query's ``nprobe`` nearest
    lists from the centroids in the snapshot meta, scan ONLY those lists'
    data files (manifest-pruned), exact-cosine re-rank the candidates.

    The list set touched by the whole query batch is the union of the
    per-query probes — collected driver-side (bounded by ``n_lists``, never
    by corpus or query count) to choose the partitions; the per-query
    restriction to its own ``nprobe`` lists happens in the candidate join.
    """
    snap = table.current_snapshot()
    if snap is None or "ivf_centroids" not in (snap.meta or {}):
        raise ValueError("table holds no IVF index — run build_ivf_index first")
    cents = np.array(snap.meta["ivf_centroids"], dtype=np.float64)
    ref_id, ref_vec = snap.meta["ivf_ref_id"], snap.meta["ivf_ref_vec"]
    nprobe = min(nprobe, len(cents))
    queries = queries.filter(F.col(query_vec).isNotNull())

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_lists(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cents.T), axis=1)[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    q_probed = queries.select(
        query_id, query_vec, F.explode(probe_lists(F.col(query_vec))).alias("list_id")
    )
    touched = sorted(
        str(r["list_id"]) for r in q_probed.select("list_id").distinct().collect()
    )
    spark = queries.sparkSession
    cand_src = table.read_partitions(spark, touched)
    if cand_src is None:  # empty query batch -> no probed lists
        return _empty_topk(queries, table.read(spark), query_id, ref_id)
    cands = q_probed.join(cand_src, "list_id").dropDuplicates([query_id, ref_id])
    scored = cands.withColumn("score", cosine_score_col(query_vec, ref_vec))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(ref_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", ref_id, "score")
    )


# bounded re-cut attempts before the split path gives up loudly; each
# round re-draws the sub-quantizer init, so only a genuinely inseparable
# (near-identical) cluster survives all of them
_SPLIT_ROUNDS = 4


def _guard_cluster_sizes(
    assigned: DataFrame,
    max_cluster: int,
    on_oversize: str,
    tau: float,
    n_lists: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Enforce ``semantic_dedup``'s per-cluster pair-cost bound: one
    count per list (<= n_lists rows to the driver), then raise on — or
    sub-quantize — every list larger than ``max_cluster``. Returns the
    (possibly re-keyed) assignment; list ids stay unique across original
    lists, so splitting never merges two coarse clusters."""
    out = assigned.withColumn("list_id", F.col("list_id").cast("long"))
    for rnd in range(_SPLIT_ROUNDS + 1):
        hot = sorted(
            (r["list_id"], r["_n"])
            for r in out.groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_cluster)
            .collect()
        )
        if not hot:
            return out
        desc = ", ".join(f"list {l}={n} rows" for l, n in hot[:10])
        more = ", ..." if len(hot) > 10 else ""
        if on_oversize == "raise":
            raise ValueError(
                f"semantic_dedup: {len(hot)} cluster(s) exceed "
                f"max_cluster={max_cluster} ({desc}{more}); the pair join "
                "would go quadratic on them — raise n_lists, raise "
                "max_cluster, or pass on_oversize='split'"
            )
        if rnd == _SPLIT_ROUNDS:
            raise ValueError(
                f"semantic_dedup: {len(hot)} cluster(s) still exceed "
                f"max_cluster={max_cluster} after {_SPLIT_ROUNDS} split "
                f"rounds ({desc}{more}) — likely more than max_cluster "
                "near-identical embeddings, which no quantizer separates; "
                "raise max_cluster or dedup exact duplicates first"
            )
        hot_ids = [l for l, _ in hot]
        total_hot = sum(n for _, n in hot)
        # enough sub-lists that an even split lands well under the cap;
        # a fresh seed per round re-draws the centroid init, so a merge
        # the previous draw happened to leave is re-cut next round
        n_sub = min(1024, max(2, -(-2 * total_hot // max_cluster)))
        hot_rows = out.filter(F.col("list_id").isin(hot_ids))
        sub_cents = train_ivf_centroids(
            hot_rows.select(id_col, vec_col),
            n_lists=n_sub,
            seed=seed + 1 + rnd,
            vec_col=vec_col,
        )
        # merge sub-centroids that are themselves tau-close: a cut
        # between two such centroids could strand a tau-duplicate pair
        # on opposite sides, so those sub-lists collapse back into one
        # before assignment (union-find over <= n_sub^2 driver-side dots)
        sim = sub_cents @ sub_cents.T
        parent = list(range(len(sub_cents)))

        def _find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(len(sub_cents)):
            for j in range(i + 1, len(sub_cents)):
                if sim[i, j] >= tau:
                    parent[_find(i)] = _find(j)
        roots = sorted({_find(i) for i in range(len(sub_cents))})
        labels = np.array(
            [roots.index(_find(i)) for i in range(len(sub_cents))],
            dtype=np.int32,
        )
        n_slots = len(roots)

        @F.pandas_udf(T.IntegerType())
        def assign_sub(vecs: pd.Series) -> pd.Series:
            m = np.stack(vecs.to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            return pd.Series(labels[np.argmax(m @ sub_cents.T, axis=1)])

        refined = hot_rows.withColumn("_sub", assign_sub(F.col(vec_col)))
        cold = out.filter(~F.col("list_id").isin(hot_ids)).withColumn(
            "_sub", F.lit(0)
        )
        # (list, sub) re-keyed injectively: splitting can only refine a
        # list, never merge rows across different original lists
        out = cold.unionByName(refined).select(
            F.col(id_col),
            F.col(vec_col),
            (
                F.col("list_id") * F.lit(int(n_slots)) + F.col("_sub")
            ).alias("list_id"),
        )
    raise AssertionError("unreachable")


def semantic_dedup(
    df: DataFrame,
    tau: float = 0.95,
    n_lists: int = 16,
    seed: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
    on_oversize: str = "raise",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    embeddings with the IVF coarse quantizer, find cosine >= ``tau`` pairs
    WITHIN each cluster only, and keep the smallest-id row of every pair
    (the engine-wide keep-first convention; like SemDeDup itself this is a
    greedy per-pair drop, not a transitive closure — in a chain a~b~c both
    b and c drop even though b is gone, i.e. one representative survives
    per semantic neighborhood).

    Near-identical embeddings land in the same list except exactly at a
    cluster boundary, so recall vs the exact all-pairs rule is high but
    not 1.0 by construction — raise ``n_lists`` resolution or ``tau``
    headroom accordingly (the exact rule is ``cosine_dup_pairs(...,
    exact=True)`` + the same keep-first drop, used as the oracle in
    tests). NULL embeddings pass through untouched.

    Scale: training is driver-cheap (hash-slice sample, see
    ``train_ivf_centroids``); assignment is one Arrow matmul pass; the
    candidate join is cluster-bucketed (shuffle on ``list_id``), so the
    pair count is sum over lists of n_l^2 rather than N^2 — the SemDeDup
    pitch. The drop itself is a left_anti join on the id.

    ``max_cluster`` guards the one way that pitch fails: a runaway hot
    list (skewed corpus, too-coarse quantizer) silently turning one
    reducer quadratic. When set, a cheap per-list count (<= n_lists
    rows) checks every list before the pair join:

    - ``on_oversize='raise'`` (default when guarded) — ``ValueError``
      naming the hot lists and sizes, so the failure is loud instead of
      a multi-hour straggler; remedies: raise ``n_lists``, raise
      ``max_cluster``, or switch to ``'split'``.
    - ``on_oversize='split'`` — re-quantize JUST the hot lists' rows
      with a finer sub-quantizer (sub-list count sized from the overflow
      ratio) and pair within (list, sub-list) intersections. Splitting
      never ADDS candidate pairs across original lists; it can only drop
      pairs that straddle a sub-boundary — same recall caveat as the
      coarse quantizer itself, one level finer. If a sub-list still
      exceeds ``max_cluster`` (e.g. more than ``max_cluster`` identical
      embeddings, which no quantizer can separate), it raises.
    """
    if on_oversize not in ("raise", "split"):
        raise ValueError(
            f"on_oversize must be 'raise' or 'split', got {on_oversize!r}"
        )
    if max_cluster is not None and max_cluster < 1:
        raise ValueError(f"max_cluster must be >= 1, got {max_cluster}")
    with_vec = df.filter(F.col(vec_col).isNotNull())
    cents = train_ivf_centroids(with_vec, n_lists=n_lists, seed=seed, vec_col=vec_col)
    if cents is None:
        return df

    @F.pandas_udf(T.IntegerType())
    def assign_list(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype(np.int32))

    assigned = with_vec.select(
        F.col(id_col), F.col(vec_col), assign_list(F.col(vec_col)).alias("list_id")
    )
    if max_cluster is not None:
        assigned = _guard_cluster_sizes(
            assigned, max_cluster, on_oversize, tau, n_lists, seed,
            id_col, vec_col
        )
    a = assigned.select(
        F.col("list_id"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
    )
    b = assigned.select(
        F.col("list_id"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")
    )
    losers = (
        a.join(b, ["list_id"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", cosine_score_col("v_a", "v_b"))
        .filter(F.col("score") >= tau)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.filter(F.col(vec_col).isNull()).unionByName(
        with_vec.join(losers, id_col, "left_anti")
    )


def embedding_drift(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    key_col: str = "source",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift between two corpus windows per key — the
    vector companion to the scalar drift reads (``quantiles.hist_drift``,
    ``heavyhitters.topk_drift``): did a source's embedding distribution
    MOVE (centroid shift) or SPREAD (dispersion change) between last
    week's crawl and this week's?

    Per shared key:

    - ``centroid_cos`` / ``drift`` — cosine similarity between the two
      windows' mean vectors and ``1 - cos`` (0 = no directional shift).
    - ``disp_a`` / ``disp_b`` — mean cosine DISTANCE of each window's
      vectors to its own centroid (higher = more spread; a rise without
      centroid shift means the source got more heterogeneous).
    - ``n_a`` / ``n_b`` — vector counts.

    Execution shape: centroids via ``posexplode`` + one (key, dim) agg
    (shuffle bounded by keys x dim, never corpus rows beyond the narrow
    explode); dispersion joins the broadcast centroids back and folds
    each row's cosine with ``aggregate``/``zip_with`` exprs — zero
    Python. NULL/empty vectors are dropped; keys present on one side
    only emit nothing; a zero-norm centroid (cancelling vectors) yields
    NULL cosine, never NaN."""

    def _prep(df: DataFrame, tag: str) -> tuple[DataFrame, DataFrame]:
        rows = df.filter(
            F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
        ).select(key_col, F.col(vec_col).cast("array<double>").alias("_v"))
        cent = (
            rows.select(key_col, F.posexplode("_v").alias("_pos", "_x"))
            .groupBy(key_col, "_pos")
            .agg(F.avg("_x").alias("_m"), F.count(F.lit(1)).alias("_n"))
            .groupBy(key_col)
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_m"))
                ).alias("_entries"),
                F.max("_n").alias(f"n_{tag}"),
            )
            .select(
                key_col,
                F.transform("_entries", lambda e: e["_m"]).alias(f"c_{tag}"),
                f"n_{tag}",
            )
        )
        return rows, cent

    rows_a, cent_a = _prep(corpus_a, "a")
    rows_b, cent_b = _prep(corpus_b, "b")

    def _dot(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def _norm(u):
        return F.sqrt(_dot(u, u))

    def _cos(u, v):
        return F.try_divide(
            _dot(u, v), F.nullif(_norm(u) * _norm(v), F.lit(0.0))
        )

    def _disp(rows: DataFrame, cent: DataFrame, tag: str) -> DataFrame:
        c = F.col(f"c_{tag}")
        return (
            rows.join(F.broadcast(cent), key_col)
            .select(key_col, (1.0 - _cos(F.col("_v"), c)).alias("_d"))
            .groupBy(key_col)
            .agg(F.avg("_d").alias(f"disp_{tag}"))
        )

    disp_a = _disp(rows_a, cent_a, "a")
    disp_b = _disp(rows_b, cent_b, "b")
    cos = _cos(F.col("c_a"), F.col("c_b"))
    return (
        cent_a.join(cent_b, key_col)  # inner: only comparable keys
        .join(disp_a, key_col, "left")
        .join(disp_b, key_col, "left")
        .select(
            key_col, "n_a", "n_b",
            cos.alias("centroid_cos"),
            (1.0 - cos).alias("drift"),
            "disp_a", "disp_b",
        )
    )
