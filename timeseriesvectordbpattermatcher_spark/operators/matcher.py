"""Vector pattern matcher: broadcast cosine top-k + reference post-filters.

Replaces the reference's Pinecone round-trip
(/root/reference/opkatsPatternMatcherUtil.py:221-253: ``kats_index.query(xq,
top_k=20, include_values=True)`` then ``filter_results`` then sort/head-10)
with two Spark strategies:

- ``cosine_topk_join``  — declarative: broadcast nested-loop join of queries
  × reference segments with the dot product as a ``zip_with``/``aggregate``
  SQL expression, then windowed top-k. Catalyst keeps the whole score
  expression in codegen; correct for any size, oracle-checkable in DuckDB.
- ``cosine_topk_bcast`` — the scale path when |refs| fits an executor
  (the reference corpus: ~8k tickers × ~150 windows ≈ 1.2M × 40 floats ≈
  200 MB): one numpy matmul per Arrow batch of queries against a broadcast
  ref matrix, emitting only k rows per query. Avoids materializing the
  |Q|×|R| cross product entirely — at 10^6 queries × 10^6 refs the join
  strategy would shuffle 10^12 rows; this shuffles 20×10^6.

Post-filters reproduce the reference exactly:
- keep-first-per-series over score-ordered results
  (/root/reference/opkatsPatternMatcherUtil.py:182-195)  -> window rank = 1
- historical-only: the trailing date parsed from the segment id must be
  <= the query window's start date (:198-207)            -> regexp + filter
- self-injection at score 1.0, sort desc, display top 10 (:250-252)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOP_K = 20
DISPLAY_K = 10


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def cosine_score_col(qcol: str, rcol: str):
    """Cosine similarity as a pure Spark SQL expression over two array cols.

    Arrays are cast to double first: float32 intermediate products would
    diverge from any double-precision oracle at ~1e-7."""
    q = F.transform(F.col(qcol), lambda x: x.cast("double"))
    r = F.transform(F.col(rcol), lambda x: x.cast("double"))
    dot = _dot(q, r)
    qn = F.sqrt(_dot(q, q))
    rn = F.sqrt(_dot(r, r))
    return F.when((qn > 0) & (rn > 0), dot / (qn * rn)).otherwise(F.lit(0.0))


def cosine_topk_join(
    queries: DataFrame,
    refs: DataFrame,
    k: int = TOP_K,
    query_id: str = "query_id",
    query_vec: str = "q_features",
    ref_id: str = "segment_id",
    ref_vec: str = "features",
) -> DataFrame:
    """Declarative top-k: queries × broadcast(refs) -> score -> row_number<=k."""
    scored = (
        queries.select(query_id, query_vec)
        .join(F.broadcast(refs.select(ref_id, ref_vec)))
        .withColumn("score", cosine_score_col(query_vec, ref_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(ref_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", ref_id, "score")
    )


# one ref matrix cached per Python worker process, keyed by its store path
_REF_CACHE: dict[str, tuple] = {}

# driver-side: store paths already written this session, keyed by
# (store_dir, semantic hash of the refs plan) — repeated pipeline calls over
# the same ref set reuse one parquet store instead of re-writing it per call
_REF_STORE_PATHS: dict[tuple, str] = {}


def _local_default_store_is_safe(master: str | None) -> bool:
    """Whether a driver-local mkdtemp default store is readable by every
    Python worker. True only for in-process masters (``local[...]`` — driver
    and executors share one machine/filesystem). On ``yarn`` / ``k8s://…`` /
    ``spark://…`` / ``mesos://…`` executors run on OTHER hosts: a
    driver-local temp dir silently yields empty/failed reads there, so the
    caller must supply a shared ``store_dir`` (HDFS/S3/DBFS/NFS path both
    the driver's parquet write and pyarrow on executors can reach)."""
    return master is not None and master.startswith("local")


def _require_cluster_safe_store(master: str | None, store_dir: str | None) -> None:
    """Raise unless the (master, store_dir) combination is cluster-safe —
    pure and unit-testable without spinning up a non-local master."""
    if store_dir is None and not _local_default_store_is_safe(master):
        raise ValueError(
            f"cosine_topk_bcast on non-local master {master!r} requires "
            "store_dir= on shared storage (HDFS/S3/DBFS/NFS): the default "
            "driver-local temp directory is not readable by executors on "
            "other hosts, which would silently produce empty match results"
        )


def _ref_store_path(refs: DataFrame, ref_id: str, ref_vec: str,
                    store_dir: str | None) -> str:
    """Materialize (once per session per distinct refs plan) the ref segment
    store and return its path.

    Every write generation gets a FRESH uuid-suffixed subdirectory, so the
    executor-side ``_REF_CACHE`` (keyed by path) can never serve a stale
    matrix after an overwrite to the same ``store_dir`` — two different ref
    sets sharing one ``store_dir`` land in two different subdirs. Reuse is
    keyed by the refs plan's ``semanticHash``; callers whose underlying
    files mutate between calls under an unchanged plan should pass a fresh
    ``store_dir`` (or clear ``_REF_STORE_PATHS``).

    Every store this process writes is removed at interpreter exit (atexit),
    so neither the mkdtemp default nor a persistent ``store_dir`` accumulates
    one parquet copy per ref set per process lifetime — within a session the
    footprint is bounded by the distinct ref plans actually in use (each
    still reachable through ``_REF_STORE_PATHS`` until exit; no mid-session
    eviction, because an alternating caller may still hold queries running
    against an older generation)."""
    import os
    import tempfile
    import uuid

    _require_cluster_safe_store(
        refs.sparkSession.conf.get("spark.master", None), store_dir
    )
    projected = refs.select(ref_id, ref_vec)
    key = (store_dir, projected.semanticHash())
    path = _REF_STORE_PATHS.get(key)
    if path is None:
        base = store_dir or tempfile.mkdtemp(prefix="ref_segment_store_")
        path = os.path.join(base, f"gen_{uuid.uuid4().hex[:12]}")
        projected.write.mode("errorifexists").parquet(path)
        _REF_STORE_PATHS[key] = path
        _register_store_cleanup(path if store_dir else base)
    return path


_STORES_TO_CLEAN: list[str] = []


def _register_store_cleanup(path: str) -> None:
    """Remove ``path`` (a gen_ subdir, or the whole mkdtemp base) at exit.
    Local-FS only: on a cluster with ``store_dir`` on HDFS/S3 shutil is a
    no-op miss and lifecycle belongs to the warehouse's retention policy."""
    if not _STORES_TO_CLEAN:
        import atexit
        import shutil

        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _STORES_TO_CLEAN]
        )
    _STORES_TO_CLEAN.append(path)


def _load_ref_matrix(path: str, ref_id: str, ref_vec: str):
    """Executor-side: read the ref segment store (parquet) into the
    (ids, matrix, norms) triple, once per Python worker. The driver never
    holds the matrix — it only knows the path."""
    hit = _REF_CACHE.get(path)
    if hit is None:
        import pyarrow.dataset as ds

        tbl = ds.dataset(path, format="parquet").to_table(columns=[ref_id, ref_vec])
        ids = np.array(tbl.column(ref_id).to_pylist())
        mat = np.array(tbl.column(ref_vec).to_pylist(), dtype=np.float64)
        if len(ids) == 0:
            mat = mat.reshape(0, 0)  # np.array([]) is 1-D; keep the matmul shape
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        norms = np.linalg.norm(mat, axis=1) if len(ids) else np.empty(0)
        norms = np.where(norms > 0, norms, 1.0)
        hit = (ids, mat, norms)
        _REF_CACHE.clear()  # hold at most one matrix per worker
        _REF_CACHE[path] = hit
    return hit


def cosine_topk_bcast(
    queries: DataFrame,
    refs: DataFrame,
    k: int = TOP_K,
    query_id: str = "query_id",
    query_vec: str = "q_features",
    ref_id: str = "segment_id",
    ref_vec: str = "features",
    store_dir: str | None = None,
) -> DataFrame:
    """Scale path: side-file "broadcast" of the ref matrix, one numpy matmul
    per Arrow batch of queries.

    The refs are materialized to a parquet segment store by the EXECUTORS
    (``refs.write.parquet``) and each Python worker lazily reads it back
    once (pyarrow, module-level cache) — the driver never collects the
    matrix, so driver memory stays O(1) regardless of |refs| (the round-1
    driver ``collect()`` died at ~100× reference scale). On a cluster pass
    ``store_dir`` on shared storage (HDFS/S3/DBFS path readable by pyarrow);
    the session-scoped local temp default is only valid for ``local[...]``
    masters — any other master without ``store_dir`` raises ``ValueError``
    up front instead of silently returning empty matches from executors
    that can't see the driver's disk.

    Emits exactly k rows per query — the |Q|×|R| intermediate never exists.
    Ties broken by ref id ascending (same order as ``cosine_topk_join``).
    The parquet store is written once per session per distinct refs plan
    (semantic-hash keyed, uuid generation subdir) and reused across calls.
    """
    qid_type = queries.schema[query_id].dataType.simpleString()
    rid_type = refs.schema[ref_id].dataType.simpleString()
    path = _ref_store_path(refs, ref_id, ref_vec, store_dir)

    kk = k
    rid, rvec = ref_id, ref_vec

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r_ids, r_mat, r_norms = _load_ref_matrix(path, rid, rvec)
        n_refs = len(r_ids)
        take = min(kk, n_refs)
        if take == 0:
            return  # empty ref store: no matches for any query
        for pdf in batches:
            if pdf.empty:
                continue
            q = np.stack(pdf[query_vec].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn = np.where(qn > 0, qn, 1.0)
            scores = (q @ r_mat.T) / (qn[:, None] * r_norms[None, :])
            # top-k by (-score, ref_id): ids are pre-sorted so stable argsort
            # on -score yields id-ascending tie order
            part = np.argpartition(-scores, take - 1, axis=1)[:, :take]
            out_frames = []
            for i, qid in enumerate(pdf[query_id]):
                cand = part[i]
                cand = cand[np.lexsort((cand, -scores[i, cand]))]
                out_frames.append(
                    pd.DataFrame(
                        {
                            query_id: qid,
                            "rank": np.arange(1, take + 1),
                            ref_id: r_ids[cand],
                            "score": scores[i, cand],
                        }
                    )
                )
            yield pd.concat(out_frames, ignore_index=True)

    schema = f"{query_id} {qid_type}, rank int, {ref_id} {rid_type}, score double"
    return queries.select(query_id, query_vec).mapInPandas(op, schema=schema)


def keep_first_per_series(
    matches: DataFrame,
    query_id: str = "query_id",
    ref_id: str = "segment_id",
) -> DataFrame:
    """P4 dedupe (/root/reference/opkatsPatternMatcherUtil.py:182-195):
    the reference walks score-ordered results and keeps the first row per
    parsed series name — ids are '{prefix}_{series}_{d0}_{d1}' (4 parts) or
    '{series}_{d0}_{d1}' (3 parts)."""
    parts = F.split(F.col(ref_id), "_")
    series = F.when(F.size(parts) == 3, parts.getItem(0)).otherwise(parts.getItem(1))
    w = Window.partitionBy(query_id, series).orderBy(F.asc("rank"))
    return (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def historical_only(
    matches: DataFrame,
    query_start: str | F.Column,
    ref_id: str = "segment_id",
) -> DataFrame:
    """P5 filter (/root/reference/opkatsPatternMatcherUtil.py:198-207): parse
    the trailing date out of each result id, keep results ending on or before
    the query window's start date."""
    final_date = F.to_date(F.element_at(F.split(F.col(ref_id), "_"), -1), "yyyyMMdd")
    start = F.to_date(F.lit(query_start)) if isinstance(query_start, str) else query_start
    return matches.filter(final_date <= start)


def rerank(matches: DataFrame, query_id: str = "query_id") -> DataFrame:
    """Recompute dense rank after filters (reference re-sorts at :251)."""
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc("segment_id"))
    return matches.withColumn("rank", F.row_number().over(w))


# auto-routing thresholds: up to JOIN_MAX_REFS the |Q|x|R| nested-loop
# intermediate is cheap; past it the side-file matmul wins until the matrix
# no longer fits one executor's memory (~40-dim float64 at 1 GiB ~= 3.3M
# refs), after which only bucketed approximate search scales
AUTO_JOIN_MAX_REFS = 20_000
AUTO_BCAST_MAX_BYTES = 1 << 30


def choose_strategy(
    n_refs: int,
    dim: int,
    join_max_refs: int = AUTO_JOIN_MAX_REFS,
    bcast_max_bytes: int = AUTO_BCAST_MAX_BYTES,
) -> str:
    """Pick the top-k strategy from the ref-set size (pure, unit-testable).

    join  : small ref sets — exact broadcast nested-loop join.
    bcast : ref matrix fits an executor — exact side-file matmul.
    lsh   : oversize ref sets — bucketed approximate search (recall >= 0.9
            pinned in tests/test_matcher.py)."""
    if n_refs <= join_max_refs:
        return "join"
    if n_refs * dim * 8 <= bcast_max_bytes:
        return "bcast"
    return "lsh"


def match_pipeline(
    queries: DataFrame,
    refs: DataFrame | None,
    k: int = TOP_K,
    display_k: int = DISPLAY_K,
    query_start_col: str = "query_start",
    strategy: str = "auto",
    store_dir: str | None = None,
    index_table=None,
    nprobe: int = 4,
) -> DataFrame:
    """Full reference query path E2 (SURVEY.md §3): top-k search -> dedupe per
    series -> historical-only -> re-rank -> head ``display_k`` per query.

    ``queries`` must carry (query_id, q_features, query_start date col).

    Strategies:
    - ``auto``  — (default) route by ref count/bytes via
      :func:`choose_strategy`: one cheap count+dim agg over the id/vector
      projection gates the choice, so a caller can no longer broadcast a
      too-large ref table by accident at 100x scale.
    - ``join``  — broadcast nested-loop + expression scoring (exact).
    - ``bcast`` — side-file ref matrix + Arrow-batch matmul (exact; the
      default scale path when the matrix fits an executor). On a non-local
      master this REQUIRES ``store_dir`` on shared storage (HDFS/S3/DBFS)
      — the driver-local temp default would be invisible to executors, so
      it raises ``ValueError`` instead (cluster-safety guard).
    - ``lsh``   — hyperplane-bucketed approximate top-k (recall tested
      >= 0.9 vs brute force in tests/test_matcher.py) — the 100 TB path
      when the ref matrix no longer fits one executor.
    - ``ivf``   — coarse-quantizer (k-means lists) approximate top-k,
      partition-prunable on list_id.

    ``index_table`` (a SnapshotTable written by
    ``similarity.build_ivf_index`` over (segment_id, features)) routes the
    top-k through the PERSISTED index instead of any per-call strategy:
    each batch of queries scans only its ``nprobe`` lists' data files
    through the snapshot manifest — the serving shape when the same ref
    corpus is probed thousands of times. The E2 filters downstream are
    identical, so index vs per-call strategies differ only by the IVF
    recall profile (pinned in tests). Pass ``refs=None`` with it;
    ``strategy`` must stay ``'auto'`` (anything else contradicts the
    explicit index and raises).
    """
    if index_table is not None:
        if refs is not None:
            raise ValueError("pass either refs or index_table, not both")
        if strategy != "auto":
            raise ValueError(
                "strategy is chosen by the persisted index; leave it 'auto' "
                f"when index_table is given (got {strategy!r})"
            )
        snap = index_table.current_snapshot()
        meta = (snap.meta or {}) if snap else {}
        if meta.get("ivf_ref_id") != "segment_id" or meta.get("ivf_ref_vec") != "features":
            raise ValueError(
                "index_table must hold an IVF index built over "
                "(segment_id, features) — run similarity.build_ivf_index "
                f"on the segment corpus (meta: {sorted(meta)[:6]})"
            )
        from .similarity import ivf_probe_index

        matches = ivf_probe_index(
            queries, index_table, k=k, nprobe=nprobe,
            query_id="query_id", query_vec="q_features",
        )
        matches = matches.join(
            queries.select("query_id", query_start_col), "query_id", "left"
        )
        matches = keep_first_per_series(matches)
        matches = historical_only(matches, F.col(query_start_col))
        matches = rerank(matches.drop(query_start_col))
        return matches.filter(F.col("rank") <= display_k)
    if refs is None:
        raise ValueError("refs is required when no index_table is given")
    if strategy == "auto":
        stats = refs.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.size("features")).alias("dim")
        ).first()
        strategy = choose_strategy(int(stats["n"]), int(stats["dim"] or 0))
    if strategy == "join":
        matches = cosine_topk_join(queries, refs, k=k)
    elif strategy == "bcast":
        matches = cosine_topk_bcast(queries, refs, k=k, store_dir=store_dir)
    elif strategy in ("lsh", "ivf"):
        from .similarity import ivf_topk, lsh_topk

        fn = lsh_topk if strategy == "lsh" else ivf_topk
        matches = fn(
            queries, refs.select("segment_id", "features"), k=k,
            query_id="query_id", query_vec="q_features",
            ref_id="segment_id", ref_vec="features",
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    matches = matches.join(
        queries.select("query_id", query_start_col), "query_id", "left"
    )
    matches = keep_first_per_series(matches)
    matches = historical_only(matches, F.col(query_start_col))
    matches = rerank(matches.drop(query_start_col))
    return matches.filter(F.col("rank") <= display_k)
