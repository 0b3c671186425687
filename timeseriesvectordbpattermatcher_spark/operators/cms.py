"""Tiered per-token frequency via mergeable Count-Min sketches.

The rollup planes answer "how many tokens" (stats), "how are lengths
distributed" (histogram/DDSketch), "how many distinct docs" (HLL) — but
not "how often did TOKEN t appear in this bucket". Exact per-token counts
per (source, bucket) are a buckets x vocab blow-up (50k-entry maps per
minute bucket at 10^12 rows); the classic fix is the Count-Min sketch
(Cormode & Muthukrishnan, J. Algorithms 2005): a d x w counter grid where
each occurrence increments one counter per hash row, point estimates read
``min_j grid[j][h_j(t)]``, guaranteeing

    exact <= estimate <= exact + (e/w) * N   with prob >= 1 - e^(-d)

(N = the bucket's total token occurrences). CMS grids merge by
element-wise ADDITION — fully mergeable, so the 1m -> 1h -> 1d cascade is
bit-exact vs a direct build and the error bound at every tier is the
bound for that tier's own N. No other plane needs rescanning raw to
answer per-token questions at day granularity.

Representation: the grid is stored SPARSE as ``map<int,bigint>`` of
non-zero cells keyed ``j*width + h_j(token)`` — most minute buckets touch
far fewer than d*w distinct cells, sparse maps merge with the exact
histogram machinery verbatim (count addition), and the dense bound d*w
caps every bucket's summary regardless of corpus size.

Hashing: row j's hash is ``xxhash64(token AS LONG, j)`` (Spark's builtin
64-bit xxHash chain) reduced mod width — d=depth independent functions by
seeding with the row index. The engine-free oracle in
tests/oracle/xxh64_pure.py reproduces this chain from the public xxHash
spec, so the sketch tests pin map equality against an implementation that
imports nothing from the engine.

Two build/merge engines, map-for-map identical (parity-pinned):

- ``expr``: explode + two hash-bounded aggregations (the exact
  histogram shape) — pure codegen, but when buckets are SMALL relative
  to the grid the map-side combine absorbs nothing and the build
  shuffles ~buckets x min(N*d, d*w) cell rows (measured 472s at sf0.1).
- ``arrow`` (default): ONE repartition co-locating each (key, bucket),
  then an accumulating ``mapInArrow`` kernel — the vectorized bit-exact
  ``xxhash64(long, lit(j))`` twin (functions/xxhash.py) + per-batch
  ``np.bincount`` — emits COMPLETE sparse grids, so no map-entry
  exchange exists anywhere in the plan (46s on the same corpus). The
  cascade merge uses the same shape with weighted bincount scatter.

Reads (estimate / N) are always least()-of-lookups codegen expressions.

The reference repo has no frequency sketches (its token work is
full-materialization pandas); this plane exists for the north star's
"token-level stats" at cascading retention tiers.
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quantiles import hist_cascade
from .rollup import TIER_TRUNC

__all__ = [
    "cms_error_bound",
    "cms_cell_keys",
    "cms_bucket",
    "cms_cascade",
    "cms_all_tiers",
    "cms_estimate",
    "cms_n",
    "cms_estimates_for",
    "cms_cascade_width",
]


def _check_dims(width: int, depth: int) -> None:
    if not (isinstance(width, int) and width >= 2):
        raise ValueError(f"width must be an int >= 2, got {width!r}")
    if not (isinstance(depth, int) and 1 <= depth <= 16):
        raise ValueError(f"depth must be an int in [1, 16], got {depth!r}")


def cms_error_bound(width: int, depth: int) -> tuple[float, float]:
    """(epsilon, delta): estimate <= exact + epsilon*N with prob >= 1-delta."""
    _check_dims(width, depth)
    return math.e / width, math.exp(-depth)


def cms_cell_keys(token: Column, width: int, depth: int) -> Column:
    """The d sparse-map keys a token occurrence increments:
    ``j*width + pmod(xxhash64(token::long, j), width)`` for each hash row
    j. NULL token -> NULL (callers exclude it from the sketch)."""
    _check_dims(width, depth)
    t = token.cast("long")
    return F.when(
        t.isNotNull(),
        F.array(
            *[
                (
                    F.lit(j * width)
                    + F.pmod(F.xxhash64(t, F.lit(j)), F.lit(width))
                ).cast("int")
                for j in range(depth)
            ]
        ),
    )


def _resolve_engine(engine: str) -> str:
    if engine not in ("auto", "expr", "arrow"):
        raise ValueError(f"engine must be auto|expr|arrow, got {engine!r}")
    return "arrow" if engine == "auto" else engine


def _cms_out_schema(pre: DataFrame, key_col: str, sketch_col: str):
    from pyspark.sql import types as T

    return T.StructType(
        [
            pre.schema[key_col],
            T.StructField("bucket_ts", pre.schema["bucket_ts"].dataType),
            T.StructField(
                sketch_col, T.MapType(T.IntegerType(), T.LongType(), False)
            ),
        ]
    )


def _repartitioned(pre: DataFrame, key_col: str, num_partitions: int | None):
    """Co-locate every (key, bucket_ts) group on one partition so the
    accumulating kernel can emit COMPLETE sketches with no downstream
    merge shuffle. Default partition count = 8x the session's shuffle
    partitions: the kernel holds one sparse grid per bucket in its
    partition, so more/smaller partitions bound peak Python memory (at
    cluster scale, size so one partition's buckets x depth x width cells
    fit an executor core's share)."""
    if num_partitions is None:
        sess = pre.sparkSession
        num_partitions = 8 * int(sess.conf.get("spark.sql.shuffle.partitions"))
    # the sort makes each (key, bucket) group CONTIGUOUS, which lets the
    # kernels flush in small L2-resident lgid blocks instead of one
    # partition-wide dense grid (measured 26x faster sparse conversion
    # under 32-way memory-bandwidth contention); Tungsten sorts the
    # already-shuffled partition, no extra exchange
    return pre.repartition(
        num_partitions, F.col(key_col), F.col("bucket_ts")
    ).sortWithinPartitions(key_col, "bucket_ts")


class _SketchAccumulator:
    """Per-partition (key, bucket) -> sorted sparse (cells, counts) grids.

    Batches are bincounted DENSE over only the buckets present in that
    batch (lgids x depth x width int64 cells — bounded by the repartition
    granularity, not the corpus), compressed to sparse immediately, and
    re-merged only for buckets that straddle an Arrow batch boundary."""

    def __init__(self, width: int, depth: int):
        self.dw = depth * width
        self.order: list[tuple] = []  # insertion-ordered (key, ts) pairs
        self.segs: dict[tuple, list] = {}  # pair -> [(cells, counts), ...]

    def flush(self, lgid_pairs: list, combined, weights,
              stride: int | None = None) -> None:
        """lgid_pairs: batch-local gid -> (key, ts) tuple; combined: int64
        array of ``local_gid * stride + cell`` updates; weights: None
        (count 1 each) or float64 per-update increments. ``stride`` only
        scopes THIS flush (stored cells are absolute), so a merge batch
        can widen it past self.dw when fine maps carry larger cell ids
        than the configured dims imply — no silent collisions."""
        import numpy as np

        dw = stride if stride is not None else self.dw
        n_lgid = len(lgid_pairs)
        if len(combined):
            dense = np.bincount(
                combined,
                weights=weights,
                minlength=n_lgid * dw,
            )
            # float64 from weighted bincount is exact up to 2^53 — far
            # beyond any per-cell day count; cast back to int64
            nz = np.flatnonzero(dense)
            gid_of = nz // dw
            cell_of = (nz % dw).astype(np.int32)
            cnt_of = np.rint(dense[nz]).astype(np.int64)
        else:
            gid_of = np.empty(0, dtype=np.int64)
            cell_of = np.empty(0, dtype=np.int32)
            cnt_of = np.empty(0, dtype=np.int64)
        bounds = np.searchsorted(gid_of, np.arange(n_lgid + 1))
        for g, pair in enumerate(lgid_pairs):
            seg = (cell_of[bounds[g]: bounds[g + 1]],
                   cnt_of[bounds[g]: bounds[g + 1]])
            if pair in self.segs:
                self.segs[pair].append(seg)
            else:
                self.order.append(pair)
                self.segs[pair] = [seg]

    def emit(self, key_type, ts_type, out_names):
        import numpy as np
        import pyarrow as pa

        if not self.order:
            return None
        keys_out, ts_out = [], []
        map_offsets = [0]
        cells_all, counts_all = [], []
        total = 0
        for pair in self.order:
            keys_out.append(pair[0])
            ts_out.append(pair[1])
            segs = self.segs[pair]
            if len(segs) == 1:
                cells, counts = segs[0]
            else:  # bucket straddled an Arrow batch boundary: re-merge
                cells = np.concatenate([s[0] for s in segs])
                counts = np.concatenate([s[1] for s in segs])
                order = np.argsort(cells, kind="stable")
                cells, counts = cells[order], counts[order]
                first = np.ones(len(cells), dtype=bool)
                first[1:] = cells[1:] != cells[:-1]
                starts = np.flatnonzero(first)
                counts = np.add.reduceat(counts, starts) if len(cells) else counts
                cells = cells[starts]
            total += len(cells)
            cells_all.append(cells)
            counts_all.append(counts)
            map_offsets.append(total)
        flat_cells = (
            np.concatenate(cells_all) if cells_all else np.empty(0, np.int32)
        )
        flat_counts = (
            np.concatenate(counts_all) if counts_all else np.empty(0, np.int64)
        )
        maps = pa.MapArray.from_arrays(
            pa.array(map_offsets, pa.int32()),
            pa.array(flat_cells, pa.int32()),
            pa.array(flat_counts, pa.int64()),
        )
        return pa.RecordBatch.from_arrays(
            [
                pa.array(keys_out, key_type),
                pa.array(ts_out, pa.int64()).cast(ts_type),
                maps,
            ],
            names=out_names,
        )


def _cms_build_kernel(width: int, depth: int, out_names: list[str]):
    """Accumulating mapInArrow kernel: raw (key, bucket_ts, tokens)
    partitions -> complete sparse CMS grids. Hashing is the bit-exact
    numpy twin of ``F.xxhash64(token::long, lit(j))``
    (functions/xxhash.py, parity-pinned)."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        from timeseriesvectordbpattermatcher_spark.functions.xxhash import (
            _SPARK_SEED,
            xxh64_int_const,
            xxh64_long,
        )

        acc = _SketchAccumulator(width, depth)
        dw = depth * width
        key_type = ts_type = None
        for b in batches:
            if b.num_rows == 0:
                continue
            keyarr, tsarr, toks = b.column(0), b.column(1), b.column(2)
            if key_type is None:
                key_type, ts_type = keyarr.type, tsarr.type
            key_py = keyarr.to_pylist()
            ts_py = tsarr.cast("int64").to_pylist()
            pairs = pd.Series(list(zip(key_py, ts_py)))
            codes, uniq = pd.factorize(pairs, use_na_sentinel=False)
            # flat token occurrences, minhash-kernel idiom: gather only
            # non-null list extents so sliced arrays can't leak values
            offs = np.asarray(toks.offsets, dtype=np.int64)
            starts, ends = offs[:-1] - offs[0], offs[1:] - offs[0]
            raw_len = ends - starts
            null_list = np.asarray(toks.is_null(), dtype=bool)
            eff_len = np.where(null_list, 0, raw_len)
            sel = np.repeat(~null_list, raw_len)
            vals = np.asarray(
                toks.values.cast("int64"), dtype=np.int64
            )[offs[0]: offs[-1]][sel]
            val_null = np.asarray(toks.values.is_null(), dtype=bool)[
                offs[0]: offs[-1]
            ][sel]
            rep = np.repeat(codes.astype(np.int64), eff_len)
            if val_null.any():  # null elements never update the sketch
                keep = ~val_null
                vals, rep = vals[keep], rep[keep]
            if len(vals) and np.all(codes[1:] >= codes[:-1]):
                # sorted partition (the _repartitioned contract): flush in
                # L2-resident lgid blocks with chunked hashing
                _blocked_token_scatter(
                    acc, list(uniq), rep, vals, width, depth
                )
                continue
            if len(vals):  # unsorted caller-supplied input: one dense grid
                inner = xxh64_long(vals.view(np.uint64), _SPARK_SEED)
                combined = np.empty(depth * len(vals), dtype=np.int64)
                base = rep * dw
                for j in range(depth):
                    col = xxh64_int_const(j, inner).view(np.int64) % width
                    combined[j * len(vals): (j + 1) * len(vals)] = (
                        base + j * width + col
                    )
            else:
                combined = np.empty(0, dtype=np.int64)
            acc.flush(list(uniq), combined, None)
        out = acc.emit(key_type, ts_type, out_names)
        if out is not None:
            yield out

    return gen


_HASH_CHUNK = 1 << 14  # xxh64 temporaries stay L2-resident per core
_BLOCK_DENSE_BYTES = 512 * 1024  # per-flush dense grid target (L2-sized)


def _lgid_block(width: int, depth: int) -> int:
    return max(1, _BLOCK_DENSE_BYTES // (depth * width * 8))


def _blocked_token_scatter(acc, uniq_pairs, rep, vals, width, depth):
    """Flush token occurrences block-of-lgids at a time. Requires ``rep``
    monotone non-decreasing (sorted partitions — what ``_repartitioned``
    emits); hashing runs in L2-sized chunks so the ~20 numpy temporaries
    of the xxh64 chain never round-trip DRAM (2.7x under contention)."""
    import numpy as np

    from timeseriesvectordbpattermatcher_spark.functions.xxhash import (
        _SPARK_SEED,
        xxh64_int_const,
        xxh64_long,
    )

    dw = depth * width
    n_lgid = len(uniq_pairs)
    starts = np.searchsorted(rep, np.arange(n_lgid + 1))
    block = _lgid_block(width, depth)
    for g0 in range(0, n_lgid, block):
        g1 = min(g0 + block, n_lgid)
        s, e = int(starts[g0]), int(starts[g1])
        m = e - s
        combined = np.empty(depth * m, dtype=np.int64)
        base = (rep[s:e] - g0) * dw
        for cs in range(0, m, _HASH_CHUNK):
            ce = min(cs + _HASH_CHUNK, m)
            inner = xxh64_long(vals[s + cs: s + ce].view(np.uint64), _SPARK_SEED)
            bs = base[cs:ce]
            for j in range(depth):
                col = xxh64_int_const(j, inner).view(np.int64) % width
                combined[j * m + cs: j * m + ce] = bs + j * width + col
        acc.flush(uniq_pairs[g0:g1], combined, None)


def _blocked_col_scatter(acc, uniq_pairs, rep, cols, width, depth):
    """Blocked flush from PRECOMPUTED hash columns (the multi-tier path:
    cols is (depth, n) int32, hashed once, scattered once per tier)."""
    import numpy as np

    dw = depth * width
    n_lgid = len(uniq_pairs)
    starts = np.searchsorted(rep, np.arange(n_lgid + 1))
    block = _lgid_block(width, depth)
    for g0 in range(0, n_lgid, block):
        g1 = min(g0 + block, n_lgid)
        s, e = int(starts[g0]), int(starts[g1])
        m = e - s
        combined = np.empty(depth * m, dtype=np.int64)
        base = (rep[s:e] - g0) * dw
        for j in range(depth):
            combined[j * m: (j + 1) * m] = base + j * width + cols[j, s:e]
        acc.flush(uniq_pairs[g0:g1], combined, None)


def _blocked_cell_scatter(acc, uniq_pairs, rep, cells, counts, stride,
                          width, depth):
    """Blocked weighted flush of pre-addressed (cell, count) entries (the
    cascade merge path)."""
    import numpy as np

    n_lgid = len(uniq_pairs)
    starts = np.searchsorted(rep, np.arange(n_lgid + 1))
    block = max(1, _BLOCK_DENSE_BYTES // (stride * 8))
    for g0 in range(0, n_lgid, block):
        g1 = min(g0 + block, n_lgid)
        s, e = int(starts[g0]), int(starts[g1])
        combined = (rep[s:e] - g0) * stride + cells[s:e]
        acc.flush(
            uniq_pairs[g0:g1], combined,
            counts[s:e].astype(np.float64), stride,
        )


def _cms_multi_kernel(width: int, depth: int, n_tiers: int,
                      tier_names: list[str], out_names: list[str]):
    """Accumulating mapInArrow kernel for the FUSED multi-tier build:
    raw (key, b_0, ..., b_{k-1}, tokens) partitions (b_i = tier i's
    bucket ts, fine -> coarse, co-located on the coarsest) -> complete
    sparse grids for EVERY tier in one pass. The expensive per-occurrence
    work (xxh64 chain, cell columns) happens once; each tier only adds
    its own bincount scatter — so building 1m+1h+1d costs one raw
    decode, not three, and no sketch entry ever rides an exchange."""

    def gen(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from timeseriesvectordbpattermatcher_spark.functions.xxhash import (
            _SPARK_SEED,
            xxh64_int_const,
            xxh64_long,
        )

        accs = [_SketchAccumulator(width, depth) for _ in range(n_tiers)]
        dw = depth * width
        key_type = ts_type = None
        for b in batches:
            if b.num_rows == 0:
                continue
            keyarr = b.column(0)
            tsarrs = [b.column(1 + i) for i in range(n_tiers)]
            toks = b.column(1 + n_tiers)
            if key_type is None:
                key_type, ts_type = keyarr.type, tsarrs[0].type
            key_py = keyarr.to_pylist()
            ts_np = [
                np.asarray(t.cast("int64"), dtype=np.int64) for t in tsarrs
            ]
            pairs = pd.Series(list(zip(key_py, ts_np[0].tolist())))
            codes, uniq = pd.factorize(pairs, use_na_sentinel=False)
            # per-lgid coarse bucket ts via each lgid's first occurrence
            # (the fine bucket determines every coarser one)
            _, first_idx = np.unique(codes, return_index=True)
            lgid_keys = [p[0] for p in uniq]
            tier_uniq: list[list] = [list(uniq)]
            lgid2tier = [np.arange(len(uniq), dtype=np.int64)]
            for i in range(1, n_tiers):
                ts_i = ts_np[i][first_idx]
                pairs_i = pd.Series(list(zip(lgid_keys, ts_i.tolist())))
                codes_i, uniq_i = pd.factorize(pairs_i, use_na_sentinel=False)
                tier_uniq.append(list(uniq_i))
                lgid2tier.append(codes_i.astype(np.int64))
            # flat token occurrences — same gather as _cms_build_kernel
            offs = np.asarray(toks.offsets, dtype=np.int64)
            starts, ends = offs[:-1] - offs[0], offs[1:] - offs[0]
            raw_len = ends - starts
            null_list = np.asarray(toks.is_null(), dtype=bool)
            eff_len = np.where(null_list, 0, raw_len)
            sel = np.repeat(~null_list, raw_len)
            vals = np.asarray(
                toks.values.cast("int64"), dtype=np.int64
            )[offs[0]: offs[-1]][sel]
            val_null = np.asarray(toks.values.is_null(), dtype=bool)[
                offs[0]: offs[-1]
            ][sel]
            rep = np.repeat(codes.astype(np.int64), eff_len)
            if val_null.any():
                keep = ~val_null
                vals, rep = vals[keep], rep[keep]
            n = len(vals)
            tiers_monotone = n and np.all(codes[1:] >= codes[:-1]) and all(
                np.all(lgid2tier[i][1:] >= lgid2tier[i][:-1])
                for i in range(1, n_tiers)
            )
            if tiers_monotone:
                # hash once into L2-chunked columns, scatter per tier in
                # lgid blocks (rep_i inherits monotonicity: factorize of
                # monotone fine codes is first-occurrence-ordered)
                cols = np.empty((depth, n), dtype=np.int32)
                for cs in range(0, n, _HASH_CHUNK):
                    ce = min(cs + _HASH_CHUNK, n)
                    inner = xxh64_long(
                        vals[cs:ce].view(np.uint64), _SPARK_SEED
                    )
                    for j in range(depth):
                        cols[j, cs:ce] = (
                            xxh64_int_const(j, inner).view(np.int64) % width
                        )
                for i in range(n_tiers):
                    _blocked_col_scatter(
                        accs[i], tier_uniq[i], lgid2tier[i][rep],
                        cols, width, depth,
                    )
                continue
            combineds = [
                np.empty(depth * n, dtype=np.int64) for _ in range(n_tiers)
            ]
            if n:
                inner = xxh64_long(vals.view(np.uint64), _SPARK_SEED)
                bases = [lgid2tier[i][rep] * dw for i in range(n_tiers)]
                for j in range(depth):
                    cell = xxh64_int_const(j, inner).view(np.int64) % width
                    cell += j * width
                    for i in range(n_tiers):
                        combineds[i][j * n: (j + 1) * n] = bases[i] + cell
            for i in range(n_tiers):
                accs[i].flush(tier_uniq[i], combineds[i], None)
        for i in range(n_tiers):
            rb = accs[i].emit(key_type, ts_type, ["k", "t", "m"])
            if rb is not None:
                tier_col = pa.array([tier_names[i]] * rb.num_rows, pa.string())
                yield pa.RecordBatch.from_arrays(
                    [rb.column(0), tier_col, rb.column(1), rb.column(2)],
                    names=out_names,
                )

    return gen


def _cms_merge_kernel(width: int, depth: int, out_names: list[str]):
    """Accumulating mapInArrow kernel for the cascade: fine-tier
    (key, coarse_ts, map) partitions -> coarse sparse grids by weighted
    bincount scatter (cell-count addition, bit-exact)."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        acc = _SketchAccumulator(width, depth)
        dw = depth * width
        key_type = ts_type = None
        for b in batches:
            if b.num_rows == 0:
                continue
            keyarr, tsarr, maps = b.column(0), b.column(1), b.column(2)
            if key_type is None:
                key_type, ts_type = keyarr.type, tsarr.type
            key_py = keyarr.to_pylist()
            ts_py = tsarr.cast("int64").to_pylist()
            pairs = pd.Series(list(zip(key_py, ts_py)))
            codes, uniq = pd.factorize(pairs, use_na_sentinel=False)
            offs = np.asarray(maps.offsets, dtype=np.int64)
            starts, ends = offs[:-1] - offs[0], offs[1:] - offs[0]
            raw_len = ends - starts
            null_map = np.asarray(maps.is_null(), dtype=bool)
            eff_len = np.where(null_map, 0, raw_len)
            sel = np.repeat(~null_map, raw_len)
            cells = np.asarray(maps.keys.cast("int64"), dtype=np.int64)[
                offs[0]: offs[-1]
            ][sel]
            counts = np.asarray(maps.items.cast("int64"), dtype=np.int64)[
                offs[0]: offs[-1]
            ][sel]
            rep = np.repeat(codes.astype(np.int64), eff_len)
            # widen past the configured dims if the fine maps carry larger
            # cells (build dims > cascade defaults): stride is flush-local
            stride = dw
            if len(cells):
                if int(cells.min()) < 0:
                    raise ValueError(
                        "cms_cascade: negative cell key in sketch map — "
                        "not a CMS sparse grid"
                    )
                stride = max(dw, int(cells.max()) + 1)
            if len(cells) and np.all(codes[1:] >= codes[:-1]):
                _blocked_cell_scatter(
                    acc, list(uniq), rep, cells, counts, stride, width, depth
                )
                continue
            combined = rep * stride + cells
            acc.flush(list(uniq), combined, counts.astype(np.float64), stride)
        out = acc.emit(key_type, ts_type, out_names)
        if out is not None:
            yield out

    return gen


def cms_bucket(
    rows: DataFrame,
    tier: str = "1m",
    width: int = 2048,
    depth: int = 4,
    key_col: str = "source",
    ts_col: str = "event_ts",
    tokens_col: str = "tokens",
    sketch_col: str = "cms",
    engine: str = "auto",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-(key, bucket) CMS over every token occurrence in ``tokens_col``
    (array column; duplicate tokens in one row count once each, matching
    total-occurrence semantics). Null ts rows are dropped (no bucket);
    null/empty token arrays and null elements don't update the sketch —
    a bucket whose rows carry no tokens keeps an empty map, it does not
    vanish.

    Engines (``auto`` -> ``arrow``; both produce identical maps,
    parity-pinned in tests/test_cms.py):

    - ``expr``: pure codegen'd explode + two hash aggregations. Correct
      at any scale but pathological when buckets are SMALL relative to
      the grid: with near-unique tokens the map-side combine absorbs
      nothing, so the build shuffles ~buckets x min(N_bucket*depth, d*w)
      cell rows (measured 472s at sf0.1 — the 2.15B-row fan-out barely
      combines into ~1.5B shuffled cells).
    - ``arrow``: ONE shuffle of the raw rows co-locating each
      (key, bucket) on a partition, then an accumulating ``mapInArrow``
      kernel (vectorized bit-exact ``xxhash64(long, lit(j))`` twin +
      per-batch ``np.bincount``) emits COMPLETE sketches — no map-entry
      shuffle at all. Shuffle bytes = the token payload itself (8x fewer
      than the expr plan's cell rows at sf0.1; 472s -> 46s measured).
    """
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    _check_dims(width, depth)
    eng = _resolve_engine(engine)
    if eng == "expr":
        tok = (
            rows.filter(F.col(ts_col).isNotNull())
            .withColumn(
                "bucket_ts", F.date_trunc(TIER_TRUNC[tier], F.col(ts_col))
            )
            .select(
                key_col, "bucket_ts", F.explode_outer(tokens_col).alias("_t")
            )
        )
        cells = tok.select(
            key_col,
            "bucket_ts",
            F.explode_outer(
                cms_cell_keys(F.col("_t"), width, depth)
            ).alias("_hv"),
        )
        per_cell = cells.groupBy(key_col, "bucket_ts", "_hv").agg(
            F.count("_hv").alias("_hc")  # count() skips null keep-alives
        )
        return per_cell.groupBy(key_col, "bucket_ts").agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_hv").isNotNull(), F.struct("_hv", "_hc"))
                    )
                )
            ).alias(sketch_col)
        )
    pre = (
        rows.filter(F.col(ts_col).isNotNull())
        .select(
            key_col,
            F.date_trunc(TIER_TRUNC[tier], F.col(ts_col)).alias("bucket_ts"),
            F.col(tokens_col).cast("array<long>").alias("_toks"),
        )
    )
    out_schema = _cms_out_schema(pre, key_col, sketch_col)
    return _repartitioned(pre, key_col, num_partitions).mapInArrow(
        _cms_build_kernel(width, depth, [f.name for f in out_schema.fields]),
        out_schema,
    )


def cms_all_tiers(
    rows: DataFrame,
    tiers: tuple = ("1m", "1h", "1d"),
    width: int = 2048,
    depth: int = 4,
    key_col: str = "source",
    ts_col: str = "event_ts",
    tokens_col: str = "tokens",
    sketch_col: str = "cms",
    num_partitions: int | None = None,
) -> DataFrame:
    """FUSED tier build: every requested tier's sketches from ONE raw
    scan and ONE shuffle — output rows are ``(key, tier, bucket_ts,
    sketch)``, bit-exact equal (per tier) to ``cms_bucket`` followed by
    ``cms_cascade`` (parity-pinned in tests/test_cms.py).

    Why: the sequential build re-decodes raw for the 1m tier, then ships
    the ~buckets x d x w-entry 1m maps through Python->JVM, an exchange,
    and JVM->Python TWICE more for the 1h/1d merges — at sf0.1 the map
    traffic is ~8x the raw token payload and dominates the wall
    (bench.py cms_tokenfreq_1d, 34.5s -> ~1/3 fused). Here raw
    repartitions once on (key, coarsest bucket) — which co-locates every
    finer bucket too — and the kernel scatters each token occurrence
    into every tier's accumulator in the same pass: the xxh64 chain and
    cell columns are computed once, each extra tier costs one bincount,
    and sketch entries cross the Arrow boundary exactly once, with no
    entry-level exchange anywhere.

    Filter ``tier = '...'`` to split planes; persist (or write) the
    combined frame first if you read more than one tier, or each read
    re-runs the kernel. At 100 TB, partition the single output write by
    ``tier`` — same files the per-tier builds would have produced.

    ``tiers`` must be a fine->coarse subset of ("1m", "1h", "1d")."""
    from .rollup import TIER_ORDER

    _check_dims(width, depth)
    if (
        not tiers
        or len(set(tiers)) != len(tiers)
        or any(t not in TIER_TRUNC for t in tiers)
        or list(tiers) != sorted(tiers, key=TIER_ORDER.index)
    ):
        raise ValueError(
            f"tiers must be a non-empty fine->coarse subset of {TIER_ORDER},"
            f" got {tiers!r}"
        )
    pre = (
        rows.filter(F.col(ts_col).isNotNull())
        .select(
            key_col,
            *[
                F.date_trunc(TIER_TRUNC[t], F.col(ts_col)).alias(f"_b{i}")
                for i, t in enumerate(tiers)
            ],
            F.col(tokens_col).cast("array<long>").alias("_toks"),
        )
    )
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            pre.schema[key_col],
            T.StructField("tier", T.StringType(), False),
            T.StructField("bucket_ts", pre.schema["_b0"].dataType),
            T.StructField(
                sketch_col, T.MapType(T.IntegerType(), T.LongType(), False)
            ),
        ]
    )
    if num_partitions is None:
        sess = pre.sparkSession
        num_partitions = 8 * int(sess.conf.get("spark.sql.shuffle.partitions"))
    co = pre.repartition(
        num_partitions, F.col(key_col), F.col(f"_b{len(tiers) - 1}")
    ).sortWithinPartitions(key_col, "_b0")
    return co.mapInArrow(
        _cms_multi_kernel(
            width, depth, len(tiers), list(tiers),
            [f.name for f in out_schema.fields],
        ),
        out_schema,
    )


def cms_cascade(
    sketches: DataFrame,
    tier: str,
    key_col: str = "source",
    sketch_col: str = "cms",
    width: int = 2048,
    depth: int = 4,
    engine: str = "auto",
    num_partitions: int | None = None,
) -> DataFrame:
    """Merge fine-tier sketches one tier coarser — cell-count addition, so
    a cascaded tier is BIT-EXACT vs building that tier from raw and its
    error bound is the CMS bound for the coarser bucket's own N.

    ``expr`` delegates to the histogram merge (explode + re-agg: shuffles
    every map entry twice); ``arrow`` (the ``auto`` default) repartitions
    the fine-tier ROWS by coarse bucket and scatter-adds entries in an
    accumulating kernel — one shuffle of the sketch payload, no
    entry-level exchange. ``width``/``depth`` only size the arrow
    kernel's dense accumulator; they must match the build dims."""
    eng = _resolve_engine(engine)
    if eng == "expr":
        return hist_cascade(sketches, tier, key_col=key_col, hist_col=sketch_col)
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be in {list(TIER_TRUNC)}")
    _check_dims(width, depth)
    pre = sketches.select(
        key_col,
        F.date_trunc(TIER_TRUNC[tier], F.col("bucket_ts")).alias("bucket_ts"),
        F.col(sketch_col).alias("_m"),
    )
    out_schema = _cms_out_schema(pre, key_col, sketch_col)
    return _repartitioned(pre, key_col, num_partitions).mapInArrow(
        _cms_merge_kernel(width, depth, [f.name for f in out_schema.fields]),
        out_schema,
    )


def cms_estimate(
    sketch: Column | str,
    token: Column | int,
    width: int = 2048,
    depth: int = 4,
) -> Column:
    """Point-estimate expression: ``min_j`` of the token's d cells (absent
    sparse cell = 0). Always >= the true occurrence count; exceeds it by
    more than ``(e/width) * N`` with probability <= ``e^-depth``."""
    _check_dims(width, depth)
    sk = F.col(sketch) if isinstance(sketch, str) else sketch
    tok = F.lit(token) if isinstance(token, int) else token
    keys = cms_cell_keys(tok, width, depth)
    reads = [
        F.coalesce(
            F.element_at(sk, F.element_at(keys, j + 1)), F.lit(0).cast("bigint")
        )
        for j in range(depth)
    ]
    est = reads[0] if depth == 1 else F.least(*reads)
    return F.when(tok.isNotNull(), est)


def cms_n(sketch: Column | str, width: int) -> Column:
    """Total token occurrences the sketch saw: every hash row sums to N,
    so fold row 0's cells (keys < width). This is the N in the error
    bound and doubles as a cross-check against the stats plane's
    ``sum_n_tok``."""
    sk = F.col(sketch) if isinstance(sketch, str) else sketch
    row0 = F.filter(F.map_entries(sk), lambda e: e["key"] < F.lit(width))
    return F.aggregate(
        row0, F.lit(0).cast("bigint"), lambda acc, e: acc + e["value"]
    )


def cms_estimates_for(
    sketches: DataFrame,
    tokens: Iterable[int],
    width: int = 2048,
    depth: int = 4,
    sketch_col: str = "cms",
) -> DataFrame:
    """Convenience reader: one ``tok_<t>`` estimate column per candidate
    token (candidate lists come from a sample or a vocab table — CMS
    answers point queries, it cannot enumerate its own heavy hitters)."""
    out = sketches
    for t in tokens:
        out = out.withColumn(
            f"tok_{t}", cms_estimate(sketch_col, int(t), width, depth)
        )
    return out


def cms_cascade_width(
    sketches: DataFrame,
    width_sec: int,
    key_col: str = "source",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Merge Count-Min grids onto an ARBITRARY fixed-width time grid —
    plain cell addition over OPAQUE cell keys, which is exact when every
    input summary shares one build config (unlike :func:`cms_cascade`,
    no stride widening is applied here, so do not mix builds).
    Alignment contract as :func:`~.rollup.cascade_width`."""
    from .rollup import width_bucket

    ex = sketches.select(
        key_col,
        width_bucket(F.col("bucket_ts"), width_sec, origin).alias("bucket_ts"),
        F.explode_outer("cms").alias("_cell", "_cnt"),
    )
    summed = (
        ex.filter(F.col("_cell").isNotNull())
        .groupBy(key_col, "bucket_ts", "_cell")
        .agg(F.sum("_cnt").alias("_cnt"))
    )
    merged = summed.groupBy(key_col, "bucket_ts").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_cell", "_cnt")))
        ).alias("cms")
    )
    empties = (
        ex.groupBy(key_col, "bucket_ts")
        .agg(F.max(F.col("_cell").isNotNull()).alias("_any"))
        .filter(~F.col("_any"))
        .select(
            key_col, "bucket_ts",
            F.map_from_entries(
                F.array().cast("array<struct<_cell:int,_cnt:bigint>>")
            ).alias("cms"),
        )
    )
    return merged.unionByName(empties)
