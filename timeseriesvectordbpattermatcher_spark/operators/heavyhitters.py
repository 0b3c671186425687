"""Misra-Gries heavy-hitter (top-k token) tiers.

The CMS plane (operators/cms.py) answers point queries — "how often did
token t appear in this bucket" — but cannot ENUMERATE the frequent
tokens: recovering top-k from a CMS needs a candidate set. This plane
stores the candidates themselves: a bounded Misra-Gries summary
(Misra & Gries 1982; the SpaceSaving-equivalent form) per
(source, bucket), mergeable up the 1m -> 1h -> 1d cascade by the
counter-addition + re-compress rule of Agarwal et al., "Mergeable
Summaries" (PODS 2012).

Summary = ``hh: map<token, est>`` with at most ``cap`` entries plus one
scalar ``hh_err``. Invariant maintained by construction at every tier
(est(t) = 0 when t is absent):

    est(t) <= true(t) <= est(t) + hh_err        for EVERY token t

so any token with true count > ``hh_err`` is guaranteed present, and
``hh_err <= N / (cap + 1)`` where N is the bucket's total token count —
the classical frequent-elements guarantee. Compression subtracts the
(cap+1)-th largest counter from all counters and drops the non-positive
ones; merging adds counters pointwise, adds the error scalars, then
compresses once more. Every step is deterministic, so the whole cascade
is exactly reproducible by the engine-free oracle in
tests/test_heavyhitters.py (and is bit-equal to an exact top-k whenever
``cap`` >= the bucket's distinct-token count, where ``hh_err`` stays 0).

Scale shape (mirrors the histogram plane): the 1m build is one explode +
two hash aggs — the shuffle carries (source, bucket, token, partial
count) rows with map-side combine, bounded by buckets x distinct tokens
per bucket, never by corpus rows. Compression is zero-UDF expression
work, arranged carefully around a Spark higher-order-function trap: a
custom ``array_sort`` COMPARATOR runs interpreted per comparison, and a
subexpression referenced inside a lambda is re-evaluated PER ELEMENT —
a first cut that embedded the O(n log n) threshold expression in the
survivor filter's lambda went O(n^2 log n) interpreted and measured
~90 CPU-minutes on a 2k-row corpus. The shipped form therefore (a)
derives the threshold from a comparator-FREE primitive sort of
``map_values`` (ties make entry order irrelevant to the threshold
VALUE), and (b) materializes it as its own projection column first, so
the lambdas only reference a computed attribute (multi-referenced
non-cheap producers are exactly what CollapseProject refuses to inline;
a regression test pins the wall time). Cascade merges explode only the
cap-bounded maps (rows = buckets x cap, corpus-size independent). A
(source, day) output depends only on same-(source, day) fine buckets, so
the RollupJob's changed-partition recompute protocol applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIER_TRUNC

__all__ = [
    "mg_threshold",
    "compress_summary",
    "topk_bucket",
    "topk_cascade",
    "topk_read",
    "topk_rolling",
    "topk_merge_all",
    "topk_drift",
]


def _check_cap(cap: int) -> None:
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")


def mg_threshold(hist: Column | str, cap: int) -> Column:
    """The Misra-Gries decrement for one ``map<int, bigint>``: the
    (cap+1)-th largest count, or 0 when the map already fits. Only the
    VALUE matters (ties at the threshold drop together), so this sorts
    ``map_values`` with the comparator-free primitive ``array_sort``
    and indexes from the end — no interpreted comparator anywhere."""
    _check_cap(cap)
    vals = F.array_sort(F.map_values(hist))  # ascending, codegen'd
    return (
        F.when(
            F.size(vals) > cap,
            F.element_at(vals, F.size(vals) - F.lit(cap)),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )


def compress_summary(
    df: DataFrame,
    src_col: str,
    cap: int,
    out_map: str = "hh",
    thr_col: str = "_thr",
) -> DataFrame:
    """Two-projection Misra-Gries compression of ``src_col`` into
    ``out_map`` (<= cap entries, each decremented by the threshold) with
    the subtracted threshold left in ``thr_col`` for the caller's error
    accounting. The threshold is materialized as its OWN column in the
    first projection so the survivor filter/transform lambdas reference
    a plain attribute — never re-evaluating the sort per element (see
    the module docstring; pinned by the perf regression test)."""
    _check_cap(cap)
    d = df.withColumn(thr_col, mg_threshold(src_col, cap))
    thr = F.col(thr_col)
    survivors = F.filter(F.map_entries(src_col), lambda e: e["value"] > thr)
    dec = F.transform(
        survivors,
        lambda e: F.struct(
            e["key"].alias("key"), (e["value"] - thr).alias("value")
        ),
    )
    # default struct array_sort orders by key asc — again comparator-free
    return d.withColumn(out_map, F.map_from_entries(F.array_sort(dec))).drop(
        src_col
    )


def _topk_build_kernel(cap: int, out_names: list[str]):
    """Accumulating mapInArrow kernel: co-located (key, bucket_ts,
    tokens) partitions -> complete compressed summaries. Exact
    (bucket, token) counts are accumulated with a lexsort run-length
    pass per batch (no dense grid — tokens are unbounded ids, unlike
    CMS cells), segments merged at emit, then the MG compress runs in
    numpy. Same deterministic result as the expr engine — exact counts
    are unique per bucket, so partition layout cannot show."""

    def gen(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        order: list[tuple] = []
        segs: dict[tuple, list] = {}
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
            offs = np.asarray(toks.offsets, dtype=np.int64)
            raw_len = offs[1:] - offs[:-1]
            null_list = np.asarray(toks.is_null(), dtype=bool)
            eff_len = np.where(null_list, 0, raw_len)
            sel = np.repeat(~null_list, raw_len)
            vals = np.asarray(toks.values.cast("int64"), dtype=np.int64)[
                offs[0]: offs[-1]
            ][sel]
            val_null = np.asarray(toks.values.is_null(), dtype=bool)[
                offs[0]: offs[-1]
            ][sel]
            rep = np.repeat(codes.astype(np.int64), eff_len)
            if val_null.any():  # null elements count nowhere (expr parity)
                keep = ~val_null
                vals, rep = vals[keep], rep[keep]
            if len(vals):
                o = np.lexsort((vals, rep))
                rs, vs = rep[o], vals[o]
                first = np.ones(len(vs), dtype=bool)
                first[1:] = (vs[1:] != vs[:-1]) | (rs[1:] != rs[:-1])
                starts = np.flatnonzero(first)
                cnts = np.diff(np.append(starts, len(vs))).astype(np.int64)
                g_of, v_of = rs[starts], vs[starts]
            else:
                g_of = np.empty(0, dtype=np.int64)
                v_of = np.empty(0, dtype=np.int64)
                cnts = np.empty(0, dtype=np.int64)
            bounds = np.searchsorted(g_of, np.arange(len(uniq) + 1))
            for g, pair in enumerate(uniq):
                seg = (v_of[bounds[g]: bounds[g + 1]],
                       cnts[bounds[g]: bounds[g + 1]])
                if pair in segs:
                    segs[pair].append(seg)
                else:
                    order.append(pair)
                    segs[pair] = [seg]
        if not order:
            return
        keys_out, ts_out, errs, ns = [], [], [], []
        map_offsets = [0]
        toks_all, cnts_all = [], []
        total = 0
        for pair in order:
            ss = segs[pair]
            if len(ss) == 1:
                t, c = ss[0]
            else:  # bucket straddled an Arrow batch boundary: re-merge
                t = np.concatenate([s[0] for s in ss])
                c = np.concatenate([s[1] for s in ss])
                o = np.argsort(t, kind="stable")
                t, c = t[o], c[o]
                first = np.ones(len(t), dtype=bool)
                first[1:] = t[1:] != t[:-1]
                starts = np.flatnonzero(first)
                c = np.add.reduceat(c, starts) if len(t) else c
                t = t[starts]
            n_tot = int(c.sum())
            if len(t) > cap:
                by_desc = np.lexsort((t, -c))
                thr = int(c[by_desc[cap]])
                keep = c > thr
                t, c = t[keep], c[keep] - thr
            else:
                thr = 0
            keys_out.append(pair[0])
            ts_out.append(pair[1])
            errs.append(thr)
            ns.append(n_tot)
            total += len(t)
            toks_all.append(t)
            cnts_all.append(c)
            map_offsets.append(total)
        flat_t = np.concatenate(toks_all) if toks_all else np.empty(0, np.int64)
        flat_c = np.concatenate(cnts_all) if cnts_all else np.empty(0, np.int64)
        maps = pa.MapArray.from_arrays(
            pa.array(map_offsets, pa.int32()),
            pa.array(flat_t.astype(np.int32), pa.int32()),
            pa.array(flat_c, pa.int64()),
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(keys_out, key_type),
                pa.array(ts_out, pa.int64()).cast(ts_type),
                maps,
                pa.array(errs, pa.int64()),
                pa.array(ns, pa.int64()),
            ],
            names=out_names,
        )

    return gen


def topk_bucket(
    df: DataFrame,
    tier: str = "1m",
    cap: int = 64,
    key_col: str = "source",
    ts_col: str = "event_ts",
    tokens_col: str = "tokens",
    engine: str = "auto",
    num_partitions: int | None = None,
) -> DataFrame:
    """Finest heavy-hitter tier: (key, bucket_ts) -> ``hh`` (<= cap-entry
    Misra-Gries map over the bucket's token occurrences) + ``hh_err``
    (the per-token overcount bound, 0 when the bucket's distinct tokens
    fit in ``cap``) + ``hh_n`` (exact total token count — the scale of
    the bound, and the cross-check against the stats tier's token sums).

    Buckets whose rows carry only NULL/empty arrays survive with an empty
    map (explode_outer + NULL-guarded struct, the histogram-plane rule),
    so cascade merges never see missing groups.

    Two parity-pinned physical engines (``auto`` = arrow):

    - ``expr``: explode + two hash aggs. Fine at test scale, but the
      first shuffle keys EVERY token occurrence by (key, bucket, token)
      — when per-task key cardinality outgrows the hash-agg memory the
      partial combine degrades to a sort-based spill of near-raw volume
      (measured: a 20M-row/5.4B-token build spilled past 60 GB of local
      disk — the same pathology the CMS plane hit).
    - ``arrow``: ONE co-locating repartition on (key, bucket_ts) + an
      accumulating ``mapInArrow`` kernel (numpy lexsort run-length
      counts, MG compress at emit). The only Exchange carries the raw
      rows themselves; nothing per-token ever shuffles. Token ids must
      fit int32 (vocab ids; the map key type both engines share)."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    _check_cap(cap)
    if engine not in ("auto", "expr", "arrow"):
        raise ValueError(f"engine must be auto|expr|arrow, got {engine!r}")
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col(ts_col)).alias("bucket_ts")
    if (engine if engine != "auto" else "arrow") == "arrow":
        from pyspark.sql import types as T

        pre = df.select(F.col(key_col), bucket, F.col(tokens_col).alias("_tk"))
        if num_partitions is None:
            sess = pre.sparkSession
            num_partitions = 8 * int(
                sess.conf.get("spark.sql.shuffle.partitions")
            )
        pre = pre.repartition(num_partitions, F.col(key_col), F.col("bucket_ts"))
        schema = T.StructType(
            [
                pre.schema[key_col],
                T.StructField("bucket_ts", pre.schema["bucket_ts"].dataType),
                T.StructField(
                    "hh", T.MapType(T.IntegerType(), T.LongType(), False)
                ),
                T.StructField("hh_err", T.LongType()),
                T.StructField("hh_n", T.LongType()),
            ]
        )
        names = [key_col, "bucket_ts", "hh", "hh_err", "hh_n"]
        return pre.mapInArrow(_topk_build_kernel(cap, names), schema=schema)
    ex = df.select(
        F.col(key_col), bucket, F.explode_outer(tokens_col).alias("_hv")
    )
    counts = ex.groupBy(key_col, "bucket_ts", "_hv").agg(
        F.count("_hv").alias("_hc")
    )
    exact = counts.groupBy(key_col, "bucket_ts").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_hv").isNotNull(), F.struct("_hv", "_hc"))
                )
            )
        ).alias("_exact"),
        F.coalesce(F.sum("_hc"), F.lit(0)).cast("bigint").alias("hh_n"),
    )
    out = compress_summary(exact, "_exact", cap)
    return out.select(
        key_col, "bucket_ts", "hh", F.col("_thr").alias("hh_err"), "hh_n"
    )


def topk_cascade(
    df: DataFrame,
    tier: str,
    cap: int = 64,
    key_col: str = "source",
) -> DataFrame:
    """Merge a finer tier's summaries one tier coarser (1m->1h, 1h->1d):
    pointwise counter addition (explode the cap-bounded maps, sum per
    coarse token), error scalars add, then one re-compress whose
    subtraction joins the error. The est <= true <= est + hh_err
    invariant survives merging (Agarwal et al. 2012); ``cap`` must be
    the build's cap or the bound loosens silently — pass the same value.

    Two bounded aggs + one bucket-sized join: the scalar leg
    (hh_err/hh_n sums) is buckets-sized, the map leg explodes
    buckets x cap rows; nothing scales with corpus rows."""
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    _check_cap(cap)
    coarse = F.date_trunc(TIER_TRUNC[tier], F.col("bucket_ts")).alias("bucket_ts")
    scalars = (
        df.select(key_col, coarse, "hh_err", "hh_n")
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.sum("hh_err").cast("bigint").alias("_err_in"),
            F.sum("hh_n").cast("bigint").alias("hh_n"),
        )
    )
    ex = df.select(key_col, coarse, F.explode_outer("hh").alias("_hv", "_hc"))
    summed = (
        ex.filter(F.col("_hv").isNotNull())
        .groupBy(key_col, "bucket_ts", "_hv")
        .agg(F.sum("_hc").alias("_hc"))
    )
    merged = summed.groupBy(key_col, "bucket_ts").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_hv", "_hc")))
        ).alias("_merged")
    )
    # groups whose fine maps were all empty must survive with empty maps
    joined = scalars.join(merged, [key_col, "bucket_ts"], "left").withColumn(
        "_merged",
        F.coalesce(
            F.col("_merged"),
            F.map_from_entries(
                F.array().cast("array<struct<_hv:int,_hc:bigint>>")
            ),
        ),
    )
    out = compress_summary(joined, "_merged", cap)
    return out.select(
        key_col,
        "bucket_ts",
        "hh",
        (F.col("_err_in") + F.col("_thr")).cast("bigint").alias("hh_err"),
        "hh_n",
    )


def topk_read(
    df: DataFrame,
    n: int | None = None,
    key_col: str = "source",
) -> DataFrame:
    """Row view of a summary tier: one row per (key, bucket_ts, token)
    with ``est`` (guaranteed lower bound), ``est_hi = est + hh_err``
    (guaranteed upper bound) and ``rank`` by (est desc, token asc);
    ``n`` keeps only the top n per bucket. A pure per-row explode of the
    cap-bounded maps — ranking happens inside each row's own sorted
    array (struct sort on (-est, token): comparator-free), so there is
    no window and no extra Exchange."""
    if n is not None and n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    by_desc = F.array_sort(
        F.transform(
            F.map_entries("hh"),
            lambda e: F.struct(
                (-e["value"]).alias("negv"),
                e["key"].alias("token"),
                e["value"].alias("est"),
            ),
        )
    )
    ranked = F.transform(
        by_desc,
        lambda e, i: F.struct(
            e["token"].alias("token"),
            e["est"].alias("est"),
            (i + 1).alias("rank"),
        ),
    )
    if n is not None:
        ranked = F.slice(ranked, 1, n)
    out = df.select(
        key_col,
        "bucket_ts",
        "hh_err",
        "hh_n",
        F.explode(ranked).alias("_e"),
    )
    return out.select(
        key_col,
        "bucket_ts",
        F.col("_e.token").alias("token"),
        F.col("_e.est").alias("est"),
        (F.col("_e.est") + F.col("hh_err")).alias("est_hi"),
        F.col("_e.rank").alias("rank"),
        "hh_err",
        "hh_n",
    )


def topk_rolling(
    df: DataFrame,
    window_buckets: int,
    tier: str,
    cap: int = 64,
    key_col: str = "source",
    min_buckets: int | None = None,
) -> DataFrame:
    """Rolling heavy hitters over the TRAILING ``window_buckets``
    calendar slots of a summary tier — "top tokens of the last 24
    hourly buckets" from the cap-bounded summaries, never raw. The
    merge is the cascade's: counter addition + one re-compress, so
    every window read still carries ``est <= true <= est + hh_err``
    (the window's summed input errors plus the re-compress threshold),
    and any token whose true windowed count exceeds ``hh_err`` is
    guaranteed present. ``cap`` must be the build's cap.

    Window semantics match the other rolling reads
    (:func:`~.quantiles.hist_rolling_quantiles`): calendar-ranged
    trailing slots, output rows only for slots present in the input,
    ``win_buckets`` reporting how many slots contributed, and — below
    the ``min_buckets`` warm-up (default: the full window) — a NULL
    ``hh``/``hh_err`` (``hh_n`` stays, it is exact). Physical shape:
    bounded scatter of each summary to the <= k slots it serves, two
    slot-keyed aggs + the compress join — everything tier-table-sized.
    """
    if tier not in TIER_TRUNC:
        raise ValueError(f"tier must be one of {sorted(TIER_TRUNC)}, got {tier!r}")
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    _check_cap(cap)
    mb = window_buckets if min_buckets is None else min_buckets
    unit = TIER_TRUNC[tier]
    targets = F.expr(
        f"sequence(bucket_ts, bucket_ts + interval {window_buckets - 1} {unit}, "
        f"interval 1 {unit})"
    )
    base = df.select(key_col, "bucket_ts", "hh", "hh_err", "hh_n").withColumn(
        "_tgt", F.explode(targets)
    )
    scalars = base.groupBy(key_col, "_tgt").agg(
        F.sum("hh_err").cast("bigint").alias("_err_in"),
        F.sum("hh_n").cast("bigint").alias("hh_n"),
        F.max(F.col("bucket_ts") == F.col("_tgt")).alias("_has_origin"),
        F.size(F.collect_set("bucket_ts")).alias("win_buckets"),
    )
    ex = base.select(key_col, "_tgt", F.explode_outer("hh").alias("_hv", "_hc"))
    summed = (
        ex.filter(F.col("_hv").isNotNull())
        .groupBy(key_col, "_tgt", "_hv")
        .agg(F.sum("_hc").alias("_hc"))
    )
    merged = summed.groupBy(key_col, "_tgt").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_hv", "_hc")))
        ).alias("_merged")
    )
    joined = scalars.join(merged, [key_col, "_tgt"], "left").withColumn(
        "_merged",
        F.coalesce(
            F.col("_merged"),
            F.map_from_entries(
                F.array().cast("array<struct<_hv:int,_hc:bigint>>")
            ),
        ),
    )
    out = compress_summary(joined, "_merged", cap)
    warm = F.col("win_buckets") >= F.lit(mb)
    return (
        out.filter(F.col("_has_origin"))
        .select(
            key_col,
            F.col("_tgt").alias("bucket_ts"),
            F.when(warm, F.col("hh")).alias("hh"),
            F.when(warm, (F.col("_err_in") + F.col("_thr")).cast("bigint")).alias(
                "hh_err"
            ),
            "hh_n",
            "win_buckets",
        )
    )


def topk_merge_all(
    df: DataFrame,
    cap: int = 64,
    key_col: str = "source",
) -> DataFrame:
    """Collapse a summary tier to ONE summary per key (counter addition
    over every bucket + a single re-compress — the cascade's merge with
    the calendar axis dropped). Scope the window by filtering
    ``bucket_ts`` first; feeds :func:`topk_drift`."""
    _check_cap(cap)
    scalars = df.groupBy(key_col).agg(
        F.sum("hh_err").cast("bigint").alias("_err_in"),
        F.sum("hh_n").cast("bigint").alias("hh_n"),
    )
    ex = df.select(key_col, F.explode_outer("hh").alias("_hv", "_hc"))
    summed = (
        ex.filter(F.col("_hv").isNotNull())
        .groupBy(key_col, "_hv")
        .agg(F.sum("_hc").alias("_hc"))
    )
    merged = summed.groupBy(key_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_hv", "_hc")))
        ).alias("_merged")
    )
    joined = scalars.join(merged, [key_col], "left").withColumn(
        "_merged",
        F.coalesce(
            F.col("_merged"),
            F.map_from_entries(
                F.array().cast("array<struct<_hv:int,_hc:bigint>>")
            ),
        ),
    )
    out = compress_summary(joined, "_merged", cap)
    return out.select(
        key_col, "hh",
        (F.col("_err_in") + F.col("_thr")).cast("bigint").alias("hh_err"),
        "hh_n",
    )


def topk_drift(
    summary_a: DataFrame,
    summary_b: DataFrame,
    n: int | None = 20,
    key_col: str = "source",
) -> DataFrame:
    """Which tokens' frequency RATES moved most between two windows,
    from the cap-bounded summaries alone. For every token reported in
    either side's summary (per shared key):

    - ``rate_a``/``rate_b`` — the point estimates ``est / hh_n`` (an
      absent token's est point-estimates 0; its true count is bounded
      by that side's ``hh_err``).
    - ``delta`` = rate_b - rate_a (point estimate), with the GUARANTEED
      bracket [``delta_lo``, ``delta_hi``] from the MG bounds:
      true delta is in [est_b/n_b - (est_a + err_a)/n_a,
      (est_b + err_b)/n_b - est_a/n_a] — callers should treat a bracket
      containing 0 as "no reliable drift".
    - ranked by |delta| descending (ties: token asc); ``n`` keeps the
      top movers per key (None = all).

    Keys present on only one side emit nothing (nothing to compare).
    Bounded everywhere: <= 2*cap tokens per key enter the join.

    Contract: each side must hold ONE summary row per key (the shape
    :func:`topk_merge_all` emits). A multi-bucket tier table would
    silently fan the scalar join out into duplicated drift rows, so a
    key with more than one row on either side RAISES at execution."""
    if n is not None and n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def scalars(side_df: DataFrame, side: str, e: str, nn: str) -> DataFrame:
        g = side_df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.first("hh_err").alias(e),
            F.first("hh_n").alias(nn),
        )
        guarded = F.when(
            F.col("_cnt") > 1,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"topk_drift: summary_{side} has multiple rows for"
                        " key "
                    ),
                    F.col(key_col).cast("string"),
                    F.lit(
                        " — pass a one-summary-per-key table"
                        " (topk_merge_all output), not a bucket tier"
                    ),
                )
            ),
        ).otherwise(F.col(e))
        return g.select(key_col, guarded.alias(e), nn)

    a = summary_a.select(
        key_col, F.explode_outer("hh").alias("_tok", "_ca"),
    )
    b = summary_b.select(
        key_col, F.explode_outer("hh").alias("_tok", "_cb"),
    )
    scal_a = scalars(summary_a, "a", "_ea", "_na")
    scal_b = scalars(summary_b, "b", "_eb", "_nb")
    toks = (
        a.filter(F.col("_tok").isNotNull()).select(key_col, "_tok", "_ca")
        .join(
            b.filter(F.col("_tok").isNotNull()).select(key_col, "_tok", "_cb"),
            [key_col, "_tok"], "full_outer",
        )
        .join(scal_a, key_col)
        .join(scal_b, key_col)
    )
    ca = F.coalesce("_ca", F.lit(0)).cast("double")
    cb = F.coalesce("_cb", F.lit(0)).cast("double")
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    rate_a = F.try_divide(ca, F.nullif(na, F.lit(0.0)))
    rate_b = F.try_divide(cb, F.nullif(nb, F.lit(0.0)))
    delta = rate_b - rate_a
    lo = F.try_divide(cb, F.nullif(nb, F.lit(0.0))) - F.try_divide(
        ca + F.col("_ea"), F.nullif(na, F.lit(0.0))
    )
    hi = F.try_divide(cb + F.col("_eb"), F.nullif(nb, F.lit(0.0))) - F.try_divide(
        ca, F.nullif(na, F.lit(0.0))
    )
    scored = toks.select(
        key_col,
        F.col("_tok").alias("token"),
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        delta.alias("delta"),
        lo.alias("delta_lo"),
        hi.alias("delta_hi"),
    )
    w = Window.partitionBy(key_col).orderBy(
        F.abs(F.col("delta")).desc(), F.col("token")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    return ranked if n is None else ranked.filter(F.col("rank") <= n)


def topk_cascade_width(
    df: DataFrame,
    width_sec: int,
    cap: int = 64,
    key_col: str = "source",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Merge heavy-hitter summaries onto an ARBITRARY fixed-width time
    grid — counter addition + one re-compress per width bucket, exactly
    :func:`topk_cascade`'s algebra, so est <= true <= est + hh_err
    holds per width bucket. ``cap`` must be the build's; alignment
    contract as :func:`~.rollup.cascade_width`."""
    from .rollup import width_bucket

    _check_cap(cap)
    coarse = width_bucket(F.col("bucket_ts"), width_sec, origin).alias("bucket_ts")
    scalars = (
        df.select(key_col, coarse, "hh_err", "hh_n")
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.sum("hh_err").cast("bigint").alias("_err_in"),
            F.sum("hh_n").cast("bigint").alias("hh_n"),
        )
    )
    ex = df.select(key_col, coarse, F.explode_outer("hh").alias("_hv", "_hc"))
    summed = (
        ex.filter(F.col("_hv").isNotNull())
        .groupBy(key_col, "bucket_ts", "_hv")
        .agg(F.sum("_hc").alias("_hc"))
    )
    merged = summed.groupBy(key_col, "bucket_ts").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_hv", "_hc")))
        ).alias("_merged")
    )
    joined = scalars.join(merged, [key_col, "bucket_ts"], "left").withColumn(
        "_merged",
        F.coalesce(
            F.col("_merged"),
            F.map_from_entries(
                F.array().cast("array<struct<_hv:int,_hc:bigint>>")
            ),
        ),
    )
    out = compress_summary(joined, "_merged", cap)
    return out.select(
        key_col, "bucket_ts", "hh",
        (F.col("_err_in") + F.col("_thr")).cast("bigint").alias("hh_err"),
        "hh_n",
    )
