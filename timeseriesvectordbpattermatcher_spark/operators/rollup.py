"""Continuous aggregates: raw -> 1m -> 1h -> 1d cascading rollups.

North-star core (BASELINE.json.north_rule). The reference's closest op is its
OHLCV resample/downsample (consumers at
/root/reference/extremaPatternUtil.py:186-188 and
/root/reference/boxCandlePatternUtil.py:143-146 — first/max/min/last/sum per
rule) and its stride-sampled expensive rolling op
(/root/reference/patternTraderUtil.py:365-371) — both manual incremental
computation. Here the same idea is the tier cascade: 1h re-aggregates the 1m
table (never the raw data), 1d re-aggregates 1h. All stats are chosen to be
**associative** (count/sum/min/max; avg derived as sum/cnt at read time), so
partial -> final re-aggregation is exact — integer stats carry no float
reduction-order hazard (SURVEY.md §4.3).

Scale notes (100 TB / 10^12 rows):
- one wide scan of raw data, one shuffle on (source, minute-bucket) — AQE
  coalesces the tail; 1h/1d tiers shuffle only the (much smaller) 1m table.
- token-level stats (tok_min/tok_max/tok_sum) are computed per-row with
  ``array_min``/``array_max``/``aggregate`` *before* the shuffle, so token
  arrays never move across the network — only 3 scalars per row do.
- hot keys (``web`` is ~70% of rows): ``salt_buckets`` splits each
  (source, bucket) group into B sub-groups for the first shuffle, then a
  cheap second agg over B rows per key merges them (two-phase salted agg).
  Spark's map-side partial aggregation already bounds skew for these
  commutative stats, so salting is off by default and available for AQE-less
  clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_ORDER = ["1m", "1h", "1d"]

DOC_TS_PATTERN = "_([0-9]{14})_"


def derive_event_ts(seqs: DataFrame, doc_id_col: str = "doc_id") -> DataFrame:
    """Parse the time axis out of ``doc_id`` ('{source}_{yyyyMMddHHmmss}_{seq}').

    Mirrors the reference's id parse-back
    (/root/reference/opkatsPatternMatcherUtil.py:198-207: strip prefix, split
    on '_', take the date field) as one codegen'd regexp.

    try_to_timestamp: a malformed doc_id (regexp miss -> '') must yield a
    NULL event_ts the downstream jobs skip and audit, not an ANSI
    CANNOT_PARSE_TIMESTAMP crash that kills the whole scan (PySpark 4 is
    ANSI by default).
    """
    return seqs.withColumn(
        "event_ts",
        F.try_to_timestamp(
            F.regexp_extract(F.col(doc_id_col), DOC_TS_PATTERN, 1),
            F.lit("yyyyMMddHHmmss"),
        ),
    )


def add_token_stats(
    seqs: DataFrame, tokens_col: str = "tokens", engine: str = "expr"
) -> DataFrame:
    """Per-row token scalars (tok_min/tok_max/tok_sum). Two engines:

    - ``expr`` (default): JVM higher-order functions. Catalyst can PRUNE the
      token column when a consumer never reads the tok_* outputs (pinned by
      tests/test_plans.py) — but the per-element lambda evaluation costs
      ~100 ns/token (measured), which dominates token-heavy scans.
    - ``arrow``: ``mapInArrow`` + numpy ``reduceat`` over the ListArray's
      flat values buffer — vectorized segment reduction, measured ~60x
      faster per token than the HOF path on the bench corpus. The python
      stage is opaque to Catalyst (no pruning through it), so callers that
      KNOW they consume token stats (the rollup jobs, the bench) opt in.

    Identical null semantics on both paths (parity-tested): null array ->
    all three null; empty array -> min/max null, sum 0.
    """
    if engine == "arrow":
        return _add_token_stats_arrow(seqs, tokens_col)
    if engine == "arrow_drop":
        # arrow path that DROPS the token column on the way out: halves the
        # Arrow IPC volume (the return leg carries 3 scalars instead of the
        # array) — the right engine when downstream never reads tokens
        # again, e.g. the rollup tiers (aggregation keeps scalars only)
        return _add_token_stats_arrow(seqs, tokens_col, drop_tokens=True)
    if engine != "expr":
        # a typo must not silently route a token-heavy 100 TB scan onto the
        # ~60x-slower-per-token HOF path
        raise ValueError(f"unknown token-stat engine {engine!r}")
    t = F.col(tokens_col)
    return (
        seqs.withColumn("tok_min", F.array_min(t))
        .withColumn("tok_max", F.array_max(t))
        .withColumn(
            "tok_sum",
            F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")),
        )
    )


def _add_token_stats_arrow(
    seqs: DataFrame, tokens_col: str = "tokens", drop_tokens: bool = False
) -> DataFrame:
    """mapInArrow fast path: per-batch segment reductions on the list
    buffer. ``np.*.reduceat`` over the non-empty segment starts is exact —
    empty segments occupy no values, so consecutive non-empty starts span
    exactly one real segment each."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    def batches(it):
        import pyarrow.compute as pc

        for batch in it:
            names = batch.schema.names
            la = batch.column(names.index(tokens_col))
            offs = np.asarray(la.offsets)
            child = la.values
            # null ELEMENTS (tokens = [1, null, 3]) match the expr path:
            # a null element nulls the segment's sum (Spark's aggregate
            # fold: acc + null = null) while min/max skip it (array_min/
            # array_max semantics); np.asarray on an int child with nulls
            # would coerce to float64/NaN and corrupt all three
            if child.null_count:
                emask_full = np.asarray(child.is_valid())
                vals = np.asarray(pc.fill_null(child, 0))
            else:
                emask_full = None
                vals = np.asarray(child)
            # a sliced ListArray's offsets need not start at 0 nor end at
            # len(values) (and null slots may span nonzero extents): slice the
            # flat buffer to this array's extent and rebase, so the final
            # reduceat segment ends exactly at the last offset instead of
            # silently absorbing trailing out-of-slice values
            if len(offs) and (offs[0] != 0 or offs[-1] != len(vals)):
                vals = vals[offs[0]:offs[-1]]
                if emask_full is not None:
                    emask_full = emask_full[offs[0]:offs[-1]]
                offs = offs - offs[0]
            starts, ends = offs[:-1], offs[1:]
            n = len(la)
            lens = ends - starts
            valid = np.asarray(la.is_valid())
            nonempty = lens > 0
            elem_pa = la.type.value_type
            elem_np = vals.dtype
            sums = np.zeros(n, dtype=np.int64)
            mins = np.zeros(n, dtype=elem_np)
            maxs = np.zeros(n, dtype=elem_np)
            anynull = np.zeros(n, dtype=bool)
            allnull = np.zeros(n, dtype=bool)
            if nonempty.any():
                ne = np.flatnonzero(nonempty)
                if emask_full is None:
                    sums[ne] = np.add.reduceat(vals.astype(np.int64), starts[ne])
                    mins[ne] = np.minimum.reduceat(vals, starts[ne])
                    maxs[ne] = np.maximum.reduceat(vals, starts[ne])
                else:
                    nvalid = np.add.reduceat(emask_full.astype(np.int64), starts[ne])
                    anynull[ne] = nvalid < lens[ne]
                    allnull[ne] = nvalid == 0
                    sums[ne] = np.add.reduceat(
                        np.where(emask_full, vals, 0).astype(np.int64), starts[ne]
                    )
                    info = (
                        np.iinfo(elem_np) if np.issubdtype(elem_np, np.integer)
                        else np.finfo(elem_np)
                    )
                    mins[ne] = np.minimum.reduceat(
                        np.where(emask_full, vals, info.max), starts[ne]
                    )
                    maxs[ne] = np.maximum.reduceat(
                        np.where(emask_full, vals, info.min), starts[ne]
                    )
            mm = ~(valid & nonempty) | allnull  # empty/null array or all-null elems
            sm = ~valid | anynull               # null array or any null elem
            keep = [
                i for i in range(batch.num_columns)
                if not (drop_tokens and names[i] == tokens_col)
            ]
            arrs = [batch.column(i) for i in keep]
            out_names = [names[i] for i in keep]
            arrs += [
                pa.array(mins, mask=mm, type=elem_pa),
                pa.array(maxs, mask=mm, type=elem_pa),
                pa.array(sums, mask=sm, type=pa.int64()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrs, names=out_names + ["tok_min", "tok_max", "tok_sum"]
            )

    elem_type = seqs.schema[tokens_col].dataType.elementType
    base_fields = [
        f for f in seqs.schema.fields
        if not (drop_tokens and f.name == tokens_col)
    ]
    schema = T.StructType(
        base_fields
        + [
            T.StructField("tok_min", elem_type),
            T.StructField("tok_max", elem_type),
            T.StructField("tok_sum", T.LongType()),
        ]
    )
    return seqs.mapInArrow(batches, schema=schema)


def _row_partial_aggs():
    return [
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_tok").alias("sum_n_tok"),
        F.min("n_tok").alias("min_n_tok"),
        F.max("n_tok").alias("max_n_tok"),
    ]


def _tok_partial_aggs():
    return [
        F.min("tok_min").alias("tok_min"),
        F.max("tok_max").alias("tok_max"),
        F.sum("tok_sum").alias("tok_sum"),
    ]


def _partial_aggs():
    return _row_partial_aggs() + _tok_partial_aggs()


def _row_merge_aggs():
    return [
        F.sum("cnt").alias("cnt"),
        F.sum("sum_n_tok").alias("sum_n_tok"),
        F.min("min_n_tok").alias("min_n_tok"),
        F.max("max_n_tok").alias("max_n_tok"),
    ]


def _merge_aggs():
    return _row_merge_aggs() + _tok_partial_aggs()


def _with_avg(df: DataFrame) -> DataFrame:
    return df.withColumn("avg_n_tok", F.col("sum_n_tok") / F.col("cnt"))


def _rollup_1m_explode(
    seqs: DataFrame,
    ts_col: str,
    key_col: str,
    salt_buckets: int | None,
    tokens_col: str = "tokens",
) -> DataFrame:
    """1m rollup with token stats aggregated straight off an ``explode`` —
    zero Python AND zero interpreted-lambda work in the hot path.

    The per-ROW tok_* scalars the other engines produce are never needed by
    the tiers — only their per-(key, bucket) aggregates are. Exploding the
    token column into whole-stage codegen'd hash aggregation skips both the
    interpreted ``aggregate()`` fold (~100 ns/token) and the Arrow IPC round
    trip (ships every token array to Python and back). On the 2M-row bench
    corpus the arrow path is still faster at its best (interleaved min-of-k
    2.9 s vs 5.3 s) but spreads 2.9-11.9 s under host contention where this
    path spreads 5.3-9.6 s — no Python worker processes to starve — so it is
    the deterministic-latency / no-Python-workers option, not the default.

    Exactness vs the per-row engines (parity-pinned in tests/test_rollup.py):

    - tok_min/tok_max: min/max over exploded elements ≡ min over rows of
      array_min/array_max — null elements are skipped by both, empty/null
      arrays contribute nothing either way.
    - tok_sum: the per-row engines NULL a row's sum when any element is null
      (Spark's aggregate-fold semantics), give 0 for an empty array and NULL
      for a null array — so the bucket sum covers "clean" rows, counts empty
      rows as +0, and is NULL only when no row has a non-null sum. The token
      branch uses ``explode_outer`` (empty/null arrays keep one NULL-element
      row) plus a carried ``size(tokens)`` column — free here, the column is
      being decoded anyway — so empty (+0), null (skip) and dirty (NULL by
      count(_t) < size) rows are all rebuilt exactly. Elements are re-grouped
      per doc first (map-side partial agg collapses this shuffle: each doc's
      exploded elements are contiguous in one partition, so the per-task
      hash map emits one row per doc). When the schema declares
      ``containsNull=False`` on the element type there are no dirty rows and
      the doc re-group collapses into the bucket agg itself (fast path).

    The two branches join on null-safe key equality (malformed doc_ids yield
    NULL bucket_ts, which the per-row engines still aggregate as a group).
    """
    bucketed = seqs.withColumn(
        "bucket_ts", F.date_trunc(TIER_TRUNC["1m"], F.col(ts_col))
    )
    row_aggs = _row_partial_aggs()
    row_merge = _row_merge_aggs()
    salted = salt_buckets is not None and salt_buckets > 1
    if salted:
        salt_src = (
            [F.col("doc_id")] if "doc_id" in bucketed.columns
            else [F.col(c) for c in bucketed.columns if c != tokens_col]
        )
        bucketed = bucketed.withColumn(
            "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(salt_buckets))
        )
        rows = (
            bucketed.groupBy(key_col, "bucket_ts", "_salt")
            .agg(*row_aggs)
            .groupBy(key_col, "bucket_ts")
            .agg(*row_merge)
        )
    else:
        rows = bucketed.groupBy(key_col, "bucket_ts").agg(*row_aggs)

    # _t NULL rows come from empty arrays (_sz = 0, contribute +0 to the
    # sum), null arrays (_sz NULL, skipped), or genuine null elements
    # (min/max skip them; the doc re-group NULLs the doc's sum)
    elems_nullable = seqs.schema[tokens_col].dataType.containsNull
    need_doc = elems_nullable or salted
    if not need_doc:
        doc_cols = []
    else:
        # unique-per-ROW regroup key — NOT doc_id: the engine must not
        # assume id uniqueness (duplicate ids sharing a bucket would merge
        # into one pseudo-doc and defeat the dirty-row sum NULLing).
        # monotonically_increasing_id is deterministic per (partition,
        # offset), so task retries regroup identically. It MUST be assigned
        # in a projection BELOW the explode — inside the generate's select
        # it would be evaluated once per exploded element, splitting every
        # doc into single-element pseudo-docs
        bucketed = bucketed.withColumn("_doc", F.monotonically_increasing_id())
        doc_cols = ["_doc"]
    elem = bucketed.select(
        key_col,
        "bucket_ts",
        *doc_cols,
        F.size(tokens_col).alias("_sz"),
        F.explode_outer(tokens_col).alias("_t"),
    )
    row_sum = F.when(F.col("_sz") == 0, F.lit(0).cast("long")).otherwise(
        F.when(F.count("_t") < F.col("_sz"), F.lit(None)).otherwise(
            F.sum(F.col("_t").cast("long"))
        )
    )
    if not need_doc:
        # fast path: no null elements possible -> every row is clean, so the
        # doc re-group is unnecessary; per-row sums collapse associatively
        # into the bucket sum (empty rows still contribute +0 via _sz = 0,
        # null arrays still skip via the otherwise-NULL _t)
        toks = (
            elem.groupBy(key_col, "bucket_ts")
            .agg(
                F.min("_t").alias("tok_min"),
                F.max("_t").alias("tok_max"),
                F.sum(
                    F.when(F.col("_sz") == 0, F.lit(0).cast("long")).otherwise(
                        F.col("_t").cast("long")
                    )
                ).alias("_sm_clean"),
            )
        )
    else:
        per_doc = (
            elem.groupBy(key_col, "bucket_ts", "_doc", "_sz")
            .agg(
                F.min("_t").alias("tok_min"),
                F.max("_t").alias("tok_max"),
                row_sum.alias("_sm"),
            )
        )
        tok_merge = [
            F.min("tok_min").alias("tok_min"),
            F.max("tok_max").alias("tok_max"),
            F.sum("_sm").alias("_sm_clean"),
        ]
        if salted:
            toks = (
                per_doc.withColumn(
                    "_salt2", F.pmod(F.xxhash64("_doc"), F.lit(salt_buckets))
                )
                .groupBy(key_col, "bucket_ts", "_salt2")
                .agg(*tok_merge)
                .withColumnRenamed("_sm_clean", "_sm")
                .groupBy(key_col, "bucket_ts")
                .agg(*tok_merge)
            )
        else:
            toks = per_doc.groupBy(key_col, "bucket_ts").agg(*tok_merge)

    t = toks.select(
        F.col(key_col).alias("_tk"),
        F.col("bucket_ts").alias("_tb"),
        "tok_min",
        "tok_max",
        F.col("_sm_clean").alias("tok_sum"),
    )
    out = (
        rows.join(
            t,
            rows[key_col].eqNullSafe(t["_tk"])
            & rows["bucket_ts"].eqNullSafe(t["_tb"]),
            "left",
        )
        .select(
            key_col, "bucket_ts", "cnt", "sum_n_tok", "min_n_tok",
            "max_n_tok", "tok_min", "tok_max", "tok_sum",
        )
    )
    return _with_avg(out)


def rollup_1m(
    seqs: DataFrame,
    ts_col: str = "event_ts",
    key_col: str = "source",
    salt_buckets: int | None = None,
    token_engine: str = "expr",
) -> DataFrame:
    """raw -> rollup_1m(source, bucket_ts, cnt, sum/min/max/avg_n_tok, tok_*).

    ``token_engine='arrow'/'arrow_drop'`` opts into the vectorized mapInArrow
    token-stat path (see add_token_stats) — fastest on a healthy host
    (min-of-k 2.9 s vs explode 5.3 s on the 2M-row bench cascade).
    ``'explode'`` aggregates token stats straight off a whole-stage-codegen'd
    explode_outer — zero Python workers and zero interpreted lambdas in the
    hot path (see _rollup_1m_explode); measured ~2x lower run-to-run variance
    under host contention (interleaved A/B: arrow 2.9-11.9 s, explode
    5.3-9.6 s), the right engine where Python worker memory is constrained."""
    has_tokens = "tokens" in seqs.columns
    if token_engine == "explode" and has_tokens and "tok_sum" not in seqs.columns:
        return _rollup_1m_explode(
            seqs, ts_col=ts_col, key_col=key_col, salt_buckets=salt_buckets
        )
    if has_tokens and "tok_sum" not in seqs.columns:
        seqs = add_token_stats(seqs, engine=token_engine)
    if not has_tokens and "tok_sum" not in seqs.columns:
        # degenerate corpus without token arrays: token stats fall back to n_tok
        seqs = (
            seqs.withColumn("tok_min", F.col("n_tok"))
            .withColumn("tok_max", F.col("n_tok"))
            .withColumn("tok_sum", F.col("n_tok").cast("long"))
        )
    bucketed = seqs.withColumn("bucket_ts", F.date_trunc(TIER_TRUNC["1m"], F.col(ts_col)))
    if salt_buckets and salt_buckets > 1:
        # spread hot (key, bucket) groups: hash a row id if present, else
        # every available column — the projected token-less shape this
        # function explicitly supports has no doc_id to hash
        salt_src = (
            [F.col("doc_id")] if "doc_id" in bucketed.columns
            else [F.col(c) for c in bucketed.columns]
        )
        salted = bucketed.withColumn(
            "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(salt_buckets))
        )
        partial = salted.groupBy(key_col, "bucket_ts", "_salt").agg(*_partial_aggs())
        out = partial.groupBy(key_col, "bucket_ts").agg(*_merge_aggs())
    else:
        out = bucketed.groupBy(key_col, "bucket_ts").agg(*_partial_aggs())
    return _with_avg(out)


def cascade(rollup: DataFrame, to_tier: str, key_col: str = "source") -> DataFrame:
    """Re-aggregate a finer tier into ``to_tier`` (partial -> final, exact).

    1h is computed FROM 1m and 1d FROM 1h — the raw table is scanned once per
    refresh no matter how many tiers exist. This is the engine's answer to the
    reference's skip-sampled rolling optimization
    (/root/reference/patternTraderUtil.py:365-371).
    """
    out = (
        rollup.withColumn("bucket_ts", F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_ts")))
        .groupBy(key_col, "bucket_ts")
        .agg(*_merge_aggs())
    )
    return _with_avg(out)


def rollup_all_tiers(
    seqs: DataFrame,
    ts_col: str = "event_ts",
    key_col: str = "source",
    salt_buckets: int | None = None,
    token_engine: str = "expr",
) -> dict[str, DataFrame]:
    """Full cascade raw->1m->1h->1d. Each tier derives from the previous one."""
    tiers: dict[str, DataFrame] = {}
    tiers["1m"] = rollup_1m(
        seqs, ts_col=ts_col, key_col=key_col, salt_buckets=salt_buckets,
        token_engine=token_engine,
    )
    tiers["1h"] = cascade(tiers["1m"], "1h", key_col=key_col)
    tiers["1d"] = cascade(tiers["1h"], "1d", key_col=key_col)
    return tiers


def width_bucket(ts: Column, width_sec: int, origin: str = "2020-01-01 00:00:00") -> Column:
    """Floor ``ts`` onto a fixed-width grid anchored at ``origin``
    (TimescaleDB ``time_bucket(width, ts, origin)`` semantics) — the
    general form of the calendar ``date_trunc`` the tiers use, for
    widths the tier set does not carry (5m, 15m, 4h, weeks, ...)."""
    if width_sec < 1:
        raise ValueError(f"width_sec must be >= 1, got {width_sec}")
    o = F.unix_micros(F.lit(origin).cast("timestamp"))
    t = F.unix_micros(ts)
    w = F.lit(int(width_sec) * 1_000_000).cast("long")
    return F.timestamp_micros((F.floor((t - o) / w) * w + o).cast("long"))


def cascade_width(
    rollup: DataFrame,
    width_sec: int,
    key_col: str = "source",
    origin: str = "2020-01-01 00:00:00",
) -> DataFrame:
    """Re-aggregate a tier into ARBITRARY fixed-width buckets (partial ->
    final, exact — the same merge algebra as :func:`cascade`): "15-minute
    rollups" served from the committed 1m tier with one tier-table-sized
    groupBy, never a raw rescan. The source tier's width must divide
    ``width_sec`` and its buckets must align to the grid (1m input: any
    whole-minute width with a whole-minute origin) — otherwise a source
    bucket would straddle two output buckets, which a summary cannot
    split; this is the caller's contract exactly as ``to_tier`` ordering
    is for :func:`cascade`."""
    out = (
        rollup.withColumn("bucket_ts", width_bucket(F.col("bucket_ts"), width_sec, origin))
        .groupBy(key_col, "bucket_ts")
        .agg(*_merge_aggs())
    )
    return _with_avg(out)
