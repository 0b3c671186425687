"""SAX symbolic time-series representation: PAA + Gaussian breakpoints,
motif discovery, and word-bucketed candidate pairs.

The reference's pattern machinery matches RAW segment geometry (sliding
64-point windows -> 40-dim feature vectors -> cosine top-k,
/root/reference/opkatsPatternMatcherUtil.py:223-253, and shape state
machines in extremaPatternLooper.py). What it lacks is a *symbolic* index:
a compact alphabet form of each window under which "same shape" becomes
"same word" — the classic SAX construction (Lin, Keogh, Wei, Lonardi,
"Experiencing SAX: a novel symbolic representation of time series", DMKD
2007; the iSAX index family builds on it). SAX gives this engine a
shuffle-cheap motif/discord layer over any rollup metric:

1. frame each per-key series into length-``frame_len`` windows (tumbling
   by default, overlapping via ``stride``),
2. z-normalize WITHIN the frame (shape, not level),
3. PAA: mean of each of ``word_len`` equal segments,
4. quantize each PAA value through the published equiprobable N(0,1)
   breakpoints into letters 'a'..; the frame's word is the concatenation.

Identical words <=> lower-bounded-similar shapes (the MINDIST guarantee),
so motif discovery is a word count and near-pair candidate generation is
a word-bucket self-join — never an all-pairs distance matrix.

Physical shape (all codegen'd expressions, zero UDFs):

- framing is ``row_number`` per key + integer frame arithmetic; an
  overlapping stride explodes each row into its ~frame_len/stride member
  frames (bounded fan-out, corpus-independent multiplier),
- the two aggregations (per-(key, frame, segment) PAA means, then
  per-(key, frame) word assembly + moments) shuffle on (key, frame) —
  map-side combine absorbs the segment fan-in because PAA segments are
  DENSE runs, so the exchange carries frames x word_len rows, not raw
  points,
- quantization is a <=9-comparison CASE chain; word assembly is
  ``array_sort(collect_list(struct))`` -> ``concat_ws``.

At 10^12-row scale the input to this module is a rollup tier (minutes,
not raw events) — frames x word_len is orders of magnitude below the raw
count, and every stage above keys its shuffle by (key, frame) so skew is
bounded by series length, mitigable upstream by the same salting the
rollup cascade uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "SAX_BREAKPOINTS",
    "sax_symbol",
    "sax_words",
    "sax_motifs",
    "sax_candidate_pairs",
]

#: Equiprobable N(0,1) breakpoints per alphabet size (Lin et al., DMKD
#: 2007, Table 2 — the canonical published two-decimal table; alphabet
#: size a has a-1 cut points splitting the Gaussian into a equal-mass
#: regions).
SAX_BREAKPOINTS: dict[int, list[float]] = {
    3: [-0.43, 0.43],
    4: [-0.67, 0.0, 0.67],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
    7: [-1.07, -0.57, -0.18, 0.18, 0.57, 1.07],
    8: [-1.15, -0.67, -0.32, 0.0, 0.32, 0.67, 1.15],
    9: [-1.22, -0.76, -0.43, -0.14, 0.14, 0.43, 0.76, 1.22],
    10: [-1.28, -0.84, -0.52, -0.25, 0.0, 0.25, 0.52, 0.84, 1.28],
}


def sax_symbol(z: Column, alphabet: int = 4) -> Column:
    """Letter for one z-normalized value: 'a' for the lowest region, on
    up — a CASE chain over the published breakpoints (<= 9 comparisons,
    codegen'd). NULL z -> NULL symbol."""
    if alphabet not in SAX_BREAKPOINTS:
        raise ValueError(
            f"alphabet must be in {sorted(SAX_BREAKPOINTS)}, got {alphabet!r}"
        )
    cuts = SAX_BREAKPOINTS[alphabet]
    expr = F.lit(chr(ord("a") + len(cuts)))  # top region
    for i in range(len(cuts) - 1, -1, -1):
        expr = F.when(z < F.lit(cuts[i]), F.lit(chr(ord("a") + i))).otherwise(
            expr
        )
    return F.when(z.isNotNull(), expr)


def sax_words(
    series: DataFrame,
    frame_len: int,
    word_len: int,
    alphabet: int = 4,
    key_col: str = "source",
    ts_col: str = "bucket_ts",
    value_col: str = "avg_n_tok",
    stride: int | None = None,
) -> DataFrame:
    """Per-key SAX words over ``value_col`` ordered by ``ts_col``.

    Returns one row per COMPLETE frame: (key, frame_id, frame_start_ts,
    frame_mean, frame_std, word). ``frame_id`` counts frame starts in
    stride units; partial tail frames (fewer than ``frame_len`` points)
    are dropped — a word must summarize a full window. NULL values and
    NULL timestamps are excluded from the series before framing (SAX is
    defined over an observed sequence; gap-fill upstream via
    operators/gapfill if positional alignment matters).

    A frame whose points are all equal (std == 0) z-normalizes to the
    all-zero vector — its word is the middle letter repeated, matching
    the convention in the public SAX implementations rather than NaN.

    ``stride`` (default ``frame_len``: tumbling) < ``frame_len`` gives
    overlapping frames: each row fans out to ceil(frame_len/stride)
    member frames via an explode — the multiplier is fixed by config,
    never by data.
    """
    if frame_len < 2 or word_len < 1 or frame_len % word_len:
        raise ValueError(
            "need frame_len >= 2 divisible by word_len >= 1, got "
            f"frame_len={frame_len} word_len={word_len}"
        )
    if stride is None:
        stride = frame_len
    if stride < 1 or frame_len % stride:
        raise ValueError(
            f"stride must divide frame_len, got stride={stride} "
            f"frame_len={frame_len}"
        )
    seg_len = frame_len // word_len

    pos = (
        series.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("val"),
        )
        .withColumn(
            "_i",
            F.row_number().over(
                Window.partitionBy("key").orderBy("ts")
            ) - F.lit(1),
        )
    )
    # frame k covers positions [k*stride, k*stride + frame_len); row _i
    # belongs to k in [max(0, ceil((_i - frame_len + 1)/stride)), _i/stride]
    k_lo = F.greatest(
        F.lit(0),
        -F.floor((F.lit(frame_len - 1) - F.col("_i")) / F.lit(stride)),
    ).cast("int")
    k_hi = F.floor(F.col("_i") / F.lit(stride)).cast("int")
    member = pos.select(
        "key",
        "ts",
        "val",
        "_i",
        F.explode(F.sequence(k_lo, k_hi)).alias("frame_id"),
    ).withColumn(
        "_seg",
        F.floor(
            (F.col("_i") - F.col("frame_id") * F.lit(stride)) / F.lit(seg_len)
        ).cast("int"),
    )
    paa = member.groupBy("key", "frame_id", "_seg").agg(
        F.avg("val").alias("_paa"),
        F.sum("val").alias("_sum"),
        F.sum(F.col("val") * F.col("val")).alias("_sumsq"),
        F.count(F.lit(1)).alias("_n"),
        F.min("ts").alias("_seg_ts"),
    )
    frames = paa.groupBy("key", "frame_id").agg(
        F.sum("_n").alias("_cnt"),
        (F.sum("_sum") / F.sum("_n")).alias("frame_mean"),
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                F.sum("_sumsq") / F.sum("_n")
                - F.pow(F.sum("_sum") / F.sum("_n"), F.lit(2)),
            )
        ).alias("frame_std"),
        F.min("_seg_ts").alias("frame_start_ts"),
        F.array_sort(F.collect_list(F.struct("_seg", "_paa"))).alias("_segs"),
    )
    return (
        frames.filter(F.col("_cnt") == F.lit(frame_len))
        .select(
            F.col("key").alias(key_col),
            "frame_id",
            "frame_start_ts",
            "frame_mean",
            "frame_std",
            F.concat_ws(
                "",
                F.transform(F.col("_segs"), lambda e: _sym_of(e, alphabet)),
            ).alias("word"),
        )
    )


def _sym_of(entry: Column, alphabet: int) -> Column:
    """Symbol for one (_seg, _paa) struct given the row's frame moments —
    split out so ``F.transform`` can reference the lambda argument."""
    z = (entry["_paa"] - F.col("frame_mean")) / F.col("frame_std")
    mid = F.lit(chr(ord("a") + len(SAX_BREAKPOINTS[alphabet]) // 2))
    return F.when(F.col("frame_std") > F.lit(0.0), sax_symbol(z, alphabet)) \
        .otherwise(mid)


def sax_motifs(
    words: DataFrame,
    top_k: int = 10,
    min_count: int = 2,
    key_col: str = "source",
) -> DataFrame:
    """Top-``top_k`` most frequent words per key (the SAX motif heuristic:
    a shape that recurs is a motif candidate). One aggregation + one
    windowed rank, both keyed by (key[, word]) — no joins. Ties rank
    dense so equal-count words all surface."""
    counts = words.groupBy(key_col, "word").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_start_ts").alias("first_ts"),
    )
    ranked = counts.withColumn(
        "rank",
        F.dense_rank().over(
            Window.partitionBy(key_col).orderBy(F.col("n_frames").desc())
        ),
    )
    return ranked.filter(
        (F.col("rank") <= F.lit(top_k)) & (F.col("n_frames") >= F.lit(min_count))
    )


def sax_candidate_pairs(
    words: DataFrame,
    key_col: str = "source",
    max_bucket: int | None = None,
) -> DataFrame:
    """Frame pairs sharing an exact word within a key — the candidate set
    for motif verification (exact distance on the raw segments, which
    MINDIST lower-bounds). A word-bucket self-join: each bucket joins
    only with itself, so the pair count is sum(bucket^2), never corpus^2.

    ``max_bucket`` drops words recurring more than that many times (a
    flat series produces one degenerate word covering most frames —
    the hot-gram problem; at scale, cap it). Dropped words are REPORTED
    via the returned frame's sibling: filter upstream on sax_motifs if
    you need the census — this function never silently truncates within
    a kept bucket."""
    w = words.select(key_col, "word", "frame_id", "frame_start_ts")
    if max_bucket is not None:
        sizes = w.groupBy(key_col, "word").agg(
            F.count(F.lit(1)).alias("_bucket_n")
        )
        w = w.join(
            sizes.filter(F.col("_bucket_n") <= F.lit(max_bucket)),
            on=[key_col, "word"],
            how="inner",
        ).drop("_bucket_n")
    a = w.select(
        F.col(key_col),
        F.col("word"),
        F.col("frame_id").alias("frame_a"),
        F.col("frame_start_ts").alias("ts_a"),
    )
    b = w.select(
        F.col(key_col),
        F.col("word"),
        F.col("frame_id").alias("frame_b"),
        F.col("frame_start_ts").alias("ts_b"),
    )
    return a.join(b, on=[key_col, "word"], how="inner").filter(
        F.col("frame_a") < F.col("frame_b")
    )
