"""Compressed segment persistence: Gorilla payloads as BinaryType columns.

Turns a per-key time series (e.g. the 1m rollup) into one row per
(key, day-chunk) holding delta-of-delta-compressed timestamps and
XOR-compressed values — the compact rollup-segment store the north star
requires. The reference's nearest concept is its pickle.gz datapack sink
(/root/reference/katslib/opkatsDataUtil.py:239-240); here the payload is a
columnar binary codec instead of a Python pickle, written through ordinary
``df.write.parquet`` so the bytes live inside a splittable, scan-able table.

All entry points are Arrow-batch UDFs (``pandas_udf`` over array columns):
the DataFrame shape is one segment per row, arrays collected per segment via
``collect_list`` over a window-ordered group — a single shuffle on the
segment key, then embarrassingly parallel encoding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codecs


@F.pandas_udf(T.BinaryType())
def dod_encode_udf(ts_arrays: pd.Series) -> pd.Series:
    return ts_arrays.map(lambda a: codecs.encode_dod_ints(a))


@F.pandas_udf(T.ArrayType(T.LongType()))
def dod_decode_udf(blobs: pd.Series) -> pd.Series:
    return blobs.map(lambda b: codecs.decode_dod_ints(b).tolist())


@F.pandas_udf(T.BinaryType())
def xor_encode_udf(val_arrays: pd.Series) -> pd.Series:
    return val_arrays.map(lambda a: codecs.encode_xor_floats(a))


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def xor_decode_udf(blobs: pd.Series) -> pd.Series:
    return blobs.map(lambda b: codecs.decode_xor_floats(b).tolist())


def compress_rollup_segments(
    rollup: DataFrame,
    value_col: str = "avg_n_tok",
    key_col: str = "source",
    chunk: str = "1 day",
) -> DataFrame:
    """rollup(source, bucket_ts, value) -> one compressed segment per
    (source, chunk): (segment_id, source, chunk_ts, n_points, ts_codec,
    val_codec).

    ``sort_array`` of collected (ts, value) structs pins the intra-segment
    order deterministically regardless of shuffle arrival order.
    """
    # rows with a null bucket_ts can't live in any time chunk, and a null
    # inside the collected ts array would crash the int64 DoD encoder on
    # the executor with no hint of the bad input row — drop them here
    rollup = rollup.filter(F.col("bucket_ts").isNotNull())
    grouped = (
        rollup.withColumn("chunk_ts", F.window("bucket_ts", chunk).getField("start"))
        .groupBy(key_col, "chunk_ts")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("bucket_ts").cast("long").alias("ts_s"),
                        F.col(value_col).cast("double").alias("v"),
                    )
                )
            ).alias("pts")
        )
    )
    return grouped.select(
        F.concat_ws(
            "_", F.col(key_col), F.date_format("chunk_ts", "yyyyMMddHHmmss")
        ).alias("segment_id"),
        key_col,
        "chunk_ts",
        F.size("pts").alias("n_points"),
        dod_encode_udf(F.col("pts.ts_s")).alias("ts_codec"),
        xor_encode_udf(F.col("pts.v")).alias("val_codec"),
    )


def decompress_segments(segments: DataFrame, key_col: str = "source") -> DataFrame:
    """Inverse of ``compress_rollup_segments``: back to (key, bucket_ts, value)."""
    exploded = segments.select(
        key_col,
        F.explode(
            F.arrays_zip(
                dod_decode_udf("ts_codec").alias("ts_s"),
                xor_decode_udf("val_codec").alias("v"),
            )
        ).alias("pt"),
    )
    return exploded.select(
        key_col,
        F.col("pt.ts_s").cast("timestamp").alias("bucket_ts"),
        F.col("pt.v").alias("value"),
    )
