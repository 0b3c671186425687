"""Loaders for the driver's parquet tables (TESTDATA.md).

Thin wrappers over ``spark.read.parquet`` — Catalyst handles predicate
pushdown / column pruning; nothing is cached here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and sorted) on its join/groupBy key.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle (Exchange elimination) — the co-located-join strategy
    for repeatedly-joined big tables (e.g. segments x rollups on
    (source, bucket)). At 100 TB this turns every downstream equi-join on
    the key into a local sort-merge per bucket. Plain parquet ``save()``
    cannot carry bucket metadata — this requires ``saveAsTable`` (metastore).
    """
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.saveAsTable(table)
