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
