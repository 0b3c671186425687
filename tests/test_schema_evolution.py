"""Additive schema evolution on the snapshot table.

Iceberg rule subset: commits may ADD columns (old files read as NULL) and
may stop writing columns (new files read as NULL); type changes refuse.
The recorded schema is per-version, so time travel shows the schema as of
that version. Oracle: DuckDB union_by_name over the raw data files."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import (
    SnapshotTable,
    _merge_schema,
)


@pytest.fixture()
def evolved(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "evo"))
    v1 = spark.range(10).select(
        F.lit("a").alias("part"),
        F.col("id"),
        (F.col("id") * 2).alias("x"),
    )
    t.overwrite_partitions(v1, ["part"])
    v2 = spark.range(10, 20).select(
        F.lit("b").alias("part"),
        F.col("id"),
        (F.col("id") * 2).alias("x"),
        F.concat(F.lit("q"), F.col("id").cast("string")).alias("quality"),
    )
    t.overwrite_partitions(v2, ["part"])
    return t


def test_added_column_null_fills_old_files(evolved, spark, duck):
    df = evolved.read(spark)
    assert set(df.columns) == {"part", "id", "x", "quality"}
    got = df.toPandas().sort_values("id").reset_index(drop=True)
    assert got[got.part == "a"]["quality"].isna().all()
    assert (got[got.part == "b"]["quality"] == "q" + got[got.part == "b"]["id"].astype(str)).all()
    # DuckDB union_by_name over the raw files agrees
    snap = evolved.current_snapshot()
    files = [os.path.join(evolved.root, f) for p in snap.partitions.values() for f in p["files"]]
    want = duck.sql(
        f"SELECT * FROM read_parquet({files!r}, union_by_name=true) ORDER BY id"
    ).df()
    assert len(want) == len(got)
    assert (want["id"].to_numpy() == got["id"].to_numpy()).all()
    assert (want["quality"].isna() == got["quality"].isna()).all()


def test_version_pinned_read_shows_old_schema(evolved, spark):
    old = evolved.read(spark, version=1)
    assert set(old.columns) == {"part", "id", "x"}
    assert old.count() == 10


def test_dropped_column_stays_with_nulls(evolved, spark):
    v3 = spark.range(20, 25).select(
        F.lit("c").alias("part"),
        F.col("id"),  # no x, no quality
    )
    evolved.overwrite_partitions(v3, ["part"])
    df = evolved.read(spark)
    assert set(df.columns) == {"part", "id", "x", "quality"}
    c_rows = df.filter(F.col("part") == "c")
    assert c_rows.count() == 5
    assert c_rows.filter(F.col("x").isNull()).count() == 5


def test_type_change_refuses(evolved, spark):
    bad = spark.range(3).select(
        F.lit("d").alias("part"),
        F.col("id"),
        F.col("id").cast("string").alias("x"),  # bigint -> string
    )
    with pytest.raises(ValueError, match="schema evolution rejected"):
        evolved.overwrite_partitions(bad, ["part"])


def test_schema_survives_drop_and_rollback(evolved, spark):
    evolved.drop_partitions(["a"])
    assert set(evolved.read(spark).columns) == {"part", "id", "x", "quality"}
    evolved.rollback(1)
    # rollback restores v1's CONTENT and v1's schema
    assert set(evolved.read(spark).columns) == {"part", "id", "x"}
    assert evolved.read(spark).count() == 10


def test_read_where_uses_evolved_schema(evolved, spark):
    t = evolved
    v4 = spark.range(100, 105).select(
        F.lit("e").alias("part"), F.col("id"), (F.col("id") * 2).alias("x"),
        F.lit("z").alias("quality"),
    )
    t.overwrite_partitions(v4, ["part"], stats_cols=["id"])
    out = t.read_where(spark, {"id": (100, None)})
    assert set(out.columns) == {"part", "id", "x", "quality"}
    assert out.count() == 5


def test_legacy_manifest_without_schema_still_reads(evolved, spark, tmp_path):
    """Pre-evolution manifests (no schema key) fall back to file-derived
    schema — simulated by stripping the key from the commit log."""
    import json

    t = evolved
    for v in t._versions():
        p = os.path.join(t.root, "_commits", f"v{v}.json")
        d = json.load(open(p))
        d.pop("schema", None)
        json.dump(d, open(p, "w"))
    df = t.read(spark)
    assert df.count() == 20  # content still reads (schema from files)


def test_widening_promotion(evolved, spark):
    """int -> long widening is accepted (Iceberg ladder); the table schema
    keeps the widest type and narrow files upcast on read."""
    t = evolved
    narrow = spark.range(3).select(
        F.lit("w").alias("part"), F.col("id"), F.col("id").cast("int").alias("x")
    )
    t.overwrite_partitions(narrow, ["part"])  # x int vs table's bigint
    df = t.read(spark)
    assert dict(df.dtypes)["x"] == "bigint"
    assert df.filter(F.col("part") == "w").agg(F.sum("x")).first()[0] == 3
    # and the reverse order: a float column widened by a later double commit
    t2 = SnapshotTable(t.root + "_w2")
    t2.overwrite_partitions(
        spark.range(2).select(F.lit("a").alias("part"), F.col("id").cast("float").alias("v")),
        ["part"],
    )
    t2.overwrite_partitions(
        spark.range(2).select(F.lit("b").alias("part"), (F.col("id") + 0.5).alias("v")),
        ["part"],
    )
    df2 = t2.read(spark)
    assert dict(df2.dtypes)["v"] == "double"
    assert df2.count() == 4


def test_merge_schema_pure():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    a = StructType([StructField("x", LongType(), False)])
    merged = _merge_schema(None, a)
    b = StructType([StructField("x", LongType(), True), StructField("y", StringType(), False)])
    merged2 = _merge_schema(merged, b)
    out = StructType.fromJson(__import__("json").loads(merged2))
    assert [f.name for f in out.fields] == ["x", "y"]
    assert out["y"].nullable  # appended fields forced nullable
