"""Row-level MERGE INTO / DELETE on the snapshot table (copy-on-write).

Oracle: DuckDB replays the merge relationally over the pre-merge rows and
the update set (FULL OUTER semantics expressed as anti-join + union) and
the post-merge table must match exactly. Untouched partitions keep their
version stamps — the snapshot-incremental contract."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "m"))
    base = spark.range(100).select(
        F.concat(F.lit("p"), (F.col("id") % 4).cast("string")).alias("part"),
        F.col("id"),
        (F.col("id") * 10).alias("val"),
    )
    t.overwrite_partitions(base, ["part"])
    return t


def test_upsert_replaces_inserts_and_spares_untouched(table, spark, duck):
    v1 = {pk: p["v"] for pk, p in table.current_snapshot().partitions.items()}
    updates = spark.createDataFrame(
        [("p0", 0, -1), ("p0", 4, -2), ("p0", 1000, 7), ("p9", 2000, 9)],
        "part string, id bigint, val bigint",
    )
    before = table.read(spark).toPandas()
    table.merge_into(spark, updates, ["part", "id"], ["part"])
    got = table.read(spark).toPandas().sort_values("id").reset_index(drop=True)

    duck.register("before_m", before)
    duck.register("upd_m", updates.toPandas())
    want = duck.sql("""
        SELECT * FROM before_m b
        WHERE NOT EXISTS (SELECT 1 FROM upd_m u WHERE u.part=b.part AND u.id=b.id)
        UNION ALL SELECT * FROM upd_m
        ORDER BY id
    """).df().reset_index(drop=True)
    assert len(got) == len(want) == 102
    assert (got["id"].to_numpy() == want["id"].to_numpy()).all()
    assert (got["val"].to_numpy() == want["val"].to_numpy()).all()

    v2 = {pk: p["v"] for pk, p in table.current_snapshot().partitions.items()}
    for pk in ("p1", "p2", "p3"):
        assert v2[pk] == v1[pk], f"untouched partition {pk} was rewritten"
    assert v2["p0"] > v1["p0"] and "p9" in v2


def test_delete_rows_and_empty_partition_drops(table, spark):
    # delete every p1 row and two p2 rows
    doomed = table.read(spark).filter(
        (F.col("part") == "p1") | ((F.col("part") == "p2") & (F.col("id") < 10))
    ).select("part", "id")
    n_before = table.read(spark).count()
    n_doomed = doomed.count()
    table.merge_into(spark, doomed, ["part", "id"], ["part"], mode="delete")
    after = table.read(spark)
    assert after.count() == n_before - n_doomed
    assert after.filter(F.col("part") == "p1").count() == 0
    assert "p1" not in table.current_snapshot().partitions  # emptied -> dropped
    assert after.filter((F.col("part") == "p2") & (F.col("id") < 10)).count() == 0


def test_duplicate_update_keys_raise(table, spark):
    dup = spark.createDataFrame(
        [("p0", 0, 1), ("p0", 0, 2)], "part string, id bigint, val bigint"
    )
    with pytest.raises(ValueError, match="not unique"):
        table.merge_into(spark, dup, ["part", "id"], ["part"])


def test_upsert_into_empty_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "fresh"))
    upd = spark.createDataFrame([("a", 1, 5)], "part string, id bigint, val bigint")
    t.merge_into(spark, upd, ["part", "id"], ["part"])
    assert t.read(spark).count() == 1
    with pytest.raises(ValueError, match="empty table"):
        SnapshotTable(str(tmp_path / "fresh2")).merge_into(
            spark, upd, ["part", "id"], ["part"], mode="delete"
        )


def test_delete_missing_partition_is_noop(table, spark):
    v = table.current_snapshot().version
    ghost = spark.createDataFrame([("zz", 1)], "part string, id bigint")
    # ghost partition exists nowhere: read_partitions -> None -> no-op
    out = table.merge_into(spark, ghost, ["part", "id"], ["part"], mode="delete")
    assert out.version == v
    assert table.read(spark).count() == 100


def test_merge_idempotent_rerun(table, spark):
    updates = spark.createDataFrame(
        [("p0", 0, -1), ("p3", 999, 3)], "part string, id bigint, val bigint"
    )
    table.merge_into(spark, updates, ["part", "id"], ["part"])
    first = table.read(spark).toPandas().sort_values("id").reset_index(drop=True)
    table.merge_into(spark, updates, ["part", "id"], ["part"])  # same merge again
    second = table.read(spark).toPandas().sort_values("id").reset_index(drop=True)
    assert first.equals(second)
