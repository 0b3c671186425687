from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal
from timeseriesvectordbpattermatcher_spark.operators.rollup import (
    cascade,
    derive_event_ts,
    rollup_1m,
    rollup_all_tiers,
)

ORACLE_1M = """
SELECT source,
       date_trunc('minute', event_ts) AS bucket_ts,
       count(*)   AS cnt,
       sum(n_tok) AS sum_n_tok,
       min(n_tok) AS min_n_tok,
       max(n_tok) AS max_n_tok,
       min(list_min(tokens)) AS tok_min,
       max(list_max(tokens)) AS tok_max,
       sum(list_sum(tokens)) AS tok_sum,
       sum(n_tok) * 1.0 / count(*) AS avg_n_tok
FROM seqs GROUP BY 1, 2
"""


@pytest.fixture(scope="module")
def seqs_with_ts(seqs_2k):
    df = derive_event_ts(seqs_2k).cache()
    df.count()
    yield df
    df.unpersist()


def test_derive_event_ts_roundtrip(seqs_with_ts):
    # the timestamp parsed back from doc_id must re-format to the same string
    bad = seqs_with_ts.filter(
        F.date_format("event_ts", "yyyyMMddHHmmss") != F.split("doc_id", "_").getItem(1)
    ).count()
    assert bad == 0


def test_rollup_1m_vs_duckdb(spark, seqs_with_ts, duck):
    pdf = seqs_with_ts.select("doc_id", "tokens", "n_tok", "source", "event_ts").toPandas()
    duck.register("seqs", pdf)
    got = rollup_1m(seqs_with_ts)
    assert_df_equal(got, duck.sql(ORACLE_1M), ["source", "bucket_ts"])


def test_salted_equals_unsalted(seqs_with_ts):
    plain = rollup_1m(seqs_with_ts).orderBy("source", "bucket_ts").collect()
    salted = rollup_1m(seqs_with_ts, salt_buckets=8).orderBy("source", "bucket_ts").collect()
    assert plain == salted


def test_tier_exactness(seqs_with_ts):
    """north_rule: each tier must equal a direct rollup at that granularity."""
    tiers = rollup_all_tiers(seqs_with_ts)
    for tier, trunc in [("1h", "hour"), ("1d", "day")]:
        direct = (
            derive_event_ts(seqs_with_ts.drop("event_ts"))
            .withColumn("event_ts", F.date_trunc(trunc, "event_ts"))
            .transform(rollup_1m)
            .withColumn("bucket_ts", F.date_trunc(trunc, "bucket_ts"))
        )
        got = tiers[tier].orderBy("source", "bucket_ts").collect()
        want = direct.orderBy("source", "bucket_ts").collect()
        assert got == want, f"tier {tier} mismatch"


def test_cascade_preserves_totals(seqs_with_ts):
    t1m = rollup_1m(seqs_with_ts)
    t1h = cascade(t1m, "1h")
    t1d = cascade(t1h, "1d")
    totals = [
        t.agg(F.sum("cnt"), F.sum("sum_n_tok"), F.sum("tok_sum")).collect()[0]
        for t in (t1m, t1h, t1d)
    ]
    assert totals[0] == totals[1] == totals[2]


def test_token_stats_arrow_matches_expr(spark):
    """The vectorized mapInArrow token-stat engine must agree with the HOF
    expression engine row-for-row — including null and empty token arrays
    (null -> all null; empty -> min/max null, sum 0)."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import add_token_stats

    rows = [
        ("a", [1, 5, 3], 3),
        ("b", [], 0),
        ("c", None, 0),
        ("d", [7], 1),
        ("e", [-2, 0, 9, 4], 4),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int")
    a = {
        r["doc_id"]: (r["tok_min"], r["tok_max"], r["tok_sum"])
        for r in add_token_stats(df, engine="arrow").collect()
    }
    e = {
        r["doc_id"]: (r["tok_min"], r["tok_max"], r["tok_sum"])
        for r in add_token_stats(df, engine="expr").collect()
    }
    assert a == e, (a, e)
    assert a["b"] == (None, None, 0)
    assert a["c"] == (None, None, None)
    assert a["a"] == (1, 5, 9)


def test_token_stats_arrow_matches_expr_bulk(spark, seqs_2k):
    from pyspark.sql import functions as F

    from timeseriesvectordbpattermatcher_spark.operators.rollup import add_token_stats

    agg = [F.sum("tok_sum"), F.min("tok_min"), F.max("tok_max")]
    a = add_token_stats(seqs_2k, engine="arrow").agg(*agg).collect()[0]
    e = add_token_stats(seqs_2k, engine="expr").agg(*agg).collect()[0]
    assert tuple(a) == tuple(e)


def test_token_stats_arrow_matches_expr_null_elements(spark):
    """Null ELEMENTS inside token arrays: the expr path nulls the sum
    (aggregate fold: acc + null = null) but min/max skip nulls — the arrow
    kernel must agree instead of coercing the child buffer to float/NaN."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import add_token_stats

    rows = [
        ("a", [1, None, 3], 3),
        ("b", [None], 1),            # all elements null
        ("c", [None, None, 5], 3),
        ("d", [4, 2], 2),            # clean row in the same batch
        ("e", None, 0),
        ("f", [], 0),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int")
    for engine in ("arrow", "arrow_drop"):
        a = {
            r["doc_id"]: (r["tok_min"], r["tok_max"], r["tok_sum"])
            for r in add_token_stats(df, engine=engine).collect()
        }
        e = {
            r["doc_id"]: (r["tok_min"], r["tok_max"], r["tok_sum"])
            for r in add_token_stats(df, engine="expr").collect()
        }
        assert a == e, (engine, a, e)
    assert e["a"] == (1, 3, None)       # null element nulls the sum only
    assert e["b"] == (None, None, None)
    assert e["c"] == (5, 5, None)
    assert e["d"] == (2, 4, 6)


def test_token_stats_unknown_engine_raises(spark):
    import pytest as _pytest

    from timeseriesvectordbpattermatcher_spark.operators.rollup import add_token_stats

    df = spark.createDataFrame([("a", [1], 1)], "doc_id string, tokens array<int>, n_tok int")
    with _pytest.raises(ValueError, match="unknown token-stat engine"):
        add_token_stats(df, engine="arow")


def test_rollup_salted_without_doc_id(spark):
    """The projected token-less shape (no doc_id) must still salt."""
    from pyspark.sql import functions as F

    from timeseriesvectordbpattermatcher_spark.operators.rollup import rollup_1m

    df = spark.createDataFrame(
        [("s", "2024-01-01 00:00:30", 5), ("s", "2024-01-01 00:00:45", 7)],
        "source string, event_ts string, n_tok int",
    ).withColumn("event_ts", F.to_timestamp("event_ts"))
    out = rollup_1m(df, salt_buckets=4).collect()
    assert len(out) == 1 and out[0]["cnt"] == 2 and out[0]["sum_n_tok"] == 12


def test_derive_event_ts_tolerates_malformed_doc_ids(spark):
    """A doc_id the timestamp regexp can't parse must yield NULL event_ts
    (skipped + auditable downstream), not an ANSI CANNOT_PARSE_TIMESTAMP
    crash — PySpark 4 is ANSI by default."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts

    df = spark.createDataFrame(
        [("web_20240101000000_00000001",), ("web_badid_x",), ("nodate",)],
        "doc_id string",
    )
    out = {r["doc_id"]: r["event_ts"] for r in derive_event_ts(df).collect()}
    assert out["web_20240101000000_00000001"] is not None
    assert out["web_badid_x"] is None
    assert out["nodate"] is None


def test_skewed_hot_key_salted_rollup(spark, duck):
    """Skew probe (r3 verdict #8): one (source, minute) pair carries 50% of
    all rows. Pins three things at once:

    1. exactness — every salted tier still matches a DuckDB recompute of the
       skewed corpus at that tier's granularity;
    2. the salted plan ENGAGES — ``_salt`` appears in the first Exchange's
       hash partitioning, so the hot group is split across salt buckets by
       the plan itself, not by luck;
    3. distribution — under the grouping-key shuffle the hot group would land
       ~50% of all rows on one reducer; under (key, bucket, _salt) the max
       reducer share is bounded near 1/salt_buckets of the hot share. This
       is the property that keeps max-task-time/median bounded at 100 TB.
    """
    from pyspark.sql import functions as F

    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        cascade,
        rollup_1m,
    )

    n, buckets = 40_000, 8
    hot = F.col("id") % 2 == 0  # 50% of rows -> one (source, minute) group
    df = spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(
            (F.col("id") % 5).cast("int"), (F.col("id") % 9 + 1).cast("int")
        ).alias("tokens"),
        F.lit(2).alias("n_tok"),
        F.when(hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 7)))
        .alias("source"),
        F.when(hot, F.lit("2024-01-01 00:00:30").cast("timestamp"))
        .otherwise(
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") % 600) * 60 + F.col("id") % 60
            )
        )
        .alias("event_ts"),
    )

    # 1. exactness at every tier on the skewed corpus
    duck.register("skew", df.toPandas())
    t1m = rollup_1m(df, salt_buckets=buckets)
    tiers = {"1m": t1m, "1h": cascade(t1m, "1h"), "1d": cascade(cascade(t1m, "1h"), "1d")}
    for tier, trunc in (("1m", "minute"), ("1h", "hour"), ("1d", "day")):
        oracle = duck.sql(ORACLE_1M.replace("'minute'", f"'{trunc}'").replace("seqs", "skew"))
        assert_df_equal(tiers[tier], oracle, ["source", "bucket_ts"])

    # 2. the salted plan engages: _salt partitions the first Exchange
    plan = t1m._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan.split("Exchange")[1], plan[:2000]

    # 3. reducer-share bound: same salt construction as rollup_1m, measured
    # as actual rows per shuffle partition
    def max_share(cols):
        parts = (
            df.withColumn("bucket_ts", F.date_trunc("minute", "event_ts"))
            .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(buckets)))
            .repartition(32, *cols)
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        return parts / n

    assert max_share(["source", "bucket_ts"]) >= 0.5  # the hot reducer
    # salted: hot share/buckets + cold residue; 3x headroom over 1/8 of 50%
    assert max_share(["source", "bucket_ts", "_salt"]) < 3 * 0.5 / buckets


def _edge_corpus_rows():
    import datetime as dt

    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    return [
        # 00:00 — clean rows, two sources, plus a null source key
        ("a1", [1, 5, 3], 3, "web", T0),
        ("a2", [7], 1, "web", T0),
        ("i1", [8, -1], 2, "code", T0),
        ("h1", [6], 1, None, T0),
        # 00:01 — all empty arrays -> tok_sum 0, tok_min/max null
        ("b1", [], 0, "web", T0.replace(minute=1)),
        ("b2", [], 0, "web", T0.replace(minute=1)),
        # 00:02 — all null arrays -> all token stats null
        ("c1", None, 0, "web", T0.replace(minute=2)),
        # 00:03 — only dirty rows (null elements) -> sum null, min/max from
        # the clean elements
        ("d1", [1, None, 3], 3, "web", T0.replace(minute=3)),
        ("d2", [None], 1, "web", T0.replace(minute=3)),
        # 00:04 — dirty + empty -> sum 0 (the empty row's +0 survives)
        ("e1", [None, 9], 2, "web", T0.replace(minute=4)),
        ("e2", [], 0, "web", T0.replace(minute=4)),
        # 00:05 — dirty + clean -> sum covers the clean row only
        ("f1", [2, None], 2, "web", T0.replace(minute=5)),
        ("f2", [10, 20], 2, "web", T0.replace(minute=5)),
        # malformed doc_id downstream -> NULL event_ts group
        ("g1", [4, 4], 2, "web", None),
    ]


def test_rollup_explode_engine_matches_expr_edges(spark):
    """token_engine='explode' (bucket-level explode_outer agg, zero Python
    AND zero interpreted lambdas) must reproduce the per-row engines' null
    semantics bucket-for-bucket: empty arrays +0, null arrays skipped, a
    null ELEMENT nulls its row's sum while min/max keep the clean elements,
    and NULL group keys (bad event_ts / null source) still aggregate."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import rollup_1m

    df = spark.createDataFrame(
        _edge_corpus_rows(),
        "doc_id string, tokens array<int>, n_tok int, source string, event_ts timestamp",
    )

    def norm(d):
        return sorted(
            [tuple(r) for r in d.collect()], key=lambda t: (str(t[0]), str(t[1]))
        )

    for salt in (None, 4):
        e = norm(rollup_1m(df, token_engine="expr", salt_buckets=salt))
        x = norm(rollup_1m(df, token_engine="explode", salt_buckets=salt))
        assert e == x, (salt, set(e) ^ set(x))
    by_bucket = {
        (r[0], str(r[1])): r for r in norm(rollup_1m(df, token_engine="explode"))
    }
    assert by_bucket[("web", "2024-01-01 00:01:00")][8] == 0      # all-empty: 0
    assert by_bucket[("web", "2024-01-01 00:02:00")][8] is None   # all-null: null
    assert by_bucket[("web", "2024-01-01 00:03:00")][6:9] == (1, 3, None)
    assert by_bucket[("web", "2024-01-01 00:04:00")][8] == 0      # dirty+empty
    assert by_bucket[("web", "2024-01-01 00:05:00")][8] == 30     # clean row only


def test_rollup_explode_engine_fast_path(spark):
    """With containsNull=False on the element type the explode engine skips
    the per-doc re-group (fast path) — parity still holds, including empty
    arrays (+0) and null ARRAYS (field nullability is independent of element
    nullability)."""
    import datetime as dt

    from pyspark.sql import types as T

    from timeseriesvectordbpattermatcher_spark.operators.rollup import rollup_1m

    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    sch = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType(), containsNull=False)),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
            T.StructField("event_ts", T.TimestampType()),
        ]
    )
    rows = [
        ("a1", [1, 5, 3], 3, "web", T0),
        ("a2", [7], 1, "web", T0),
        ("b1", [], 0, "web", T0.replace(minute=1)),
        ("n1", None, 0, "web", T0.replace(minute=2)),
        ("m1", [4], 1, "web", T0.replace(minute=2)),
    ]
    df = spark.createDataFrame(rows, sch)

    def norm(d):
        return sorted([tuple(r) for r in d.collect()], key=lambda t: str(t[1]))

    e = norm(rollup_1m(df, token_engine="expr"))
    x = norm(rollup_1m(df, token_engine="explode"))
    assert e == x, set(e) ^ set(x)
    # the fast path must actually engage: no _doc re-group in the plan
    plan = rollup_1m(df, token_engine="explode")._jdf.queryExecution().toString()
    assert "_doc" not in plan


def test_rollup_explode_engine_matches_arrow_bulk(spark, seqs_2k):
    """Tier-for-tier equality on a realistic corpus (all three tiers)."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        derive_event_ts,
        rollup_all_tiers,
    )

    seqs = derive_event_ts(seqs_2k)
    a = rollup_all_tiers(seqs, token_engine="arrow_drop")
    x = rollup_all_tiers(seqs, token_engine="explode")
    for tier in ("1m", "1h", "1d"):
        ra = sorted([tuple(r) for r in a[tier].collect()], key=str)
        rx = sorted([tuple(r) for r in x[tier].collect()], key=str)
        assert ra == rx, tier


def test_rollup_explode_engine_duplicate_doc_ids(spark):
    """The per-doc regroup must key on row identity, not doc_id: two rows
    SHARING a doc_id (and array size) in one bucket must not merge into a
    pseudo-doc — a dirty row's sum stays NULLed while its clean twin counts."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.rollup import rollup_1m

    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("X", [1, None, 3], 3, "web", T0),   # dirty
        ("X", [4, 5, 6], 3, "web", T0),      # clean, same id + size
        (None, [5, None], 2, "web", T0.replace(minute=1)),  # null ids too
        (None, [7, 8], 2, "web", T0.replace(minute=1)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, event_ts timestamp"
    )
    for salt in (None, 4):
        e = sorted(map(tuple, rollup_1m(df, token_engine="expr", salt_buckets=salt).collect()))
        x = sorted(map(tuple, rollup_1m(df, token_engine="explode", salt_buckets=salt).collect()))
        assert e == x, (salt, e, x)
    by_min = {str(r[1]): r for r in rollup_1m(df, token_engine="explode").collect()}
    assert by_min["2024-01-01 00:00:00"]["tok_sum"] == 15   # clean twin only
    assert by_min["2024-01-01 00:01:00"]["tok_sum"] == 15
