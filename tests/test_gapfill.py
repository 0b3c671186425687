from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.gapfill import bucket_spine, gap_fill
from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts, rollup_1m


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def tiny_rollup(spark):
    # observed minutes: 0, 1, 4, 5 for source 'a' (gap at 2, 3); 2 only for 'b'
    rows = [
        ("a", _ts(0), 10.0),
        ("a", _ts(1), 20.0),
        ("a", _ts(4), 50.0),
        ("a", _ts(5), 60.0),
        ("b", _ts(2), 7.0),
    ]
    return spark.createDataFrame(rows, "source string, bucket_ts timestamp, avg_n_tok double")


def test_spine_covers_min_to_max(tiny_rollup):
    spine = bucket_spine(tiny_rollup, tier="1m")
    got = {(r["source"], r["bucket_ts"].minute) for r in spine.collect()}
    assert got == {("a", m) for m in range(6)} | {("b", 2)}


def test_locf(tiny_rollup):
    out = gap_fill(tiny_rollup, ["avg_n_tok"], tier="1m", method="locf")
    a = {r["bucket_ts"].minute: r for r in out.filter("source='a'").collect()}
    assert a[2]["avg_n_tok_filled"] == 20.0 and a[2]["is_filled"]
    assert a[3]["avg_n_tok_filled"] == 20.0 and a[3]["is_filled"]
    assert a[4]["avg_n_tok_filled"] == 50.0 and not a[4]["is_filled"]


def test_linear(tiny_rollup):
    out = gap_fill(tiny_rollup, ["avg_n_tok"], tier="1m", method="linear")
    a = {r["bucket_ts"].minute: r for r in out.filter("source='a'").collect()}
    # gap 2,3 between (1 -> 20.0) and (4 -> 50.0): slope 10/minute
    assert a[2]["avg_n_tok_filled"] == pytest.approx(30.0)
    assert a[3]["avg_n_tok_filled"] == pytest.approx(40.0)
    assert a[0]["avg_n_tok_filled"] == 10.0  # observed rows untouched


def test_linear_leading_trailing_gaps(spark):
    rows = [("a", _ts(2), 5.0), ("a", _ts(4), 9.0)]
    df = spark.createDataFrame(rows, "source string, bucket_ts timestamp, v double")
    # null-valued rows at minutes 0 and 6 widen the spine -> leading/trailing gaps
    spine_rows = [("a", _ts(m), None) for m in (0, 6)]
    widened = df.unionByName(
        spark.createDataFrame(spine_rows, "source string, bucket_ts timestamp, v double")
    )
    out = gap_fill(widened, ["v"], method="linear")
    vals = {r["bucket_ts"].minute: r["v_filled"] for r in out.collect()}
    assert vals[0] == 5.0 and vals[1] == 5.0  # leading -> bfill
    assert vals[3] == pytest.approx(7.0)  # interior -> interpolate
    assert vals[5] == 9.0 and vals[6] == 9.0  # trailing -> ffill


def test_gapfill_on_synth(spark, seqs_2k):
    """synth injects a 10-min hole every 400 rows -> filled rows must exist."""
    r1m = rollup_1m(derive_event_ts(seqs_2k))
    out = gap_fill(r1m, ["avg_n_tok", "cnt"], tier="1m", method="locf")
    assert out.filter("is_filled").count() > 0
    # every filled row carries the previous observed value
    assert out.filter("is_filled and avg_n_tok_filled is null").count() == 0


def test_noncanonical_spacing_does_not_crash(spark):
    """sequence() boundary clamp: duplicate bucket rows (or a tier coarser
    than the data's spacing) previously aborted the job with
    IllegalArgumentException (inverted sequence bounds); such anchors must
    emit only themselves."""
    rows = [
        ("a", _ts(0), 1.0),
        ("a", _ts(0), 2.0),        # duplicate bucket
        ("a", _ts(1), 3.0),        # minute-spaced...
        ("a", _ts(2), 4.0),
    ]
    df = spark.createDataFrame(rows, "source string, bucket_ts timestamp, v double")
    # duplicate buckets at the 1m tier
    out = gap_fill(df, ["v"], tier="1m", method="locf").collect()
    assert len(out) == 4 and all(not r["is_filled"] for r in out)
    # minute-spaced data through the 1h tier: closer than one step everywhere
    out_h = gap_fill(df, ["v"], tier="1h", method="linear").collect()
    assert len(out_h) == 4


def test_gapfill_linear_per_column_anchors(spark):
    """Each column interpolates between ITS OWN nearest non-null neighbors:
    a null cell inside an observed row fills (not a permanent hole), and a
    column with different null positions than value_cols[0] must not borrow
    the first column's time anchors (review counterexample: cnt anchors at
    0->120 but x at -60->120 gave x_filled 12.5 instead of 15)."""
    from pyspark.sql import functions as F

    from timeseriesvectordbpattermatcher_spark.operators.gapfill import gap_fill

    rows = [
        ("s", "2024-01-01 00:59:00", 1.0, 5.0),    # t=-60s rel anchor
        ("s", "2024-01-01 01:00:00", 1.0, None),   # x null on observed row
        ("s", "2024-01-01 01:02:00", 1.0, 20.0),   # t=+120s
    ]
    df = spark.createDataFrame(rows, "source string, bucket_ts string, cnt double, x double")
    df = df.withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    out = {
        r["bucket_ts"].strftime("%H:%M"): (r["cnt_filled"], r["x_filled"])
        for r in gap_fill(df, ["cnt", "x"], tier="1m", method="linear").collect()
    }
    # x is linear over ITS anchors (-60s: 5.0, +120s: 20.0 => 5 + 15*t/180)
    assert out["00:59"] == (1.0, 5.0)
    assert out["01:00"] == (1.0, 10.0)   # null cell on observed row: filled
    assert out["01:01"] == (1.0, 15.0)   # gap row: x uses its own anchors
    assert out["01:02"] == (1.0, 20.0)
