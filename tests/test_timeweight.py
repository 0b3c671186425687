"""Time-weighted average + counter aggregates (operators/timeweight.py).

Oracles:
- DuckDB recomputes each tier's integral / increase DIRECTLY from the raw
  points (window lead over (key, tier-bucket), no summaries anywhere) — the
  Spark cascade path only ever sees 1m summaries, so agreement at 1h/1d
  proves the bridge algebra.
- Equality is EXACT (==, no tolerance): the fixture's values are small ints
  and timestamps are second-aligned, so every segment area is an
  exactly-representable double and the partial sums stay far inside 2^53 —
  reduction order cannot matter (the module docstring documents the general
  float caveat).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts
from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
    counter_bucket,
    counter_cascade,
    counter_rate,
    time_weight_bucket,
    time_weight_cascade,
    tw_average,
)

TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}


@pytest.fixture(scope="module")
def points(spark, seqs_2k):
    # one point per (source, ts) — the documented input contract
    df = (
        derive_event_ts(seqs_2k)
        .filter(F.col("event_ts").isNotNull())
        .groupBy("source", "event_ts")
        .agg(F.max("n_tok").alias("val"))
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def _tw_oracle(duck, pdf, trunc, method):
    duck.register("tw_pts", pdf)
    if method == "locf":
        area = "val * (epoch(nts) - epoch(ts))"
    else:
        area = "(val + nval) / 2.0 * (epoch(nts) - epoch(ts))"
    return duck.sql(f"""
        WITH p AS (
          SELECT source, event_ts AS ts, val::double AS val,
                 date_trunc('{trunc}', event_ts) AS bucket_ts,
                 lead(event_ts) OVER w AS nts, lead(val::double) OVER w AS nval
          FROM tw_pts
          WINDOW w AS (PARTITION BY source, date_trunc('{trunc}', event_ts)
                       ORDER BY event_ts)
        )
        SELECT source, bucket_ts,
               min(ts) AS first_ts, max(ts) AS last_ts,
               coalesce(sum(CASE WHEN nts IS NOT NULL THEN {area} END), 0) AS area,
               count(*) AS n,
               CASE WHEN max(ts) > min(ts)
                    THEN coalesce(sum(CASE WHEN nts IS NOT NULL THEN {area} END), 0)
                         / (epoch(max(ts)) - epoch(min(ts)))
               END AS twa
        FROM p GROUP BY 1, 2
    """).df()


def _counter_oracle(duck, pdf, trunc):
    duck.register("ctr_pts", pdf)
    return duck.sql(f"""
        WITH p AS (
          SELECT source, event_ts AS ts, val::double AS val,
                 date_trunc('{trunc}', event_ts) AS bucket_ts,
                 lead(event_ts) OVER w AS nts, lead(val::double) OVER w AS nval
          FROM ctr_pts
          WINDOW w AS (PARTITION BY source, date_trunc('{trunc}', event_ts)
                       ORDER BY event_ts)
        )
        SELECT source, bucket_ts,
               coalesce(sum(CASE WHEN nts IS NULL THEN NULL
                                 WHEN nval >= val THEN nval - val
                                 ELSE nval END), 0) AS increase,
               coalesce(sum(CASE WHEN nval < val THEN 1 END), 0) AS resets,
               count(*) AS n
        FROM p GROUP BY 1, 2
    """).df()


def _flat(df):
    return (
        df.select(
            "source",
            "bucket_ts",
            F.col("first")["ts"].alias("first_ts"),
            F.col("last")["ts"].alias("last_ts"),
            *[c for c in df.columns if c not in ("source", "bucket_ts", "first", "last")],
        )
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("method", ["locf", "linear"])
@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_twa_direct_build_matches_duckdb(points, duck, tier, method):
    got = _flat(tw_average(time_weight_bucket(points, tier=tier, method=method)))
    want = (
        _tw_oracle(duck, points.toPandas(), TRUNC[tier], method)
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    m = got.merge(want, on=["source", "bucket_ts"], suffixes=("", "_w"), how="outer",
                  indicator=True)
    assert (m["_merge"] == "both").all()
    for col in ("first_ts", "last_ts", "area", "n"):
        bad = m[m[col] != m[f"{col}_w"]]
        assert bad.empty, (col, bad.head())
    twa_bad = m[m["twa"].fillna(-1) != m["twa_w"].fillna(-1)]
    assert twa_bad.empty, twa_bad.head()


@pytest.mark.parametrize("method", ["locf", "linear"])
def test_twa_cascade_equals_direct(points, method):
    t1m = time_weight_bucket(points, tier="1m", method=method)
    c1h = time_weight_cascade(t1m, "1h", from_tier="1m", method=method)
    c1d = time_weight_cascade(c1h, "1d", from_tier="1h", method=method)
    for cascaded, tier in ((c1h, "1h"), (c1d, "1d")):
        direct = _flat(time_weight_bucket(points, tier=tier, method=method))
        got = _flat(cascaded)
        pd.testing.assert_frame_equal(got, direct, check_exact=True)


def test_single_point_bucket_area_zero_twa_null(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a"],
            "event_ts": [pd.Timestamp("2024-01-01 00:00:30")],
            "val": [7],
        }
    )
    out = tw_average(time_weight_bucket(spark.createDataFrame(pdf))).collect()
    assert len(out) == 1
    assert out[0]["area"] == 0.0 and out[0]["twa"] is None and out[0]["n"] == 1


def test_method_and_tier_guards(spark, points):
    with pytest.raises(ValueError, match="method"):
        time_weight_bucket(points, method="nearest")
    with pytest.raises(ValueError, match="coarsen"):
        time_weight_cascade(time_weight_bucket(points), "1m", from_tier="1h")


@pytest.fixture(scope="module")
def counter_points(spark, points):
    # monotonic counter per source with deterministic resets: cumulative
    # n_tok sum that wraps at 50_000 (a restart mid-stream)
    w = (
        "sum(val) over (partition by source order by event_ts "
        "rows between unbounded preceding and current row)"
    )
    df = (
        points.withColumn("cum", F.expr(w))
        .withColumn("val", F.pmod("cum", F.lit(50_000)).cast("double"))
        .select("source", "event_ts", "val")
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_counter_direct_build_matches_duckdb(counter_points, duck, tier):
    got = _flat(counter_bucket(counter_points, tier=tier))
    want = (
        _counter_oracle(duck, counter_points.toPandas(), TRUNC[tier])
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    m = got.merge(want, on=["source", "bucket_ts"], suffixes=("", "_w"), how="outer",
                  indicator=True)
    assert (m["_merge"] == "both").all()
    for col in ("increase", "resets", "n"):
        bad = m[m[col] != m[f"{col}_w"]]
        assert bad.empty, (col, bad.head())


def test_counter_cascade_equals_direct(counter_points):
    c1m = counter_bucket(counter_points, tier="1m")
    c1h = counter_cascade(c1m, "1h", from_tier="1m")
    c1d = counter_cascade(c1h, "1d", from_tier="1h")
    for cascaded, tier in ((c1h, "1h"), (c1d, "1d")):
        direct = _flat(counter_bucket(counter_points, tier=tier))
        got = _flat(cascaded)
        pd.testing.assert_frame_equal(got, direct, check_exact=True)


def test_counter_rate_and_reset_detection(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 4,
            "event_ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:10",
                    "2024-01-01 00:00:20",
                    "2024-01-01 00:00:30",
                ]
            ),
            "val": [100.0, 150.0, 5.0, 25.0],  # reset between 150 -> 5
        }
    )
    out = counter_rate(counter_bucket(spark.createDataFrame(pdf))).collect()
    assert len(out) == 1
    row = out[0]
    # increases: +50, reset(+5 post-reset reading), +20 = 75 over 30 s
    assert row["increase"] == 75.0
    assert row["resets"] == 1
    assert row["rate"] == 75.0 / 30.0


# --- RollupJob tw plane (plans/checkpoint.py) -------------------------------


def _tw_plane_sets(job, spark):
    out = {}
    for t in ("1m", "1h", "1d"):
        df = job.tw_tables[t].read(spark)
        out[t] = (
            set()
            if df is None
            else {
                (
                    r["source"],
                    r["bucket_ts"],
                    r["first"]["ts"],
                    r["first"]["val"],
                    r["last"]["ts"],
                    r["last"]["val"],
                    r["area"],
                    r["n"],
                )
                for r in df.collect()
            }
        )
    return out


def test_rollup_job_tw_plane_end_to_end(spark, seqs_2k, points, tmp_path):
    """time_weight=True maintains the tw tiers alongside stats; the CASCADED
    1d summaries equal a direct time_weight build from the deduped raw
    points (exact — int vals, second-aligned ts)."""
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob

    seqs = derive_event_ts(seqs_2k)
    job = RollupJob(str(tmp_path / "twjob"))
    job.run(spark, seqs, time_weight=True)
    got = _flat(job.tw_tables["1d"].read(spark).drop("bucket_day"))
    want = _flat(time_weight_bucket(points, tier="1d", method="locf"))
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # rerun over same input is a no-op on the tw plane too
    v = job.tw_tables["1m"].current_snapshot().version
    job.run(spark, seqs, time_weight=True)
    assert job.tw_tables["1m"].current_snapshot().version == v


def test_tw_plane_incremental_equals_oneshot(spark, tmp_path):
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    all_seqs = derive_event_ts(synth_seqs(spark, 1500, seed=23))
    cut = all_seqs.agg(
        F.percentile_approx(F.col("event_ts").cast("double"), 0.5)
    ).collect()[0][0]
    job = RollupJob(str(tmp_path / "twincr"))
    job.run(spark, all_seqs.filter(F.col("event_ts").cast("double") <= cut),
            time_weight=True, tw_method="linear")
    job.run(spark, all_seqs, time_weight=True, tw_method="linear")
    oneshot = RollupJob(str(tmp_path / "twone"))
    oneshot.run(spark, all_seqs, time_weight=True, tw_method="linear")
    assert _tw_plane_sets(job, spark) == _tw_plane_sets(oneshot, spark)


def test_tw_plane_resumes_after_crash_between_planes(spark, tmp_path):
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    seqs = derive_event_ts(synth_seqs(spark, 1000, seed=29))
    clean = RollupJob(str(tmp_path / "twclean"))
    clean.run(spark, seqs, time_weight=True)
    want = _tw_plane_sets(clean, spark)

    crashed = RollupJob(str(tmp_path / "twcrash"))
    with pytest.raises(RuntimeError, match="tw_1m"):
        crashed.run(spark, seqs, time_weight=True, fail_after="tw_1m")
    assert crashed.tw_tables["1h"].current_snapshot() is None
    crashed.run(spark, seqs, time_weight=True)  # resume
    assert _tw_plane_sets(crashed, spark) == want


# --- OHLC mergeable candles --------------------------------------------------


def _ohlc_oracle(duck, pdf, trunc):
    duck.register("ohlc_pts", pdf)
    return duck.sql(f"""
        SELECT source, date_trunc('{trunc}', event_ts) AS bucket_ts,
               first(val::double ORDER BY event_ts, val) AS open,
               last(val::double ORDER BY event_ts, val) AS close,
               min(val::double) AS low, max(val::double) AS high,
               count(*) AS n
        FROM ohlc_pts GROUP BY 1, 2
    """).df()


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_ohlc_direct_build_matches_duckdb(points, duck, tier):
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        ohlc_bucket,
        ohlc_read,
    )

    got = (
        ohlc_read(ohlc_bucket(points, tier=tier))
        .select("source", "bucket_ts", "open", "close", "low", "high", "n")
        .toPandas()
    )
    want = _ohlc_oracle(duck, points.toPandas(), TRUNC[tier])
    m = got.merge(want, on=["source", "bucket_ts"], suffixes=("", "_w"), how="outer",
                  indicator=True)
    assert (m["_merge"] == "both").all()
    for col in ("open", "close", "low", "high", "n"):
        bad = m[m[col] != m[f"{col}_w"]]
        assert bad.empty, (col, bad.head())


def test_ohlc_cascade_equals_direct(points):
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        ohlc_bucket,
        ohlc_cascade,
    )

    o1m = ohlc_bucket(points, tier="1m")
    c1h = ohlc_cascade(o1m, "1h")
    c1d = ohlc_cascade(c1h, "1d", from_tier="1h")
    for cascaded, tier in ((c1h, "1h"), (c1d, "1d")):
        direct = _flat(ohlc_bucket(points, tier=tier))
        got = _flat(cascaded)
        pd.testing.assert_frame_equal(got, direct, check_exact=True)


# --- interpolated (full-bucket) average --------------------------------------


def _itwa_oracle(duck, pdf, trunc, step, method):
    """Independent recompute from RAW points: every raw segment is split
    across the buckets it crosses (generate_series lateral), in-bucket
    portions integrate under the method's curve, locf adds the final point's
    carry-to-bucket-end, and coverage spans are derived from the key's
    global first/last timestamps — no summaries anywhere."""
    duck.register("itw_pts", pdf)
    if method == "locf":
        part_area = "val * (epoch(hi) - epoch(lo))"
    else:
        part_area = """
          ((val + (nval-val)*(epoch(lo)-epoch(ts))/(epoch(nts)-epoch(ts)))
           + (val + (nval-val)*(epoch(hi)-epoch(ts))/(epoch(nts)-epoch(ts))))
          / 2.0 * (epoch(hi) - epoch(lo))"""
    tail_sql = f"""
        SELECT source, date_trunc('{trunc}', ts)::TIMESTAMP AS bucket_ts,
               val * (epoch(date_trunc('{trunc}', ts)::TIMESTAMP + INTERVAL {step})
                      - epoch(ts)) AS area
        FROM p WHERE rn = 1
    """ if method == "locf" else "SELECT NULL AS source, NULL AS bucket_ts, NULL AS area WHERE false"
    hi_cover = (
        f"epoch(bucket_ts + INTERVAL {step})" if method == "locf"
        else f"CASE WHEN key_max >= bucket_ts + INTERVAL {step} "
             f"THEN epoch(bucket_ts + INTERVAL {step}) ELSE epoch(last_in) END"
    )
    return duck.sql(f"""
        WITH pts AS (
          SELECT source, event_ts AS ts, val::double AS val FROM itw_pts
        ), span AS (
          SELECT source, date_trunc('{trunc}', ts)::TIMESTAMP AS bucket_ts,
                 min(ts) AS first_in, max(ts) AS last_in,
                 min(min(ts)) OVER (PARTITION BY source) AS key_min,
                 max(max(ts)) OVER (PARTITION BY source) AS key_max
          FROM pts GROUP BY 1, 2
        ), p AS (
          SELECT source, ts, val,
                 lead(ts) OVER w AS nts, lead(val) OVER w AS nval,
                 row_number() OVER (PARTITION BY source ORDER BY ts DESC) AS rn
          FROM pts WINDOW w AS (PARTITION BY source ORDER BY ts)
        ), segparts AS (
          -- overlap join: clip every raw segment to each OBSERVED bucket it
          -- crosses (empty buckets aren't compared, so the bucket list from
          -- span suffices)
          SELECT p.source, s.bucket_ts,
                 greatest(p.ts, s.bucket_ts) AS lo,
                 least(p.nts, s.bucket_ts + INTERVAL {step}) AS hi,
                 p.ts, p.val, p.nts, p.nval
          FROM p JOIN span s ON p.source = s.source
           AND p.nts IS NOT NULL
           AND p.ts < s.bucket_ts + INTERVAL {step}
           AND p.nts > s.bucket_ts
        ), areas AS (
          SELECT source, bucket_ts, sum({part_area}) AS area
          FROM segparts WHERE hi > lo GROUP BY 1, 2
        ), tails AS ({tail_sql}
        ), allarea AS (
          SELECT source, bucket_ts, sum(area) AS area FROM (
            SELECT * FROM areas UNION ALL SELECT * FROM tails
          ) GROUP BY 1, 2
        )
        SELECT s.source, s.bucket_ts,
               coalesce(a.area, 0) /
               (({hi_cover}) -
                CASE WHEN key_min < bucket_ts THEN epoch(bucket_ts)
                     ELSE epoch(first_in) END) AS want
        FROM span s LEFT JOIN allarea a USING (source, bucket_ts)
    """).df()


STEPS = {"1m": "'60 seconds'", "1h": "'3600 seconds'", "1d": "'1 day'"}


@pytest.mark.parametrize("method", ["locf", "linear"])
@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_interpolated_average_matches_raw_recompute(points, duck, tier, method):
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        tw_interpolated_average,
    )

    tw = time_weight_bucket(points, tier=tier, method=method)
    got = (
        tw_interpolated_average(tw, tier, method=method)
        .select("source", "bucket_ts", "itwa")
        .toPandas()
    )
    want = _itwa_oracle(duck, points.toPandas(), TRUNC[tier], STEPS[tier], method)
    m = got.merge(want, on=["source", "bucket_ts"], how="outer", indicator=True)
    assert (m["_merge"] == "both").all()
    if method == "locf":
        bad = m[m["itwa"].fillna(-1) != m["want"].fillna(-1)]
        assert bad.empty, bad.head()
    else:
        import numpy as np

        a, b = m["itwa"].fillna(-1).to_numpy(), m["want"].fillna(-1).to_numpy()
        assert np.allclose(a, b, rtol=1e-9, atol=1e-12), m[~np.isclose(a, b, rtol=1e-9)].head()


def test_interpolated_average_hand_case(spark):
    """One point per hour-bucket at :30; locf itwa of the middle bucket must
    blend 30 min of the previous value with 30 min of its own."""
    import pandas as pd_

    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        tw_interpolated_average,
    )

    pdf = pd_.DataFrame(
        {
            "source": ["a"] * 3,
            "event_ts": pd_.to_datetime(
                ["2024-01-01 00:30:00", "2024-01-01 01:30:00", "2024-01-01 02:30:00"]
            ),
            "val": [10.0, 20.0, 40.0],
        }
    )
    tw = time_weight_bucket(spark.createDataFrame(pdf), tier="1h", method="locf")
    out = {
        r["bucket_ts"].hour: r["itwa"]
        for r in tw_interpolated_average(tw, "1h", method="locf").collect()
    }
    assert out[1] == (10.0 * 1800 + 20.0 * 1800) / 3600  # 15.0
    assert out[2] == (20.0 * 1800 + 40.0 * 1800) / 3600  # 30.0
    # first bucket: no prev -> covered from :30, value 10 carried to end
    assert out[0] == 10.0


# ------------------------------------------------------------- gauge reads

from pyspark.sql import Window  # noqa: E402

from timeseriesvectordbpattermatcher_spark.operators.timeweight import (  # noqa: E402
    gauge_delta,
)


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_gauge_delta_matches_duckdb(points, duck, tier):
    """delta = last - first per bucket (no reset rule, unlike increase);
    rate = delta / observed span, NULL on single-point buckets. DuckDB
    recomputes both from raw with its own first/last-by-ts."""
    trunc = {"1m": "minute", "1h": "hour", "1d": "day"}[tier]
    pdf = points.toPandas()
    duck.register("g_pts", pdf)
    want = duck.sql(f"""
        SELECT source, date_trunc('{trunc}', event_ts) AS bucket_ts,
               last(val ORDER BY event_ts) - first(val ORDER BY event_ts) AS delta,
               CASE WHEN epoch(max(event_ts)) != epoch(min(event_ts))
                    THEN (last(val ORDER BY event_ts) - first(val ORDER BY event_ts))
                         / (epoch(max(event_ts)) - epoch(min(event_ts))) END AS grate
        FROM g_pts GROUP BY 1, 2 ORDER BY 1, 2
    """).df().reset_index(drop=True)
    got = (
        gauge_delta(time_weight_bucket(points, tier=tier))
        .select("source", "bucket_ts", "delta", "grate")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, rtol=1e-9, atol=1e-12,
    )


def test_gauge_reads_any_tier_and_counter_summaries(points):
    """The accessor works on cascaded tiers (endpoint structs survive the
    merge) and on counter summaries; on a monotone series delta equals
    the counter's increase."""
    t1m = time_weight_bucket(points, tier="1m")
    t1d = time_weight_cascade(time_weight_cascade(t1m, "1h"), "1d", from_tier="1h")
    direct = gauge_delta(time_weight_bucket(points, tier="1d"))
    casc = gauge_delta(t1d)
    a = _flat(casc)[["source", "bucket_ts", "delta", "grate"]]
    b = _flat(direct)[["source", "bucket_ts", "delta", "grate"]]
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_exact=True
    )
    mono = points.withColumn(
        "val",
        F.sum("val").over(
            Window.partitionBy("source")
            .orderBy("event_ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    cb = gauge_delta(counter_bucket(mono, tier="1d"))
    row = cb.filter(F.col("resets") == 0).first()
    assert row is not None and row["delta"] == row["increase"]


def test_candlestick_volume_vwap_matches_duckdb(points, duck):
    """vol/pv sums + vwap accessor (candlestick_agg parity): DuckDB
    recomputes per tier from raw; cascaded == direct exact; NULL-volume
    rows shape the candle but add nothing to vol/pv."""
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        ohlc_bucket,
        ohlc_cascade,
        ohlc_read,
    )

    vpts = points.withColumn(
        "volm",
        F.when(F.col("val") % 11 == 3, F.lit(None)).otherwise(
            (F.col("val") % 97) + 1
        ),
    )
    duck.register("cs_pts", vpts.toPandas())
    for tier, trunc in [("1m", "minute"), ("1d", "day")]:
        got = (
            ohlc_read(ohlc_bucket(vpts, tier=tier, vol_col="volm"))
            .select("source", "bucket_ts", "open", "close", "low", "high",
                    "vol", "vwap")
            .toPandas()
            .sort_values(["source", "bucket_ts"])
            .reset_index(drop=True)
        )
        want = duck.sql(f"""
            SELECT source, date_trunc('{trunc}', event_ts) AS bucket_ts,
                   first(val ORDER BY event_ts) AS open,
                   last(val ORDER BY event_ts) AS close,
                   min(val) AS low, max(val) AS high,
                   coalesce(sum(volm), 0) AS vol,
                   CASE WHEN coalesce(sum(volm), 0) != 0
                        THEN sum(val * volm) / sum(volm) END AS vwap
            FROM cs_pts GROUP BY 1, 2 ORDER BY 1, 2
        """).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)],
            check_dtype=False, rtol=1e-9, atol=1e-12,
        )
    direct = ohlc_bucket(vpts, tier="1d", vol_col="volm")
    casc = ohlc_cascade(
        ohlc_cascade(ohlc_bucket(vpts, tier="1m", vol_col="volm"), "1h"),
        "1d", from_tier="1h",
    )
    pd.testing.assert_frame_equal(
        _flat(casc), _flat(direct), check_exact=True
    )


# ------------------------------------------------- rolling window reads

def test_tw_rolling_matches_duckdb_window_integral(points, duck):
    """Merged trailing-K summary == direct integral over the window's
    raw points (consecutive-point segments; a gap slot contributes one
    long bridge across it — same convention as the tier merge)."""
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        time_weight_bucket,
        tw_average,
        tw_rolling,
    )

    K = 4
    t1h = time_weight_bucket(points, tier="1h")
    got = (
        tw_average(tw_rolling(t1h, K, "1h", min_buckets=1))
        .select("source", "bucket_ts", "area", "n", "win_buckets", "twa")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    duck.register("twr_pts", points.toPandas())
    want = duck.sql(f"""
        WITH p AS (
          SELECT source, event_ts, val::DOUBLE AS val,
                 date_trunc('hour', event_ts) AS b
          FROM twr_pts WHERE event_ts IS NOT NULL AND val IS NOT NULL),
        slots AS (SELECT DISTINCT source, b FROM p),
        win AS (
          SELECT s.source, s.b AS bucket_ts, p.event_ts, p.val, p.b AS src_b
          FROM slots s JOIN p ON p.source = s.source
           AND epoch(s.b) - epoch(p.b) BETWEEN 0 AND {(K - 1) * 3600}),
        seg AS (
          SELECT source, bucket_ts, val, src_b,
                 epoch(lead(event_ts) OVER w) - epoch(event_ts) AS dt
          FROM win WINDOW w AS (PARTITION BY source, bucket_ts
                                ORDER BY event_ts, val))
        SELECT source, bucket_ts,
               coalesce(sum(val * dt), 0) AS area,
               count(*) AS n,
               count(DISTINCT src_b) AS win_buckets
        FROM seg GROUP BY 1, 2 ORDER BY 1, 2
    """).df().reset_index(drop=True)
    m = got.merge(want, on=["source", "bucket_ts"], suffixes=("", "_w"))
    assert len(m) == len(got) == len(want)
    assert (m["n"] == m["n_w"]).all()
    assert (m["win_buckets"] == m["win_buckets_w"]).all()
    assert (m["area"] == m["area_w"]).all()  # int-valued: exact


def test_ohlc_rolling_matches_duckdb(points, duck):
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        ohlc_bucket,
        ohlc_read,
        ohlc_rolling,
    )

    K = 6
    t1h = ohlc_bucket(points, tier="1h")
    got = (
        ohlc_read(ohlc_rolling(t1h, K, "1h", min_buckets=1))
        .select("source", "bucket_ts", "open", "close", "low", "high", "n")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    duck.register("ohr_pts", points.toPandas())
    want = duck.sql(f"""
        WITH p AS (SELECT source, event_ts, val::DOUBLE val,
                          date_trunc('hour', event_ts) b
                   FROM ohr_pts),
        slots AS (SELECT DISTINCT source, b FROM p),
        win AS (SELECT s.source, s.b bucket_ts, p.event_ts, p.val
                FROM slots s JOIN p ON p.source = s.source
                 AND epoch(s.b) - epoch(p.b) BETWEEN 0 AND {(K - 1) * 3600})
        SELECT source, bucket_ts,
               first(val ORDER BY event_ts, val) AS open,
               last(val ORDER BY event_ts, val) AS close,
               min(val) AS low, max(val) AS high, count(*) AS n
        FROM win GROUP BY 1, 2 ORDER BY 1, 2
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, rtol=1e-12,
    )


def test_rolling_warmup_nulls(points):
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        ohlc_bucket,
        ohlc_rolling,
        time_weight_bucket,
        tw_rolling,
    )

    K = 3
    tw = tw_rolling(time_weight_bucket(points, tier="1d"), K, "1d").toPandas()
    oh = ohlc_rolling(ohlc_bucket(points, tier="1d"), K, "1d").toPandas()
    for df, payload in ((tw, "area"), (oh, "low")):
        cold = df[df["win_buckets"] < K]
        hot = df[df["win_buckets"] >= K]
        assert cold[payload].isna().all()
        if len(hot):
            assert hot[payload].notna().all()
        assert df["n"].notna().all()
