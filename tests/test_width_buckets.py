"""Arbitrary-width bucket reads served from committed tiers
(rollup.width_bucket / cascade_width, quantiles.hist_cascade_width,
ddsketch.dds_cascade_width).

Oracles: DuckDB recomputes each width bucket straight from RAW rows
(floor-epoch bucketing with the same origin) — stats incl. token-level
sums via unnest, exact type-1 quantiles for the histogram plane, exact
quantiles bounding the dds plane within alpha.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.ddsketch import (
    dds_bucket,
    dds_cascade_width,
    dds_quantiles,
)
from timeseriesvectordbpattermatcher_spark.operators.quantiles import (
    add_hist_quantiles,
    hist_1m,
    hist_cascade_width,
)
from timeseriesvectordbpattermatcher_spark.operators.rollup import (
    cascade_width,
    derive_event_ts,
    rollup_1m,
    width_bucket,
)

ORIGIN = "2020-01-01 00:00:00"


@pytest.fixture(scope="module")
def raw(spark, seqs_2k):
    df = derive_event_ts(seqs_2k).filter(F.col("event_ts").isNotNull()).cache()
    df.count()
    yield df
    df.unpersist()


def _bucket_sql(width):
    return (
        f"to_timestamp(floor((epoch(event_ts) - epoch(TIMESTAMP '{ORIGIN}'))"
        f" / {width}) * {width} + epoch(TIMESTAMP '{ORIGIN}'))"
    )


@pytest.mark.parametrize("width", [300, 900, 4 * 3600, 7 * 86400])
def test_cascade_width_matches_duckdb_raw_recompute(duck, raw, width):
    t1m = rollup_1m(raw)
    got = (
        cascade_width(t1m, width, origin=ORIGIN)
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    duck.register("wb_raw", raw.select("source", "event_ts", "n_tok", "tokens").toPandas())
    want = duck.sql(f"""
        WITH b AS (
          SELECT source, {_bucket_sql(width)} AS bucket_ts, n_tok, tokens
          FROM wb_raw),
        tok AS (
          SELECT source, bucket_ts, min(t) tok_min, max(t) tok_max, sum(t) tok_sum
          FROM (SELECT source, bucket_ts, unnest(tokens) AS t FROM b)
          GROUP BY 1, 2)
        SELECT b.source, b.bucket_ts, count(*) AS cnt,
               sum(n_tok) AS sum_n_tok, min(n_tok) AS min_n_tok,
               max(n_tok) AS max_n_tok,
               tok.tok_min, tok.tok_max, tok.tok_sum,
               sum(n_tok)::DOUBLE / count(*) AS avg_n_tok
        FROM b LEFT JOIN tok USING (source, bucket_ts)
        GROUP BY 1, 2, tok.tok_min, tok.tok_max, tok.tok_sum
        ORDER BY 1, 2
    """).df().reset_index(drop=True)
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols], want[cols], check_dtype=False, rtol=1e-12
    )


def test_hist_width_quantiles_exact(duck, raw):
    W = 900
    got = (
        add_hist_quantiles(hist_cascade_width(hist_1m(raw), W, origin=ORIGIN),
                           qs={"p90": 0.9})
        .select("source", "bucket_ts", "p90", "hist_n")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    duck.register("wb_raw2", raw.select("source", "event_ts", "n_tok").toPandas())
    want = duck.sql(f"""
        WITH b AS (SELECT source, {_bucket_sql(W)} AS bucket_ts, n_tok FROM wb_raw2),
        r AS (SELECT source, bucket_ts, n_tok,
                     row_number() OVER (PARTITION BY source, bucket_ts ORDER BY n_tok) rnk,
                     count(*) OVER (PARTITION BY source, bucket_ts) tot
              FROM b)
        SELECT source, bucket_ts,
               min(CASE WHEN rnk >= greatest(1, ceil(tot * 0.9)) THEN n_tok END) AS p90,
               max(tot) AS hist_n
        FROM r GROUP BY 1, 2 ORDER BY 1, 2
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_dds_width_within_alpha(duck, raw):
    W, ALPHA = 1800, 0.01
    pts = raw.withColumn("fv", F.col("n_tok") * 2.5 + 0.75)
    got = dds_quantiles(
        dds_cascade_width(dds_bucket(pts, alpha=ALPHA, value_col="fv"), W, origin=ORIGIN),
        alpha=ALPHA, qs={"p95": 0.95},
    ).select("source", "bucket_ts", "p95").toPandas()
    duck.register("wb_raw3", pts.select("source", "event_ts", "fv").toPandas())
    want = duck.sql(f"""
        WITH b AS (SELECT source, {_bucket_sql(W)} AS bucket_ts, fv FROM wb_raw3),
        r AS (SELECT source, bucket_ts, fv,
                     row_number() OVER (PARTITION BY source, bucket_ts ORDER BY fv) rnk,
                     count(*) OVER (PARTITION BY source, bucket_ts) tot
              FROM b)
        SELECT source, bucket_ts,
               min(CASE WHEN rnk >= greatest(1, ceil(tot * 0.95)) THEN fv END) AS exact
        FROM r GROUP BY 1, 2
    """).df()
    for d in (got, want):
        b = pd.to_datetime(d["bucket_ts"])
        if b.dt.tz is not None:
            b = b.dt.tz_convert("UTC").dt.tz_localize(None)
        d["bucket_ts"] = b.astype("datetime64[us]")
    m = got.merge(want, on=["source", "bucket_ts"])
    assert len(m) == len(got) == len(want)
    rel = (m["p95"] - m["exact"]).abs() / m["exact"].abs()
    assert (rel <= ALPHA).all(), rel.max()


def test_width_bucket_origin_and_guards(spark, raw):
    # an origin mid-grid shifts the boundaries: a 2h bucket anchored at
    # 00:30 puts 00:00-00:29 in the PREVIOUS bucket
    row = spark.range(1).select(
        width_bucket(F.lit("2024-01-01 01:00:00").cast("timestamp"), 7200,
                     origin="2020-01-01 00:30:00").alias("b")
    ).first()
    assert str(row["b"]) == "2024-01-01 00:30:00"
    with pytest.raises(ValueError, match="width_sec"):
        cascade_width(rollup_1m(raw), 0)


def test_tw_and_ohlc_width_match_direct(raw, duck):
    """Width merges of tw/candle summaries equal direct builds at the
    same grid: for tw, a direct build = bucketing raw by the width grid
    then running time_weight_bucket's algebra — realized here by DuckDB
    integrating consecutive-point segments per width bucket; candles by
    windowed first/last/min/max."""
    from timeseriesvectordbpattermatcher_spark.operators.timeweight import (
        ohlc_bucket,
        ohlc_cascade_width,
        ohlc_read,
        time_weight_bucket,
        time_weight_cascade_width,
    )

    W = 2 * 3600
    pts = raw.groupBy("source", "event_ts").agg(F.max("n_tok").alias("val"))
    duck.register("wtw", pts.toPandas())
    tw = time_weight_cascade_width(
        time_weight_bucket(pts, tier="1m"), W, origin=ORIGIN
    ).select("source", "bucket_ts", "area", "n").toPandas() \
        .sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    want = duck.sql(f"""
        WITH p AS (SELECT source, event_ts, val::DOUBLE val,
                          {_bucket_sql(W)} AS b FROM wtw),
        seg AS (SELECT source, b, val,
                       epoch(lead(event_ts) OVER w) - epoch(event_ts) dt
                FROM p WINDOW w AS (PARTITION BY source, b ORDER BY event_ts, val))
        SELECT source, b AS bucket_ts, coalesce(sum(val*dt),0) AS area, count(*) AS n
        FROM seg GROUP BY 1,2 ORDER BY 1,2
    """).df().reset_index(drop=True)
    for d in (tw, want):
        b = pd.to_datetime(d["bucket_ts"])
        if b.dt.tz is not None:
            b = b.dt.tz_convert("UTC").dt.tz_localize(None)
        d["bucket_ts"] = b.astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        tw[sorted(tw.columns)], want[sorted(want.columns)], check_dtype=False
    )

    oc = ohlc_read(ohlc_cascade_width(ohlc_bucket(pts, tier="1m"), W, origin=ORIGIN)) \
        .select("source", "bucket_ts", "open", "close", "low", "high", "n").toPandas() \
        .sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    wc = duck.sql(f"""
        WITH p AS (SELECT source, event_ts, val::DOUBLE val,
                          {_bucket_sql(W)} AS b FROM wtw)
        SELECT source, b AS bucket_ts,
               first(val ORDER BY event_ts, val) AS "open",
               last(val ORDER BY event_ts, val) AS "close",
               min(val) AS low, max(val) AS high, count(*) AS n
        FROM p GROUP BY 1,2 ORDER BY 1,2
    """).df().reset_index(drop=True)
    for d in (oc, wc):
        b = pd.to_datetime(d["bucket_ts"])
        if b.dt.tz is not None:
            b = b.dt.tz_convert("UTC").dt.tz_localize(None)
        d["bucket_ts"] = b.astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        oc[sorted(oc.columns)], wc[sorted(wc.columns)], check_dtype=False
    )


def test_sketch_width_cascades(raw, duck):
    """distinct/cms/topk width merges: HLL estimate per 2h grid inside
    the published band of exact COUNT DISTINCT; CMS estimates bound
    exact token counts per grid; topk keeps the est<=true<=est+err
    bracket per grid (spot-checked via DuckDB exact counts)."""
    import math

    from timeseriesvectordbpattermatcher_spark.operators.cms import (
        cms_bucket,
        cms_cascade_width,
        cms_estimate,
    )
    from timeseriesvectordbpattermatcher_spark.operators.distinct import (
        distinct_bucket,
        distinct_cascade_width,
        distinct_estimate,
    )
    from timeseriesvectordbpattermatcher_spark.operators.heavyhitters import (
        topk_bucket,
        topk_cascade_width,
    )

    W = 2 * 3600
    duck.register("wsk_raw", raw.select("source", "event_ts", "doc_id", "tokens").toPandas())

    # distinct
    d = distinct_estimate(
        distinct_cascade_width(distinct_bucket(raw, col="doc_id", tier="1m"), W,
                               origin=ORIGIN)
    ).toPandas()
    exact_d = duck.sql(f"""
        SELECT source, {_bucket_sql(W)} bucket_ts, count(DISTINCT doc_id) ex
        FROM wsk_raw GROUP BY 1,2
    """).df()
    for df_ in (d, exact_d):
        b = pd.to_datetime(df_["bucket_ts"])
        if b.dt.tz is not None:
            b = b.dt.tz_convert("UTC").dt.tz_localize(None)
        df_["bucket_ts"] = b.astype("datetime64[us]")
    m = d.merge(exact_d, on=["source", "bucket_ts"])
    assert len(m) == len(d) == len(exact_d)
    rse = 1.04 / math.sqrt(2 ** 12)
    rel = (m["approx_distinct"] - m["ex"]).abs() / m["ex"].clip(lower=1)
    assert (rel <= 5 * rse).all()

    # cms: estimates of a few tokens bound their exact per-grid counts
    cm = cms_cascade_width(cms_bucket(raw), W, origin=ORIGIN)
    toks = [0, 7, 101]
    est = cm.select(
        "source", "bucket_ts",
        *[cms_estimate("cms", t).alias(f"e{t}") for t in toks],
    ).toPandas()
    exact_t = duck.sql(f"""
        SELECT source, {_bucket_sql(W)} bucket_ts, tok, count(*) c
        FROM (SELECT source, event_ts, unnest(tokens) tok FROM wsk_raw)
        WHERE tok IN (0, 7, 101) GROUP BY 1,2,3
    """).df()
    key = {}
    for r in exact_t.itertuples():
        ts = pd.Timestamp(r.bucket_ts)
        if ts.tz is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        key[(r.source, ts, r.tok)] = r.c
    for r in est.itertuples():
        ts = pd.Timestamp(r.bucket_ts)
        for t in toks:
            true = key.get((r.source, ts, t), 0)
            assert getattr(r, f"e{t}") >= true  # CMS never underestimates

    # topk bracket per grid
    tk = topk_cascade_width(topk_bucket(raw, tier="1m", cap=8), W, cap=8,
                            origin=ORIGIN).toPandas()
    exact_all = duck.sql(f"""
        SELECT source, {_bucket_sql(W)} bucket_ts, tok, count(*) c
        FROM (SELECT source, event_ts, unnest(tokens) tok FROM wsk_raw)
        GROUP BY 1,2,3
    """).df()
    ek = {}
    for r in exact_all.itertuples():
        ts = pd.Timestamp(r.bucket_ts)
        if ts.tz is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        ek[(r.source, ts, r.tok)] = r.c
    assert len(tk) > 0
    for r in tk.itertuples():
        ts = pd.Timestamp(r.bucket_ts)
        for tok, est_c in r.hh.items():
            true = ek.get((r.source, ts, tok), 0)
            assert est_c <= true <= est_c + r.hh_err, (r.source, ts, tok)


@pytest.mark.parametrize("width", [300, 4 * 3600])
def test_stats2_width_accessors_match_duckdb(duck, raw, width):
    """stats2_cascade_width xy-mode: width-merged moment sums must read
    back DuckDB's regr_*/corr recomputed straight from raw rows grouped
    on the same floor-epoch grid."""
    from timeseriesvectordbpattermatcher_spark.operators.stats2d import (
        stats2_bucket,
        stats2_cascade_width,
        stats2_read,
    )

    points = raw.withColumn("y", F.col("n_tok")).withColumn(
        "x", (F.col("n_tok") * 7 + F.crc32(F.col("doc_id")) % 89) % 101
    )
    t1m = stats2_bucket(points, tier="1m", y_col="y", x_col="x")
    got = (
        stats2_read(stats2_cascade_width(t1m, width, origin=ORIGIN))
        .select("source", "bucket_ts", "n", "avg_x", "avg_y", "slope",
                "intercept", "corr", "r2", "covar_pop")
        .toPandas().sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    )
    duck.register("wb_s2", points.select("source", "event_ts", "x", "y").toPandas())
    want = duck.sql(f"""
        SELECT source, {_bucket_sql(width)} AS bucket_ts,
               regr_count(y, x)::BIGINT AS n,
               avg(x) AS avg_x, avg(y) AS avg_y,
               regr_slope(y, x) AS slope,
               regr_intercept(y, x) AS intercept,
               corr(y, x) AS corr, regr_r2(y, x) AS r2,
               covar_pop(y, x) AS covar_pop
        FROM wb_s2 GROUP BY 1, 2 ORDER BY 1, 2
    """).df().reset_index(drop=True)
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols], want[cols], check_dtype=False, rtol=1e-9, atol=1e-9
    )


@pytest.mark.parametrize("width", [900, 7 * 86400])
def test_stats2_time_mode_width_reorigin_matches_duckdb(duck, raw, width):
    """Time mode through a width merge: the shift identities must
    re-origin x to each WIDTH bucket's start, so slope/intercept agree
    with DuckDB regressing against (epoch(ts) - epoch(width_bucket))."""
    from timeseriesvectordbpattermatcher_spark.operators.stats2d import (
        stats2_bucket,
        stats2_cascade_width,
        stats2_read,
    )

    points = raw.withColumn("y", F.col("n_tok"))
    t1m = stats2_bucket(points, tier="1m", y_col="y")
    got = (
        stats2_read(stats2_cascade_width(t1m, width, origin=ORIGIN))
        .select("source", "bucket_ts", "n", "slope", "intercept", "corr", "r2")
        .toPandas().sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    )
    duck.register("wb_s2t", points.select("source", "event_ts", "y").toPandas())
    b = _bucket_sql(width)
    want = duck.sql(f"""
        SELECT source, {b} AS bucket_ts,
               count(*)::BIGINT AS n,
               regr_slope(y, epoch(event_ts) - epoch({b})) AS slope,
               regr_intercept(y, epoch(event_ts) - epoch({b})) AS intercept,
               corr(y, epoch(event_ts)) AS corr,
               regr_r2(y, epoch(event_ts)) AS r2
        FROM wb_s2t GROUP BY 1, 2 ORDER BY 1, 2
    """).df().reset_index(drop=True)
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols], want[cols], check_dtype=False, rtol=1e-6, atol=1e-9
    )
    assert (got["corr"].abs().dropna() <= 1.0 + 1e-12).all()


@pytest.mark.parametrize("width", [900, 4 * 3600])
def test_state_width_durations_match_duckdb(duck, raw, width):
    """state_cascade_width: per-state seconds in each width bucket equal
    DuckDB summing consecutive-reading segments whose BOTH endpoints land
    in the bucket (bridge segments between fine buckets included —
    that's the cascade's own merge rule applied at the width grid)."""
    from timeseriesvectordbpattermatcher_spark.operators.stateagg import (
        state_bucket,
        state_cascade_width,
    )

    pts = raw.withColumn(
        "state", F.concat(F.lit("s"), (F.col("n_tok") % 3).cast("string"))
    )
    s1m = state_bucket(pts, tier="1m")
    merged = state_cascade_width(s1m, width, origin=ORIGIN)
    got = (
        merged.select(
            "source", "bucket_ts", "n",
            F.explode(F.map_entries("durs")).alias("e"),
        )
        .select("source", "bucket_ts", "n",
                F.col("e")["key"].alias("state"),
                F.col("e")["value"].alias("dur"))
        .toPandas().sort_values(["source", "bucket_ts", "state"])
        .reset_index(drop=True)
    )
    duck.register(
        "wb_st", pts.select("source", "event_ts", "state").toPandas()
    )
    b = _bucket_sql(width)
    want = duck.sql(f"""
        WITH p AS (
          SELECT source, event_ts, state, {b} AS bucket_ts,
                 lead(event_ts) OVER (PARTITION BY source
                                      ORDER BY event_ts, state) AS nxt
          FROM wb_st),
        seg AS (
          SELECT source, bucket_ts, state,
                 CASE WHEN nxt IS NOT NULL
                       AND {b.replace("event_ts", "nxt")} = bucket_ts
                      THEN epoch(nxt) - epoch(event_ts) ELSE 0 END AS d
          FROM p)
        SELECT source, bucket_ts, state, sum(d) AS dur,
               sum(count(*)) OVER (PARTITION BY source, bucket_ts) AS n
        FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df().reset_index(drop=True)
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols], want[cols], check_dtype=False, rtol=1e-9
    )


@pytest.mark.parametrize("width", [900, 4 * 3600])
def test_heartbeat_width_uptime_matches_duckdb(duck, raw, width):
    """heartbeat_cascade_width + heartbeat_read(width): uptime per width
    bucket equals DuckDB's sweep-line union of [hb, hb+period) intervals
    clipped to the bucket (in-bucket islands only, spill-in excluded —
    heartbeat_read's documented contract)."""
    from timeseriesvectordbpattermatcher_spark.operators.stateagg import (
        heartbeat_bucket,
        heartbeat_cascade_width,
        heartbeat_read,
    )

    PERIOD = 90.0
    h1m = heartbeat_bucket(raw, PERIOD, tier="1m")
    got = (
        heartbeat_read(heartbeat_cascade_width(h1m, width, origin=ORIGIN), width)
        .select("source", "bucket_ts", "n", "uptime", "downtime")
        .toPandas().sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    )
    duck.register("wb_hb", raw.select("source", "event_ts").toPandas())
    b = _bucket_sql(width)
    want = duck.sql(f"""
        WITH h AS (SELECT source, {b} AS bucket_ts, event_ts FROM wb_hb),
        o AS (SELECT source, bucket_ts, event_ts,
                     max(epoch(event_ts) + {PERIOD}) OVER (
                       PARTITION BY source, bucket_ts ORDER BY event_ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS prev_end
              FROM h)
        SELECT source, bucket_ts, count(*)::BIGINT AS n,
               sum(greatest(0.0,
                   least(epoch(event_ts) + {PERIOD}, epoch(bucket_ts) + {width})
                   - greatest(epoch(event_ts), coalesce(prev_end, 0.0))
               )) AS uptime,
               {width} - sum(greatest(0.0,
                   least(epoch(event_ts) + {PERIOD}, epoch(bucket_ts) + {width})
                   - greatest(epoch(event_ts), coalesce(prev_end, 0.0))
               )) AS downtime
        FROM o GROUP BY 1, 2 ORDER BY 1, 2
    """).df().reset_index(drop=True)
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols], want[cols], check_dtype=False, rtol=1e-9
    )
