"""Rolling quantile reads over tier maps (quantiles.hist_rolling_quantiles,
ddsketch.dds_rolling_quantiles).

Oracles:
- hist plane (exact): DuckDB recomputes the inverted-CDF type-1 quantile
  directly from the RAW rows of each trailing-k CALENDAR window (a range
  join on bucket seconds — no histograms anywhere on the oracle side);
  the rolling read must match exactly.
- dds plane: the same DuckDB exact quantile bounds every decoded rolling
  read within relative error alpha.
- calendar-vs-row window: a planted gap (one empty minute) must shrink
  ``win_buckets`` instead of silently stretching the window back.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.ddsketch import (
    dds_bucket,
    dds_rolling_quantiles,
)
from timeseriesvectordbpattermatcher_spark.operators.quantiles import (
    hist_1m,
    hist_cascade,
    hist_rolling_quantiles,
)
from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts

K = 5
TRUNC = {"1m": "minute", "1h": "hour"}
STEP = {"1m": 60, "1h": 3600}


@pytest.fixture(scope="module")
def points(spark, seqs_2k):
    df = (
        derive_event_ts(seqs_2k)
        .filter(F.col("event_ts").isNotNull())
        .select("source", "event_ts", "n_tok")
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def raw_pdf(points):
    return points.toPandas()


def _oracle_rolling(duck, raw_pdf, tier, q, min_buckets):
    """Exact type-1 quantile over each trailing-K calendar window: for
    every (source, slot) present in the tier, rank the raw values whose
    bucket falls within [slot - (K-1) steps, slot]."""
    duck.register("raw_rq", raw_pdf)
    trunc, step = TRUNC[tier], STEP[tier]
    return duck.sql(f"""
        WITH r AS (
          SELECT source, date_trunc('{trunc}', event_ts) AS b, n_tok AS v
          FROM raw_rq),
        slots AS (SELECT DISTINCT source, b FROM r),
        win AS (
          SELECT s.source, s.b AS bucket_ts, r.v, r.b AS src_b
          FROM slots s JOIN r
            ON r.source = s.source
           AND epoch(s.b) - epoch(r.b) BETWEEN 0 AND {(K - 1) * step}),
        ranked AS (
          SELECT source, bucket_ts, v,
                 row_number() OVER (PARTITION BY source, bucket_ts ORDER BY v) AS rnk,
                 count(*)    OVER (PARTITION BY source, bucket_ts) AS tot,
                 count(DISTINCT src_b) OVER (PARTITION BY source, bucket_ts) AS wb
          FROM win)
        SELECT source, bucket_ts,
               max(tot) AS hist_n, max(wb) AS win_buckets,
               CASE WHEN max(wb) >= {min_buckets}
                    THEN min(CASE WHEN rnk >= greatest(1, ceil(tot * {q}))
                             THEN v END) END AS qv
        FROM ranked GROUP BY 1, 2 ORDER BY 1, 2
    """).df()


@pytest.mark.parametrize("tier", ["1m", "1h"])
@pytest.mark.parametrize("min_buckets", [1, K])
def test_hist_rolling_matches_duckdb_exactly(spark, duck, points, raw_pdf, tier, min_buckets):
    h1m = hist_1m(points)
    tierdf = h1m if tier == "1m" else hist_cascade(h1m, "1h")
    got = (
        hist_rolling_quantiles(
            tierdf, K, tier, qs={"qv": 0.9}, min_buckets=min_buckets
        )
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = _oracle_rolling(duck, raw_pdf, tier, 0.9, min_buckets).reset_index(drop=True)
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols], want[cols], check_dtype=False
    )


def test_window_is_calendar_not_rows(spark):
    # source s: minutes 0,1,2, GAP at 3, then 4. K=3 window at minute 4
    # covers calendar slots {2,3,4} -> only buckets 2 and 4 contribute
    # (win_buckets=2); a row-frame would have pulled bucket 1 in.
    rows = [
        ("s", f"2024-01-01 00:0{m}:00", v)
        for m, v in [(0, 10), (1, 20), (2, 30), (4, 50)]
    ]
    df = spark.createDataFrame(rows, "source string, ts string, n_tok int").select(
        "source", F.col("ts").cast("timestamp").alias("event_ts"), "n_tok"
    )
    out = {
        str(r["bucket_ts"]): r
        for r in hist_rolling_quantiles(
            hist_1m(df), 3, "1m", qs={"qv": 1.0}, min_buckets=1
        ).collect()
    }
    at4 = out["2024-01-01 00:04:00"]
    assert at4["win_buckets"] == 2
    assert at4["hist_n"] == 2          # values {30, 50} only
    assert at4["qv"] == 50
    at2 = out["2024-01-01 00:02:00"]
    assert at2["win_buckets"] == 3 and at2["hist_n"] == 3 and at2["qv"] == 30
    # warm-up: min_buckets=3 nulls the first two slots AND the post-gap slot
    strict = {
        str(r["bucket_ts"]): r
        for r in hist_rolling_quantiles(
            hist_1m(df), 3, "1m", qs={"qv": 1.0}
        ).collect()
    }
    assert strict["2024-01-01 00:00:00"]["qv"] is None
    assert strict["2024-01-01 00:01:00"]["qv"] is None
    assert strict["2024-01-01 00:02:00"]["qv"] == 30
    assert strict["2024-01-01 00:04:00"]["qv"] is None


def test_dds_rolling_within_alpha_of_exact(spark, duck, points, raw_pdf):
    ALPHA = 0.01
    # float metric with spread (reuses the n_tok-derived signed scale the
    # dds tests use, simplified): exercise decode on non-integer values
    pts = points.withColumn("val", F.col("n_tok") * 1.37 + 0.25)
    sk = dds_bucket(pts, alpha=ALPHA, value_col="val", tier="1m")
    got = dds_rolling_quantiles(
        sk, K, "1m", alpha=ALPHA, qs={"qv": 0.95}, min_buckets=1
    ).toPandas().sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    raw2 = raw_pdf.copy()
    raw2["n_tok"] = raw2["n_tok"] * 1.37 + 0.25
    want = _oracle_rolling(duck, raw2, "1m", 0.95, 1).reset_index(drop=True)
    merged = got.merge(want, on=["source", "bucket_ts"], suffixes=("", "_w"))
    assert len(merged) == len(got) == len(want)
    assert (merged["dds_n"] == merged["hist_n"]).all()
    rel = ((merged["qv"] - merged["qv_w"]).abs() / merged["qv_w"].abs())
    assert (rel <= ALPHA).all(), rel.max()


def test_rolling_plan_shape(spark, seqs_2k):
    # the walk runs off ONE hash Exchange on (key, target slot); the
    # scatter is a narrow bounded explode (no extra shuffle)
    pts = derive_event_ts(seqs_2k).filter(F.col("event_ts").isNotNull())
    df = hist_rolling_quantiles(hist_1m(pts), K, "1m")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # hist_1m's own build contributes its two aggregation Exchanges; the
    # rolling read itself must add exactly one more
    assert plan.count("Exchange hashpartitioning") <= 3, plan
