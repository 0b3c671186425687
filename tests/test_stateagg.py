"""Duration-in-state + heartbeat liveness (operators/stateagg.py).

Oracles:
- state_agg: DuckDB recomputes every tier's per-state durations DIRECTLY
  from raw readings (window lead over (key, tier-bucket)); the interpolated
  accessor is checked against a bucket-splitting overlap join over GLOBAL
  segments — a genuinely different algorithm from the engine's
  summary+bridge algebra.
- heartbeat_agg: a pure-python interval-union replay (sort, merge, clamp)
  recomputes uptime/gaps per bucket; interpolated uptime is checked against
  the global-union measure, which the summary+carry algebra must equal.
- Equality is EXACT: second-aligned timestamps make every duration an
  exactly-representable double and sums stay far inside 2^53.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts
from timeseriesvectordbpattermatcher_spark.operators.stateagg import (
    duration_in,
    heartbeat_bucket,
    heartbeat_cascade,
    heartbeat_read,
    interpolated_duration_in,
    interpolated_uptime,
    state_bucket,
    state_cascade,
)

TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
IVAL = {"1m": "INTERVAL 1 MINUTE", "1h": "INTERVAL 1 HOUR", "1d": "INTERVAL 1 DAY"}
SPAN = {"1m": 60.0, "1h": 3600.0, "1d": 86400.0}


@pytest.fixture(scope="module")
def st_points(spark, seqs_2k):
    # one reading per (source, ts) — the documented input contract; state is
    # a 3-level categorical derived from the sequence length
    df = (
        derive_event_ts(seqs_2k)
        .filter(F.col("event_ts").isNotNull())
        .groupBy("source", "event_ts")
        .agg(F.max("n_tok").alias("ntok"))
        .withColumn(
            "state",
            F.when(F.col("ntok") < 600, F.lit("low"))
            .when(F.col("ntok") < 1200, F.lit("mid"))
            .otherwise(F.lit("high")),
        )
        .select("source", "event_ts", "state")
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def _state_oracle(duck, pdf, trunc):
    duck.register("st_pts", pdf)
    return duck.sql(f"""
        WITH p AS (
          SELECT source, event_ts AS ts, state,
                 date_trunc('{trunc}', event_ts) AS bucket_ts,
                 lead(event_ts) OVER w AS nts
          FROM st_pts
          WINDOW w AS (PARTITION BY source, date_trunc('{trunc}', event_ts)
                       ORDER BY event_ts, state)
        )
        SELECT source, bucket_ts, state,
               coalesce(sum(epoch(nts) - epoch(ts)), 0) AS dur
        FROM p GROUP BY 1, 2, 3
    """).df()


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_state_direct_build_matches_duckdb(st_points, duck, tier):
    got = (
        state_bucket(st_points, tier=tier)
        .select("source", "bucket_ts", F.explode("durs").alias("state", "dur"))
        .toPandas()
        .sort_values(["source", "bucket_ts", "state"])
        .reset_index(drop=True)
    )
    want = (
        _state_oracle(duck, st_points.toPandas(), TRUNC[tier])
        .sort_values(["source", "bucket_ts", "state"])
        .reset_index(drop=True)
    )
    m = got.merge(want, on=["source", "bucket_ts", "state"],
                  suffixes=("", "_w"), how="outer", indicator=True)
    assert (m["_merge"] == "both").all(), m[m["_merge"] != "both"].head()
    bad = m[m["dur"] != m["dur_w"]]
    assert bad.empty, bad.head()


def _flat_state(df):
    return (
        df.select(
            "source",
            "bucket_ts",
            F.col("first")["ts"].alias("first_ts"),
            F.col("first")["state"].alias("first_state"),
            F.col("last")["ts"].alias("last_ts"),
            F.col("last")["state"].alias("last_state"),
            F.map_entries(F.col("durs")).alias("durs"),  # sorted by key already
            "n",
        )
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_state_cascade_equals_direct(st_points):
    s1m = state_bucket(st_points, tier="1m")
    c1h = state_cascade(s1m, "1h", from_tier="1m")
    c1d = state_cascade(c1h, "1d", from_tier="1h")
    for cascaded, tier in ((c1h, "1h"), (c1d, "1d")):
        direct = _flat_state(state_bucket(st_points, tier=tier))
        got = _flat_state(cascaded)
        # cascaded durs may carry extra 0.0 entries for states whose only
        # appearance was a fine bucket's final reading — drop exact-zero
        # entries on both sides before comparing (duration algebra is
        # unaffected: absent == 0.0 by the duration_in contract)
        for frame in (direct, got):
            frame["durs"] = frame["durs"].map(
                lambda es: {x["key"]: x["value"] for x in es if x["value"] != 0.0}
            )
        pd.testing.assert_frame_equal(got, direct, check_exact=True)


def test_duration_in_zero_for_unseen_state(st_points):
    out = duration_in(state_bucket(st_points, tier="1d"), "nosuch").collect()
    assert out and all(r["dur"] == 0.0 for r in out)


def _idur_oracle(duck, pdf, trunc, ival, target):
    duck.register("st_pts2", pdf)
    return duck.sql(f"""
        WITH segs AS (
          SELECT source, state, event_ts AS s,
                 coalesce(lead(event_ts) OVER (PARTITION BY source
                                               ORDER BY event_ts, state),
                          date_trunc('{trunc}', event_ts) + {ival}) AS e
          FROM st_pts2
        ),
        buckets AS (
          SELECT DISTINCT source, date_trunc('{trunc}', event_ts) AS bucket_ts
          FROM st_pts2
        )
        SELECT b.source, b.bucket_ts,
               coalesce(sum(CASE WHEN g.state = '{target}' THEN
                 greatest(0, epoch(least(g.e, b.bucket_ts + {ival}))
                           - epoch(greatest(g.s, b.bucket_ts))) END), 0) AS idur
        FROM buckets b JOIN segs g ON b.source = g.source
        GROUP BY 1, 2
    """).df()


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_interpolated_duration_matches_global_segment_split(st_points, duck, tier):
    got = (
        interpolated_duration_in(state_bucket(st_points, tier=tier), "mid", tier)
        .select("source", "bucket_ts", "idur")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = (
        _idur_oracle(duck, st_points.toPandas(), TRUNC[tier], IVAL[tier], "mid")
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    m = got.merge(want, on=["source", "bucket_ts"], suffixes=("", "_w"),
                  how="outer", indicator=True)
    assert (m["_merge"] == "both").all()
    bad = m[m["idur"] != m["idur_w"]]
    assert bad.empty, bad.head()


def test_state_guards(st_points):
    with pytest.raises(ValueError, match="tier"):
        state_bucket(st_points, tier="5m")
    with pytest.raises(ValueError, match="coarsen"):
        state_cascade(state_bucket(st_points, tier="1h"), "1m", from_tier="1h")


# --- heartbeat ---------------------------------------------------------------

PERIOD = 90.0


@pytest.fixture(scope="module")
def hb_points(spark, st_points):
    # thin the readings so real gaps exist at every tier
    df = (
        st_points.filter(F.pmod(F.xxhash64("source", "event_ts"), F.lit(3)) == 0)
        .select("source", "event_ts")
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def _union(intervals):
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


def _overlap(islands, lo, hi):
    return sum(max(0.0, min(e, hi) - max(s, lo)) for s, e in islands)


def _hb_oracle(pdf, trunc, span):
    """Pure-python replay: per (key, bucket) merge the bucket's own
    [hb, hb+P) intervals; uptime / gaps from the clamped union; iuptime from
    the GLOBAL per-key union (the summary+carry algebra must equal it)."""
    rows = []
    pdf = pdf.copy()
    pdf["t"] = pdf["event_ts"].astype("int64") / 1e9  # epoch seconds
    pdf["bucket"] = pdf["event_ts"].dt.floor(
        {"minute": "min", "hour": "h", "day": "D"}[trunc]
    )
    for src, g in pdf.groupby("source"):
        glob = _union([(t, t + PERIOD) for t in g["t"]])
        for b, gb in g.groupby("bucket"):
            b0 = b.value / 1e9 if hasattr(b, "value") else b.timestamp()
            b1 = b0 + span
            own = _union([(t, t + PERIOD) for t in gb["t"]])
            up = _overlap(own, b0, b1)
            gaps = (
                (1 if own[0][0] > b0 else 0)
                + (len(own) - 1)
                + (1 if own[-1][1] < b1 else 0)
            )
            rows.append(
                {
                    "source": src,
                    "bucket_ts": b,
                    "uptime": min(up, span),
                    "downtime": span - min(up, span),
                    "num_gaps": gaps,
                    "iuptime": min(_overlap(glob, b0, b1), span),
                    "n": len(gb),
                }
            )
    return pd.DataFrame(rows).sort_values(["source", "bucket_ts"]).reset_index(drop=True)


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_heartbeat_matches_python_union_replay(hb_points, tier):
    built = heartbeat_bucket(hb_points, PERIOD, tier=tier)
    got = (
        interpolated_uptime(heartbeat_read(built, tier), tier)
        .select("source", "bucket_ts", "uptime", "downtime", "num_gaps",
                "iuptime", "n")
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = _hb_oracle(hb_points.toPandas(), TRUNC[tier], SPAN[tier])
    m = got.merge(want, on=["source", "bucket_ts"], suffixes=("", "_w"),
                  how="outer", indicator=True)
    assert (m["_merge"] == "both").all(), m[m["_merge"] != "both"].head()
    for col in ("uptime", "downtime", "num_gaps", "iuptime", "n"):
        bad = m[m[col] != m[f"{col}_w"]]
        assert bad.empty, (col, bad.head())


def _flat_hb(df):
    return (
        df.select(
            "source", "bucket_ts", "first_hb", "last_hb", "n",
            F.transform(
                "live", lambda x: F.struct(x["s"].alias("s"), x["e"].alias("e"))
            ).alias("live"),
        )
        .toPandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_heartbeat_cascade_equals_direct(hb_points):
    h1m = heartbeat_bucket(hb_points, PERIOD, tier="1m")
    c1h = heartbeat_cascade(h1m, "1h", from_tier="1m")
    c1d = heartbeat_cascade(c1h, "1d", from_tier="1h")
    for cascaded, tier in ((c1h, "1h"), (c1d, "1d")):
        direct = _flat_hb(heartbeat_bucket(hb_points, PERIOD, tier=tier))
        got = _flat_hb(cascaded)
        pd.testing.assert_frame_equal(got, direct, check_exact=True)


def test_heartbeat_touching_islands_merge(spark):
    # [0, 30) and [30, 60): half-open touch must coalesce into one island
    pdf = pd.DataFrame(
        {
            "source": ["a", "a"],
            "event_ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:30"]
            ),
        }
    )
    out = heartbeat_bucket(spark.createDataFrame(pdf), 30.0).collect()
    assert len(out) == 1 and len(out[0]["live"]) == 1
    assert out[0]["n"] == 2


def test_heartbeat_guards(spark, hb_points):
    with pytest.raises(ValueError, match="period_sec"):
        heartbeat_bucket(hb_points, 0.0)
    with pytest.raises(ValueError, match="coarsen"):
        heartbeat_cascade(heartbeat_bucket(hb_points, PERIOD, tier="1h"), "1m",
                          from_tier="1h")


def test_stateagg_one_exchange_per_step(spark):
    """Builds window over (key, bucket) and pay exactly ONE Exchange reused
    by window + both aggs; cascades add one summary-sized Exchange."""
    pts = spark.createDataFrame(
        [("a", "2024-01-01 00:00:05", "up")],
        "source string, ts string, state string",
    ).selectExpr("source", "cast(ts as timestamp) as event_ts", "state")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    s1m = state_bucket(pts)
    assert plan(s1m).count("Exchange") == 1, plan(s1m)
    assert plan(state_cascade(s1m, "1h")).count("Exchange") == 2

    h1m = heartbeat_bucket(pts.select("source", "event_ts"), 30.0)
    assert plan(h1m).count("Exchange") == 1, plan(h1m)
    assert plan(heartbeat_cascade(h1m, "1h")).count("Exchange") == 2


def test_rollup_job_hb_plane_end_to_end(spark, seqs_2k, tmp_path):
    """heartbeat=True maintains the hb tiers alongside stats with the same
    watermark/resume semantics; the CASCADED 1d islands are byte-equal to a
    direct 1d build over the raw points, reruns are no-ops, and a crash
    between the hb 1m commit and the cascade resumes exactly."""
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob

    seqs = derive_event_ts(seqs_2k).filter(F.col("event_ts").isNotNull())
    direct = _flat_hb(
        heartbeat_bucket(seqs.select("source", "event_ts"), PERIOD, tier="1d")
    )

    job = RollupJob(str(tmp_path / "hbjob"))
    job.run(spark, seqs, heartbeat=True, hb_period_sec=PERIOD)
    got = _flat_hb(job.hb_tables["1d"].read(spark).drop("bucket_day"))
    pd.testing.assert_frame_equal(got, direct, check_exact=True)

    # rerun over the same input is a no-op on the hb plane too
    v = job.hb_tables["1m"].current_snapshot().version
    job.run(spark, seqs, heartbeat=True, hb_period_sec=PERIOD)
    assert job.hb_tables["1m"].current_snapshot().version == v

    # crash AFTER the hb 1m commit but BEFORE the cascade: resume converges
    crashed = RollupJob(str(tmp_path / "hbcrash"))
    with pytest.raises(RuntimeError, match="hb_1m"):
        crashed.run(spark, seqs, heartbeat=True, hb_period_sec=PERIOD,
                    fail_after="hb_1m")
    assert crashed.hb_tables["1h"].current_snapshot() is None
    crashed.run(spark, seqs, heartbeat=True, hb_period_sec=PERIOD)
    got2 = _flat_hb(crashed.hb_tables["1d"].read(spark).drop("bucket_day"))
    pd.testing.assert_frame_equal(got2, direct, check_exact=True)


def test_hb_rolling_matches_python_union(spark, hb_points):
    """Rolling trailing-K window liveness: merged islands + window-span
    uptime equal a pure-python union replay over the window's
    heartbeats; warm-up slots emit NULL payload."""
    from timeseriesvectordbpattermatcher_spark.operators.stateagg import (
        hb_rolling,
        heartbeat_bucket,
    )

    K, STEP = 4, 3600
    t1h = heartbeat_bucket(hb_points, PERIOD, tier="1h")
    got = hb_rolling(t1h, K, "1h", min_buckets=1).toPandas()
    pdf = hb_points.toPandas()
    pdf["t"] = pdf["event_ts"].astype("int64") / 1e9
    pdf["bucket"] = pdf["event_ts"].dt.floor("h")
    checked = 0
    for row in got.itertuples():
        g = pdf[pdf["source"] == row.source]
        b_end = row.bucket_ts.timestamp() + STEP
        w_start = row.bucket_ts.timestamp() - (K - 1) * STEP
        member = g[(g["bucket"].apply(lambda b: b.timestamp()) >= w_start)
                   & (g["bucket"].apply(lambda b: b.timestamp()) < b_end)]
        islands = _union([(t, t + PERIOD) for t in member["t"]])
        assert row.n == len(member)
        assert row.win_buckets == member["bucket"].nunique()
        got_islands = [
            (iv["s"].timestamp(), iv["e"].timestamp()) for iv in row.live
        ]
        assert len(got_islands) == len(islands)
        for (gs, ge), (ws, we) in zip(got_islands, islands):
            assert gs == pytest.approx(ws, abs=1e-6)
            assert ge == pytest.approx(we, abs=1e-6)
        assert row.uptime == pytest.approx(
            _overlap(islands, w_start, b_end), abs=1e-6
        )
        assert row.downtime == pytest.approx(
            (b_end - w_start) - row.uptime, abs=1e-6
        )
        checked += 1
    assert checked > 0
    # warm-up
    strict = hb_rolling(t1h, K, "1h").toPandas()
    cold = strict[strict["win_buckets"] < K]
    assert cold["uptime"].isna().all() and cold["live"].isna().all()
    assert cold["n"].notna().all()


def test_state_rolling_matches_python_replay(spark, st_points):
    """Rolling trailing-K duration-in-state: a python replay computes
    locf segment durations over each window's member readings (segments
    between consecutive readings, both endpoints inside the window's
    member buckets — gaps bridged in the last member's closing state);
    warm-up slots NULL the payload, n stays exact."""
    from timeseriesvectordbpattermatcher_spark.operators.stateagg import (
        state_bucket,
        state_rolling,
    )

    K, STEP = 4, 3600
    t1h = state_bucket(st_points, tier="1h")
    got = state_rolling(t1h, K, "1h", min_buckets=1).toPandas()
    pdf = st_points.toPandas()
    pdf["t"] = pdf["event_ts"].astype("int64") / 1e9
    pdf["b"] = pdf["event_ts"].dt.floor("h")
    checked = 0
    for row in got.itertuples():
        g = pdf[pdf["source"] == row.source]
        b_end = row.bucket_ts.timestamp() + STEP
        w_start = row.bucket_ts.timestamp() - (K - 1) * STEP
        bsec = g["b"].astype("int64") / 1e9
        mem = g[(bsec >= w_start) & (bsec < b_end)].sort_values(["t", "state"])
        assert row.n == len(mem)
        assert row.win_buckets == mem["b"].nunique()
        durs = {}
        ts = mem["t"].to_numpy()
        sts = mem["state"].to_numpy()
        for i in range(len(ts) - 1):
            durs[sts[i]] = durs.get(sts[i], 0.0) + (ts[i + 1] - ts[i])
        want = {k: v for k, v in durs.items() if v > 0 or k in durs}
        got_durs = dict(row.durs) if row.durs is not None else None
        assert got_durs is not None
        assert set(got_durs) == set(want), (row.source, row.bucket_ts)
        for k, v in want.items():
            assert got_durs[k] == pytest.approx(v, abs=1e-6), (row.source, k)
        checked += 1
    assert checked > 0
    # warm-up
    strict = state_rolling(t1h, K, "1h").toPandas()
    cold = strict[strict["win_buckets"] < K]
    assert cold["durs"].isna().all() and cold["n"].notna().all()
