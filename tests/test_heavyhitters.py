"""Misra-Gries heavy-hitter tiers (operators/heavyhitters.py).

Oracles:
- bit-exact replay: the whole pipeline (exact counts -> compress ->
  pointwise merge -> compress) is deterministic, so a pure-python
  replay over the raw pandas rows must match every map, error scalar
  and total at every tier, entry for entry.
- bounds vs DuckDB: exact per-(bucket, token) counts from an unnest
  group-by (no summary anywhere) must satisfy
  est <= true <= est + hh_err for every token, every token with
  true > hh_err must be PRESENT in the summary, and
  hh_err <= hh_n / (cap + 1) — the published Misra-Gries guarantee,
  preserved under merging (Agarwal et al., PODS 2012).
- exact regime: with cap >= distinct tokens the summary IS the exact
  count map (err everywhere 0) and cascaded == direct bit-exact.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from timeseriesvectordbpattermatcher_spark.operators.heavyhitters import (
    topk_bucket,
    topk_cascade,
    topk_read,
)
from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts

CAP = 8  # small so compression genuinely engages on the 2k corpus


# ---------- engine-free python oracle ----------

def mg_compress_py(counts: dict[int, int], cap: int) -> tuple[dict[int, int], int]:
    if len(counts) <= cap:
        return dict(counts), 0
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    thr = ordered[cap][1]
    return {k: v - thr for k, v in counts.items() if v > thr}, thr


def build_1m_py(raw: pd.DataFrame, cap: int):
    """(source, minute) -> [map, err, n] from raw rows."""
    out: dict[tuple, list] = {}
    for _, r in raw.iterrows():
        b = (r["source"], r["event_ts"].floor("min"))
        slot = out.setdefault(b, [{}, 0, 0])
        toks = r["tokens"]
        for t in [] if toks is None else toks:
            slot[0][int(t)] = slot[0].get(int(t), 0) + 1
            slot[2] += 1
    for b, slot in out.items():
        m, thr = mg_compress_py(slot[0], cap)
        out[b] = [m, thr, slot[2]]
    return out


def cascade_py(fine: dict[tuple, list], freq: str, cap: int):
    out: dict[tuple, list] = {}
    for (src, ts), (m, err, n) in fine.items():
        b = (src, ts.floor(freq))
        slot = out.setdefault(b, [{}, 0, 0])
        for k, v in m.items():
            slot[0][k] = slot[0].get(k, 0) + v
        slot[1] += err
        slot[2] += n
    for b, slot in out.items():
        m, thr = mg_compress_py(slot[0], cap)
        out[b] = [m, slot[1] + thr, slot[2]]
    return out


def oracle_flat(tiers: dict[tuple, list]) -> pd.DataFrame:
    rows = []
    for (src, ts), (m, err, n) in sorted(tiers.items()):
        if not m:
            rows.append((src, ts, None, None, err, n))
        for k in sorted(m):
            rows.append((src, ts, k, m[k], err, n))
    return pd.DataFrame(
        rows, columns=["source", "bucket_ts", "token", "est", "hh_err", "hh_n"]
    ).reset_index(drop=True)


def engine_flat(df) -> pd.DataFrame:
    out = (
        df.select(
            "source", "bucket_ts",
            F.explode_outer("hh").alias("token", "est"),
            "hh_err", "hh_n",
        )
        .toPandas()
        .sort_values(["source", "bucket_ts", "token"])
        .reset_index(drop=True)
    )
    return out[["source", "bucket_ts", "token", "est", "hh_err", "hh_n"]]


@pytest.fixture(scope="module")
def seqs(spark, seqs_2k):
    df = (
        derive_event_ts(seqs_2k)
        .filter(F.col("event_ts").isNotNull())
        .select("source", "event_ts", "tokens")
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def tiers(seqs):
    t1m = topk_bucket(seqs, tier="1m", cap=CAP).cache()
    t1h = topk_cascade(t1m, "1h", cap=CAP).cache()
    t1d = topk_cascade(t1h, "1d", cap=CAP).cache()
    t1m.count(), t1h.count(), t1d.count()
    yield {"1m": t1m, "1h": t1h, "1d": t1d}
    for t in t1m, t1h, t1d:
        t.unpersist()


@pytest.fixture(scope="module")
def oracle_tiers(seqs):
    raw = seqs.toPandas()
    o1m = build_1m_py(raw, CAP)
    o1h = cascade_py(o1m, "h", CAP)
    o1d = cascade_py(o1h, "d", CAP)
    return {"1m": o1m, "1h": o1h, "1d": o1d}


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_bitexact_vs_python_oracle(tiers, oracle_tiers, tier):
    got = engine_flat(tiers[tier])
    want = oracle_flat(oracle_tiers[tier])
    for col in ("token", "est", "hh_err", "hh_n"):
        want[col] = want[col].astype(got[col].dtype)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_bounds_vs_duckdb_exact(tiers, seqs, duck):
    duck.register("raw_hh", seqs.select("source", "event_ts", "tokens").toPandas())
    exact = duck.sql("""
        SELECT source, bucket_ts, tok, count(*) AS c FROM (
          SELECT source, date_trunc('day', event_ts) AS bucket_ts,
                 unnest(tokens) AS tok
          FROM raw_hh
        ) GROUP BY 1, 2, 3
    """).df()
    got = engine_flat(tiers["1d"]).dropna(subset=["token"])
    exact["tok"] = exact["tok"].astype("int64")
    got["token"] = got["token"].astype("int64")
    m = got.merge(
        exact.rename(columns={"tok": "token"}),
        on=["source", "bucket_ts", "token"],
        how="left",
    )
    assert m["c"].notna().all()  # every summary token really occurred
    assert (m["est"] <= m["c"]).all()              # never overcount
    assert (m["c"] <= m["est"] + m["hh_err"]).all()  # undercount bounded

    # completeness: any token with true count > hh_err must be present
    errs = (
        engine_flat(tiers["1d"])[["source", "bucket_ts", "hh_err", "hh_n"]]
        .drop_duplicates()
    )
    e = exact.rename(columns={"tok": "token"}).merge(
        errs, on=["source", "bucket_ts"]
    )
    must = e[e["c"] > e["hh_err"]]
    present = must.merge(
        got[["source", "bucket_ts", "token"]],
        on=["source", "bucket_ts", "token"],
        how="left",
        indicator=True,
    )
    assert (present["_merge"] == "both").all()

    # the published error guarantee, preserved through the merges
    assert (errs["hh_err"] <= errs["hh_n"] / (CAP + 1)).all()


def test_exact_regime_large_cap(seqs, duck):
    duck.register("raw_hh", seqs.select("source", "event_ts", "tokens").toPandas())
    want = duck.sql("""
        SELECT source, bucket_ts, tok AS token, count(*) AS est FROM (
          SELECT source, date_trunc('hour', event_ts) AS bucket_ts,
                 unnest(tokens) AS tok
          FROM raw_hh
        ) GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df().reset_index(drop=True)
    big = 1_000_000
    t1m = topk_bucket(seqs, tier="1m", cap=big)
    t1h = topk_cascade(t1m, "1h", cap=big)
    got = engine_flat(t1h).dropna(subset=["token"]).reset_index(drop=True)
    assert (got["hh_err"] == 0).all()
    cmp = got[["source", "bucket_ts", "token", "est"]].copy()
    for col in ("token", "est"):
        cmp[col] = cmp[col].astype("int64")
        want[col] = want[col].astype("int64")
    want["bucket_ts"] = want["bucket_ts"].astype(cmp["bucket_ts"].dtype)
    pd.testing.assert_frame_equal(cmp, want, check_exact=True)
    # direct hour build == cascaded (no compression anywhere => addition)
    direct = engine_flat(topk_bucket(seqs, tier="1h", cap=big))
    pd.testing.assert_frame_equal(engine_flat(t1h), direct, check_exact=True)


def test_ties_at_threshold_drop_together(spark):
    # counts: 5,3,3,3,1 with cap=2 -> thr = 3 (3rd largest); ALL entries
    # with count 3 drop; survivors: {10: 2}; err = 3
    pdf = pd.DataFrame(
        {
            "source": ["a"],
            "event_ts": pd.to_datetime(["2024-01-01 00:00:05"]),
            "tokens": [[10] * 5 + [20] * 3 + [30] * 3 + [40] * 3 + [50]],
        }
    )
    df = spark.createDataFrame(
        pdf, "source string, event_ts timestamp, tokens array<int>"
    )
    row = topk_bucket(df, cap=2).collect()[0]
    assert row["hh"] == {10: 2}
    assert row["hh_err"] == 3
    assert row["hh_n"] == 15


def test_null_and_empty_token_rows(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a", "a", "b", "b"],
            "event_ts": pd.to_datetime(["2024-01-01 00:00:05"] * 4),
            "tokens": [[1, 1, 2], [], None, None],
        }
    )
    df = spark.createDataFrame(
        pdf, "source string, event_ts timestamp, tokens array<int>"
    )
    out = topk_bucket(df, cap=CAP)
    rows = {r["source"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["b"]["hh"] == {} and rows["b"]["hh_err"] == 0 and rows["b"]["hh_n"] == 0
    assert rows["a"]["hh"] == {1: 2, 2: 1} and rows["a"]["hh_n"] == 3
    # empty buckets survive the cascade with empty maps too
    casc = {r["source"]: r for r in topk_cascade(out, "1h", cap=CAP).collect()}
    assert casc["b"]["hh"] == {} and casc["b"]["hh_n"] == 0


def test_topk_read_ranks_and_bounds(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a"],
            "event_ts": pd.to_datetime(["2024-01-01 00:00:05"]),
            "tokens": [[7] * 4 + [8] * 2 + [9]],
        }
    )
    df = spark.createDataFrame(
        pdf, "source string, event_ts timestamp, tokens array<int>"
    )
    t = topk_bucket(df, cap=CAP)
    rows = topk_read(t, n=2).orderBy("rank").collect()
    assert [(r["token"], r["est"], r["rank"]) for r in rows] == [(7, 4, 1), (8, 2, 2)]
    assert all(r["est_hi"] == r["est"] + r["hh_err"] for r in rows)


def test_cap_validation(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a"],
            "event_ts": pd.to_datetime(["2024-01-01"]),
            "tokens": [[1]],
        }
    )
    df = spark.createDataFrame(
        pdf, "source string, event_ts timestamp, tokens array<int>"
    )
    with pytest.raises(ValueError):
        topk_bucket(df, cap=0)
    with pytest.raises(ValueError):
        topk_bucket(df, tier="5m")


def test_build_plan_shapes(spark):
    """expr: explode + two hash aggs (2 Exchanges, compression a pure
    projection). arrow (default): ONE co-locating Exchange feeding the
    accumulating kernel — no per-token shuffle exists in the plan."""
    pdf = pd.DataFrame(
        {
            "source": ["a"],
            "event_ts": pd.to_datetime(["2024-01-01"]),
            "tokens": [[1, 2, 3]],
        }
    )
    df = spark.createDataFrame(
        pdf, "source string, event_ts timestamp, tokens array<int>"
    )
    expr_plan = (
        topk_bucket(df, cap=CAP, engine="expr")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert expr_plan.count("Exchange") == 2, expr_plan
    assert "BatchEvalPython" not in expr_plan and "MapInPandas" not in expr_plan
    arrow_plan = (
        topk_bucket(df, cap=CAP, engine="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert arrow_plan.count("Exchange") == 1, arrow_plan
    assert "MapInArrow" in arrow_plan, arrow_plan


def test_engine_parity_expr_vs_arrow(seqs):
    """The arrow build (deployment default) is summary-for-summary
    identical to the expr plan — exact counts are unique per bucket, so
    the compressed result cannot depend on physical layout. Transitively
    extends the python-oracle bit-exact pin to both engines."""
    e = engine_flat(topk_bucket(seqs, cap=CAP, engine="expr"))
    a = engine_flat(topk_bucket(seqs, cap=CAP, engine="arrow"))
    pd.testing.assert_frame_equal(a, e, check_exact=True)


def test_arrow_engine_null_and_empty_rows(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a", "a", "b", "b"],
            "event_ts": pd.to_datetime(["2024-01-01 00:00:05"] * 4),
            "tokens": [[1, 1, 2], [], None, None],
        }
    )
    df = spark.createDataFrame(
        pdf, "source string, event_ts timestamp, tokens array<int>"
    )
    rows = {r["source"]: r for r in topk_bucket(df, cap=CAP, engine="arrow").collect()}
    assert set(rows) == {"a", "b"}
    assert rows["b"]["hh"] == {} and rows["b"]["hh_err"] == 0 and rows["b"]["hh_n"] == 0
    assert rows["a"]["hh"] == {1: 2, 2: 1} and rows["a"]["hh_n"] == 3


def test_wide_map_compression_stays_fast(spark):
    """Regression pin for the higher-order-function trap (module
    docstring): compressing maps with thousands of entries must be
    seconds, not CPU-hours. A comparator-based sort with the threshold
    expression inlined into the survivor lambda re-evaluates an
    O(n log n) subtree PER ELEMENT — the first cut measured ~90
    CPU-minutes on exactly this shape."""
    import time

    n_tokens, n_buckets = 4000, 64
    rows = pd.DataFrame(
        {
            "source": ["s"] * n_buckets,
            "event_ts": pd.date_range("2024-01-01", periods=n_buckets, freq="min"),
            "tokens": [list(range(n_tokens)) for _ in range(n_buckets)],
        }
    )
    df = spark.createDataFrame(
        rows, "source string, event_ts timestamp, tokens array<int>"
    )
    t0 = time.time()
    out = topk_bucket(df, cap=CAP)
    assert out.count() == n_buckets
    wall = time.time() - t0
    assert wall < 30, f"wide-map compression took {wall:.1f}s — lambda trap is back"


def test_rollup_job_topk_plane_end_to_end(spark, seqs_2k, tmp_path):
    """topk=True maintains the summary tiers alongside stats with the
    same watermark/resume semantics; the job's cascaded 1d summaries are
    bit-equal to the python oracle's replay, reruns are no-ops, and a
    crash after the topk 1m commit resumes exactly."""
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob

    seqs = derive_event_ts(seqs_2k).filter(F.col("event_ts").isNotNull())
    raw = seqs.select("source", "event_ts", "tokens").toPandas()
    want = oracle_flat(cascade_py(cascade_py(build_1m_py(raw, CAP), "h", CAP), "d", CAP))

    job = RollupJob(str(tmp_path / "hhjob"))
    job.run(spark, seqs, topk=True, topk_cap=CAP)
    got = engine_flat(job.topk_tables["1d"].read(spark).drop("bucket_day"))
    for col in ("token", "est", "hh_err", "hh_n"):
        want[col] = want[col].astype(got[col].dtype)
    pd.testing.assert_frame_equal(got, want, check_exact=True)

    v = job.topk_tables["1m"].current_snapshot().version
    job.run(spark, seqs, topk=True, topk_cap=CAP)
    assert job.topk_tables["1m"].current_snapshot().version == v

    crashed = RollupJob(str(tmp_path / "hhcrash"))
    with pytest.raises(RuntimeError, match="topk_1m"):
        crashed.run(spark, seqs, topk=True, topk_cap=CAP, fail_after="topk_1m")
    assert crashed.topk_tables["1h"].current_snapshot() is None
    crashed.run(spark, seqs, topk=True, topk_cap=CAP)
    got2 = engine_flat(crashed.topk_tables["1d"].read(spark).drop("bucket_day"))
    pd.testing.assert_frame_equal(got2, want, check_exact=True)


def test_rolling_topk_bound_and_exact_regime(seqs, tiers, duck):
    """Rolling trailing-K calendar merge: every reported token's
    [est, est + hh_err] brackets its DuckDB-exact windowed count, every
    token whose true windowed count exceeds hh_err is present, hh_n is
    exact, and at cap >= distinct tokens the read IS the exact counts."""
    from timeseriesvectordbpattermatcher_spark.operators.heavyhitters import (
        topk_rolling,
    )

    K = 5
    got = topk_rolling(tiers["1h"], K, "1h", cap=CAP, min_buckets=1).toPandas()
    duck.register("hh_raw", seqs.toPandas())
    exact = duck.sql(f"""
        WITH r AS (
          SELECT source, date_trunc('hour', event_ts) AS b, unnest(tokens) AS tok
          FROM hh_raw),
        slots AS (SELECT DISTINCT source, b FROM r)
        SELECT s.source, s.b AS bucket_ts, r.tok, count(*) AS true_cnt
        FROM slots s JOIN r ON r.source = s.source
         AND epoch(s.b) - epoch(r.b) BETWEEN 0 AND {(K - 1) * 3600}
        GROUP BY 1, 2, 3
    """).df()
    tot = exact.groupby(["source", "bucket_ts"])["true_cnt"].sum().to_dict()
    ex_map = {
        (r.source, r.bucket_ts, r.tok): r.true_cnt for r in exact.itertuples()
    }
    assert len(got) > 0
    for row in got.itertuples():
        key = (row.source, row.bucket_ts)
        assert row.hh_n == tot[key]
        for tok, est in row.hh.items():
            true = ex_map.get((row.source, row.bucket_ts, tok), 0)
            assert est <= true <= est + row.hh_err, (key, tok, est, true, row.hh_err)
        # completeness: true > hh_err must be reported
        for (s, b, tok), true in ex_map.items():
            if (s, b) == key and true > row.hh_err:
                assert tok in row.hh, (key, tok, true, row.hh_err)
    # exact regime: cap large enough -> rolling == exact windowed counts
    big = topk_bucket(seqs, tier="1h", cap=1_000_000)
    roll = topk_rolling(big, K, "1h", cap=1_000_000, min_buckets=1).toPandas()
    for row in roll.itertuples():
        assert row.hh_err == 0
        want = {
            tok: cnt for (s, b, tok), cnt in ex_map.items()
            if (s, b) == (row.source, row.bucket_ts)
        }
        assert dict(row.hh) == want


def test_rolling_topk_warmup_and_origin(spark):
    from timeseriesvectordbpattermatcher_spark.operators.heavyhitters import (
        topk_bucket,
        topk_rolling,
    )

    rows = [("s", f"2024-01-01 0{h}:00:00", [1, 1, 2]) for h in range(3)]
    df = spark.createDataFrame(
        rows, "source string, ts string, tokens array<int>"
    ).select("source", F.col("ts").cast("timestamp").alias("event_ts"), "tokens")
    t = topk_bucket(df, tier="1h", cap=8)
    out = {str(r["bucket_ts"]): r for r in topk_rolling(t, 2, "1h", cap=8).collect()}
    assert len(out) == 3  # only real slots emit
    first = out["2024-01-01 00:00:00"]
    assert first["hh"] is None and first["hh_err"] is None  # warm-up
    assert first["hh_n"] == 3 and first["win_buckets"] == 1
    second = out["2024-01-01 01:00:00"]
    assert second["win_buckets"] == 2 and second["hh"] == {1: 4, 2: 2}


def test_topk_drift_exact_regime_and_bounds(spark, seqs, duck):
    """Exact regime (cap >= vocab): drift deltas equal DuckDB's exact
    rate differences between the two halves; MG regime: the
    [delta_lo, delta_hi] bracket contains the exact delta for every
    reported token; a planted emerging token ranks first."""
    from timeseriesvectordbpattermatcher_spark.operators.heavyhitters import (
        topk_drift,
        topk_merge_all,
    )

    mid = seqs.agg(
        F.percentile_approx("event_ts", 0.5, 10000).alias("m")
    ).first()["m"]
    a = seqs.filter(F.col("event_ts") <= F.lit(mid.isoformat()))
    # plant: token 77 injected 5x into every late-half doc of one source
    b = seqs.filter(F.col("event_ts") > F.lit(mid.isoformat())).withColumn(
        "tokens",
        F.when(
            F.col("source") == "web",
            F.concat("tokens", F.array(*[F.lit(77)] * 5)),
        ).otherwise(F.col("tokens")),
    )
    duck.register("tda", a.toPandas())
    duck.register("tdb", b.toPandas())
    exact = duck.sql("""
        WITH ca AS (SELECT source, tok, count(*) c FROM
                    (SELECT source, unnest(tokens) tok FROM tda) GROUP BY 1,2),
        cb AS (SELECT source, tok, count(*) c FROM
                    (SELECT source, unnest(tokens) tok FROM tdb) GROUP BY 1,2),
        na AS (SELECT source, sum(c) n FROM ca GROUP BY 1),
        nb AS (SELECT source, sum(c) n FROM cb GROUP BY 1)
        SELECT coalesce(ca.source, cb.source) source,
               coalesce(ca.tok, cb.tok) tok,
               coalesce(ca.c,0)::DOUBLE / na.n rate_a,
               coalesce(cb.c,0)::DOUBLE / nb.n rate_b
        FROM ca FULL OUTER JOIN cb ON ca.source=cb.source AND ca.tok=cb.tok
        JOIN na ON na.source = coalesce(ca.source, cb.source)
        JOIN nb ON nb.source = coalesce(ca.source, cb.source)
    """).df()
    ex = {(r.source, r.tok): (r.rate_a, r.rate_b) for r in exact.itertuples()}

    BIG = 1_000_000
    sa = topk_merge_all(topk_bucket(a, tier="1h", cap=BIG), cap=BIG)
    sb = topk_merge_all(topk_bucket(b, tier="1h", cap=BIG), cap=BIG)
    drift = topk_drift(sa, sb, n=10).toPandas()
    assert len(drift) > 0
    for r in drift.itertuples():
        ra, rb = ex.get((r.source, r.token), (0.0, 0.0))
        assert r.rate_a == pytest.approx(ra, rel=1e-12)
        assert r.rate_b == pytest.approx(rb, rel=1e-12)
        assert r.delta_lo <= r.delta <= r.delta_hi
    top_web = drift[(drift["source"] == "web") & (drift["rank"] == 1)].iloc[0]
    assert top_web["token"] == 77 and top_web["delta"] > 0

    # MG regime: bracket must contain the exact delta
    s8a = topk_merge_all(topk_bucket(a, tier="1h", cap=CAP), cap=CAP)
    s8b = topk_merge_all(topk_bucket(b, tier="1h", cap=CAP), cap=CAP)
    d8 = topk_drift(s8a, s8b, n=None).toPandas()
    assert len(d8) > 0
    for r in d8.itertuples():
        ra, rb = ex.get((r.source, r.token), (0.0, 0.0))
        true_delta = rb - ra
        assert r.delta_lo - 1e-12 <= true_delta <= r.delta_hi + 1e-12, (
            r.source, r.token
        )


def test_topk_drift_raises_on_multi_row_summary(spark, seqs):
    """Contract guard: feeding a multi-bucket tier table (more than one
    summary row per key) to topk_drift must raise loudly instead of
    fanning the scalar join out into duplicated drift rows."""
    from pyspark.errors import SparkRuntimeException

    from timeseriesvectordbpattermatcher_spark.operators.heavyhitters import (
        topk_drift,
        topk_merge_all,
    )

    tier = topk_bucket(seqs, tier="1h", cap=CAP)  # many buckets per key
    ok = topk_merge_all(tier, cap=CAP)
    with pytest.raises(Exception, match="multiple rows"):
        topk_drift(tier, ok).collect()
    with pytest.raises(Exception, match="multiple rows"):
        topk_drift(ok, tier).collect()
    # merged-per-key inputs still work
    assert topk_drift(ok, ok, n=5).count() > 0
