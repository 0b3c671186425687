"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship rollup cascade at sf0.001;
``queries()`` exposes one callable per implemented operator family
(SURVEY.md §2) over the driver's parquet tables; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one (same column names,
values rounded identically on both sides where floats are involved).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Oracle views are pre-registered by the driver: region nation customer
# supplier part orders lineitem events documents embeddings.

_R = 6  # float rounding applied on BOTH sides before the value hash

# Committed golden fixtures (tests/golden/*.parquet) back the oracle for
# queries whose semantics DuckDB can't express relationally (recursive
# kernels, LSH banding, grouped-map simulators). The driver's DuckDB simply
# SELECTs the golden file and hash-compares it against the live Spark run —
# a full rows+schema+values regression gate. Goldens are generated once by
# scripts/make_goldens.py at sf0.01 (the driver's correctness SF) and
# pinned in git; the INDEPENDENT verification of these operators lives in
# pytest (pandas-oracle cross-checks per operator).
import os as _os

_GOLDEN_DIR = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "tests", "golden"
)


def _golden_sql(name: str) -> str:
    path = _os.path.join(_GOLDEN_DIR, f"{name}.parquet")
    if _os.path.isdir(path):  # Spark-written golden (directory of part files)
        path = _os.path.join(path, "*.parquet")
    return f"SELECT * FROM read_parquet('{path}')"


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs_str(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.withColumn("doc_id", F.col("doc_id").cast("string"))


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: raw->1m->1h rollup cascade + locf gap-fill over sf0.001
    events (the engine's north-star spine on the driver's own table)."""
    from timeseriesvectordbpattermatcher_spark.operators.gapfill import gap_fill
    from timeseriesvectordbpattermatcher_spark.operators.rollup import TIER_TRUNC

    ev = _events(spark, "/root/testdata/sf0.001")
    r1m = (
        ev.groupBy("event_type", F.date_trunc("minute", "ts").alias("bucket_ts"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("cnt"))
    )
    filled = gap_fill(r1m, ["cnt", "avg_value"], tier="1m", key_col="event_type", method="locf")
    return filled.select(
        "event_type", "bucket_ts", "cnt", "avg_value", "is_filled",
        "cnt_filled", "avg_value_filled",
    )


# --------------------------------------------------------------------------
# queries — A9/W16 rollups + cascade
# --------------------------------------------------------------------------


def q_rollup_1m(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.col("event_type").alias("source"),
            F.date_trunc("minute", "ts").alias("bucket_ts"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), _R).alias("sum_value"),
            F.round(F.min("value"), _R).alias("min_value"),
            F.round(F.max("value"), _R).alias("max_value"),
        )
    )


SQL_ROLLUP_1M = f"""
SELECT event_type AS source, date_trunc('minute', ts) AS bucket_ts,
       count(*) AS cnt, round(sum(value), {_R}) AS sum_value,
       round(min(value), {_R}) AS min_value, round(max(value), {_R}) AS max_value
FROM events GROUP BY 1, 2
"""


def q_rollup_1h_cascade(spark, sf_dir):
    """1h tier computed FROM the 1m tier (partial->final) — the oracle
    aggregates raw directly; equality proves the cascade exact (A9)."""
    ev = _events(spark, sf_dir)
    r1m = ev.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("minute", "ts").alias("bucket_ts"),
    ).agg(F.count("*").alias("cnt"), F.sum("value").alias("sum_value"))
    return (
        r1m.groupBy("source", F.date_trunc("hour", "bucket_ts").alias("bucket_ts"))
        .agg(
            F.sum("cnt").alias("cnt"),
            # 2 dp: cascade float accumulation order differs from the
            # oracle's direct sum (round-1 ADVICE)
            F.round(F.sum("sum_value"), 2).alias("sum_value"),
        )
    )


SQL_ROLLUP_1H = """
SELECT event_type AS source, date_trunc('hour', ts) AS bucket_ts,
       count(*) AS cnt, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_gapfill_locf(spark, sf_dir):
    """W20/P6: minute spine + locf over the 1m rollup of events."""
    from timeseriesvectordbpattermatcher_spark.operators.gapfill import gap_fill

    ev = _events(spark, sf_dir)
    r1m = (
        ev.groupBy(
            F.col("event_type").alias("source"),
            F.date_trunc("minute", "ts").alias("bucket_ts"),
        )
        .agg(F.count("*").alias("cnt"))
        .withColumn("cnt", F.col("cnt").cast("double"))
    )
    out = gap_fill(r1m, ["cnt"], tier="1m", key_col="source", method="locf")
    return out.select("source", "bucket_ts", "is_filled", F.col("cnt_filled"))


SQL_GAPFILL_LOCF = """
WITH r AS (
  SELECT event_type AS source, date_trunc('minute', ts) AS b, count(*)::DOUBLE AS cnt
  FROM events GROUP BY 1, 2),
bounds AS (SELECT source, min(b) lo, max(b) hi FROM r GROUP BY 1),
spine AS (SELECT source, unnest(generate_series(lo, hi, INTERVAL 1 minute)) AS b FROM bounds),
j AS (SELECT s.source, s.b, r.cnt FROM spine s LEFT JOIN r ON r.source = s.source AND r.b = s.b)
SELECT source, b AS bucket_ts, cnt IS NULL AS is_filled,
       last_value(cnt IGNORE NULLS) OVER (
         PARTITION BY source ORDER BY b ROWS UNBOUNDED PRECEDING) AS cnt_filled
FROM j
"""


# --------------------------------------------------------------------------
# window / ordered operators over events
# --------------------------------------------------------------------------


def q_window_basics(spark, sf_dir):
    """W1/W5/W6 in one per-event pass (single window partitioning):
    5-step forward return, strict 20-row rolling mean, and value crossing
    its own 10-row mean (+1 up / -1 down,
    /root/reference/datalib/patternTraderUtil.py:16-23 semantics)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w20 = w.rowsBetween(-19, 0)
    avg20 = F.when(F.count("value").over(w20) >= 20, F.round(F.avg("value").over(w20), _R))
    ma10 = F.avg("value").over(w.rowsBetween(-9, 0))
    ev2 = ev.withColumn("_d", F.col("value") - ma10).withColumn(
        "_dp", F.lag("_d").over(w)
    )
    sig = F.when(F.col("_d") * F.col("_dp") < 0, F.signum("_d")).otherwise(F.lit(0.0))
    return ev2.select(
        "event_id",
        "event_type",
        # try_divide: a 0-value base yields NULL forward return instead of
        # an ANSI DIVIDE_BY_ZERO (sf0.1 events contain value = 0.0 rows)
        F.round(F.try_divide(F.lead("value", 5).over(w), F.col("value")) - 1, _R).alias("fw_ret_5"),
        avg20.alias("avg20"),
        sig.alias("sig_cross"),
    )


SQL_WINDOW_BASICS = f"""
WITH d AS (
  SELECT event_id, event_type, ts, value,
         value - avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS d
  FROM events),
l AS (SELECT event_id, event_type, ts, value, d,
             lag(d) OVER wo AS dp,
             lead(value, 5) OVER wo AS lead5,
             CASE WHEN count(value) OVER w20 >= 20 THEN avg(value) OVER w20 END AS a20
      FROM d
      WINDOW wo AS (PARTITION BY event_type ORDER BY ts, event_id),
             w20 AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT event_id, event_type,
       round(lead5 / nullif(value, 0) - 1, {_R}) AS fw_ret_5,
       round(a20, {_R}) AS avg20,
       CASE WHEN d * dp < 0 THEN sign(d)::DOUBLE ELSE 0.0 END AS sig_cross
FROM l
"""


def q_sessionize(spark, sf_dir):
    """X16: per-user session ids with a 1-hour gap; output session spans."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("interval 1 hour")), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


SQL_SESSIONIZE = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 1 hour THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
  FROM d)
SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM s GROUP BY 1, 2
"""


def q_topk_per_group(spark, sf_dir):
    """T1/T2: top-5 events by value per event_type (deterministic tiebreak)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("event_type", "rank", "event_id", F.round("value", _R).alias("value"))
    )


SQL_TOPK_PER_GROUP = f"""
SELECT event_type, rank, event_id, round(value, {_R}) AS value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
  FROM events)
WHERE rank <= 5
"""


def q_rank_across_keys(spark, sf_dir):
    """W14: cross-sectional percent rank of users by their total value."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    tot = ev.groupBy("user_id").agg(F.sum("value").alias("total_value"))
    w = Window.orderBy(F.round("total_value", _R), F.asc("user_id"))
    return tot.select(
        "user_id",
        F.round("total_value", _R).alias("total_value"),
        F.round(F.percent_rank().over(w), _R).alias("rs_rank"),
    )


SQL_RANK_ACROSS_KEYS = f"""
WITH t AS (SELECT user_id, round(sum(value), {_R}) AS total_value FROM events GROUP BY 1)
SELECT user_id, total_value,
       round(percent_rank() OVER (ORDER BY total_value, user_id), {_R}) AS rs_rank
FROM t
"""


# --------------------------------------------------------------------------
# joins / aggregations over the TPC-H-ish tables
# --------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """A1/A2 shape (TPC-H Q1): groupwise sums/avgs with a date predicate.

    Sums run over floor(x*1e6 + 0.5)-quantized BIGINT addends: integer
    addition is exact and order-independent, so the result is identical
    across engines and partition counts — double sums of 100k+ rows
    diverge from any serial oracle in the 6th decimal by summation order
    alone (the sf0.1 sweep caught exactly that). The quantization itself
    is pure IEEE double arithmetic (multiply, add, floor), which both
    engines evaluate bit-identically; a decimal(p,6) CAST was tried first
    and rejected — its half-way ties (any double that is an odd multiple
    of 1/128) round HALF_UP in Spark but half-even in DuckDB at large
    magnitudes (987654.0078125 -> .007813 vs .007812)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(q6(F.col("l_quantity"))) / 1e6).alias("sum_qty"),
            (F.sum(q6(F.col("l_extendedprice"))) / 1e6).alias("sum_base_price"),
            (F.sum(q6(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 1e6)
            .alias("sum_disc_price"),
            # avg re-quantized at 1e-6 in the same tie-free double ops
            (F.floor(F.sum(q6(F.col("l_quantity"))) / 1e6 / n * 1e6 + F.lit(0.5)) / 1e6)
            .alias("avg_qty"),
            n.alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       sum(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_qty,
       sum(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_base_price,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6 + 0.5) AS BIGINT)) / 1e6
           AS sum_disc_price,
       floor(sum(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) / 1e6
             / count(*) * 1e6 + 0.5) / 1e6 AS avg_qty,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""


def q_perf_by_year(spark, sf_dir):
    """A1: per-year aggregation + 'all' total row via GROUPING SETS."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o = o.withColumn("yr", F.year("o_orderdate"))
    o.createOrReplaceTempView("_orders_y")
    # floor(x*1e6+0.5)-quantized bigint sums: exact + order-independent
    # across engines, tie-free (see q_pricing_summary) — the 'all' row
    # sums the whole table, where double summation order flips the 6th
    # decimal at sf0.1
    return spark.sql(f"""
        SELECT coalesce(cast(yr as string), 'all') AS year,
               floor(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint)) / 1e6
                     / count(*) * 1e6 + 0.5) / 1e6 AS ret,
               count(*) AS tcnt,
               sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint)) / 1e6 AS total_ret
        FROM _orders_y
        GROUP BY GROUPING SETS ((yr), ())
    """)


SQL_PERF_BY_YEAR = """
SELECT coalesce(cast(year(o_orderdate) as varchar), 'all') AS "year",
       floor(sum(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT)) / 1e6
             / count(*) * 1e6 + 0.5) / 1e6 AS ret,
       count(*) AS tcnt,
       sum(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT)) / 1e6 AS total_ret
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate)), ())
"""


def q_asof_join(spark, sf_dir):
    """J3: first lineitem shipped at/after each order's date — via the
    engine's merge-as-of operator (one window pass over the unioned stream,
    no per-key range-join product; see operators/windows.py:asof_match_exit)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import asof_match_exit

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = asof_match_exit(
        o.select(F.col("o_orderkey").alias("k"), F.col("o_orderdate").alias("entry_ts")),
        li.select(F.col("l_orderkey").alias("k"), F.col("l_shipdate").alias("exit_ts")),
        series_col="k", entry_ts="entry_ts", exit_ts="exit_ts",
    )
    return out.select(
        F.col("k").alias("o_orderkey"),
        F.col("entry_ts").alias("o_orderdate"),
        F.col("matched_exit_ts").alias("first_ship_after"),
    )


SQL_ASOF_JOIN = """
SELECT o_orderkey, o_orderdate, min(l_shipdate) AS first_ship_after
FROM orders LEFT JOIN lineitem
  ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate
GROUP BY 1, 2
"""


def q_price_by_volume(spark, sf_dir):
    """A3: 20-bin price histogram per returnflag; argmax bin = S/R level."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bounds = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("_lo"), F.max("l_extendedprice").alias("_hi")
    )
    binned = (
        li.join(bounds, "l_returnflag")
        .withColumn(
            "bin",
            F.when(
                F.col("_hi") > F.col("_lo"),
                F.least(
                    F.floor((F.col("l_extendedprice") - F.col("_lo")) / ((F.col("_hi") - F.col("_lo")) / 20)),
                    F.lit(19),
                ),
            ).otherwise(F.lit(0)).cast("int"),
        )
        .groupBy("l_returnflag", "bin")
        .agg(F.round(F.sum("l_quantity"), _R).alias("vol"))
    )
    return binned.groupBy("l_returnflag").agg(
        F.max_by("bin", F.struct(F.col("vol"), -F.col("bin"))).alias("snr_bin"),
        F.round(F.max("vol"), _R).alias("snr_vol"),
    )


SQL_PRICE_BY_VOLUME = f"""
WITH bounds AS (
  SELECT l_returnflag, min(l_extendedprice) lo, max(l_extendedprice) hi
  FROM lineitem GROUP BY 1),
binned AS (
  SELECT l.l_returnflag,
         CASE WHEN b.hi > b.lo
              THEN least(floor((l_extendedprice - b.lo) / ((b.hi - b.lo) / 20)), 19)
              ELSE 0 END::INT AS bin,
         round(sum(l_quantity), {_R}) AS vol
  FROM lineitem l JOIN bounds b USING (l_returnflag)
  GROUP BY 1, 2)
SELECT l_returnflag, bin AS snr_bin, vol AS snr_vol FROM (
  SELECT l_returnflag, bin, vol,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY vol DESC, bin ASC) AS rn
  FROM binned)
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# documents: dedup + text analysis
# --------------------------------------------------------------------------


def q_exact_dedup(spark, sf_dir):
    """Dedup-exact: min doc_id per content digest."""
    docs = _docs_str(spark, sf_dir)
    return docs.groupBy(F.md5("text").alias("digest")).agg(
        F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies")
    )


SQL_EXACT_DEDUP = """
SELECT md5(text) AS digest, min(cast(doc_id as varchar)) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_ngram_jaccard(spark, sf_dir):
    """Dedup near-dup: word-3-gram Jaccard pairs >= 0.25."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import ngram_jaccard_pairs

    docs = _docs_str(spark, sf_dir)
    out = ngram_jaccard_pairs(docs, threshold=0.25, n=3)
    return out.select(
        F.col("doc_a"), F.col("doc_b"), F.round("jaccard", _R).alias("jaccard")
    )


SQL_NGRAM_JACCARD = f"""
WITH w AS (SELECT cast(doc_id as varchar) AS doc_id,
                  string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
           FROM documents),
g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ng
      FROM w, UNNEST(range(1, len(ws) - 1)) t(i) WHERE len(ws) >= 3),
sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (sa.sz + sb.sz - inter), {_R}) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.25
"""


def q_text_stats(spark, sf_dir):
    """Text-analysis suite in one per-document plan (pure codegen'd SQL
    exprs, no UDFs): whitespace + BPE-ish token counts, stopword-profile
    language ID, winnowing-lite fingerprint, and the composite quality
    score."""
    from timeseriesvectordbpattermatcher_spark.operators.textstats import (
        add_fingerprint,
        add_lang_id,
        add_quality_score,
        add_token_counts,
    )

    docs = _docs_str(spark, sf_dir)
    out = add_quality_score(add_fingerprint(add_lang_id(add_token_counts(docs))))
    return out.select(
        "doc_id", "n_tokens_ws", "n_tokens_bpe", "lang_pred", "lang_score",
        "fingerprint", "n_words",
        F.round("alpha_ratio", _R).alias("alpha_ratio"),
        F.round("mean_word_len", _R).alias("mean_word_len"),
        F.round("quality", _R).alias("quality"),
    )


SQL_TOKEN_COUNTS = r"""
SELECT cast(doc_id as varchar) AS doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens_ws,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS n_tokens_bpe
FROM documents
"""


def _lang_sql():
    from timeseriesvectordbpattermatcher_spark.operators.textstats import LANG_PROFILES

    score_exprs = []
    for lang, stops in LANG_PROFILES.items():
        lst = ", ".join(f"'{s}'" for s in stops)
        score_exprs.append(
            f"len(list_filter(ws, x -> list_contains([{lst}], x))) AS s_{lang}"
        )
    # argmax with Python-dict insertion order precedence (Spark array_max on
    # (score, lang) structs breaks ties by lang string DESC -> replicate via
    # greatest + CASE ordered by (score, lang) descending)
    return f"""
WITH w AS (SELECT cast(doc_id as varchar) AS doc_id,
                  string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
           FROM documents),
s AS (SELECT doc_id, {', '.join(score_exprs)} FROM w),
r AS (SELECT doc_id,
             [struct_pack(score := s_en, lang := 'en'),
              struct_pack(score := s_de, lang := 'de'),
              struct_pack(score := s_fr, lang := 'fr'),
              struct_pack(score := s_es, lang := 'es')] AS arr
      FROM s),
m AS (SELECT doc_id, list_max(arr) AS best FROM r)
SELECT doc_id,
       CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred,
       best.score AS lang_score
FROM m
"""


SQL_FINGERPRINT = """
WITH w AS (SELECT cast(doc_id as varchar) AS doc_id, lower(text) AS lt,
                  string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
           FROM documents),
g AS (SELECT doc_id, list_transform(range(1, len(ws) - 3),
                                    i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS hs,
             lt
      FROM w)
SELECT doc_id,
       CASE WHEN len(hs) > 0 THEN list_min(hs) ELSE md5(lt) END AS fingerprint
FROM g
"""


# --------------------------------------------------------------------------
# embeddings: similarity search
# --------------------------------------------------------------------------


def q_cosine_topk(spark, sf_dir):
    """Similarity: exact cosine top-3 of the first 5 vectors vs the corpus."""
    from timeseriesvectordbpattermatcher_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    out = brute_force_topk(
        q, emb, k=3, query_id="query_id", query_vec="q_embedding",
        ref_id="vec_id", ref_vec="embedding",
    )
    return out.select("query_id", "rank", "vec_id", F.round("score", _R).alias("score"))


SQL_COSINE_TOPK = f"""
SELECT query_id, rank, vec_id, round(score, {_R}) AS score FROM (
  SELECT q.vec_id AS query_id, r.vec_id,
         list_cosine_similarity(q.embedding::DOUBLE[], r.embedding::DOUBLE[]) AS score,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], r.embedding::DOUBLE[]) DESC,
                                     r.vec_id ASC) AS rank
  FROM embeddings q CROSS JOIN embeddings r WHERE q.vec_id < 5)
WHERE rank <= 3
"""


def q_embedding_dup_pairs(spark, sf_dir):
    """Similarity: exact cosine near-dup pairs (tau = 0.35)."""
    from timeseriesvectordbpattermatcher_spark.operators.similarity import cosine_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < 200)
    out = cosine_dup_pairs(emb, tau=0.35, exact=True)
    return out.select("id_a", "id_b", F.round("score", _R).alias("score"))


SQL_EMBEDDING_DUP_PAIRS = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), {_R}) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 200 AND b.vec_id < 200
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
"""


# --------------------------------------------------------------------------
# non-SQL-expressible operators (rows-only checks): matcher, LSH, codecs
# --------------------------------------------------------------------------


def q_token_segmentation(spark, sf_dir):
    """W11/north star: 64/10 sliding windows + 40-dim features over a
    deterministic synthetic seqs corpus (mapInPandas, no shuffle)."""
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import segment_tokens
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    seqs = synth_seqs(spark, 2000, seed=42)
    return segment_tokens(seqs).select("segment_id", "doc_id", "source", "start_idx", "end_idx")


def q_matcher_pipeline(spark, sf_dir):
    """E2 query path: segment an OHLCV fixture, embed a query window,
    cosine top-k + dedupe + historical filters (J7/P4/P5/T1) — run under
    BOTH physical strategies (broadcast join and the executor-side ref
    store), one strategy-tagged row set each. The two halves of the golden
    are identical except the tag, so the driver's hash-compare doubles as a
    strategy-parity gate (round-2 `matcher_golden_parity` folded in here;
    the `tests/golden/matches.parquet` pin stays in
    tests/test_invariants.py)."""
    from timeseriesvectordbpattermatcher_spark.operators.matcher import match_pipeline
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
        ma_normalize,
        segment_series,
    )
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=6, n_days=900)
    refs = segment_series(ma_normalize(ohlcv))
    qseg = (
        segment_series(ma_normalize(ohlcv.filter("series_id = 'TK00'")))
        .orderBy(F.desc("end_ts"))
        .limit(1)
        .select(
            F.col("segment_id").alias("query_id"),
            F.col("features").alias("q_features"),
            F.to_date("start_ts").alias("query_start"),
        )
    )
    out = None
    for strategy in ("bcast", "join"):
        part = match_pipeline(qseg, refs, strategy=strategy).select(
            F.lit(strategy).alias("strategy"),
            "query_id", "rank", "segment_id",
            F.round("score", _R).alias("score"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def q_ann_recall(spark, sf_dir):
    """Similarity: both approximate-NN paths (hyperplane LSH, IVF coarse
    quantizer) scored against the exact brute-force top-10 — one row per
    (method, query) with its recall and a recall >= 0.9 flag. Deterministic
    (seeded planes / seeded k-means on an ordered sample), golden-pinned
    (fixture regenerated by the engine-free tests/oracle/ann_oracle.py).

    Honesty note on the recorded values: the sf embeddings fixture is
    UNIFORM RANDOM 64-dim vectors — the worst case for a coarse
    quantizer, so IVF at nprobe=4/8 lists records recall 0.6-0.9 here
    (raising nprobe toward n_lists converges to brute force; measured
    0.8-1.0 at nprobe=6). LSH multi-table probing clears >= 0.9 on the
    same fixture. On a CLUSTERABLE corpus both paths clear >= 0.9 at
    default settings — pinned by tests/test_matcher.py::
    test_match_pipeline_lsh_ivf_recall."""
    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    kw = dict(query_id="query_id", query_vec="q_embedding",
              ref_id="vec_id", ref_vec="embedding")
    truth = brute_force_topk(q, emb, k=10, **kw).select(
        "query_id", F.col("vec_id").alias("t_id")
    )
    parts = []
    for method, fn, extra in [
        ("lsh", lsh_topk, dict(n_bits=4, n_tables=16)),
        ("ivf", ivf_topk, dict(n_lists=8, nprobe=4)),
    ]:
        approx = fn(q, emb, k=10, **kw, **extra).select(
            "query_id", F.col("vec_id").alias("a_id")
        )
        hit = truth.join(
            approx,
            (truth.query_id == approx.query_id) & (truth.t_id == approx.a_id),
            "left_semi",
        )
        rec = (
            hit.groupBy("query_id").agg((F.count("*") / 10.0).alias("recall"))
            .withColumn("method", F.lit(method))
            .withColumn("query_id", F.col("query_id").cast("string"))
        )
        parts.append(rec)

    # ---- lsh_e2 (r3 verdict #10): the auto-router's lsh tier scored on the
    # E2 query distribution — segment features from the matcher's own
    # segmentation, the matcher's k=20 and its lsh_topk defaults (8 bits,
    # 4 tables). Recall >= 0.9 on every row is the routing SLA, pinned in
    # the golden (make_goldens asserts it at regeneration time).
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
        ma_normalize,
        segment_series,
    )
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    segs = segment_series(
        ma_normalize(synth_ohlcv(spark, n_tickers=60, n_days=900))
    ).select("segment_id", "features")
    q2 = (
        segs.orderBy("segment_id").limit(5)
        .select(F.col("segment_id").alias("query_id"),
                F.col("features").alias("q_features"))
    )
    kw2 = dict(query_id="query_id", query_vec="q_features",
               ref_id="segment_id", ref_vec="features")
    truth2 = brute_force_topk(q2, segs, k=20, **kw2).select(
        "query_id", F.col("segment_id").alias("t_id")
    )
    approx2 = lsh_topk(q2, segs, k=20, n_bits=8, n_tables=4, **kw2).select(
        "query_id", F.col("segment_id").alias("a_id")
    )
    hit2 = truth2.join(
        approx2,
        (truth2.query_id == approx2.query_id) & (truth2.t_id == approx2.a_id),
        "left_semi",
    )
    parts.append(
        hit2.groupBy("query_id").agg((F.count("*") / 20.0).alias("recall"))
        .withColumn("method", F.lit("lsh_e2"))
    )

    out = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return out.select(
        "method", "query_id", F.round("recall", _R).alias("recall"),
        (F.col("recall") >= 0.9).alias("recall_ok"),
    )


def q_codec_roundtrip(spark, sf_dir):
    """Gorilla XOR + delta-of-delta roundtrip over the events 1m rollup:
    emits (source, n_points, ok) — ok proves decode(encode(x)) == x."""
    from timeseriesvectordbpattermatcher_spark.operators.compression import (
        compress_rollup_segments,
        decompress_segments,
    )

    ev = _events(spark, sf_dir)
    r1m = (
        ev.groupBy(
            F.col("event_type").alias("source"),
            F.date_trunc("minute", "ts").alias("bucket_ts"),
        )
        .agg(F.avg("value").alias("avg_value"))
    )
    segs = compress_rollup_segments(r1m, value_col="avg_value", chunk="1 day")
    sizes = segs.groupBy("source").agg(
        F.sum(F.length("ts_codec") + F.length("val_codec")).alias("compressed_bytes"),
        F.sum(F.col("n_points") * 16).alias("raw_bytes"),  # 8B ts + 8B double
    )
    # floor(v*1e6+0.5)-quantized bigint sums: the roundtrip is bit-exact,
    # so decoded and original values are the same multiset and integer
    # sums match EXACTLY regardless of partition/summation order — a
    # rounded double sum here could flip at a .0005 boundary between runs
    # at different parallelism (same fix as q_pricing_summary)
    q6 = lambda c: F.floor(F.col(c) * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    back = decompress_segments(segs).groupBy("source").agg(
        F.count("*").alias("n_points"),
        F.sum(q6("value")).alias("sum_back"),
    )
    orig = r1m.groupBy("source").agg(
        F.count("*").alias("n_points_orig"),
        F.sum(q6("avg_value")).alias("sum_orig"),
    )
    return back.join(orig, "source").join(sizes, "source").select(
        "source",
        "n_points",
        (F.col("n_points") == F.col("n_points_orig")).alias("count_ok"),
        (F.col("sum_back") == F.col("sum_orig")).alias("sum_ok"),
        "compressed_bytes",
        "raw_bytes",
        # tie-free double quantization, not round(): see q_pricing_summary
        (F.floor(F.col("raw_bytes") / F.col("compressed_bytes") * 100 + F.lit(0.5)) / 100)
        .alias("compression_ratio"),
    )


def _event_bars(spark, sf_dir):
    """Hourly OHLC bars per event_type derived from events.value — gives the
    candle/pattern operators an oracle-checkable input."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.col("event_type").alias("series_id"),
            F.date_trunc("hour", "ts").alias("ts"),
        )
        .agg(
            F.min_by("value", F.struct("ts", "event_id")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.struct("ts", "event_id")).alias("close"),
            F.sum(F.abs("value")).alias("volume"),
        )
    )


_SQL_BARS = """
  WITH _o AS (
    SELECT event_type AS series_id, date_trunc('hour', ts) AS h, value,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events)
  SELECT series_id, h AS ts,
         max(CASE WHEN rn_a = 1 THEN value END) AS open,
         max(value) AS high, min(value) AS low,
         max(CASE WHEN rn_d = 1 THEN value END) AS close,
         sum(abs(value)) AS volume
  FROM _o GROUP BY 1, 2
"""


def q_candle_kernels(spark, sf_dir):
    """W18 over event-derived bars — the FULL ranked kernel set (every
    pattern in the reference's rank table) plus the resolved summary
    columns (match count, score sum, pattern list, min-rank best). The
    oracle is the same kernel spec rendered to standalone ANSI SQL by
    candles.candle_oracle_sql and evaluated independently by DuckDB."""
    from timeseriesvectordbpattermatcher_spark.operators.candles import (
        KERNELS,
        candle_patterns,
    )

    bars = _event_bars(spark, sf_dir)
    out = candle_patterns(bars)
    return out.select(
        "series_id", "ts", *list(KERNELS),
        "candlestick_match_count", "candlestick_pattern_score",
        "candlestick_pattern", "best_pattern",
    )


def _candle_kernels_sql() -> str:
    from timeseriesvectordbpattermatcher_spark.operators.candles import (
        candle_oracle_sql,
    )

    return candle_oracle_sql(_SQL_BARS)


def q_pattern_higher_low(spark, sf_dir):
    """X4 lag-tuple pattern over minima of event-derived bars: 4 strictly
    ascending local minima within 10 days."""
    from pyspark.sql import Window

    bars = _event_bars(spark, sf_dir)
    w5 = Window.partitionBy("series_id").orderBy("ts").rowsBetween(-2, 2)
    minima = (
        bars.withColumn("is_min", F.col("low") == F.min("low").over(w5))
        .filter("is_min")
        .select("series_id", "ts", F.col("low").alias("px"))
    )
    w = Window.partitionBy("series_id").orderBy("ts")
    a, b, c = F.lag("px", 3).over(w), F.lag("px", 2).over(w), F.lag("px", 1).over(w)
    t0 = F.lag("ts", 3).over(w)
    out = (
        minima.withColumn("start_ts", t0)
        .withColumn(
            "_c",
            (a < b) & (b < c) & (c < F.col("px"))
            & t0.isNotNull()
            & (F.col("ts") <= t0 + F.expr("interval 10 days")),
        )
        .filter("_c")
    )
    return out.select(
        "series_id", "start_ts", F.col("ts").alias("end_ts"), F.round("px", _R).alias("px")
    )


SQL_PATTERN_HIGHER_LOW = f"""
WITH bars AS ({_SQL_BARS}),
m AS (
  SELECT series_id, ts, low AS px,
         low = min(low) OVER (PARTITION BY series_id ORDER BY ts
                              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS is_min
  FROM bars),
mm AS (SELECT series_id, ts, px FROM m WHERE is_min),
lagged AS (
  SELECT series_id, ts, px,
         lag(px, 3) OVER w AS a, lag(px, 2) OVER w AS b, lag(px, 1) OVER w AS c,
         lag(ts, 3) OVER w AS t0
  FROM mm WINDOW w AS (PARTITION BY series_id ORDER BY ts))
SELECT series_id, t0 AS start_ts, ts AS end_ts, round(px, {_R}) AS px
FROM lagged
WHERE a < b AND b < c AND c < px AND t0 IS NOT NULL
  AND ts <= t0 + INTERVAL 10 days
"""


def _hhl_fixture_rows():
    """Shared extrema fixture for X3 (same literals feed the Spark frame and
    the oracle's VALUES): the driver's events table is near-iid noise, so
    the joint highs-AND-lows-ascending predicate has no support there —
    this fixture carries 4 genuine patterns ('up'), a >10%-step violation
    ('break'), and a descending series ('down')."""
    import datetime as dt

    rows, t = [], dt.datetime(2024, 1, 1)
    hi, lo = 100.0, 90.0
    for i in range(7):  # 'up': alternating max/min, +5% steps -> 4 hits
        rows.append(("up", t, "max", round(hi, 6))); t += dt.timedelta(days=7)
        rows.append(("up", t, "min", round(lo, 6))); t += dt.timedelta(days=7)
        hi *= 1.05; lo *= 1.05
    t = dt.datetime(2024, 1, 1)
    hi, lo = 100.0, 90.0
    for i in range(7):  # 'break': one +20% jump kills windows containing it
        rows.append(("break", t, "max", round(hi, 6))); t += dt.timedelta(days=7)
        rows.append(("break", t, "min", round(lo, 6))); t += dt.timedelta(days=7)
        step = 1.20 if i == 3 else 1.05
        hi *= step; lo *= step
    t = dt.datetime(2024, 1, 1)
    hi, lo = 100.0, 90.0
    for i in range(7):  # 'down': descending -> 0 hits
        rows.append(("down", t, "max", round(hi, 6))); t += dt.timedelta(days=7)
        rows.append(("down", t, "min", round(lo, 6))); t += dt.timedelta(days=7)
        hi *= 0.95; lo *= 0.95
    return rows


def q_higher_high_low(spark, sf_dir):
    """X3: 7-extrema window split by type — highs AND lows strictly
    ascending with step <= +10%, balanced counts, ending on a 'min'
    (/root/reference/datalib/extremaPatternLooper.py:9-62) — over the
    shared deterministic extrema fixture (see _hhl_fixture_rows)."""
    from timeseriesvectordbpattermatcher_spark.operators.patterns import (
        find_higher_high_low_patterns,
    )

    ex = spark.createDataFrame(
        _hhl_fixture_rows(),
        "series_id string, ts timestamp, minmax_type string, px double",
    )
    out = find_higher_high_low_patterns(ex, max_step=0.10, span_days=100)
    return out.select("series_id", "pattern", "start_ts", "end_ts", "bullbear")


def _hhl_sql() -> str:
    vals = ",\n    ".join(
        f"('{s}', TIMESTAMP '{t:%Y-%m-%d %H:%M:%S}', '{mt}', {px})"
        for s, t, mt, px in _hhl_fixture_rows()
    )
    return f"""
WITH x(series_id, ts, mt, px) AS (VALUES
    {vals}),
w7 AS (""" + _SQL_HHL_TAIL


_SQL_HHL_TAIL = f"""
  SELECT series_id, ts, mt,
         list(struct_pack(t := mt, v := px)) OVER w AS vals,
         min(ts) OVER w AS t0, count(*) OVER w AS cnt
  FROM x WINDOW w AS (PARTITION BY series_id ORDER BY ts
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
hl AS (
  SELECT series_id, ts, mt, t0, cnt,
         list_transform(list_filter(vals, s -> s.t = 'max'), s -> s.v) AS hv,
         list_transform(list_filter(vals, s -> s.t = 'min'), s -> s.v) AS lv
  FROM w7)
SELECT series_id, 'higher_high_low' AS pattern, t0 AS start_ts, ts AS end_ts,
       1 AS bullbear
FROM hl
WHERE cnt = 7 AND len(hv) >= 3 AND len(lv) >= 3 AND abs(len(hv) - len(lv)) <= 2
  AND list_aggregate(list_transform(hv, (xx, i) ->
        i = len(hv) OR (xx < hv[i+1] AND hv[i+1] <= xx * 1.1)), 'bool_and')
  AND list_aggregate(list_transform(lv, (xx, i) ->
        i = len(lv) OR (xx < lv[i+1] AND lv[i+1] <= xx * 1.1)), 'bool_and')
  AND mt = 'min' AND ts <= t0 + INTERVAL 100 days
"""


def q_pbv_obv(spark, sf_dir):
    """A3 OBV variant: per price bin, total / up-move / down-move volume and
    the up-ratio (missing vcplib ``get_price_by_volume_obv_df``; consumers
    /root/reference/datalib/patternTraderUtil.py:310-404,
    extremaPlotter.py:1261-1290)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import (
        price_by_volume_obv,
    )

    bars = _event_bars(spark, sf_dir)
    out = price_by_volume_obv(bars, bin_cnt=10)
    return out.select(
        "series_id", "bin",
        F.round("volume_by_price", 3).alias("volume_by_price"),
        F.round("pbv_up", 3).alias("pbv_up"),
        F.round("pbv_down", 3).alias("pbv_down"),
        F.round("pbv_up_ratio_at_price", _R).alias("pbv_up_ratio_at_price"),
        F.round("bin_px", _R).alias("bin_px"),
    )


SQL_PBV_OBV = f"""
WITH bars AS ({_SQL_BARS}),
u AS (SELECT series_id, ts, close, volume,
             coalesce(close > lag(close) OVER (PARTITION BY series_id ORDER BY ts),
                      FALSE) AS up
      FROM bars),
bounds AS (SELECT series_id, min(close) lo, max(close) hi FROM u GROUP BY 1),
binned AS (
  SELECT u.series_id,
         CASE WHEN b.hi > b.lo
              THEN least(floor((u.close - b.lo) / ((b.hi - b.lo) / 10)), 9)
              ELSE 0 END::INT AS bin,
         sum(u.volume) AS volume_by_price,
         sum(CASE WHEN u.up THEN u.volume ELSE 0.0 END) AS pbv_up,
         avg(u.close) AS bin_px
  FROM u JOIN bounds b USING (series_id)
  GROUP BY 1, 2)
SELECT series_id, bin,
       round(volume_by_price, 3) AS volume_by_price,
       round(pbv_up, 3) AS pbv_up,
       round(volume_by_price - pbv_up, 3) AS pbv_down,
       round(CASE WHEN volume_by_price > 0 THEN pbv_up / volume_by_price
                  ELSE 0.5 END, {_R}) AS pbv_up_ratio_at_price,
       round(bin_px, {_R}) AS bin_px
FROM binned
"""


def q_box_detection(spark, sf_dir):
    """X13 boxes + X8 VCP over the deterministic OHLCV fixture (rows-only:
    ATR is a recursive kernel)."""
    from timeseriesvectordbpattermatcher_spark.operators.boxes import detect_boxes
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=4, n_days=700)
    return detect_boxes(ohlcv)


def q_trend_range(spark, sf_dir):
    """X15 trend-range search over the OHLCV fixture (rows-only)."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.trends import (
        find_trend_range_extended,
    )
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=3, n_days=600)
    anchors = spark.createDataFrame(
        [("TK00", dt.datetime(2019, 6, 3)), ("TK01", dt.datetime(2019, 9, 2))],
        "series_id string, anchor_ts timestamp",
    )
    return find_trend_range_extended(ohlcv, anchors)


# --------------------------------------------------------------------------
# extended coverage: full tier chain, linear gap-fill, json, W3/W6/W7/W9,
# U4/U5, W16/W17, array stats, quality scoring, time travel, A4 cohorts
# --------------------------------------------------------------------------


def q_rollup_1d_cascade(spark, sf_dir):
    """A9 full chain: 1d tier computed FROM 1h FROM 1m (partial->final twice);
    the oracle aggregates raw directly — equality proves both cascade hops."""
    ev = _events(spark, sf_dir)
    r1m = ev.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("minute", "ts").alias("bucket_ts"),
    ).agg(
        F.count("*").alias("cnt"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    r1h = r1m.groupBy("source", F.date_trunc("hour", "bucket_ts").alias("bucket_ts")).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    return (
        r1h.groupBy("source", F.date_trunc("day", "bucket_ts").alias("bucket_ts"))
        .agg(
            F.sum("cnt").alias("cnt"),
            # sums compare at 2 dp: the cascade accumulates in a different
            # order than the oracle's direct aggregation, so 6-dp rounding
            # could flip on a boundary at larger SFs (round-1 ADVICE);
            # min/max are order-independent and stay at 6 dp
            F.round(F.sum("sum_value"), 2).alias("sum_value"),
            F.round(F.min("min_value"), _R).alias("min_value"),
            F.round(F.max("max_value"), _R).alias("max_value"),
        )
    )


SQL_ROLLUP_1D = f"""
SELECT event_type AS source, date_trunc('day', ts) AS bucket_ts,
       count(*) AS cnt, round(sum(value), 2) AS sum_value,
       round(min(value), {_R}) AS min_value, round(max(value), {_R}) AS max_value
FROM events GROUP BY 1, 2
"""


def q_gapfill_linear(spark, sf_dir):
    """W20 linear interpolation: minute spine + time-weighted blend between
    the previous and next observed buckets (locf/bfill at the edges)."""
    from timeseriesvectordbpattermatcher_spark.operators.gapfill import gap_fill

    ev = _events(spark, sf_dir)
    r1m = (
        ev.groupBy(
            F.col("event_type").alias("source"),
            F.date_trunc("minute", "ts").alias("bucket_ts"),
        )
        .agg(F.count("*").alias("cnt"))
        .withColumn("cnt", F.col("cnt").cast("double"))
    )
    out = gap_fill(r1m, ["cnt"], tier="1m", key_col="source", method="linear")
    return out.select(
        "source", "bucket_ts", "is_filled", F.round("cnt_filled", _R).alias("cnt_filled")
    )


SQL_GAPFILL_LINEAR = f"""
WITH r AS (
  SELECT event_type AS source, date_trunc('minute', ts) AS b, count(*)::DOUBLE AS cnt
  FROM events GROUP BY 1, 2),
bounds AS (SELECT source, min(b) lo, max(b) hi FROM r GROUP BY 1),
spine AS (SELECT source, unnest(generate_series(lo, hi, INTERVAL 1 minute)) AS b FROM bounds),
j AS (SELECT s.source, s.b, r.cnt FROM spine s LEFT JOIN r ON r.source = s.source AND r.b = s.b),
f AS (SELECT source, b, cnt,
        last_value(cnt IGNORE NULLS) OVER wp AS pv,
        last_value(CASE WHEN cnt IS NOT NULL THEN epoch(b) END IGNORE NULLS) OVER wp AS pt,
        first_value(cnt IGNORE NULLS) OVER wn AS nv,
        first_value(CASE WHEN cnt IS NOT NULL THEN epoch(b) END IGNORE NULLS) OVER wn AS nt
      FROM j
      WINDOW wp AS (PARTITION BY source ORDER BY b ROWS UNBOUNDED PRECEDING),
             wn AS (PARTITION BY source ORDER BY b
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT source, b AS bucket_ts, cnt IS NULL AS is_filled,
       round(CASE WHEN cnt IS NOT NULL THEN cnt
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * ((epoch(b) - pt) / (nt - pt)) END, {_R}) AS cnt_filled
FROM f
"""


def q_json_props(spark, sf_dir):
    """S10/D11 json doc columns: extract props.$.k per event, aggregate per
    type (Spark get_json_object ~ the reference's sqlite json_extract
    generated columns, /root/reference/datalib/sqliteDocStoreUtil.py:5-17)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), _R).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count(k).alias("n_k"),
    )


SQL_JSON_PROPS = f"""
SELECT event_type,
       round(avg(json_extract_string(props, '$.k')::INT), {_R}) AS avg_k,
       min(json_extract_string(props, '$.k')::INT) AS min_k,
       max(json_extract_string(props, '$.k')::INT) AS max_k,
       count(json_extract_string(props, '$.k')::INT) AS n_k
FROM events GROUP BY 1
"""


def q_rolling_stats(spark, sf_dir):
    """W3/W7/W8/W5/W9-W10 + Bollinger in ONE per-bar pass over the same
    series partitioning (one Exchange): exact rolling quantile (n=15,
    q=0.25), closed-form regression slope (n=20,
    /root/reference/datalib/patternTraderUtil.py:214-218), rolling down-bar
    count (:250-262), 3-row pct_change (extremaPatternUtil.py:141),
    Bollinger(20, 2), and the argrelextrema ±5 min/max tag
    (extremaPatternUtil.py:14-68)."""
    from pyspark.sql import Window

    from timeseriesvectordbpattermatcher_spark.operators.windows import (
        bollinger,
        local_extrema,
        pct_change,
        rolling_count_where,
        rolling_slope,
    )

    bars = _event_bars(spark, sf_dir)
    out = local_extrema(bars, order=5)
    out = bollinger(out, n=20, k=2.0)
    out = rolling_slope(out, "close", 20)
    out = rolling_count_where(out, F.col("close") < F.col("open"), 20, "n_down20")
    out = pct_change(out, "close", 3)
    w = Window.partitionBy("series_id").orderBy("ts").rowsBetween(-14, 0)
    arr = F.sort_array(F.collect_list("close").over(w))
    # pos = (15-1)*0.25 = 3.5 -> x[3] + 0.5*(x[4]-x[3]) (0-based), linear interp
    q25 = F.element_at(arr, 4) + 0.5 * (F.element_at(arr, 5) - F.element_at(arr, 4))
    full15 = F.count("close").over(w) >= 15
    return out.select(
        "series_id", "ts", "minmax_type",
        F.when(full15, F.round(q25, _R)).alias("q25_15"),
        F.round("close_slope20", _R).alias("slope20"),
        "n_down20",
        F.round("close_pct3", _R).alias("pct3"),
        F.round("bb_mid", _R).alias("bb_mid"),
        F.round("bb_up", _R).alias("bb_up"),
        F.round("bb_dn", _R).alias("bb_dn"),
    )


SQL_ROLLING_STATS = f"""
WITH bars AS ({_SQL_BARS}),
s AS (SELECT series_id, ts, open, high, low, close,
             row_number() OVER wo AS rn
      FROM bars WINDOW wo AS (PARTITION BY series_id ORDER BY ts)),
agg AS (
  SELECT series_id, ts,
         CASE WHEN high = max(high) OVER we THEN 'max'
              WHEN low = min(low) OVER we THEN 'min' ELSE 'na' END AS minmax_type,
         CASE WHEN count(close) OVER w15 >= 15
              THEN quantile_cont(close, 0.25) OVER w15 END AS q25,
         count(close) OVER w20 AS cnt20,
         sum(close) OVER w20 AS sy, sum(rn) OVER w20 AS si,
         sum(rn * close) OVER w20 AS siy, sum(rn * rn) OVER w20 AS si2,
         sum(CASE WHEN close < open THEN 1 ELSE 0 END) OVER w20 AS n_down20,
         lag(close, 3) OVER wo AS c3, close,
         avg(close) OVER w20 AS mid, stddev_samp(close) OVER w20 AS sd
  FROM s
  WINDOW wo AS (PARTITION BY series_id ORDER BY ts),
         we AS (PARTITION BY series_id ORDER BY ts
                ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING),
         w15 AS (PARTITION BY series_id ORDER BY ts
                 ROWS BETWEEN 14 PRECEDING AND CURRENT ROW),
         w20 AS (PARTITION BY series_id ORDER BY ts
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT series_id, ts, minmax_type,
       round(q25, {_R}) AS q25_15,
       CASE WHEN cnt20 >= 20
            THEN round((cnt20 * siy - si * sy) / (cnt20 * si2 - si * si), {_R})
       END AS slope20,
       n_down20::BIGINT AS n_down20,
       round(close / c3 - 1, {_R}) AS pct3,
       CASE WHEN cnt20 >= 20 THEN round(mid, {_R}) END AS bb_mid,
       CASE WHEN cnt20 >= 20 THEN round(mid + 2 * sd, {_R}) END AS bb_up,
       CASE WHEN cnt20 >= 20 THEN round(mid - 2 * sd, {_R}) END AS bb_dn
FROM agg
"""


def q_interval_overlap(spark, sf_dir):
    """U4: overlap-prune the higher-low pattern intervals — keep intervals
    starting at/after the running max end of all preceding ones
    (/root/reference/datalib/extremaPatternUtil.py:340-366)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import (
        remove_overlapping_intervals,
    )

    pats = q_pattern_higher_low(spark, sf_dir).drop("px")
    return remove_overlapping_intervals(pats)


SQL_INTERVAL_OVERLAP = f"""
WITH RECURSIVE pats AS (
  SELECT series_id, start_ts, end_ts,
         row_number() OVER (PARTITION BY series_id ORDER BY start_ts, end_ts) AS rn
  FROM (SELECT series_id, start_ts, end_ts FROM ({SQL_PATTERN_HIGHER_LOW}))),
walk AS (
  -- frontier = end of the last KEPT interval (reference keep-rule; a plain
  -- preceding-rows running max would wrongly let DROPPED intervals block)
  SELECT series_id, rn, start_ts, end_ts, end_ts AS frontier, TRUE AS kept
  FROM pats WHERE rn = 1
  UNION ALL
  SELECT p.series_id, p.rn, p.start_ts, p.end_ts,
         CASE WHEN p.start_ts >= w.frontier THEN p.end_ts ELSE w.frontier END,
         p.start_ts >= w.frontier
  FROM pats p JOIN walk w ON p.series_id = w.series_id AND p.rn = w.rn + 1)
SELECT series_id, start_ts, end_ts FROM walk WHERE kept
"""


def q_min_spacing(spark, sf_dir):
    """U5: drop local minima closer than 6h to the PREVIOUS ROW (the
    reference's previous-row quirk, /root/reference/datalib/extremaPlotter.py:523-531)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import min_spacing_dedupe

    bars = _event_bars(spark, sf_dir)
    from pyspark.sql import Window

    w5 = Window.partitionBy("series_id").orderBy("ts").rowsBetween(-2, 2)
    minima = (
        bars.withColumn("is_min", F.col("low") == F.min("low").over(w5))
        .filter("is_min")
        .select("series_id", "ts")
    )
    return min_spacing_dedupe(minima, min_gap="interval 6 hours")


SQL_MIN_SPACING = f"""
WITH bars AS ({_SQL_BARS}),
m AS (
  SELECT series_id, ts,
         low = min(low) OVER (PARTITION BY series_id ORDER BY ts
                              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS is_min
  FROM bars),
mm AS (SELECT series_id, ts FROM m WHERE is_min),
l AS (SELECT series_id, ts,
             lag(ts) OVER (PARTITION BY series_id ORDER BY ts) AS pts
      FROM mm)
SELECT series_id, ts FROM l WHERE pts IS NULL OR ts >= pts + INTERVAL 6 hours
"""


def q_resample_3d(spark, sf_dir):
    """W16 downsample: hourly bars -> 3-day OHLCV (first/max/min/last/sum) —
    the missing vcplib resample_df semantics
    (/root/reference/datalib/extremaPatternUtil.py:186-188 consumers)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import resample_ohlcv

    bars = _event_bars(spark, sf_dir)
    out = resample_ohlcv(bars, rule="3 days")
    return out.select(
        "series_id", "bucket_ts",
        F.round("open", _R).alias("open"), F.round("high", _R).alias("high"),
        F.round("low", _R).alias("low"), F.round("close", _R).alias("close"),
        F.round("volume", 3).alias("volume"),
    )


SQL_RESAMPLE_3D = f"""
WITH bars AS ({_SQL_BARS}),
b3 AS (SELECT *, time_bucket(INTERVAL 3 days, ts, TIMESTAMP '1970-01-01') AS bucket_ts
       FROM bars),
r AS (SELECT series_id, bucket_ts, ts, open, high, low, close, volume,
             row_number() OVER (PARTITION BY series_id, bucket_ts ORDER BY ts) AS rn_a,
             row_number() OVER (PARTITION BY series_id, bucket_ts ORDER BY ts DESC) AS rn_d
      FROM b3)
SELECT series_id, bucket_ts,
       round(max(CASE WHEN rn_a = 1 THEN open END), {_R}) AS open,
       round(max(high), {_R}) AS high, round(min(low), {_R}) AS low,
       round(max(CASE WHEN rn_d = 1 THEN close END), {_R}) AS close,
       round(sum(volume), 3) AS volume
FROM r GROUP BY 1, 2
"""


def q_ta_indicators(spark, sf_dir):
    """W17 full aux-indicator block — OBV, AD, MFI(14), RSI(14),
    MACD(12,26,9), ADOSC(3,10) appended to event-derived bars in one plan:
    the six series the reference's divergence screener builds per ticker
    (/root/reference/datalib/extremaPatternUtil.py:400-421). OBV/AD/MFI are
    window exprs; RSI/MACD/ADOSC are one grouped-map EMA pass. The oracle
    reproduces the EMA recursion bit-for-bit via DuckDB list_reduce over
    windowed lists (same fold ``acc + a*(x-acc)``)."""
    from timeseriesvectordbpattermatcher_spark.operators.indicators import ta_indicators

    bars = _event_bars(spark, sf_dir)
    out = ta_indicators(bars)
    return out.select(
        "series_id", "ts",
        F.round("obv", 3).alias("obv"),
        F.round("ad", 3).alias("ad"),
        F.round("mfi", _R).alias("mfi"),
        F.round("rsi", _R).alias("rsi"),
        F.round("macd", _R).alias("macd"),
        F.round("macd_signal", _R).alias("macd_signal"),
        F.round("adosc", 3).alias("adosc"),
    )


SQL_TA_INDICATORS = f"""
WITH bars AS ({_SQL_BARS}),
base AS (
  SELECT series_id, ts, high, low, close, volume,
         lag(close) OVER wo AS pc,
         (high + low + close) / 3.0 AS tp,
         lag((high + low + close) / 3.0) OVER wo AS ptp,
         CASE WHEN high > low
              THEN ((close - low) - (high - close)) / (high - low) * volume
              ELSE 0.0 END AS mfv
  FROM bars WINDOW wo AS (PARTITION BY series_id ORDER BY ts)),
obv_ad AS (
  SELECT series_id, ts, close,
         sum(coalesce(sign(close - pc) * volume, 0)) OVER wc AS obv,
         sum(mfv) OVER wc AS ad,
         CASE WHEN ptp IS NULL THEN NULL
              WHEN tp > ptp THEN tp * volume ELSE 0.0 END AS posf,
         CASE WHEN ptp IS NULL THEN NULL
              WHEN tp < ptp THEN tp * volume ELSE 0.0 END AS negf,
         CASE WHEN ptp IS NULL THEN NULL ELSE greatest(close - pc, 0.0) END AS gain,
         CASE WHEN ptp IS NULL THEN NULL ELSE greatest(pc - close, 0.0) END AS loss
  FROM base
  WINDOW wc AS (PARTITION BY series_id ORDER BY ts ROWS UNBOUNDED PRECEDING)),
mfi_c AS (
  SELECT series_id, ts,
         CASE WHEN count(posf) OVER w14 >= 14 THEN
           CASE WHEN sum(coalesce(posf, 0)) OVER w14 + sum(coalesce(negf, 0)) OVER w14 > 0
                THEN 100.0 * sum(coalesce(posf, 0)) OVER w14
                     / (sum(coalesce(posf, 0)) OVER w14 + sum(coalesce(negf, 0)) OVER w14)
                ELSE 50.0 END
         END AS mfi
  FROM obv_ad
  WINDOW w14 AS (PARTITION BY series_id ORDER BY ts
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
rsi_f AS (
  SELECT series_id, ts,
         count(*) OVER wc AS ng,
         list_reduce(list(gain) OVER wc, (a, x) -> a + (1.0/14.0) * (x - a)) AS ag,
         list_reduce(list(loss) OVER wc, (a, x) -> a + (1.0/14.0) * (x - a)) AS al
  FROM obv_ad WHERE gain IS NOT NULL
  WINDOW wc AS (PARTITION BY series_id ORDER BY ts ROWS UNBOUNDED PRECEDING)),
macd_c AS (
  SELECT series_id, ts, obv, ad,
         list_reduce(list(close) OVER wc, (a, x) -> a + (2.0/13.0) * (x - a))
         - list_reduce(list(close) OVER wc, (a, x) -> a + (2.0/27.0) * (x - a)) AS macd,
         list_reduce(list(ad) OVER wc, (a, x) -> a + (2.0/4.0) * (x - a))
         - list_reduce(list(ad) OVER wc, (a, x) -> a + (2.0/11.0) * (x - a)) AS adosc
  FROM obv_ad
  WINDOW wc AS (PARTITION BY series_id ORDER BY ts ROWS UNBOUNDED PRECEDING)),
sig_c AS (
  SELECT series_id, ts, obv, ad, macd, adosc,
         list_reduce(list(macd) OVER wc, (a, x) -> a + (2.0/10.0) * (x - a)) AS macd_signal
  FROM macd_c
  WINDOW wc AS (PARTITION BY series_id ORDER BY ts ROWS UNBOUNDED PRECEDING))
SELECT s.series_id, s.ts,
       round(s.obv, 3) AS obv,
       round(s.ad, 3) AS ad,
       round(m.mfi, {_R}) AS mfi,
       CASE WHEN r.ng >= 14 THEN
         round(CASE WHEN r.ag + r.al > 0 THEN 100.0 * r.ag / (r.ag + r.al)
                    ELSE 50.0 END, {_R})
       END AS rsi,
       round(s.macd, {_R}) AS macd,
       round(s.macd_signal, {_R}) AS macd_signal,
       round(s.adosc, 3) AS adosc
FROM sig_c s
JOIN mfi_c m ON m.series_id = s.series_id AND m.ts = s.ts
LEFT JOIN rsi_f r ON r.series_id = s.series_id AND r.ts = s.ts
"""


def q_array_stats(spark, sf_dir):
    """Token-level array stats (A9 analog on the driver's array table):
    min/max/sum over each embedding array via JVM higher-order functions
    (F.array_min/array_max/F.aggregate — no UDF)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    s = F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_min("embedding").cast("double"), _R).alias("arr_min"),
        F.round(F.array_max("embedding").cast("double"), _R).alias("arr_max"),
        F.round(s, 4).alias("arr_sum"),
    )


SQL_ARRAY_STATS = f"""
SELECT vec_id, len(embedding) AS dim,
       round(list_min(embedding)::DOUBLE, {_R}) AS arr_min,
       round(list_max(embedding)::DOUBLE, {_R}) AS arr_max,
       round(list_aggregate(embedding::DOUBLE[], 'sum'), 4) AS arr_sum
FROM embeddings
"""


def q_retention_expiry(spark, sf_dir):
    """§2.10 retention + vacuum as a contract query (r3 verdict #9): build a
    (event_type, day)-partitioned snapshot table from the events stream,
    expire fine partitions past a 10-day horizon GUARDED by the coarser
    tier's absorbed-through watermark (set 15 days back here, so the
    absorption guard binds tighter than age — cutoff = absorbed+1 day),
    vacuum the unreferenced data files with no age guard (no live writer),
    and return the surviving per-partition aggregates. The DuckDB oracle
    recomputes survivors directly: day >= max(day) - 14 days.

    The reference has no retention concept (commonUtil.py:166-170 memoizes
    files forever); this is the maintenance path that keeps a 10^12-row
    corpus storable, previously pytest-only."""
    import datetime as dt
    import os
    import tempfile

    from timeseriesvectordbpattermatcher_spark.operators.retention import (
        expire_partitions,
        vacuum,
    )
    from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), _R).alias("val_sum"),
    )
    table = SnapshotTable(tempfile.mkdtemp(prefix="retention_q_"))
    table.overwrite_partitions(daily, ["event_type", "day"], run_id="retq_v1")
    as_of = daily.agg(F.max("day")).collect()[0][0]
    dropped = expire_partitions(
        table,
        horizon_days=10,
        as_of=as_of,
        run_id="retq_expire",
        absorbed_through=as_of - dt.timedelta(days=15),
    )
    n_removed = vacuum(table, min_age_secs=0)
    # invariant, not a result column: every dropped partition's files are
    # physically gone, and at least one file per dropped key was removed
    assert n_removed >= len(dropped) > 0, (n_removed, dropped)
    out = table.read(spark)
    # day as an ISO string: the snapshot table stores partition values as
    # strings, and DuckDB's date arithmetic re-types DATE columns — strings
    # hash identically on both sides of the driver compare
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cnt",
        "val_sum",
    )


SQL_RETENTION_EXPIRY = f"""
WITH d AS (
  SELECT event_type, cast(ts AS date) AS day, count(*) AS cnt,
         round(sum(value), {_R}) AS val_sum
  FROM events GROUP BY 1, 2
), mx AS (SELECT max(day) AS as_of FROM d)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt, val_sum
FROM d, mx
WHERE day >= as_of - INTERVAL 14 DAY
"""


SQL_QUALITY_SCORE = f"""
WITH w AS (
  SELECT cast(doc_id as varchar) AS doc_id, text, len(text) AS n_chars,
         CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN [] ELSE string_split_regex(
                trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')
         END AS ws
  FROM documents),
m AS (
  SELECT doc_id, n_chars, len(ws) AS n_words,
         len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
           / greatest(n_chars, 1) AS alpha_ratio,
         len(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) * 1.0
           / greatest(n_chars, 1) AS punct_ratio,
         CASE WHEN len(ws) > 0
              THEN list_sum(list_transform(ws, x -> len(x))) * 1.0 / len(ws)
              ELSE 0.0 END AS mean_word_len
  FROM w),
s AS (
  SELECT doc_id, n_words, alpha_ratio, mean_word_len,
         least(n_chars / 500.0, 1.0) AS len_score,
         CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 1.0 ELSE 0.5 END AS wl,
         CASE WHEN punct_ratio <= 0.1 THEN 1.0 ELSE 0.5 END AS ps,
         CASE WHEN n_words < 5 THEN 0.5 ELSE 1.0 END AS sp
  FROM m)
SELECT doc_id, n_words, round(alpha_ratio, {_R}) AS alpha_ratio,
       round(mean_word_len, {_R}) AS mean_word_len,
       round(sp * (len_score + alpha_ratio + wl + ps) / 4.0, {_R}) AS quality
FROM s
"""


def _text_stats_sql() -> str:
    """Oracle for q_text_stats: the four per-doc component queries joined
    on doc_id (each component keeps its own WITH block as a nested CTE)."""
    return f"""
WITH tok AS ({SQL_TOKEN_COUNTS}),
lang AS ({_lang_sql()}),
fp AS ({SQL_FINGERPRINT}),
q AS ({SQL_QUALITY_SCORE})
SELECT tok.doc_id, tok.n_tokens_ws, tok.n_tokens_bpe,
       lang.lang_pred, lang.lang_score, fp.fingerprint,
       q.n_words, q.alpha_ratio, q.mean_word_len, q.quality
FROM tok
JOIN lang ON lang.doc_id = tok.doc_id
JOIN fp ON fp.doc_id = tok.doc_id
JOIN q ON q.doc_id = tok.doc_id
"""


def q_time_travel(spark, sf_dir):
    """P3 time travel: rows <= as-of date, last 3 per user — the reference's
    df.loc[:end].iloc[-64:] (/root/reference/opkatsPatternMatcherUtil.py:29-30)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import time_travel_last_n

    ev = _events(spark, sf_dir)
    out = time_travel_last_n(
        ev, "2024-01-15 00:00:00", n=3, series_col="user_id", ts_col="ts"
    )
    return out.select("user_id", "event_id", "ts")


SQL_TIME_TRAVEL = """
SELECT user_id, event_id, ts FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
WHERE rn <= 3
"""


def q_ttest_cohorts(spark, sf_dir):
    """A4 flag-cohort comparison: mean/std/count of value per parity cohort
    + Welch t-stat per event_type
    (/root/reference/datalib/patternTraderUtil.py:717-735)."""
    ev = _events(spark, sf_dir)
    one = (F.col("user_id") % 2 == 0)
    # single conditional-aggregation pass (one shuffle, mirrors the oracle's
    # FILTER clauses) — an empty cohort yields NULL stats on BOTH sides
    # instead of dropping the event_type row (round-1 ADVICE)
    g = ev.groupBy("event_type").agg(
        F.count(F.when(one, 1)).alias("n1"),
        F.count(F.when(~one, 1)).alias("n0"),
        F.avg(F.when(one, F.col("value"))).alias("m1"),
        F.avg(F.when(~one, F.col("value"))).alias("m0"),
        F.stddev_samp(F.when(one, F.col("value"))).alias("s1"),
        F.stddev_samp(F.when(~one, F.col("value"))).alias("s0"),
    )
    t = (F.col("m1") - F.col("m0")) / F.sqrt(
        F.col("s1") ** 2 / F.col("n1") + F.col("s0") ** 2 / F.col("n0")
    )
    return g.select(
        "event_type", "n1", "n0",
        F.round("m1", _R).alias("m1"), F.round("m0", _R).alias("m0"),
        F.round(t, 4).alias("t_stat"),
    )


SQL_TTEST_COHORTS = f"""
WITH g AS (
  SELECT event_type,
         count(*) FILTER (user_id % 2 = 0) AS n1,
         count(*) FILTER (user_id % 2 <> 0) AS n0,
         avg(value) FILTER (user_id % 2 = 0) AS m1,
         avg(value) FILTER (user_id % 2 <> 0) AS m0,
         stddev_samp(value) FILTER (user_id % 2 = 0) AS s1,
         stddev_samp(value) FILTER (user_id % 2 <> 0) AS s0
  FROM events GROUP BY 1)
SELECT event_type, n1, n0, round(m1, {_R}) AS m1, round(m0, {_R}) AS m0,
       round((m1 - m0) / sqrt(s1 * s1 / n1 + s0 * s0 / n0), 4) AS t_stat
FROM g
"""


def q_hs_patterns(spark, sf_dir):
    """X1/X2 lag-tuple state machines over event-bar extrema: inverse
    head-and-shoulders + head-and-shoulders, 5-point predicates with span
    guard (/root/reference/datalib/extremaPatternLooper.py:137-201)."""
    from timeseriesvectordbpattermatcher_spark.operators.patterns import (
        find_hs_patterns,
        find_ihs_patterns,
    )
    from timeseriesvectordbpattermatcher_spark.operators.windows import local_extrema

    bars = _event_bars(spark, sf_dir)
    ex = (
        local_extrema(bars, order=5)
        .filter("minmax_type != 'na'")
        .withColumn(
            "px",
            F.when(F.col("minmax_type") == "max", F.col("high")).otherwise(F.col("low")),
        )
    )
    return find_ihs_patterns(ex).unionByName(find_hs_patterns(ex))


SQL_HS_PATTERNS = f"""
WITH bars AS ({_SQL_BARS}),
e AS (
  SELECT series_id, ts, high, low,
         CASE WHEN high = max(high) OVER w THEN 'max'
              WHEN low = min(low) OVER w THEN 'min' ELSE 'na' END AS mt
  FROM bars WINDOW w AS (PARTITION BY series_id ORDER BY ts
                         ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)),
x AS (SELECT series_id, ts, mt,
             CASE WHEN mt = 'max' THEN high ELSE low END AS px
      FROM e WHERE mt <> 'na'),
l AS (SELECT series_id, ts, px,
             lag(px, 4) OVER w AS a, lag(px, 3) OVER w AS b,
             lag(px, 2) OVER w AS c, lag(px, 1) OVER w AS d, px AS e2,
             lag(mt, 2) OVER w AS tc, lag(ts, 4) OVER w AS t0
      FROM x WINDOW w AS (PARTITION BY series_id ORDER BY ts))
SELECT series_id, 'ihs' AS pattern, t0 AS start_ts, ts AS end_ts, 1 AS bullbear
FROM l
WHERE a < b AND c < a AND c < e2 AND c < d AND e2 < d
  AND abs(b - d) <= 0.02 * (b + d) / 2
  AND abs(b - c) >= 0.03 * (b + c) / 2
  AND tc = 'min' AND t0 IS NOT NULL AND ts <= t0 + INTERVAL 150 days
UNION ALL
SELECT series_id, 'hs' AS pattern, t0 AS start_ts, ts AS end_ts, -1 AS bullbear
FROM l
WHERE a > b AND c > a AND c > e2 AND c > d AND e2 > d AND d < b
  AND tc = 'max'
  AND abs(b - c) >= 0.03 * (b + c) / 2
  AND NOT (abs(a - b) <= 0.02 * (b + d) / 2)
  AND NOT (abs(d - e2) <= 0.02 * e2)
  AND t0 IS NOT NULL AND ts <= t0 + INTERVAL 150 days
"""


def q_box_bands(spark, sf_dir):
    """X13 band machinery / W2 shifted frames: 10-bar rolling max/min of low
    plus the same bands shifted back one row (the reference's
    ``rolling(n).max().shift(1)``, /root/reference/datalib/extremaPlotter.py:568-573),
    PLUS the fib retracement/extension levels off rolling close extrema
    (/root/reference/datalib/patternReviewUtil.py:25-46 via
    operators/trends.fib_levels — folded here to stay inside the driver's
    50-query cap; both are the same rolling-extrema band machinery)."""
    from timeseriesvectordbpattermatcher_spark.operators.trends import fib_levels
    from timeseriesvectordbpattermatcher_spark.operators.windows import rolling

    bars = _event_bars(spark, sf_dir)
    out = rolling(bars, "low", 10, "max", out="ub10")
    out = rolling(out, "low", 10, "min", out="lb10")
    out = rolling(out, "low", 10, "max", out="u1b10", shift=1)
    out = rolling(out, "low", 10, "min", out="l1b10", shift=1)
    out = fib_levels(out, col="close", minmax_bars=5)
    return out.select(
        "series_id", "ts",
        F.round("ub10", _R).alias("ub10"), F.round("lb10", _R).alias("lb10"),
        F.round("u1b10", _R).alias("u1b10"), F.round("l1b10", _R).alias("l1b10"),
        F.round("fib_min", _R).alias("fib_min"),
        F.round("fib_max", _R).alias("fib_max"),
        F.round("l2", _R).alias("fib_l2"), F.round("l4", _R).alias("fib_l4"),
        F.round("ul1", _R).alias("fib_ul1"), F.round("dl1", _R).alias("fib_dl1"),
    )


SQL_BOX_BANDS = f"""
WITH bars AS ({_SQL_BARS}),
ext AS (
  SELECT series_id, ts, low, close,
         CASE WHEN close = min(close) OVER we THEN close END AS _min_mark,
         CASE WHEN close = max(close) OVER we THEN close END AS _max_mark
  FROM bars
  WINDOW we AS (PARTITION BY series_id ORDER BY ts
                ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)),
ff AS (
  SELECT series_id, ts, low,
         last_value(_min_mark IGNORE NULLS) OVER wl AS fib_min,
         last_value(_max_mark IGNORE NULLS) OVER wl AS fib_max
  FROM ext
  WINDOW wl AS (PARTITION BY series_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT series_id, ts,
       CASE WHEN count(low) OVER w0 >= 10 THEN round(max(low) OVER w0, {_R}) END AS ub10,
       CASE WHEN count(low) OVER w0 >= 10 THEN round(min(low) OVER w0, {_R}) END AS lb10,
       CASE WHEN count(low) OVER w1 >= 10 THEN round(max(low) OVER w1, {_R}) END AS u1b10,
       CASE WHEN count(low) OVER w1 >= 10 THEN round(min(low) OVER w1, {_R}) END AS l1b10,
       round(fib_min, {_R}) AS fib_min,
       round(fib_max, {_R}) AS fib_max,
       round(fib_max - (fib_max - fib_min) * 0.382, {_R}) AS fib_l2,
       round(fib_max - (fib_max - fib_min) * 0.618, {_R}) AS fib_l4,
       round(fib_max + (fib_max - fib_min) * 0.236, {_R}) AS fib_ul1,
       round(fib_min - (fib_max - fib_min) * 0.236, {_R}) AS fib_dl1
FROM ff
WINDOW w0 AS (PARTITION BY series_id ORDER BY ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
       w1 AS (PARTITION BY series_id ORDER BY ts ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
"""


def q_flag_debounce(spark, sf_dir):
    """W13 flag debounce: boolean up-bar flag smoothed with a 5-row rolling
    max (/root/reference/datalib/patternTraderUtil.py:63,78 — flags held
    high for k rows after firing)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import rolling

    bars = _event_bars(spark, sf_dir).withColumn(
        "f_up", (F.col("close") > F.col("open")).cast("double")
    )
    out = rolling(bars, "f_up", 5, "max", out="f_up_held", strict=False)
    return out.select("series_id", "ts", "f_up", "f_up_held")


SQL_FLAG_DEBOUNCE = f"""
WITH bars AS ({_SQL_BARS})
SELECT series_id, ts,
       (close > open)::INT::DOUBLE AS f_up,
       max((close > open)::INT::DOUBLE)
         OVER (PARTITION BY series_id ORDER BY ts
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS f_up_held
FROM bars
"""


def q_box_forecast(spark, sf_dir):
    """X13 forecast mode + buy/sell rule evaluation
    (/root/reference/datalib/extremaPlotter.py:85-120 forecast boxes,
    :353-402 suggest/strong buy-sell) over event-derived bars. Every bar
    yields a box (detected 'box_breakout' or 10-bar 'forecast' fallback);
    the four rule flags are evaluated on box-details inputs derived from
    the same bars (volume bias vs 10-bar mean, box_score on the reference's
    ~points scale, 20-bar relative strength, price-above-box-midline SNR,
    bar-count duration). ATR is excluded from the projection — its Wilder
    recursion is independently oracled in ta_indicators."""
    from pyspark.sql import Window

    from timeseriesvectordbpattermatcher_spark.operators.boxes import (
        box_buy_sell_signals,
        detect_boxes_forecast,
    )

    bars = _event_bars(spark, sf_dir)
    # rule-input window columns are computed BEFORE detect_boxes_forecast:
    # its ATR grouped-map reports unknown output partitioning, so any window
    # AFTER it would force a second series-key Exchange (pinned by
    # tests/test_plans.py::test_box_forecast_single_exchange). Everything
    # after the grouped map is a pure row expression.
    w = Window.partitionBy("series_id").orderBy("ts")
    pre = (
        bars.withColumn(
            "recent_vol_bias_plus",
            F.round(
                F.col("volume")
                - F.avg("volume").over(w.rowsBetween(-9, 0)),
                _R,
            ),
        )
        .withColumn(
            "rs_plus",
            F.coalesce(F.col("close") > F.lag("close", 20).over(w), F.lit(False)),
        )
        .withColumn("duration", F.row_number().over(w))
    )
    fc = detect_boxes_forecast(
        pre,
        extra_cols=("close", "recent_vol_bias_plus", "rs_plus", "duration"),
    )
    det = fc.withColumn("score", F.col("box_score") * 10).withColumn(
        "snr_mid_plus",
        F.col("close") > (F.col("box_ub") + F.col("box_lb")) / 2,
    )
    out = box_buy_sell_signals(det)
    # box_score is a sum of the reference's 0.1001 / 0.1000001 marker
    # constants, which lands EXACTLY on decimal round-half boundaries at
    # 1e-6 (e.g. 0.1001 + 5*0.1000001 - 1 = -0.3998995) — emit it as an
    # exact integer at 1e-7 scale instead of a rounded double.
    return out.select(
        "series_id", "ts", "signame",
        F.round("box_ub", _R).alias("box_ub"),
        F.round("box_lb", _R).alias("box_lb"),
        F.round(F.col("box_score") * 1e7, 0).cast("long").alias("box_score_e7"),
        "ub_near_cnt", "lb_near_cnt",
        "suggest_buy", "strong_buy", "suggest_sell", "strong_sell",
    )


def _box_forecast_sql() -> str:
    """Render the forecast-box + buy/sell-rule semantics as standalone ANSI
    SQL for DuckDB (same approach as candle_oracle_sql: the spec — combo
    lists, loop order, constants — is shared; the evaluation engine is
    not). Score terms are emitted in the engine's exact fold order so the
    float sums are bit-identical."""
    from timeseriesvectordbpattermatcher_spark.operators.boxes import (
        DELTA_TH,
        LB_N1,
        UB_N1,
        UB_N2,
    )

    ub_combos = [(n2, n1) for n2 in UB_N2 for n1 in UB_N1 if n1 > n2]
    lb_combos = [(n2, n1) for n2 in UB_N2 for n1 in LB_N1 if n1 > n2]
    band_ns = sorted({n for c in (ub_combos, lb_combos) for pair in c for n in pair})

    band_cols, windows = [], []
    for n in band_ns:
        windows.append(
            f"w{n}_0 AS (PARTITION BY series_id ORDER BY ts "
            f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)"
        )
        windows.append(
            f"w{n}_1 AS (PARTITION BY series_id ORDER BY ts "
            f"ROWS BETWEEN {n} PRECEDING AND 1 PRECEDING)"
        )
        band_cols.append(
            f"CASE WHEN count(low) OVER w{n}_0 >= {n} "
            f"THEN max(low) OVER w{n}_0 END AS ub{n}"
        )
        band_cols.append(
            f"CASE WHEN count(low) OVER w{n}_0 >= {n} "
            f"THEN min(low) OVER w{n}_0 END AS lb{n}"
        )
        band_cols.append(
            f"CASE WHEN count(low) OVER w{n}_1 >= {n} "
            f"THEN max(low) OVER w{n}_1 END AS u1b{n}"
        )
        band_cols.append(
            f"CASE WHEN count(low) OVER w{n}_1 >= {n} "
            f"THEN min(low) OVER w{n}_1 END AS l1b{n}"
        )
    windows.append(
        "wf AS (PARTITION BY series_id ORDER BY ts "
        "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)"
    )
    windows.append("wo AS (PARTITION BY series_id ORDER BY ts)")

    def near(s, long_b):
        return f"abs({s} - {long_b}) / NULLIF({long_b}, 0) < {DELTA_TH}"

    score_terms = ["0.0"]
    for n2, n1 in ub_combos:
        score_terms.append(
            f"CASE WHEN ub{n2} >= u1b{n1} AND {near(f'ub{n2}', f'u1b{n1}')} "
            f"THEN 0.1001 ELSE 0.0 END"
        )
    for n2, n1 in lb_combos:
        score_terms.append(
            f"CASE WHEN lb{n2} <= l1b{n1} AND {near(f'lb{n2}', f'l1b{n1}')} "
            f"THEN 0.1000001 ELSE 0.0 END"
        )
    last_n2 = UB_N2[-1]
    ub_near = " + ".join(
        f"CASE WHEN ub{last_n2} >= u1b{n1} AND {near(f'ub{last_n2}', f'u1b{n1}')} "
        f"THEN 1 ELSE 0 END"
        for n1 in UB_N1 if n1 > last_n2
    )
    lb_near = " + ".join(
        f"CASE WHEN lb{last_n2} <= l1b{n1} AND {near(f'lb{last_n2}', f'l1b{n1}')} "
        f"THEN 1 ELSE 0 END"
        for n1 in LB_N1 if n1 > last_n2
    )
    # last matching combo in loop order wins -> first match in REVERSE order
    recent_max = "CASE " + " ".join(
        f"WHEN ub{n2} >= u1b{n1} THEN ub{n2}"
        for n2, n1 in reversed(ub_combos)
    ) + " END"
    recent_min = "CASE " + " ".join(
        f"WHEN lb{n2} <= l1b{n1} THEN lb{n2}"
        for n2, n1 in reversed(lb_combos)
    ) + " END"

    return f"""
WITH bars AS ({_SQL_BARS}),
banded AS (
  SELECT series_id, ts, close, volume,
         {", ".join(band_cols)},
         max(high) OVER wf AS fb_ub, min(low) OVER wf AS fb_lb
  FROM bars
  WINDOW {", ".join(windows)}),
scored AS (
  SELECT series_id, ts, close, volume,
         {" + ".join(score_terms)} AS score,
         {ub_near} AS ub_near_cnt,
         {lb_near} AS lb_near_cnt,
         {recent_max} AS recent_max,
         {recent_min} AS recent_min,
         fb_ub, fb_lb
  FROM banded),
fc AS (
  SELECT series_id, ts, close, volume, ub_near_cnt, lb_near_cnt,
         recent_max IS NOT NULL AND recent_min IS NOT NULL AS found,
         CASE WHEN recent_max IS NOT NULL AND recent_min IS NOT NULL
              THEN recent_max ELSE fb_ub END AS box_ub,
         CASE WHEN recent_max IS NOT NULL AND recent_min IS NOT NULL
              THEN recent_min ELSE fb_lb END AS box_lb,
         CASE WHEN NOT (recent_max IS NOT NULL AND recent_min IS NOT NULL)
              THEN score - 3.0
              ELSE score END AS box_score
  FROM scored),
det AS (
  SELECT series_id, ts, found, box_ub, box_lb, box_score,
         ub_near_cnt, lb_near_cnt,
         round(volume - avg(volume) OVER (PARTITION BY series_id ORDER BY ts
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), {_R}) AS vol,
         box_score * 10 AS score10,
         coalesce(close > lag(close, 20) OVER
                  (PARTITION BY series_id ORDER BY ts), false) AS rs,
         close > (box_ub + box_lb) / 2 AS snr,
         row_number() OVER (PARTITION BY series_id ORDER BY ts) AS dur
  FROM fc)
SELECT series_id, ts,
       CASE WHEN found THEN 'box_breakout' ELSE 'forecast' END AS signame,
       round(box_ub, {_R}) AS box_ub,
       round(box_lb, {_R}) AS box_lb,
       CAST(round(box_score * 1e7) AS BIGINT) AS box_score_e7,
       ub_near_cnt, lb_near_cnt,
       ((CASE WHEN vol >= 0 THEN 1 ELSE 0 END
         + CASE WHEN score10 > 2 THEN 1 ELSE 0 END
         + CASE WHEN rs THEN 1 ELSE 0 END) > 2)
         AND snr AND (dur > 25) AS suggest_buy,
       (vol >= 0) AND (score10 > 4) AND rs AND snr AS strong_buy,
       ((CASE WHEN vol < 0 THEN 1 ELSE 0 END
         + CASE WHEN score10 < 3 THEN 1 ELSE 0 END
         + CASE WHEN NOT rs THEN 1 ELSE 0 END) > 1)
         AND (NOT snr) AND (dur > 15) AS suggest_sell,
       (vol < 0) AND (score10 < 3) AND (NOT rs) AND (NOT snr) AS strong_sell
FROM det
"""


def q_pattern_screener(spark, sf_dir):
    """X12 screener core: every lag-tuple pattern family in ONE plan over
    the event-bar extrema, then U4 overlap pruning per (series, pattern)
    (/root/reference/datalib/extremaPatternUtil.py:171-322 runs the same
    families in a per-ticker loop). Rows-only: the 7-point X3 family's
    type-split predicate isn't portable SQL."""
    from timeseriesvectordbpattermatcher_spark.operators.patterns import all_patterns
    from timeseriesvectordbpattermatcher_spark.operators.windows import (
        local_extrema,
        remove_overlapping_intervals,
    )

    bars = _event_bars(spark, sf_dir)
    ex = (
        local_extrema(bars, order=5)
        .filter("minmax_type != 'na'")
        .withColumn(
            "px",
            F.when(F.col("minmax_type") == "max", F.col("high")).otherwise(F.col("low")),
        )
    )
    pats = all_patterns(ex)
    # composite (series, pattern) prune key — no lossy string packing
    # (round-1 ADVICE: a series_id containing '|' would corrupt attribution)
    pruned = remove_overlapping_intervals(pats, series_col=["series_id", "pattern"])
    return pruned.select("series_id", "pattern", "start_ts", "end_ts", "bullbear")


def q_resumable_rollup(spark, sf_dir):
    """E1 lifecycle + crash-resume through the contract: run the snapshot-
    checkpointed RollupJob over a seqs frame derived from the driver's
    events table, inject a crash after the 1m commit, rerun to convergence,
    and return per-tier summaries of the POST-RESUME tier tables (row count,
    cnt/n_tok totals, min/max stats and bucket range). Oracle-checked: the
    crash+resume must re-converge to exactly the tables DuckDB computes from
    the same parquet in one pass (FIXTURES.md F5 invariant 5)."""
    import shutil
    import tempfile

    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob

    ev = _events(spark, sf_dir)
    seqs_ts = ev.select(
        F.col("event_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("source"),
        F.col("ts").alias("event_ts"),
        F.floor(F.abs(F.coalesce(F.col("value"), F.lit(0.0)))).cast("int").alias("n_tok"),
    )
    base = tempfile.mkdtemp(prefix="rollup_job_")
    try:
        job = RollupJob(base)
        try:
            job.run(spark, seqs_ts, fail_after="1m")  # crash between tier commits
        except RuntimeError:
            pass
        job.run(spark, seqs_ts)  # resume: re-converges to the single-run state
        # materialize before cleanup (the summary is 3 rows; returning a lazy
        # plan over a deleted temp dir would fail at the driver's collect)
        rows = []
        for tier in ("1m", "1h", "1d"):
            t = job.tables[tier].read(spark)
            rows.extend(
                t.agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("cnt").alias("total_cnt"),
                    F.sum("sum_n_tok").alias("total_n_tok"),
                    F.min("min_n_tok").alias("min_n_tok"),
                    F.max("max_n_tok").alias("max_n_tok"),
                    F.min("bucket_ts").alias("min_bucket"),
                    F.max("bucket_ts").alias("max_bucket"),
                )
                .withColumn("stage", F.lit(f"rollup_{tier}"))
                .collect()
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "n_rows bigint, total_cnt bigint, total_n_tok bigint, min_n_tok int, "
        "max_n_tok int, min_bucket timestamp, max_bucket timestamp, stage string",
    )


SQL_RESUMABLE_ROLLUP = """
WITH seqs AS (
  SELECT event_type AS source, ts AS event_ts,
         CAST(floor(abs(coalesce(value, 0.0))) AS INT) AS n_tok
  FROM events),
t1m AS (
  SELECT source, date_trunc('minute', event_ts) AS b,
         count(*) AS c, sum(n_tok) AS s, min(n_tok) AS mn, max(n_tok) AS mx
  FROM seqs GROUP BY 1, 2),
t1h AS (
  SELECT source, date_trunc('hour', b) AS b,
         sum(c) AS c, sum(s) AS s, min(mn) AS mn, max(mx) AS mx
  FROM t1m GROUP BY 1, 2),
t1d AS (
  SELECT source, date_trunc('day', b) AS b,
         sum(c) AS c, sum(s) AS s, min(mn) AS mn, max(mx) AS mx
  FROM t1h GROUP BY 1, 2)
SELECT 'rollup_1m' AS stage, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c) AS BIGINT) AS total_cnt, CAST(sum(s) AS BIGINT) AS total_n_tok,
       CAST(min(mn) AS INT) AS min_n_tok, CAST(max(mx) AS INT) AS max_n_tok,
       min(b) AS min_bucket, max(b) AS max_bucket FROM t1m
UNION ALL
SELECT 'rollup_1h', CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
       CAST(sum(s) AS BIGINT), CAST(min(mn) AS INT), CAST(max(mx) AS INT),
       min(b), max(b) FROM t1h
UNION ALL
SELECT 'rollup_1d', CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
       CAST(sum(s) AS BIGINT), CAST(min(mn) AS INT), CAST(max(mx) AS INT),
       min(b), max(b) FROM t1d
"""


def vcp_fixture_rows():
    """Deterministic contracting-range fixture: 9 maxima (high 103, lows 100
    between -> range 3% <= 1.1 x seeded 4%), 8th max breaks out above all
    prior highs; 8-day spacing -> window span 112d >= 50d. Shared by the
    contract query and the golden oracle (tests/oracle)."""
    import datetime as dt

    rows, t = [], dt.datetime(2024, 1, 1)
    for i in range(9):
        hi, cl = (104.0, 103.5) if i == 7 else (103.0, 102.5)
        rows.append(("FIX", t, 102.0, hi, 101.5, cl, "max"))
        t += dt.timedelta(days=8)
        if i < 8:
            rows.append(("FIX", t, 100.5, 101.0, 100.0, 100.5, "min"))
            t += dt.timedelta(days=8)
    return rows


def q_vcp_patterns(spark, sf_dir):
    """X8 volatility-contraction patterns over the deterministic OHLCV
    fixture's extrema (golden regenerated from the independent pandas
    oracle, tests/oracle/pandas_oracle.py:oracle_vcp_patterns;
    /root/reference/datalib/extremaPatternLooper.py:205-272)."""
    from timeseriesvectordbpattermatcher_spark.operators.patterns import (
        find_vcp_up_patterns,
    )

    extrema = spark.createDataFrame(
        vcp_fixture_rows(),
        "series_id string, ts timestamp, open double, high double, "
        "low double, close double, minmax_type string",
    )
    return find_vcp_up_patterns(extrema)


def q_divergence(spark, sf_dir):
    """X9/X10 end-to-end the way the reference drives it
    (/root/reference/datalib/extremaPatternUtil.py:400-470): the full
    divergence screener — six aux indicator series (ta_indicators), one
    smoothed-extrema table per indicator, price-vs-indicator containment
    scan per (indicator, side) — over the deterministic OHLCV fixture.
    Golden-pinned; unit fixtures incl. a planted divergence live in
    tests/test_divergence_screener.py."""
    from timeseriesvectordbpattermatcher_spark.operators.patterns import (
        divergence_screener,
    )
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=4, n_days=400, seed=17)
    out = divergence_screener(ohlcv)
    return out.select("series_id", "pattern", "start_ts", "end_ts", "bullbear")


def q_trade_sim(spark, sf_dir):
    """X14 stateful trade simulator + D12 equity curve: staged profit-taking
    + trailing stop, grouped-map per (series, entry)
    (/root/reference/datalib/patternTraderUtil.py:737-836). Golden-pinned:
    trades joined with per-entry equity-curve aggregates (bar count, final
    total-gain pct, max retrace) and the A2 performance roll-up, so the
    per-bar equity path and the :838-872 summary are pinned too."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.tradesim import (
        trade_equity_curve,
        trade_simulator,
        trades_performance,
    )
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=4, n_days=500)
    entries = spark.createDataFrame(
        [
            ("TK00", dt.datetime(2019, 3, 4)),
            ("TK01", dt.datetime(2019, 6, 3)),
            ("TK02", dt.datetime(2019, 9, 2)),
        ],
        "series_id string, entry_ts timestamp",
    )
    trades = trade_simulator(ohlcv, entries)
    equity = trade_equity_curve(ohlcv, entries)
    eq_sum = equity.groupBy("series_id", "entry_ts").agg(
        F.count("*").alias("equity_bars"),
        F.round(F.max_by("total_gain_pct", "ts"), _R).alias("final_total_gain_pct"),
        F.round(F.max("retrace"), _R).alias("max_retrace"),
    )
    perf = trades_performance(trades).select(
        "series_id", "entry_ts",
        F.round("total_gain", _R).alias("perf_total_gain"),
        F.round("pct_gain", _R).alias("perf_pct_gain"),
        F.round("pct_gain_ref", _R).alias("perf_pct_gain_ref"),
        "trade_cnt",
    )
    return (
        trades.join(eq_sum, ["series_id", "entry_ts"], "left")
        .join(perf, ["series_id", "entry_ts"], "left")
    )


def q_multi_stop(spark, sf_dir):
    """W19 composite trailing stops — the reference's get_multi_stop_df
    column set (/root/reference/datalib/taStopEstimater.py:233-280): PSAR,
    ATR, bb bands, chandelier, the ma±ATR trails, n-day low, the
    greatest(chand, sar, atr_minus) trail composite and both cross-exit
    signals, over the deterministic OHLCV fixture. Golden-pinned (recursive
    PSAR/ATR kernels aren't relational SQL); the pandas oracle lives in
    tests/test_stops.py."""
    from timeseriesvectordbpattermatcher_spark.operators.stops import multi_stop_frame
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=3, n_days=400)
    out = multi_stop_frame(ohlcv)
    return out.select(
        "series_id", "ts",
        F.round("psar", _R).alias("psar"),
        F.round("atr", _R).alias("atr"),
        F.round("bbu1", _R).alias("bbu1"),
        F.round("bbl1", _R).alias("bbl1"),
        F.round("chand_exit", _R).alias("chand_exit"),
        F.round("sar_exit", _R).alias("sar_exit"),
        F.round("atr_minus_exit", _R).alias("atr_minus_exit"),
        F.round("atr_plus_exit", _R).alias("atr_plus_exit"),
        F.round("nday_low_exit", _R).alias("nday_low_exit"),
        F.round("trail_long_exit", _R).alias("trail_long_exit"),
        "profit_exit_sig", "trail_exit_sig",
    )


def q_minhash_dedup(spark, sf_dir):
    """Dedup closure: MinHash-LSH pairs (banded signatures -> bucket join ->
    signature verify) feeding min-id label propagation to a fixpoint — the
    survivors table. Golden-pinned (xxhash64 minhash banding isn't portable
    SQL); exercises the whole minhash_lsh_pairs + closure path."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import minhash_lsh_dedup

    docs = _docs_str(spark, sf_dir)
    out = minhash_lsh_dedup(docs, threshold=0.4)
    return out.select("doc_id")


def q_simhash_pairs(spark, sf_dir):
    """Dedup: SimHash near-dup pairs, Hamming <= 3, pigeonhole-banded
    equi-join candidates (golden-pinned: xxhash64 bit math isn't portable
    SQL)."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import simhash_pairs

    docs = _docs_str(spark, sf_dir)
    return simhash_pairs(docs, max_hamming=3, bands=4)


def q_media_features(spark, sf_dir):
    """Multimodal: binary payload -> mapInPandas feature extraction. Real
    stdlib decode (WAV via `wave`, PPM/BMP via numpy) over valid payloads
    from synth_real_media, PLUS the deterministic fake-decode path over
    opaque payloads (stand-in for compressed formats whose decoders aren't
    in this container). Each row is decoder-tagged; the golden regenerates
    from the engine-free oracle (independent RIFF/PPM/BMP parsers in
    tests/oracle/segment_oracle.py)."""
    from timeseriesvectordbpattermatcher_spark.operators.multimodal import (
        extract_media_features,
        synth_media,
        synth_real_media,
    )

    media = synth_media(spark, n_rows=64, seed=42).unionAll(
        synth_real_media(spark, n_rows=24, seed=7)
    )
    out = extract_media_features(media, fake=True)
    # pin the decoded values themselves, not just the shape: first feature +
    # L2 norm (both computed in double, rounded like every other float in
    # the contract) — the golden is regenerated from the engine-free decode
    # oracle in tests/oracle/segment_oracle.py
    fd = F.transform("feat", lambda x: x.cast("double"))
    sumsq = F.aggregate(fd, F.lit(0.0), lambda s, v: s + v * v)
    return out.select(
        "media_id",
        "modality",
        F.size("feat").alias("feat_dim"),
        "decode_ok",
        "decoder",
        F.round(F.element_at(fd, 1), _R).alias("feat0"),
        F.round(F.sqrt(sumsq), _R).alias("feat_norm"),
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 contract queries (the driver caps per-round execution at
    50): every SURVEY.md SS2 operator family keeps a driver-visible row.
    Round-2 consolidation: window_basics folds W1/W5/W6; rolling_stats folds
    W3/W5/W7/W8/W9-W10 + Bollinger; text_stats folds the four text-analysis
    ops; ta_indicators folds OBV into the full W17 family; ann_recall folds
    both ANN paths; multi_stop carries PSAR; minhash_dedup exercises
    minhash_lsh_pairs inside the closure."""
    return {
        # tier cascade + gap-fill (north-star spine)
        "rollup_1m": q_rollup_1m,
        "rollup_1h_cascade": q_rollup_1h_cascade,
        "rollup_1d_cascade": q_rollup_1d_cascade,
        "gapfill_locf": q_gapfill_locf,
        "gapfill_linear": q_gapfill_linear,
        # per-event window ops
        "window_basics": q_window_basics,
        "sessionize": q_sessionize,
        "topk_per_group": q_topk_per_group,
        "rank_across_keys": q_rank_across_keys,
        "pricing_summary": q_pricing_summary,
        "perf_by_year": q_perf_by_year,
        "asof_join": q_asof_join,
        "time_travel": q_time_travel,
        "ttest_cohorts": q_ttest_cohorts,
        "json_props": q_json_props,
        # bar-derived window / TA ops
        "rolling_stats": q_rolling_stats,
        "ta_indicators": q_ta_indicators,
        "candle_kernels": q_candle_kernels,
        "box_bands": q_box_bands,
        "flag_debounce": q_flag_debounce,
        "resample_3d": q_resample_3d,
        "price_by_volume": q_price_by_volume,
        "pbv_obv": q_pbv_obv,
        # pattern mining
        "pattern_higher_low": q_pattern_higher_low,
        "higher_high_low": q_higher_high_low,
        "hs_patterns": q_hs_patterns,
        "interval_overlap": q_interval_overlap,
        "min_spacing": q_min_spacing,
        # documents / embeddings (LLM-pipeline ops)
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "text_stats": q_text_stats,
        "cosine_topk": q_cosine_topk,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        # array_stats moved to pytest (tests/test_features.py) to free this
        # slot under the 50-query driver cap — retention (§2.10) was the
        # last north-star maintenance path without a driver-green row
        "retention_expiry": q_retention_expiry,
        # golden-pinned (semantics beyond relational SQL; oracle reads the
        # committed fixture and the driver hash-compares the live run)
        "multi_stop": q_multi_stop,
        "vcp_patterns": q_vcp_patterns,
        "trade_sim": q_trade_sim,
        "divergence": q_divergence,
        "minhash_dedup": q_minhash_dedup,
        "simhash_pairs": q_simhash_pairs,
        # X13 forecast boxes + buy/sell rules (real DuckDB SQL oracle; took
        # the slot of matcher_golden_parity, folded into matcher_pipeline)
        "box_forecast": q_box_forecast,
        "pattern_screener": q_pattern_screener,
        "token_segmentation": q_token_segmentation,
        "matcher_pipeline": q_matcher_pipeline,
        "ann_recall": q_ann_recall,
        "codec_roundtrip": q_codec_roundtrip,
        "media_features": q_media_features,
        "box_detection": q_box_detection,
        "trend_range": q_trend_range,
        # crash-inject + resume; oracle checks the converged tier tables
        "resumable_rollup": q_resumable_rollup,
    }


GOLDEN_QUERIES = [
    "multi_stop", "vcp_patterns", "trade_sim", "divergence", "minhash_dedup",
    "simhash_pairs", "pattern_screener",
    "token_segmentation", "matcher_pipeline", "ann_recall", "codec_roundtrip",
    "media_features", "box_detection", "trend_range",
]


def oracle_sql() -> dict[str, str]:
    sql = {
        "rollup_1m": SQL_ROLLUP_1M,
        "rollup_1h_cascade": SQL_ROLLUP_1H,
        "rollup_1d_cascade": SQL_ROLLUP_1D,
        "gapfill_locf": SQL_GAPFILL_LOCF,
        "gapfill_linear": SQL_GAPFILL_LINEAR,
        "window_basics": SQL_WINDOW_BASICS,
        "sessionize": SQL_SESSIONIZE,
        "topk_per_group": SQL_TOPK_PER_GROUP,
        "rank_across_keys": SQL_RANK_ACROSS_KEYS,
        "pricing_summary": SQL_PRICING_SUMMARY,
        "perf_by_year": SQL_PERF_BY_YEAR,
        "asof_join": SQL_ASOF_JOIN,
        "time_travel": SQL_TIME_TRAVEL,
        "ttest_cohorts": SQL_TTEST_COHORTS,
        "json_props": SQL_JSON_PROPS,
        "rolling_stats": SQL_ROLLING_STATS,
        "ta_indicators": SQL_TA_INDICATORS,
        "candle_kernels": _candle_kernels_sql(),
        "box_bands": SQL_BOX_BANDS,
        "flag_debounce": SQL_FLAG_DEBOUNCE,
        "resample_3d": SQL_RESAMPLE_3D,
        "price_by_volume": SQL_PRICE_BY_VOLUME,
        "pbv_obv": SQL_PBV_OBV,
        "pattern_higher_low": SQL_PATTERN_HIGHER_LOW,
        "higher_high_low": _hhl_sql(),
        "hs_patterns": SQL_HS_PATTERNS,
        "interval_overlap": SQL_INTERVAL_OVERLAP,
        "min_spacing": SQL_MIN_SPACING,
        "exact_dedup": SQL_EXACT_DEDUP,
        "ngram_jaccard": SQL_NGRAM_JACCARD,
        "text_stats": _text_stats_sql(),
        "cosine_topk": SQL_COSINE_TOPK,
        "embedding_dup_pairs": SQL_EMBEDDING_DUP_PAIRS,
        "retention_expiry": SQL_RETENTION_EXPIRY,
        "box_forecast": _box_forecast_sql(),
        "resumable_rollup": SQL_RESUMABLE_ROLLUP,
    }
    for name in GOLDEN_QUERIES:
        sql[name] = _golden_sql(name)
    return sql
