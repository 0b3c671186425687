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
            F.round(F.sum("sum_value"), _R).alias("sum_value"),
        )
    )


SQL_ROLLUP_1H = f"""
SELECT event_type AS source, date_trunc('hour', ts) AS bucket_ts,
       count(*) AS cnt, round(sum(value), {_R}) AS sum_value
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


def q_forward_return(spark, sf_dir):
    """W5: lead(value, 5)/value - 1 per event_type, ordered (ts, event_id)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.lead("value", 5).over(w) / F.col("value") - 1, _R).alias("fw_ret_5"),
    )


SQL_FORWARD_RETURN = f"""
SELECT event_id, event_type,
       round(lead(value, 5) OVER (PARTITION BY event_type ORDER BY ts, event_id)
             / value - 1, {_R}) AS fw_ret_5
FROM events
"""


def q_rolling_avg(spark, sf_dir):
    """W1: 20-row rolling mean of value per event_type (strict min_periods)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(-19, 0)
    avg = F.when(F.count("value").over(w) >= 20, F.round(F.avg("value").over(w), _R))
    return ev.select("event_id", "event_type", avg.alias("avg20"))


SQL_ROLLING_AVG = f"""
SELECT event_id, event_type,
       CASE WHEN count(value) OVER w >= 20
            THEN round(avg(value) OVER w, {_R}) END AS avg20
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
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
    """A1/A2 shape (TPC-H Q1): groupwise sums/avgs with a date predicate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), _R).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), _R).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), _R).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), _R).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), {_R}) AS sum_qty,
       round(sum(l_extendedprice), {_R}) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), {_R}) AS sum_disc_price,
       round(avg(l_quantity), {_R}) AS avg_qty,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""


def q_perf_by_year(spark, sf_dir):
    """A1: per-year aggregation + 'all' total row via GROUPING SETS."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o = o.withColumn("yr", F.year("o_orderdate"))
    o.createOrReplaceTempView("_orders_y")
    return spark.sql(f"""
        SELECT coalesce(cast(yr as string), 'all') AS year,
               round(avg(o_totalprice), {_R}) AS ret,
               count(*) AS tcnt,
               round(sum(o_totalprice), {_R}) AS total_ret
        FROM _orders_y
        GROUP BY GROUPING SETS ((yr), ())
    """)


SQL_PERF_BY_YEAR = f"""
SELECT coalesce(cast(year(o_orderdate) as varchar), 'all') AS "year",
       round(avg(o_totalprice), {_R}) AS ret,
       count(*) AS tcnt,
       round(sum(o_totalprice), {_R}) AS total_ret
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate)), ())
"""


def q_asof_join(spark, sf_dir):
    """J3: first lineitem shipped at/after each order's date (as-of match)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    j = o.join(li, (li.l_orderkey == o.o_orderkey) & (li.l_shipdate >= o.o_orderdate), "left")
    return j.groupBy("o_orderkey", "o_orderdate").agg(
        F.min("l_shipdate").alias("first_ship_after")
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


def q_token_counts(spark, sf_dir):
    """Text: whitespace + BPE-ish token counts."""
    from timeseriesvectordbpattermatcher_spark.operators.textstats import add_token_counts

    docs = _docs_str(spark, sf_dir)
    return add_token_counts(docs).select("doc_id", "n_tokens_ws", "n_tokens_bpe")


SQL_TOKEN_COUNTS = r"""
SELECT cast(doc_id as varchar) AS doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens_ws,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS n_tokens_bpe
FROM documents
"""


def q_lang_id(spark, sf_dir):
    """Text: stopword-profile language ID (formula-deterministic)."""
    from timeseriesvectordbpattermatcher_spark.operators.textstats import add_lang_id

    docs = _docs_str(spark, sf_dir)
    return add_lang_id(docs).select("doc_id", "lang_pred", "lang_score")


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


def q_fingerprint(spark, sf_dir):
    """Text: winnowing-lite fingerprint (min md5 over word 5-grams)."""
    from timeseriesvectordbpattermatcher_spark.operators.textstats import add_fingerprint

    docs = _docs_str(spark, sf_dir)
    return add_fingerprint(docs).select("doc_id", "fingerprint")


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
    broadcast cosine top-k + dedupe + historical filters (J7/P4/P5/T1)."""
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
    return match_pipeline(qseg, refs, strategy="bcast")


def q_minhash_lsh(spark, sf_dir):
    """Dedup: MinHash-LSH candidate pairs verified by signature Jaccard."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs_str(spark, sf_dir)
    out = minhash_lsh_pairs(docs, threshold=0.4)
    return out.select("doc_a", "doc_b", F.round("jaccard_est", _R).alias("jaccard_est"))


def q_lsh_ann(spark, sf_dir):
    """Similarity: random-hyperplane LSH approximate top-3."""
    from timeseriesvectordbpattermatcher_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    out = lsh_topk(q, emb, k=3, n_bits=4, n_tables=16,
                   query_id="query_id", query_vec="q_embedding",
                   ref_id="vec_id", ref_vec="embedding")
    return out.select("query_id", "rank", "vec_id", F.round("score", _R).alias("score"))


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
    back = decompress_segments(segs).groupBy("source").agg(
        F.count("*").alias("n_points"),
        F.round(F.sum("value"), 3).alias("sum_back"),
    )
    orig = r1m.groupBy("source").agg(
        F.count("*").alias("n_points_orig"),
        F.round(F.sum("avg_value"), 3).alias("sum_orig"),
    )
    return back.join(orig, "source").join(sizes, "source").select(
        "source",
        "n_points",
        (F.col("n_points") == F.col("n_points_orig")).alias("count_ok"),
        (F.col("sum_back") == F.col("sum_orig")).alias("sum_ok"),
        "compressed_bytes",
        "raw_bytes",
        F.round(F.col("raw_bytes") / F.col("compressed_bytes"), 2).alias("compression_ratio"),
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
    """W18: doji/engulfing/marubozu kernel scores over event-derived bars."""
    from timeseriesvectordbpattermatcher_spark.operators.candles import candle_patterns

    bars = _event_bars(spark, sf_dir)
    out = candle_patterns(bars)
    return out.select("series_id", "ts", "CDLDOJI", "CDLENGULFING", "CDLMARUBOZU")


SQL_CANDLE_KERNELS = f"""
WITH bars AS ({_SQL_BARS}),
l AS (
  SELECT series_id, ts, open, high, low, close,
         lag(open) OVER w AS o1, lag(close) OVER w AS c1
  FROM bars WINDOW w AS (PARTITION BY series_id ORDER BY ts))
SELECT series_id, ts,
       CASE WHEN (high - low) > 0 AND abs(close - open) <= 0.1 * (high - low)
            THEN 100 ELSE 0 END AS "CDLDOJI",
       CASE WHEN close > open AND c1 < o1 AND close >= o1 AND open <= c1
                 AND abs(close - open) > abs(c1 - o1) THEN 100
            WHEN close < open AND c1 > o1 AND open >= c1 AND close <= o1
                 AND abs(close - open) > abs(c1 - o1) THEN -100
            ELSE 0 END AS "CDLENGULFING",
       CASE WHEN close > open AND (high - low) > 0
                 AND abs(close - open) >= 0.95 * (high - low) THEN 100
            WHEN close < open AND (high - low) > 0
                 AND abs(close - open) >= 0.95 * (high - low) THEN -100
            ELSE 0 END AS "CDLMARUBOZU"
FROM l
"""


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


def q_ivf_ann(spark, sf_dir):
    """Similarity: IVF coarse-quantizer ANN top-3 (rows-only: quantizer
    training is iterative numpy, not SQL)."""
    from timeseriesvectordbpattermatcher_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    return ivf_topk(q, emb, k=3, n_lists=8, nprobe=4,
                    query_id="query_id", query_vec="q_embedding",
                    ref_id="vec_id", ref_vec="embedding")


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
            F.round(F.sum("sum_value"), _R).alias("sum_value"),
            F.round(F.min("min_value"), _R).alias("min_value"),
            F.round(F.max("max_value"), _R).alias("max_value"),
        )
    )


SQL_ROLLUP_1D = f"""
SELECT event_type AS source, date_trunc('day', ts) AS bucket_ts,
       count(*) AS cnt, round(sum(value), {_R}) AS sum_value,
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


def q_signal_cross(spark, sf_dir):
    """W6: value crossing its own 10-row rolling mean, +1 up / -1 down
    (/root/reference/datalib/patternTraderUtil.py:16-23 semantics)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ma = F.avg("value").over(w.rowsBetween(-9, 0))
    d = F.col("value") - ma
    ev2 = ev.withColumn("_d", d).withColumn("_dp", F.lag("_d").over(w))
    sig = F.when(F.col("_d") * F.col("_dp") < 0, F.signum("_d")).otherwise(F.lit(0.0))
    return ev2.select("event_id", "event_type", sig.alias("sig_cross"))


SQL_SIGNAL_CROSS = """
WITH d AS (
  SELECT event_id, event_type, ts,
         value - avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS d
  FROM events),
l AS (SELECT event_id, event_type, d,
             lag(d) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dp
      FROM d)
SELECT event_id, event_type,
       CASE WHEN d * dp < 0 THEN sign(d)::DOUBLE ELSE 0.0 END AS sig_cross
FROM l
"""


def q_rolling_slope(spark, sf_dir):
    """W7 closed-form rolling regression slope (n=20) over event-derived
    bars — window sums replace rolling.apply(linregress)
    (/root/reference/datalib/patternTraderUtil.py:214-218)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import rolling_slope

    bars = _event_bars(spark, sf_dir)
    out = rolling_slope(bars, "close", 20)
    return out.select(
        "series_id", "ts", F.round("close_slope20", _R).alias("slope20")
    )


SQL_ROLLING_SLOPE = f"""
WITH bars AS ({_SQL_BARS}),
s AS (
  SELECT series_id, ts,
         row_number() OVER wo AS rn, close
  FROM bars WINDOW wo AS (PARTITION BY series_id ORDER BY ts)),
agg AS (
  SELECT series_id, ts,
         count(close) OVER w AS cnt,
         sum(close) OVER w AS sy, sum(rn) OVER w AS si,
         sum(rn * close) OVER w AS siy, sum(rn * rn) OVER w AS si2
  FROM s WINDOW w AS (PARTITION BY series_id ORDER BY ts
                      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT series_id, ts,
       CASE WHEN cnt >= 20
            THEN round((cnt * siy - si * sy) / (cnt * si2 - si * si), {_R}) END AS slope20
FROM agg
"""


def q_local_extrema(spark, sf_dir):
    """W9/W10: argrelextrema(greater_equal, order=5) analog — tag each bar
    max/min/na by equality with the +-5-row extreme
    (/root/reference/datalib/extremaPatternUtil.py:14-68)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import local_extrema

    bars = _event_bars(spark, sf_dir)
    return local_extrema(bars, order=5).select("series_id", "ts", "minmax_type")


SQL_LOCAL_EXTREMA = f"""
WITH bars AS ({_SQL_BARS})
SELECT series_id, ts,
       CASE WHEN high = max(high) OVER w THEN 'max'
            WHEN low = min(low) OVER w THEN 'min'
            ELSE 'na' END AS minmax_type
FROM bars WINDOW w AS (PARTITION BY series_id ORDER BY ts
                       ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
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


def q_obv(spark, sf_dir):
    """W17 OBV as a pure window expr: running sum of sign(delta close) *
    volume — no UDF (/root/reference pandas_ta ta.obv consumers,
    datalib/extremaPatternUtil.py:403-423)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import obv

    bars = _event_bars(spark, sf_dir)
    return obv(bars).select("series_id", "ts", F.round("obv", 3).alias("obv"))


SQL_OBV = f"""
WITH bars AS ({_SQL_BARS}),
d AS (SELECT series_id, ts,
             coalesce(sign(close - lag(close) OVER w) * volume, 0) AS step
      FROM bars WINDOW w AS (PARTITION BY series_id ORDER BY ts))
SELECT series_id, ts,
       round(sum(step) OVER (PARTITION BY series_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING), 3) AS obv
FROM d
"""


def q_bollinger(spark, sf_dir):
    """W17 Bollinger bands (n=20, k=2) — window mean/stddev exprs."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import bollinger

    bars = _event_bars(spark, sf_dir)
    out = bollinger(bars, n=20, k=2.0)
    return out.select(
        "series_id", "ts",
        F.round("bb_mid", _R).alias("bb_mid"),
        F.round("bb_up", _R).alias("bb_up"),
        F.round("bb_dn", _R).alias("bb_dn"),
    )


SQL_BOLLINGER = f"""
WITH bars AS ({_SQL_BARS}),
b AS (SELECT series_id, ts,
             count(close) OVER w AS cnt,
             avg(close) OVER w AS mid, stddev_samp(close) OVER w AS sd
      FROM bars WINDOW w AS (PARTITION BY series_id ORDER BY ts
                             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT series_id, ts,
       CASE WHEN cnt >= 20 THEN round(mid, {_R}) END AS bb_mid,
       CASE WHEN cnt >= 20 THEN round(mid + 2 * sd, {_R}) END AS bb_up,
       CASE WHEN cnt >= 20 THEN round(mid - 2 * sd, {_R}) END AS bb_dn
FROM b
"""


def q_rolling_quantile(spark, sf_dir):
    """W3 exact rolling quantile (n=15, q=0.25, linear interpolation) as a
    sorted-array window expr — JVM-side, no Python, byte-exact vs
    quantile_cont (/root/reference/datalib/patternTraderUtil.py:54,59)."""
    from pyspark.sql import Window

    bars = _event_bars(spark, sf_dir)
    w = Window.partitionBy("series_id").orderBy("ts").rowsBetween(-14, 0)
    arr = F.sort_array(F.collect_list("close").over(w))
    # pos = (15-1)*0.25 = 3.5 -> x[3] + 0.5*(x[4]-x[3]) (0-based)
    q25 = F.element_at(arr, 4) + 0.5 * (F.element_at(arr, 5) - F.element_at(arr, 4))
    full = F.count("close").over(w) >= 15
    return bars.select(
        "series_id", "ts", F.when(full, F.round(q25, _R)).alias("q25_15")
    )


SQL_ROLLING_QUANTILE = f"""
WITH bars AS ({_SQL_BARS})
SELECT series_id, ts,
       CASE WHEN count(close) OVER w >= 15
            THEN round(quantile_cont(close, 0.25) OVER w, {_R}) END AS q25_15
FROM bars WINDOW w AS (PARTITION BY series_id ORDER BY ts
                       ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
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


def q_quality_score(spark, sf_dir):
    """Text quality scoring: length band, alpha/punct ratios, mean word
    length -> composite score in [0,1] (deterministic arithmetic)."""
    from timeseriesvectordbpattermatcher_spark.operators.textstats import add_quality_score

    docs = _docs_str(spark, sf_dir)
    out = add_quality_score(docs)
    return out.select(
        "doc_id", "n_words",
        F.round("alpha_ratio", _R).alias("alpha_ratio"),
        F.round("mean_word_len", _R).alias("mean_word_len"),
        F.round("quality", _R).alias("quality"),
    )


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
    ev = _events(spark, sf_dir).withColumn(
        "flag", (F.col("user_id") % 2 == 0).cast("int")
    )
    g = ev.groupBy("event_type", "flag").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        F.stddev_samp("value").alias("s"),
    )
    g1 = g.filter("flag = 1").select(
        "event_type", F.col("n").alias("n1"), F.col("m").alias("m1"), F.col("s").alias("s1")
    )
    g0 = g.filter("flag = 0").select(
        "event_type", F.col("n").alias("n0"), F.col("m").alias("m0"), F.col("s").alias("s0")
    )
    j = g1.join(g0, "event_type")
    t = (F.col("m1") - F.col("m0")) / F.sqrt(
        F.col("s1") ** 2 / F.col("n1") + F.col("s0") ** 2 / F.col("n0")
    )
    return j.select(
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
    ``rolling(n).max().shift(1)``, /root/reference/datalib/extremaPlotter.py:568-573)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import rolling

    bars = _event_bars(spark, sf_dir)
    out = rolling(bars, "low", 10, "max", out="ub10")
    out = rolling(out, "low", 10, "min", out="lb10")
    out = rolling(out, "low", 10, "max", out="u1b10", shift=1)
    out = rolling(out, "low", 10, "min", out="l1b10", shift=1)
    return out.select(
        "series_id", "ts",
        F.round("ub10", _R).alias("ub10"), F.round("lb10", _R).alias("lb10"),
        F.round("u1b10", _R).alias("u1b10"), F.round("l1b10", _R).alias("l1b10"),
    )


SQL_BOX_BANDS = f"""
WITH bars AS ({_SQL_BARS})
SELECT series_id, ts,
       CASE WHEN count(low) OVER w0 >= 10 THEN round(max(low) OVER w0, {_R}) END AS ub10,
       CASE WHEN count(low) OVER w0 >= 10 THEN round(min(low) OVER w0, {_R}) END AS lb10,
       CASE WHEN count(low) OVER w1 >= 10 THEN round(max(low) OVER w1, {_R}) END AS u1b10,
       CASE WHEN count(low) OVER w1 >= 10 THEN round(min(low) OVER w1, {_R}) END AS l1b10
FROM bars
WINDOW w0 AS (PARTITION BY series_id ORDER BY ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
       w1 AS (PARTITION BY series_id ORDER BY ts ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
"""


def q_rolling_count_where(spark, sf_dir):
    """W8: rolling count of down-bars over the last 20 rows
    (/root/reference/datalib/patternTraderUtil.py:250-262 counts signs)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import (
        rolling_count_where,
    )

    bars = _event_bars(spark, sf_dir)
    out = rolling_count_where(bars, F.col("close") < F.col("open"), 20, "n_down20")
    return out.select("series_id", "ts", "n_down20")


SQL_ROLLING_COUNT_WHERE = f"""
WITH bars AS ({_SQL_BARS})
SELECT series_id, ts,
       (sum(CASE WHEN close < open THEN 1 ELSE 0 END)
         OVER (PARTITION BY series_id ORDER BY ts
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))::BIGINT AS n_down20
FROM bars
"""


def q_pct_change(spark, sf_dir):
    """W5 backward: close / lag(close, 3) - 1 per series
    (/root/reference/datalib/extremaPatternUtil.py:141)."""
    from timeseriesvectordbpattermatcher_spark.operators.windows import pct_change

    bars = _event_bars(spark, sf_dir)
    out = pct_change(bars, "close", 3)
    return out.select(
        "series_id", "ts", F.round("close_pct3", _R).alias("pct3")
    )


SQL_PCT_CHANGE = f"""
WITH bars AS ({_SQL_BARS})
SELECT series_id, ts,
       round(close / lag(close, 3) OVER (PARTITION BY series_id ORDER BY ts) - 1,
             {_R}) AS pct3
FROM bars
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


def q_matcher_golden_parity(spark, sf_dir):
    """Matcher parity vs the committed golden fixture (F4 golden_matches,
    tests/golden/matches.parquet): rerun the full E2 pipeline (segment ->
    embed -> broadcast cosine top-k -> P4/P5 filters) and emit one row per
    golden match with id/rank/score agreement flags — rows-only, but every
    *_ok column must be true (visible in the correctness record)."""
    import os as _os

    from timeseriesvectordbpattermatcher_spark.operators.matcher import match_pipeline
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
        ma_normalize,
        segment_series,
    )
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    golden_path = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "tests", "golden", "matches.parquet"
    )
    ohlcv = synth_ohlcv(spark, n_tickers=6, n_days=900, seed=42)
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
    got = match_pipeline(qseg, refs, strategy="join").select(
        "query_id", "rank", "segment_id", F.round("score", 6).alias("score")
    )
    want = spark.read.parquet(golden_path).select(
        "query_id",
        F.col("rank").alias("g_rank"),
        F.col("segment_id").alias("g_segment_id"),
        F.col("score").alias("g_score"),
    )
    j = got.join(want, (got.rank == want.g_rank) & (got.query_id == want.query_id), "full")
    return j.select(
        F.coalesce(got.query_id, want.query_id).alias("query_id"),
        F.coalesce("rank", "g_rank").alias("rank"),
        (F.col("segment_id") == F.col("g_segment_id")).alias("id_ok"),
        (F.abs(F.col("score") - F.col("g_score")) <= 1e-6).alias("score_ok"),
    )


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
    pruned = remove_overlapping_intervals(
        pats.withColumn("series_id", F.concat_ws("|", "series_id", "pattern"))
    )
    return pruned.select(
        F.split("series_id", r"\|").getItem(0).alias("series_id"),
        F.col("pattern"),
        "start_ts",
        "end_ts",
        "bullbear",
    )


def q_resumable_rollup(spark, sf_dir):
    """E1 lifecycle + crash-resume through the contract: run the snapshot-
    checkpointed RollupJob over a deterministic seqs corpus, inject a crash
    after the 1m commit, rerun to convergence, and return the audit trail
    (per-tier rows/partitions/snapshot versions). Rows-only: run ids and
    wall times are nondeterministic by nature."""
    import tempfile

    from timeseriesvectordbpattermatcher_spark.operators.rollup import derive_event_ts
    from timeseriesvectordbpattermatcher_spark.plans.checkpoint import RollupJob
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    import shutil

    base = tempfile.mkdtemp(prefix="rollup_job_")
    try:
        job = RollupJob(base)
        seqs = derive_event_ts(synth_seqs(spark, 5000, seed=11, with_tokens=False))
        try:
            job.run(spark, seqs, fail_after="1m")  # crash between tier commits
        except RuntimeError:
            pass
        job.run(spark, seqs)  # resume: re-converges to the single-run state
        audit = job.audit.read(spark)
        # materialize before cleanup (the summary is 3 rows; returning a lazy
        # plan over a deleted temp dir would fail at the driver's collect)
        rows = (
            audit.groupBy("stage")
            .agg(
                F.sum("rows").alias("rows_out"),
                F.count("*").alias("n_partitions_written"),
                F.max("snapshot_version").alias("snapshot_version"),
            )
            .orderBy("stage")
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "stage string, rows_out bigint, n_partitions_written bigint, snapshot_version int",
    )


def q_vcp_patterns(spark, sf_dir):
    """X8 volatility-contraction patterns over the deterministic OHLCV
    fixture's extrema (rows-only: running-max walk is sequential per window,
    /root/reference/datalib/extremaPatternLooper.py:205-272)."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.patterns import (
        find_vcp_up_patterns,
    )

    # deterministic contracting-range fixture: 9 maxima (high 103, lows 100
    # between -> range 3% <= 1.1 x seeded 4%), 8th max breaks out above all
    # prior highs; 8-day spacing -> window span 112d >= 50d
    rows, t = [], dt.datetime(2024, 1, 1)
    for i in range(9):
        hi, cl = (104.0, 103.5) if i == 7 else (103.0, 102.5)
        rows.append(("FIX", t, 102.0, hi, 101.5, cl, "max"))
        t += dt.timedelta(days=8)
        if i < 8:
            rows.append(("FIX", t, 100.5, 101.0, 100.0, 100.5, "min"))
            t += dt.timedelta(days=8)
    extrema = spark.createDataFrame(
        rows,
        "series_id string, ts timestamp, open double, high double, "
        "low double, close double, minmax_type string",
    )
    return find_vcp_up_patterns(extrema)


def q_divergence(spark, sf_dir):
    """X9/X10 divergence via interval-containment cogroup (J4): price
    extrema falling vs OBV extrema rising (rows-only,
    /root/reference/datalib/extremaPatternLooper.py:275-355)."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.patterns import (
        find_divergence_patterns,
    )

    # price extrema strictly falling while the aux indicator's extrema rise
    # inside the same interval -> bullish divergence (2 qualifying windows)
    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(days=7 * i) for i in range(6)]
    main = spark.createDataFrame(
        [("s", t, p) for t, p in zip(ts, [10.0, 9.0, 8.0, 7.0, 6.0, 5.0])],
        "series_id string, ts timestamp, px double",
    )
    aux = spark.createDataFrame(
        [("s", t, p) for t, p in zip(ts, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0])],
        "series_id string, ts timestamp, px double",
    )
    return find_divergence_patterns(main, aux, ex_cond="down,up")


def q_trade_sim(spark, sf_dir):
    """X14 stateful trade simulator: staged profit-taking + trailing stop,
    grouped-map per (series, entry) (rows-only: sequential within group,
    /root/reference/datalib/patternTraderUtil.py:737-836)."""
    import datetime as dt

    from timeseriesvectordbpattermatcher_spark.operators.tradesim import trade_simulator
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
    return trade_simulator(ohlcv, entries)


def q_psar(spark, sf_dir):
    """W19 parabolic SAR (recursive kernel -> grouped map; rows-only,
    /root/reference/datalib/taStopEstimater.py:93-103 consumers)."""
    from timeseriesvectordbpattermatcher_spark.operators.tradesim import psar
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=3, n_days=400)
    return psar(ohlcv).select("series_id", "ts", F.round("psar", _R).alias("psar"))


def q_minhash_dedup(spark, sf_dir):
    """Dedup closure: min-id label propagation over MinHash-LSH pair edges —
    the survivors table (rows-only: iterative fixpoint)."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import minhash_lsh_dedup

    docs = _docs_str(spark, sf_dir)
    out = minhash_lsh_dedup(docs, threshold=0.4)
    return out.select("doc_id")


def q_simhash_pairs(spark, sf_dir):
    """Dedup: SimHash near-dup pairs, Hamming <= 3, pigeonhole-banded
    equi-join candidates (rows-only: xxhash64 bit math isn't portable SQL)."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import simhash_pairs

    docs = _docs_str(spark, sf_dir)
    return simhash_pairs(docs, max_hamming=3, bands=4)


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payload -> mapInPandas feature extraction
    (decode stubbed behind a deterministic fake; schema/batching real)."""
    from timeseriesvectordbpattermatcher_spark.operators.multimodal import (
        extract_media_features,
        synth_media,
    )

    media = synth_media(spark, n_rows=64, seed=42)
    out = extract_media_features(media, fake=True)
    return out.select("media_id", "modality", F.size("feat").alias("feat_dim"), "decode_ok")


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m": q_rollup_1m,
        "rollup_1h_cascade": q_rollup_1h_cascade,
        "gapfill_locf": q_gapfill_locf,
        "forward_return": q_forward_return,
        "rolling_avg": q_rolling_avg,
        "sessionize": q_sessionize,
        "topk_per_group": q_topk_per_group,
        "rank_across_keys": q_rank_across_keys,
        "pricing_summary": q_pricing_summary,
        "perf_by_year": q_perf_by_year,
        "asof_join": q_asof_join,
        "price_by_volume": q_price_by_volume,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "cosine_topk": q_cosine_topk,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "candle_kernels": q_candle_kernels,
        "pattern_higher_low": q_pattern_higher_low,
        "rollup_1d_cascade": q_rollup_1d_cascade,
        "gapfill_linear": q_gapfill_linear,
        "json_props": q_json_props,
        "signal_cross": q_signal_cross,
        "rolling_slope": q_rolling_slope,
        "local_extrema": q_local_extrema,
        "interval_overlap": q_interval_overlap,
        "min_spacing": q_min_spacing,
        "resample_3d": q_resample_3d,
        "obv": q_obv,
        "bollinger": q_bollinger,
        "rolling_quantile": q_rolling_quantile,
        "array_stats": q_array_stats,
        "quality_score": q_quality_score,
        "time_travel": q_time_travel,
        "ttest_cohorts": q_ttest_cohorts,
        "hs_patterns": q_hs_patterns,
        "box_bands": q_box_bands,
        "flag_debounce": q_flag_debounce,
        "rolling_count_where": q_rolling_count_where,
        "pct_change": q_pct_change,
        # non-SQL-expressible (rows-only checks)
        "vcp_patterns": q_vcp_patterns,
        "pattern_screener": q_pattern_screener,
        "matcher_golden_parity": q_matcher_golden_parity,
        "divergence": q_divergence,
        "trade_sim": q_trade_sim,
        "psar": q_psar,
        "resumable_rollup": q_resumable_rollup,
        "minhash_dedup": q_minhash_dedup,
        "simhash_pairs": q_simhash_pairs,
        "media_features": q_media_features,
        "token_segmentation": q_token_segmentation,
        "matcher_pipeline": q_matcher_pipeline,
        "minhash_lsh": q_minhash_lsh,
        "lsh_ann": q_lsh_ann,
        "ivf_ann": q_ivf_ann,
        "codec_roundtrip": q_codec_roundtrip,
        "box_detection": q_box_detection,
        "trend_range": q_trend_range,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_1m": SQL_ROLLUP_1M,
        "rollup_1h_cascade": SQL_ROLLUP_1H,
        "gapfill_locf": SQL_GAPFILL_LOCF,
        "forward_return": SQL_FORWARD_RETURN,
        "rolling_avg": SQL_ROLLING_AVG,
        "sessionize": SQL_SESSIONIZE,
        "topk_per_group": SQL_TOPK_PER_GROUP,
        "rank_across_keys": SQL_RANK_ACROSS_KEYS,
        "pricing_summary": SQL_PRICING_SUMMARY,
        "perf_by_year": SQL_PERF_BY_YEAR,
        "asof_join": SQL_ASOF_JOIN,
        "price_by_volume": SQL_PRICE_BY_VOLUME,
        "exact_dedup": SQL_EXACT_DEDUP,
        "ngram_jaccard": SQL_NGRAM_JACCARD,
        "token_counts": SQL_TOKEN_COUNTS,
        "lang_id": _lang_sql(),
        "fingerprint": SQL_FINGERPRINT,
        "cosine_topk": SQL_COSINE_TOPK,
        "embedding_dup_pairs": SQL_EMBEDDING_DUP_PAIRS,
        "candle_kernels": SQL_CANDLE_KERNELS,
        "pattern_higher_low": SQL_PATTERN_HIGHER_LOW,
        "rollup_1d_cascade": SQL_ROLLUP_1D,
        "gapfill_linear": SQL_GAPFILL_LINEAR,
        "json_props": SQL_JSON_PROPS,
        "signal_cross": SQL_SIGNAL_CROSS,
        "rolling_slope": SQL_ROLLING_SLOPE,
        "local_extrema": SQL_LOCAL_EXTREMA,
        "interval_overlap": SQL_INTERVAL_OVERLAP,
        "min_spacing": SQL_MIN_SPACING,
        "resample_3d": SQL_RESAMPLE_3D,
        "obv": SQL_OBV,
        "bollinger": SQL_BOLLINGER,
        "rolling_quantile": SQL_ROLLING_QUANTILE,
        "array_stats": SQL_ARRAY_STATS,
        "quality_score": SQL_QUALITY_SCORE,
        "time_travel": SQL_TIME_TRAVEL,
        "ttest_cohorts": SQL_TTEST_COHORTS,
        "hs_patterns": SQL_HS_PATTERNS,
        "box_bands": SQL_BOX_BANDS,
        "flag_debounce": SQL_FLAG_DEBOUNCE,
        "rolling_count_where": SQL_ROLLING_COUNT_WHERE,
        "pct_change": SQL_PCT_CHANGE,
    }
