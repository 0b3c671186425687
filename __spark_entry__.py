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
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
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
    back = decompress_segments(segs).groupBy("source").agg(
        F.count("*").alias("n_points"),
        F.round(F.sum("value"), 3).alias("sum_back"),
    )
    orig = r1m.groupBy("source").agg(
        F.count("*").alias("n_points_orig"),
        F.round(F.sum("avg_value"), 3).alias("sum_orig"),
    )
    return back.join(orig, "source").select(
        "source",
        "n_points",
        (F.col("n_points") == F.col("n_points_orig")).alias("count_ok"),
        (F.col("sum_back") == F.col("sum_orig")).alias("sum_ok"),
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
         max(CASE WHEN rn_d = 1 THEN value END) AS close
  FROM _o GROUP BY 1, 2
"""


def q_candle_kernels(spark, sf_dir):
    """W18: doji/engulfing/marubozu kernel scores over event-derived bars."""
    from timeseriesvectordbpattermatcher_spark.operators.candles import candle_patterns

    bars = _event_bars(spark, sf_dir)
    out = candle_patterns(bars.withColumn("volume", F.lit(0.0)))
    return out.select("series_id", "ts", "CDLDOJI", "CDLENGULFING", "CDLMARUBOZU")


SQL_CANDLE_KERNELS = f"""
WITH bars AS ({_SQL_BARS}),
l AS (
  SELECT series_id, ts, open, high, low, close,
         lag(open) OVER w AS o1, lag(close) OVER w AS c1
  FROM bars WINDOW w AS (PARTITION BY series_id ORDER BY ts))
SELECT series_id, ts,
       CASE WHEN (high - low) > 0 AND abs(close - open) <= 0.1 * (high - low)
            THEN 100 ELSE 0 END AS CDLDOJI,
       CASE WHEN close > open AND c1 < o1 AND close >= o1 AND open <= c1
                 AND abs(close - open) > abs(c1 - o1) THEN 100
            WHEN close < open AND c1 > o1 AND open >= c1 AND close <= o1
                 AND abs(close - open) > abs(c1 - o1) THEN -100
            ELSE 0 END AS CDLENGULFING,
       CASE WHEN close > open AND (high - low) > 0
                 AND abs(close - open) >= 0.95 * (high - low) THEN 100
            WHEN close < open AND (high - low) > 0
                 AND abs(close - open) >= 0.95 * (high - low) THEN -100
            ELSE 0 END AS CDLMARUBOZU
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
        # non-SQL-expressible (rows-only checks)
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
    }
