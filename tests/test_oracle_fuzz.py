"""Cross-fixture fuzz: the engine must match the engine-free oracles on
inputs the committed goldens never saw (different seeds, shapes, and edge
rows), so golden agreement can't be a single-fixture coincidence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _assert_match(got: pd.DataFrame, want: pd.DataFrame):
    g, w = _norm(got), _norm(want)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@pytest.mark.parametrize("seed,n_rows", [(7, 120), (99, 60)])
def test_token_segmentation_oracle_fuzz(spark, seed, n_rows):
    from tests.oracle.segment_oracle import oracle_token_segmentation
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import segment_tokens
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    seqs = synth_seqs(spark, n_rows, seed=seed)
    got = (
        segment_tokens(seqs)
        .select("segment_id", "doc_id", "source", "start_idx", "end_idx")
        .toPandas()
    )
    want = oracle_token_segmentation(
        seqs.select("doc_id", "source", "tokens").toPandas()
    )
    _assert_match(got, want)


def test_token_segmentation_oracle_constant_and_short(spark):
    """Hand-built edge rows: constant window (skipped), exactly-64 tokens,
    63 tokens (too short), zero-mean normalization guard."""
    from tests.oracle.segment_oracle import oracle_token_segmentation
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import segment_tokens

    rows = [
        ("d_const", "s", [5] * 80),            # every window constant
        ("d_exact", "s", list(range(64))),     # one window
        ("d_short", "s", list(range(63))),     # none
        ("d_zeros", "s", [0] * 64),            # mean 0 -> unnormalized, constant
        ("d_mix", "s", ([0] * 32 + [1] * 48)), # varying windows
    ]
    seqs = spark.createDataFrame(rows, "doc_id string, source string, tokens array<int>")
    got = (
        segment_tokens(seqs)
        .select("segment_id", "doc_id", "source", "start_idx", "end_idx")
        .toPandas()
    )
    want = oracle_token_segmentation(seqs.toPandas())
    _assert_match(got, want)
    kept = set(got["doc_id"])
    assert "d_const" not in kept and "d_zeros" not in kept and "d_short" not in kept
    assert "d_exact" in kept and "d_mix" in kept


@pytest.mark.parametrize("seed,tickers,days,qs", [(5, 4, 700, "TK01"), (31, 3, 650, "TK00")])
def test_matcher_pipeline_oracle_fuzz(spark, seed, tickers, days, qs):
    """Full E2 path on unseen fixtures, both physical strategies."""
    from tests.oracle.segment_oracle import oracle_matcher_pipeline
    from timeseriesvectordbpattermatcher_spark.operators.matcher import match_pipeline
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
        ma_normalize,
        segment_series,
    )
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=tickers, n_days=days, seed=seed)
    refs = segment_series(ma_normalize(ohlcv))
    qseg = (
        segment_series(ma_normalize(ohlcv.filter(f"series_id = '{qs}'")))
        .orderBy(F.desc("end_ts"))
        .limit(1)
        .select(
            F.col("segment_id").alias("query_id"),
            F.col("features").alias("q_features"),
            F.to_date("start_ts").alias("query_start"),
        )
    )
    parts = []
    for strategy in ("bcast", "join"):
        parts.append(
            match_pipeline(qseg, refs, strategy=strategy)
            .select(
                F.lit(strategy).alias("strategy"),
                "query_id", "rank", "segment_id",
                F.round("score", 6).alias("score"),
            )
            .toPandas()
        )
    got = pd.concat(parts, ignore_index=True)
    want = oracle_matcher_pipeline(ohlcv.toPandas(), query_series=qs)
    _assert_match(got, want)


def test_media_features_oracle_fuzz(spark):
    from tests.oracle.segment_oracle import oracle_media_features
    from timeseriesvectordbpattermatcher_spark.operators.multimodal import (
        extract_media_features,
        synth_media,
    )

    media = synth_media(spark, n_rows=48, seed=1234)
    fd = F.transform("feat", lambda x: x.cast("double"))
    got = (
        extract_media_features(media, fake=True)
        .select(
            "media_id", "modality", F.size("feat").alias("feat_dim"),
            "decode_ok", "decoder",
            F.round(F.element_at(fd, 1), 6).alias("feat0"),
            F.round(F.sqrt(F.aggregate(fd, F.lit(0.0), lambda s, v: s + v * v)), 6).alias("feat_norm"),
        )
        .toPandas()
    )
    want = oracle_media_features(media.toPandas())
    _assert_match(got, want)


def test_ann_recall_oracle_fuzz(spark):
    """Same ANN structures over a reshuffled slice of the embeddings table
    (different query ids than the golden's vec_id < 5)."""
    import os

    from tests.oracle.ann_oracle import oracle_ann_recall

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    # remap ids so a different subset becomes the query set, then run the
    # same contract query shape through the engine
    emb2 = emb.copy()
    emb2["vec_id"] = (emb2["vec_id"] * 7) % len(emb2)

    sdf = spark.createDataFrame(emb2[["vec_id", "embedding"]])

    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )

    q = sdf.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    kw = dict(query_id="query_id", query_vec="q_embedding", ref_id="vec_id", ref_vec="embedding")
    truth = brute_force_topk(q, sdf, k=10, **kw).select("query_id", F.col("vec_id").alias("t_id"))
    parts = []
    for method, fn, extra in [
        ("lsh", lsh_topk, dict(n_bits=4, n_tables=16)),
        ("ivf", ivf_topk, dict(n_lists=8, nprobe=4)),
    ]:
        approx = fn(q, sdf, k=10, **kw, **extra).select("query_id", F.col("vec_id").alias("a_id"))
        hit = truth.join(
            approx, (truth.query_id == approx.query_id) & (truth.t_id == approx.a_id), "left_semi"
        )
        parts.append(
            hit.groupBy("query_id").agg((F.count("*") / 10.0).alias("recall"))
            .withColumn("method", F.lit(method))
        )
    got = (
        parts[0].unionByName(parts[1])
        .select("method", "query_id", F.round("recall", 6).alias("recall"),
                (F.col("recall") >= 0.9).alias("recall_ok"))
        .toPandas()
    )
    want = oracle_ann_recall(emb2[["vec_id", "embedding"]])
    _assert_match(got, want)


def _fuzz_corpus(seed: int, n: int = 120) -> list[tuple[str, str | None]]:
    """Random word-salad corpus with planted near-dup chains, exotic
    whitespace/punct, short docs, null and empty texts."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs: list[tuple[str, str | None]] = []
    for i in range(n):
        k = int(rng.integers(0, 30))
        words = list(rng.choice(vocab, size=k)) if k else []
        docs.append((f"d{i:04d}", " ".join(words)))
    # planted chain: d_base ~ d_mut1 ~ d_mut2 (transitive closure food)
    base = list(rng.choice(vocab, size=25))
    for j, flips in enumerate((0, 1, 2)):
        words = base.copy()
        for f in range(flips):
            words[f * 3] = vocab[(f * 7) % len(vocab)]
        docs.append((f"p{j}", " ".join(words)))
    docs.append(("null_doc", None))
    docs.append(("empty_doc", ""))
    docs.append(("punct_doc", "W0, w1!  W2;w3\tw4\n" + "x" * 5))
    return docs


@pytest.mark.parametrize("seed", [3, 77])
def test_minhash_dedup_oracle_fuzz(spark, seed):
    from tests.oracle import dedup_oracle as do
    from timeseriesvectordbpattermatcher_spark.operators.dedup import minhash_lsh_dedup

    docs = _fuzz_corpus(seed)
    sdf = spark.createDataFrame(docs, "doc_id string, text string")
    got = sorted(r["doc_id"] for r in minhash_lsh_dedup(sdf, threshold=0.4)
                 .select("doc_id").collect())
    want = sorted(do.minhash_dedup_survivors(docs, threshold=0.4))
    assert got == want


@pytest.mark.parametrize("seed", [9, 41])
def test_simhash_pairs_oracle_fuzz(spark, seed):
    from tests.oracle import dedup_oracle as do
    from timeseriesvectordbpattermatcher_spark.operators.dedup import simhash_pairs

    docs = _fuzz_corpus(seed)
    sdf = spark.createDataFrame(docs, "doc_id string, text string")
    got = sorted(
        (r["doc_a"], r["doc_b"], int(r["hamming"]))
        for r in simhash_pairs(sdf, max_hamming=3, bands=4).collect()
    )
    want = sorted(do.simhash_pairs(docs, max_hamming=3, bands=4))
    assert got == want


def test_segment_series_oracle_nulls(spark):
    """Null price/volume rows ride the real dropna paths on both sides:
    the 250-row MA needs a full non-null window (ma_normalize) and any
    surviving window shorter than 64 after dropna is skipped."""
    from tests.oracle.segment_oracle import (
        ma_normalize_pandas,
        segment_series_pandas,
    )
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
        ma_normalize,
        segment_series,
    )
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    pdf = (
        synth_ohlcv(spark, n_tickers=3, n_days=500, seed=23)
        .toPandas()
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    # deterministic null injection across all three value columns
    pdf.loc[pdf.index % 97 == 0, "close"] = None
    pdf.loc[pdf.index % 131 == 5, "open"] = None
    pdf.loc[pdf.index % 113 == 7, "volume"] = None

    sdf = spark.createDataFrame(pdf)
    got = (
        segment_series(ma_normalize(sdf))
        .select("segment_id", "series_id", "label", F.round("fw_ret", 6).alias("fw_ret"))
        .toPandas()
    )
    want = segment_series_pandas(ma_normalize_pandas(pdf))
    if len(want):
        want = want[["segment_id", "series_id", "label", "fw_ret"]].copy()
        want["fw_ret"] = want["fw_ret"].astype(float).round(6)
    assert len(got) == len(want)
    if len(got):
        _assert_match(got, want)


@pytest.mark.parametrize("seed,tickers,days", [(8, 3, 650), (55, 5, 720)])
def test_box_detection_oracle_fuzz(spark, seed, tickers, days):
    from tests.oracle.pandas_oracle import oracle_box_detection
    from timeseriesvectordbpattermatcher_spark.operators.boxes import detect_boxes
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=tickers, n_days=days, seed=seed)
    got = detect_boxes(ohlcv).toPandas()
    want = oracle_box_detection(
        ohlcv.toPandas().sort_values(["series_id", "ts"]).reset_index(drop=True)
    )
    _assert_match(got, want)


@pytest.mark.parametrize("seed", [19, 61])
def test_trend_range_oracle_fuzz(spark, seed):
    import datetime as dt

    from tests.oracle.pandas_oracle import oracle_trend_range_extended
    from timeseriesvectordbpattermatcher_spark.operators.trends import (
        find_trend_range_extended,
    )
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

    ohlcv = synth_ohlcv(spark, n_tickers=3, n_days=620, seed=seed)
    anchors = [("TK00", dt.datetime(2019, 7, 1)), ("TK02", dt.datetime(2019, 10, 6))]
    a_df = spark.createDataFrame(anchors, "series_id string, anchor_ts timestamp")
    got = find_trend_range_extended(ohlcv, a_df).toPandas()
    want = oracle_trend_range_extended(
        ohlcv.toPandas().sort_values(["series_id", "ts"]).reset_index(drop=True),
        anchors,
    )
    _assert_match(got, want)


def test_pattern_screener_oracle_fuzz(spark):
    """Screener on the sf0.001 events table — a corpus the golden
    (pinned at sf0.01) never saw."""
    import __spark_entry__ as e
    from tests.oracle.pandas_oracle import oracle_pattern_screener

    got = e.queries()["pattern_screener"](spark, "/root/testdata/sf0.001").toPandas()
    want = oracle_pattern_screener(pd.read_parquet("/root/testdata/sf0.001/events.parquet"))
    _assert_match(got, want)
