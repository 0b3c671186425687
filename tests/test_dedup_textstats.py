from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from timeseriesvectordbpattermatcher_spark.operators.textstats import (
    add_fingerprint,
    add_lang_id,
    add_quality_score,
    add_token_counts,
)

BASE = "the quick brown fox jumps over the lazy dog and runs far away tonight"
NEAR = "the quick brown fox jumps over the lazy dog and runs far away today"  # 1-word diff
OTHER = "completely different content about spark query engines and shuffles everywhere"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", BASE),
        ("d2", BASE),          # exact dup of d1
        ("d3", NEAR),          # near dup of d1
        ("d4", OTHER),
        ("d5", OTHER + " with a small suffix appended here"),
        ("d6", "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string").cache()
    df.count()
    yield df
    df.unpersist()


def test_exact_dedup(docs):
    out = exact_dedup(docs)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {"d1", "d3", "d4", "d5", "d6"}  # d2 dropped, min-id d1 kept


def test_ngram_jaccard_pairs(docs, duck):
    got = ngram_jaccard_pairs(docs, threshold=0.3).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert ("d1", "d2") in pairs  # identical -> jaccard 1.0
    assert ("d1", "d3") in pairs and ("d2", "d3") in pairs  # near dup
    assert all(p[0] != "d6" and p[1] != "d6" for p in pairs)
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in got}
    assert j[("d1", "d2")] == 1.0
    # DuckDB oracle: same relational query
    duck.register("docs", docs.toPandas())
    want = duck.sql("""
      WITH w AS (SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') ws FROM docs),
      g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] ng
            FROM w, UNNEST(range(1, len(ws)-1)) t(i) WHERE len(ws) >= 3),
      sz AS (SELECT doc_id, count(*) sz FROM g GROUP BY 1),
      inter AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter
                FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id GROUP BY 1, 2)
      SELECT doc_a, doc_b, inter * 1.0 / (sa.sz + sb.sz - inter) jaccard
      FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
      WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.3
    """).df()
    want_pairs = {(r.doc_a, r.doc_b) for r in want.itertuples()}
    assert pairs == want_pairs


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert ("d1", "d2") in pairs
    assert ("d1", "d3") in pairs or ("d2", "d3") in pairs
    assert ("d1", "d4") not in pairs


def test_minhash_lsh_dedup_transitive(docs):
    out = minhash_lsh_dedup(docs, threshold=0.5)
    ids = {r["doc_id"] for r in out.collect()}
    # cluster {d1,d2,d3} -> survivor d1; d4/d5 may pair (suffix overlap) or not
    assert "d1" in ids and "d2" not in ids and "d3" not in ids
    assert "d6" in ids


def test_simhash_pairs(docs):
    # short docs flip more bits per word change: measured d1^d3 hamming = 9
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=12, bands=16).collect()}
    assert pairs[("d1", "d2")] == 0  # identical text -> identical simhash
    assert ("d1", "d3") in pairs and pairs[("d1", "d3")] <= 12
    assert ("d1", "d4") not in pairs  # measured hamming 39


def test_token_counts(docs, duck):
    got = add_token_counts(docs).select("doc_id", "n_tokens_ws", "n_tokens_bpe").toPandas()
    duck.register("docs", docs.toPandas())
    want = duck.sql("""
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END n_tokens_ws,
             len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) n_tokens_bpe
      FROM docs
    """).df()
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    assert (g["n_tokens_ws"] == w["n_tokens_ws"]).all()
    assert (g["n_tokens_bpe"] == w["n_tokens_bpe"]).all()


def test_quality_score_bounds(docs):
    out = add_quality_score(docs).select("doc_id", "quality", "alpha_ratio").toPandas()
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    # long clean prose scores above the 4-char fragment
    q = dict(zip(out["doc_id"], out["quality"]))
    assert q["d1"] > q["d6"]


def test_lang_id(spark):
    rows = [
        ("e", "the cat and the dog went to the house that is red"),
        ("g", "der hund und die katze sind nicht in der stadt mit den kindern"),
        ("f", "le chat et les chiens sont pour la maison que nous avons"),
        ("s", "el perro y la casa es una cosa que los gatos tienen por ahora"),
        ("u", "zzz qqq xxx yyy www"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in add_lang_id(df).collect()}
    assert got == {"e": "en", "g": "de", "f": "fr", "s": "es", "u": "und"}


def test_fingerprint_identity(docs):
    out = add_fingerprint(docs).select("doc_id", "fingerprint").toPandas()
    fp = dict(zip(out["doc_id"], out["fingerprint"]))
    assert fp["d1"] == fp["d2"]  # identical docs share fingerprints
    assert fp["d1"] != fp["d4"]
    assert out["fingerprint"].notna().all()


def test_jaccard_prefix_filter_equals_classic(spark):
    """The AllPairs prefix filter must be lossless: identical pair set and
    jaccard values to the classic shingle self-join, including near the
    threshold boundary."""
    import numpy as np

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        words = list(rng.choice(vocab, size=rng.integers(8, 25)))
        rows.append((f"d{i:02d}", " ".join(words)))
    # seed guaranteed near-dups
    rows.append(("dup_a", rows[0][1]))
    rows.append(("dup_b", rows[0][1] + " extra tail words here"))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for t in (0.2, 0.5):
        slow = ngram_jaccard_pairs(df, threshold=t, n=3, prefix_filter=False).toPandas()
        s = slow.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        # every k of the generalized prefix theorem must be lossless, incl.
        # k above the tiny docs' guaranteed overlap (the min() clamp)
        for k in (1, 2, 3):
            fast = ngram_jaccard_pairs(df, threshold=t, n=3, prefix_k=k).toPandas()
            f = fast.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
            assert len(f) == len(s) and len(f) > 0, (t, k, len(f), len(s))
            assert (f["doc_a"] == s["doc_a"]).all() and (f["doc_b"] == s["doc_b"]).all()
            assert np.allclose(f["jaccard"], s["jaccard"])


def test_minhash_dedup_long_chain_fixpoint(spark):
    """A duplicate CHAIN of 12 docs (doc_i a sliding 60-word window, step 15,
    over a 300-word vocabulary) must collapse to ONE survivor: adjacent docs
    share 45/75 shingle-ish words (jaccard ~0.6 >= threshold) while docs two
    steps apart share 30/90 (~0.33 < threshold), so connectivity is ONLY via
    the chain — diameter 11, far beyond the old fixed 3 iterations."""
    vocab = [f"w{i:03d}" for i in range(300)]
    rows = []
    for i in range(12):
        rows.append((f"c{i:02d}", " ".join(vocab[i * 15 : i * 15 + 60])))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = minhash_lsh_dedup(
        df, threshold=0.45, num_perm=128, bands=64, n=2
    )
    survivors = {r["doc_id"] for r in out.collect()}
    assert survivors == {"c00"}, survivors


def test_xxhash64_parity(spark):
    """functions/xxhash.py must reproduce F.xxhash64(longCol, lit(intC))
    bit-exactly — the arrow minhash engine's correctness rests on it."""
    import numpy as np

    from timeseriesvectordbpattermatcher_spark.functions.xxhash import (
        spark_xxhash64_long_int,
    )

    rng = np.random.default_rng(11)
    vals = rng.integers(-2**63, 2**63 - 1, size=1000, dtype=np.int64)
    vals[:4] = [0, -1, 2**63 - 1, -2**63]
    df = spark.createDataFrame([(int(v),) for v in vals], "v: long")
    for const in (7, 8, 38, 0, -5):
        got = np.array(
            [r[0] for r in df.select(F.xxhash64("v", F.lit(const))).collect()],
            dtype=np.int64,
        )
        want = spark_xxhash64_long_int(vals, const)
        assert (got == want).all(), const


def test_minhash_engines_identical(docs, spark):
    """arrow (default) and expr signature engines must agree byte-for-byte,
    including n_shingles and row set (null/empty texts dropped by both)."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import (
        minhash_signature,
    )

    edge = docs.unionByName(
        docs.sparkSession.createDataFrame(
            [("e_null", None), ("e_empty", ""), ("e_2w", "two words")],
            "doc_id string, text string",
        )
    )
    for num_perm, seed in ((32, 7), (16, 100)):
        a = (
            minhash_signature(edge, num_perm=num_perm, seed=seed, engine="arrow")
            .orderBy("doc_id")
            .collect()
        )
        e = (
            minhash_signature(edge, num_perm=num_perm, seed=seed, engine="expr")
            .orderBy("doc_id")
            .collect()
        )
        assert [r.asDict() for r in a] == [r.asDict() for r in e]
        assert {r["doc_id"] for r in a} == {"d1", "d2", "d3", "d4", "d5"}  # d6/edge rows too short


def test_jaccard_exact_threshold_boundary(spark):
    """A pair whose jaccard EQUALS the threshold must survive the positional
    filter: the algebraic bound t/(1+t)*(sza+szb) rounds up in FP (0.4/1.4*7
    = 2.0000000000000004) and used to prune it (review finding)."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    # 1-grams: A has 3 words, B has 4, sharing 2 -> jaccard 2/5 = 0.4
    df = spark.createDataFrame(
        [("A", "alpha beta gamma"), ("B", "alpha beta delta epsilon")],
        "doc_id string, text string",
    )
    fast = ngram_jaccard_pairs(df, threshold=0.4, n=1).collect()
    slow = ngram_jaccard_pairs(df, threshold=0.4, n=1, prefix_filter=False).collect()
    assert len(slow) == 1 and abs(slow[0]["jaccard"] - 0.4) < 1e-12
    assert {(r.doc_a, r.doc_b) for r in fast} == {("A", "B")}


def test_minhash_seed_range_guard(docs):
    """seed+p past int32 would flip Spark's literal to the hashLong kernel
    while the arrow engine emulates hashInt — reject instead of diverging."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signature,
    )

    with pytest.raises(ValueError, match="int32"):
        minhash_signature(docs, num_perm=4, seed=2**31 - 2)
    with pytest.raises(ValueError, match="int32"):
        minhash_signature(docs, num_perm=4, seed=-(2**31) - 1)
    # the expr fallback is reachable from the LSH entry points
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5, engine="expr").collect()
    }
    assert ("d1", "d2") in pairs


def test_exact_dedup_null_texts_not_collapsed(spark):
    """NULL texts hash to NULL and groupBy equates NULL keys — unparsed
    docs must pass through, not collapse into one survivor."""
    rows = [("a", "same"), ("b", "same"), ("c", None), ("d", None), ("e", None)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    assert got == ["a", "c", "d", "e"]


def test_jaccard_prefix_exact_integer_threshold(spark):
    """FP ceil inflation: 0.3*10 = 3.0000000000000004 used to shorten the
    prefix by one gram and silently drop exact-threshold pairs whose shared
    grams are the corpus's hottest (last in the frequency order)."""
    vocab = [f"u{i}" for i in range(40)]
    hot = ["h0 h1 h2", "h1 h2 h3", "h2 h3 h4"]  # 3 shared grams, made hot below
    # doc A: 12 words -> 10 grams, the 3 hot grams at the END of its order
    a_words = vocab[:7] + ["h0", "h1", "h2", "h3", "h4"]
    # doc B: exactly the 3 hot grams (5 words) -> jaccard 3/10 = threshold
    b_words = ["h0", "h1", "h2", "h3", "h4"]
    # filler docs make h-grams globally frequent (last in the ascending
    # dfreq order), pushing them OUT of doc A's prefix under the old bound
    fillers = [
        (f"f{i}", " ".join(["h0", "h1", "h2", "h3", "h4"] + vocab[20 + i : 23 + i]))
        for i in range(8)
    ]
    docs = [("A", " ".join(a_words)), ("B", " ".join(b_words))] + fillers
    df = spark.createDataFrame(docs, "doc_id string, text string")
    for pf in (True, False):
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in ngram_jaccard_pairs(df, threshold=0.3, prefix_filter=pf).collect()
        }
        assert ("A", "B") in pairs, f"prefix_filter={pf} lost the exact-threshold pair"
    # and the two paths agree entirely
    got_t = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(df, threshold=0.3, prefix_filter=True).collect()
    )
    got_f = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(df, threshold=0.3, prefix_filter=False).collect()
    )
    assert got_t == got_f


def test_durable_materialization_parity(docs, spark, tmp_path):
    """MATERIALIZE_CONF=durable (reliable checkpoint through a configured
    checkpoint dir — the cluster-mode path that survives executor loss)
    must produce identical survivors and identical divergence rows to the
    default local mode; durable without a checkpoint dir raises up front."""
    from timeseriesvectordbpattermatcher_spark.operators.dedup import (
        MATERIALIZE_CONF,
        minhash_lsh_dedup,
    )

    base = sorted(r["doc_id"] for r in minhash_lsh_dedup(docs, threshold=0.4).collect())

    spark.conf.set(MATERIALIZE_CONF, "durable")
    try:
        with pytest.raises(ValueError, match="setCheckpointDir"):
            minhash_lsh_dedup(docs, threshold=0.4).collect()
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        got = sorted(r["doc_id"] for r in minhash_lsh_dedup(docs, threshold=0.4).collect())
        assert got == base

        # the other _materialize consumer: the divergence screener grid
        import pandas as pd

        from timeseriesvectordbpattermatcher_spark.operators.patterns import (
            divergence_screener,
        )
        from timeseriesvectordbpattermatcher_spark.sources.synth import synth_ohlcv

        px = synth_ohlcv(spark, n_tickers=2, n_days=300)
        cols_sorted = lambda df: df.toPandas().sort_values(  # noqa: E731
            sorted(df.columns)
        ).reset_index(drop=True)
        dur = cols_sorted(divergence_screener(px))
        spark.conf.set(MATERIALIZE_CONF, "local")
        loc = cols_sorted(divergence_screener(px))
        pd.testing.assert_frame_equal(dur, loc)
    finally:
        spark.conf.set(MATERIALIZE_CONF, "auto")


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------


def test_decontaminate_matches_duckdb(spark, duck):
    from timeseriesvectordbpattermatcher_spark.operators.dedup import decontaminate

    corpus_rows = []
    for i in range(40):
        corpus_rows.append((f"c{i:02d}", " ".join(f"w{(i * 3 + j) % 53}" for j in range(20))))
    corpus_rows += [
        ("c_bench_copy", "the quick brown fox jumps over the lazy dog again and again today"),
        ("c_partial", "prefix words here the quick brown fox jumps over the lazy dog again and again today suffix"),
        ("c_short", "too short"),
        ("c_null", None),
    ]
    bench_rows = [
        ("b0", "the quick brown fox jumps over the lazy dog again and again today"),
        ("b1", "completely different benchmark text that matches nothing in the corpus sample"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id string, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id string, text string")

    flagged = decontaminate(corpus, bench, n=13, mode="flag").toPandas()
    got_dirty = sorted(flagged[flagged.contaminated].doc_id)

    duck.register("corpus_t", __import__("pandas").DataFrame(corpus_rows, columns=["doc_id", "text"]))
    duck.register("bench_t", __import__("pandas").DataFrame(bench_rows, columns=["doc_id", "text"]))
    want_dirty = sorted(
        r[0]
        for r in duck.sql("""
        WITH cg AS (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
                 ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7] || ' ' ||
                 ws[i+8] || ' ' || ws[i+9] || ' ' || ws[i+10] || ' ' || ws[i+11] || ' ' || ws[i+12] AS ng
          FROM (SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') ws
                FROM corpus_t WHERE text IS NOT NULL),
               UNNEST(range(1, len(ws) - 11)) t(i)
        ), bg AS (
          SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
                 ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7] || ' ' ||
                 ws[i+8] || ' ' || ws[i+9] || ' ' || ws[i+10] || ' ' || ws[i+11] || ' ' || ws[i+12] AS ng
          FROM (SELECT string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') ws
                FROM bench_t),
               UNNEST(range(1, len(ws) - 11)) t(i)
        )
        SELECT DISTINCT doc_id FROM cg WHERE ng IN (SELECT ng FROM bg)
        """).fetchall()
    )
    assert got_dirty == want_dirty == ["c_bench_copy", "c_partial"]
    # drop mode == flag-false subset; null/short rows pass through
    dropped = decontaminate(corpus, bench, n=13, mode="drop")
    assert sorted(r["doc_id"] for r in dropped.select("doc_id").collect()) == sorted(
        flagged[~flagged.contaminated].doc_id
    )
    assert {"c_short", "c_null"} <= set(flagged[~flagged.contaminated].doc_id)


def test_decontaminate_broadcasts_benchmark(spark, tmp_path):
    from timeseriesvectordbpattermatcher_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [(f"c{i}", " ".join(f"x{i}w{j}" for j in range(15))) for i in range(50)],
        "doc_id string, text string",
    )
    p = str(tmp_path / "corpus.parquet")
    corpus.write.parquet(p)
    bench = spark.createDataFrame([("b0", "a b c d e f g h i j k l m")],
                                  "doc_id string, text string")
    plan = (
        decontaminate(spark.read.parquet(p), bench, n=13)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]
    with __import__("pytest").raises(ValueError):
        decontaminate(corpus, bench, mode="purge")


def test_jaccard_hot_gram_skew_probe(spark):
    """Skew probe for the jaccard candidate join (survey round-5 item,
    sibling of tests/test_rollup.py::test_skewed_hot_key_salted_rollup):
    one gram appears in 50% of all docs — the classic shingle self-join
    would put d^2/2 ~ 31k rows on that single join key (one reducer's
    straggler task at 100 TB). Pins three things:

    1. suppression — the hot gram sorts LAST in the (doc-frequency, hash)
       order, so it falls outside every doc's k-extended prefix and never
       reaches the candidate join AT ALL (0 prefix rows), while the raw
       gram stream carries its full 250-doc frequency;
    2. fanout bound — the max per-gram document frequency in the candidate
       stream stays at the near-dup cluster size (no d^2 partition forms),
       vs the classic path whose hottest key is the corpus' hot share;
    3. exactness — the filtered output still equals the classic self-join
       on the same corpus (the suppression is lossless, not lossy).
    """
    import numpy as np

    from timeseriesvectordbpattermatcher_spark.operators.dedup import (
        _ordered_prefix_stream,
        ngrams_col,
        words_col,
    )

    n_docs, t, k = 500, 0.5, 2
    rows = []
    for i in range(n_docs):
        # 8 words no other doc has (alphanumeric only: words_col splits on
        # anything else, so an underscore would leak shared digit tokens)
        uniq = [f"u{i}a{j}" for j in range(8)]
        words = (["hot"] if i % 2 == 0 else [f"c{i}"]) + uniq
        rows.append((f"d{i:03d}", " ".join(words)))
    # a genuine near-dup cluster so exactness has qualifying pairs to check:
    # 3 docs, each = hot + 8 shared + 1 own tail word (10 grams), pairwise
    # sharing 9 of 10 -> jaccard 9/11 ~ 0.818. 'hot' sits inside these
    # qualifying pairs, so its suppression must be covered by the rarer
    # shared grams surviving in both prefixes.
    shared = " ".join(f"s{j}" for j in range(8))
    for tag in ("x", "y", "z"):
        rows.append((f"dup_{tag}", f"hot {shared} tail{tag}"))
    df = spark.createDataFrame(rows, "doc_id string, text string")

    # same per-doc gram construction as ngram_jaccard_pairs (n=1: grams are
    # the whitespace words, so 'hot' is itself a gram)
    per_doc = df.select(
        "doc_id",
        F.array_distinct(
            F.transform(ngrams_col(words_col("text"), 1), lambda g: F.xxhash64(g))
        ).alias("_grams"),
    )
    grams = per_doc.select("doc_id", F.explode("_grams").alias("ng"))
    _, prefix = _ordered_prefix_stream(grams, t, k, "doc_id", materialize=False)

    hot_hash = spark.sql("SELECT xxhash64('hot') AS h").collect()[0]["h"]
    hot_raw = grams.filter(F.col("ng") == hot_hash).count()
    assert hot_raw >= n_docs // 2  # the skew is real in the gram stream...
    # ...and the prefix stream suppresses it completely: even docs have
    # sz=9, o_min=5 (5/9 >= 0.5, 4/9 < 0.5), prefix len = 9-5+2 = 6 while
    # 'hot' (highest doc frequency in the corpus) sorts at rank 9; the dup
    # cluster has sz=10, o_min=5, prefix len = 7 and 'hot' at rank 10
    assert prefix.filter(F.col("ng") == hot_hash).count() == 0

    # fanout bound: hottest candidate-join key across the WHOLE prefix
    # stream is the near-dup cluster, not the corpus' 50% share
    max_df = (
        prefix.groupBy("ng").count().agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    assert max_df <= 3, max_df  # the dup cluster's shared grams

    # losslessness on this corpus shape (hot gram inside a qualifying pair:
    # dup_x/dup_y/dup_z all contain 'hot', and their pairs must survive its
    # suppression because rarer shared grams remain in both prefixes)
    fast = ngram_jaccard_pairs(df, threshold=t, n=1, prefix_k=k).toPandas()
    slow = ngram_jaccard_pairs(df, threshold=t, n=1, prefix_filter=False).toPandas()
    f = fast.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    s = slow.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(f) == len(s) >= 3, (len(f), len(s))
    assert (f["doc_a"] == s["doc_a"]).all() and (f["doc_b"] == s["doc_b"]).all()
    assert np.allclose(f["jaccard"], s["jaccard"])


def test_repetition_signals_match_duckdb(spark, duck):
    """Gopher-style repetition signals vs an independent DuckDB recompute
    (explode + group-by counts — a different algorithm than the engine's
    sorted run-length aggregate, so agreement is evidence, not echo)."""
    import numpy as np

    from timeseriesvectordbpattermatcher_spark.operators.textstats import (
        add_repetition_signals,
    )

    rows = [
        ("clean", "the quick brown fox jumps over one lazy dog tonight\nand then "
                  "it ran far away to the hills beyond the river"),
        ("spamlines", "buy now\nbuy now\nbuy now\nbuy now\nunique closing line"),
        ("spamgrams", "spam ham spam ham spam ham spam ham eggs and toast"),
        ("oneline", "single line of perfectly ordinary text"),
        ("empty", ""),
        ("nulldoc", None),
        ("punct", "Hello, WORLD!! Hello, world?? hello --- world."),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = (
        add_repetition_signals(df, top_n=2, dup_n=3)
        .select("doc_id", "dup_line_frac", "dup_line_char_frac",
                "top_ngram_char_frac", "dup_ngram_char_frac")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )

    duck.register("rep_docs", __import__("pandas").DataFrame(
        rows, columns=["doc_id", "text"]))
    want = duck.sql("""
        WITH lines AS (
          SELECT doc_id, trim(l) AS line
          FROM rep_docs, unnest(string_split(text, chr(10))) AS t(l)
          WHERE trim(l) <> ''
        ),
        lc AS (
          SELECT doc_id, line, count(*) AS c, length(line) AS len
          FROM lines GROUP BY 1, 2
        ),
        lstats AS (
          SELECT doc_id,
                 1.0 - count(*) / sum(c) AS dup_line_frac,
                 coalesce(sum(CASE WHEN c > 1 THEN c*len END), 0) / sum(c*len)
                   AS dup_line_char_frac
          FROM lc GROUP BY doc_id
        ),
        w AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text),
                     '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
          FROM rep_docs
          WHERE trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) <> ''
        ),
        gexp AS (
          SELECT doc_id, n, unnest(list_transform(
                   generate_series(1, len(ws) - n + 1),
                   i -> array_to_string(ws[i:i+n-1], ' '))) AS g
          FROM w, (VALUES (2), (3)) AS ns(n)
        ),
        gc AS (
          SELECT doc_id, n, g, count(*) AS c, length(g) AS len
          FROM gexp GROUP BY 1, 2, 3
        ),
        gstats AS (
          SELECT doc_id,
                 max(CASE WHEN n = 2 THEN c*len END)
                   / sum(CASE WHEN n = 2 THEN c*len END) AS top_ngram_char_frac,
                 coalesce(sum(CASE WHEN n = 3 AND c > 1 THEN c*len END), 0)
                   / sum(CASE WHEN n = 3 THEN c*len END) AS dup_ngram_char_frac
          FROM gc GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(l.dup_line_frac, 0)       AS dup_line_frac,
               coalesce(l.dup_line_char_frac, 0)  AS dup_line_char_frac,
               coalesce(g.top_ngram_char_frac, 0) AS top_ngram_char_frac,
               coalesce(g.dup_ngram_char_frac, 0) AS dup_ngram_char_frac
        FROM rep_docs d
        LEFT JOIN lstats l USING (doc_id)
        LEFT JOIN gstats g USING (doc_id)
    """).df().set_index("doc_id").sort_index()

    assert list(got.index) == list(want.index)
    for col in got.columns:
        assert np.allclose(got[col], want[col]), (col, got[col], want[col])
    # every signal is a fraction, and the planted spam docs actually fire
    assert ((got >= 0) & (got <= 1)).all().all()
    assert got.loc["spamlines", "dup_line_frac"] == 0.6  # 5 lines, 2 distinct
    assert got.loc["spamlines", "dup_line_char_frac"] > 0.5
    assert got.loc["spamgrams", "top_ngram_char_frac"] > 0.35  # "spam ham"x4: 32/81 chars
    assert got.loc["spamgrams", "dup_ngram_char_frac"] > 0.5
    assert got.loc["clean"].max() < 0.35
    assert got.loc[["empty", "nulldoc"]].max().max() == 0.0


def test_paragraph_dedup_matches_duckdb(spark, duck):
    """CCNet-style paragraph dedup vs an independent DuckDB window-SQL
    recompute: corpus-wide first occurrence survives, boilerplate-only docs
    drop, normalization collapses case/whitespace variants, carried columns
    and null-text docs ride through."""
    import pandas as pd

    from timeseriesvectordbpattermatcher_spark.operators.dedup import paragraph_dedup

    BP = "This site uses cookies.\nAccept to continue."
    rows = [
        ("a1", "web", f"{BP}\n\nUnique prose of doc one."),
        ("a2", "web", f"Doc two opening.\n\n{BP}\n\nDoc two closing."),
        # case/whitespace variant of the boilerplate -> same digest
        ("a3", "web", "THIS  site   uses cookies.\nACCEPT to  continue.\n\nThird doc body."),
        ("bp_only", "web", BP),
        ("blank", "web", "\n\n \n\n"),
        ("nulldoc", "web", None),
        ("clean", "news", "Fully unique paragraph.\n\nAnother unique paragraph."),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = paragraph_dedup(df).toPandas().sort_values("doc_id").reset_index(drop=True)

    duck.register("pd_docs", pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
    want = duck.sql(r"""
        WITH parts AS (
          SELECT doc_id, source, string_split(text, chr(10)||chr(10)) AS ps
          FROM pd_docs WHERE text IS NOT NULL
        ),
        p AS (
          SELECT doc_id, source, i AS pidx, ps[i] AS para
          FROM parts, unnest(generate_series(1, len(ps))) AS t(i)
          WHERE trim(ps[i]) <> ''
        ),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY regexp_replace(trim(lower(para)), '\s+', ' ', 'g')
            ORDER BY doc_id, pidx) AS rk
          FROM p
        )
        SELECT doc_id, any_value(source) AS source,
               string_agg(para, chr(10)||chr(10) ORDER BY pidx) AS text
        FROM r WHERE rk = 1 GROUP BY doc_id
        ORDER BY doc_id
    """).df()

    got_nonnull = out[out.text.notna()].reset_index(drop=True)
    assert list(got_nonnull.doc_id) == list(want.doc_id)
    assert list(got_nonnull.source) == list(want.source)
    assert list(got_nonnull.text) == list(want.text)
    # semantics spot-checks
    by_id = dict(zip(out.doc_id, out.text))
    assert by_id["a1"].startswith(BP)               # first occurrence keeps it
    assert BP not in by_id["a2"]                    # later docs lose it
    assert by_id["a2"] == "Doc two opening.\n\nDoc two closing."
    assert by_id["a3"] == "Third doc body."         # variant collapsed too
    assert "bp_only" not in by_id and "blank" not in by_id
    assert by_id["nulldoc"] is None                 # null text passes through
    assert by_id["clean"] == "Fully unique paragraph.\n\nAnother unique paragraph."


def test_gopher_rules_match_duckdb(spark, duck):
    """Gopher word-level rules vs an independent DuckDB recompute of all
    seven columns (list/regex functions, not the Spark expressions)."""
    from timeseriesvectordbpattermatcher_spark.operators.textstats import (
        add_gopher_rules,
    )

    prose = ("the quick brown fox jumps over the lazy dog and then it ran "
             "far away to have a rest with friends near the river that "
             "flows beyond the hills while birds sing softly in the trees "
             "and the evening light fades over quiet fields of grain "
             "where farmers walk home slowly after work")  # > 50 words
    rows = [
        ("clean", prose),
        ("short", "too short to pass the word count rule"),
        ("bullets", "\n".join(f"- item {i} in a long bulleted list" for i in range(10))),
        ("ellipsis", "so it goes...\nand more...\nthen silence…\nplain end"),
        ("symbols", "# " * 30 + "hash heavy text with the and of that"),
        ("numeric", " ".join(str(i) for i in range(60))),
        ("nostops", " ".join(f"w{i}" for i in range(60))),
        ("empty", ""),
        ("nulldoc", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    cols = ["gopher_n_words", "symbol_word_ratio", "bullet_line_frac",
            "ellipsis_line_frac", "alpha_word_frac", "gopher_stop_hits",
            "gopher_pass"]
    got = (
        add_gopher_rules(df, min_words=50)
        .select("doc_id", *cols)
        .toPandas().set_index("doc_id").sort_index()
    )

    import pandas as pd

    duck.register("gq_docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = duck.sql(r"""
      WITH base AS (
        SELECT doc_id,
          list_filter(regexp_split_to_array(coalesce(text,''), '\s+'),
                      w -> w != '') AS ws,
          list_filter(list_transform(string_split(coalesce(text,''), chr(10)),
                      l -> trim(l)), l -> l != '') AS ls,
          coalesce(text,'') AS t
        FROM gq_docs)
      SELECT doc_id,
        len(ws) AS gopher_n_words,
        (len(regexp_extract_all(t, '#'))
          + len(regexp_extract_all(t, '(\.\.\.|…)'))) * 1.0
          / greatest(len(ws), 1) AS symbol_word_ratio,
        len(list_filter(ls, l -> regexp_matches(l, '^[-*•]'))) * 1.0
          / greatest(len(ls), 1) AS bullet_line_frac,
        len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)$'))) * 1.0
          / greatest(len(ls), 1) AS ellipsis_line_frac,
        len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) * 1.0
          / greatest(len(ws), 1) AS alpha_word_frac,
        (CASE WHEN regexp_matches(lower(t), '\bthe\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(lower(t), '\bbe\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(lower(t), '\bto\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(lower(t), '\bof\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(lower(t), '\band\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(lower(t), '\bthat\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(lower(t), '\bhave\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(lower(t), '\bwith\b') THEN 1 ELSE 0 END
        ) AS gopher_stop_hits
      FROM base ORDER BY doc_id
    """).df().set_index("doc_id").sort_index()

    for c in cols[:-1]:
        for d in want.index:
            g, w = got.loc[d, c], want.loc[d, c]
            # NULL text: Spark signals are NULL except pass=False; DuckDB
            # recomputes on '' — compare only where Spark is non-null
            if g == g and g is not None:
                assert abs(float(g) - float(w)) < 1e-12, (d, c, g, w)
    # pass verdicts: independent python recompute of the thresholds
    def want_pass(d):
        r = want.loc[d]
        return bool(
            50 <= r.gopher_n_words <= 100_000
            and r.symbol_word_ratio <= 0.1
            and r.bullet_line_frac <= 0.9
            and r.ellipsis_line_frac <= 0.3
            and r.alpha_word_frac >= 0.8
            and r.gopher_stop_hits >= 2
        )
    for d in want.index:
        expect = False if d == "nulldoc" else want_pass(d)
        assert bool(got.loc[d, "gopher_pass"]) == expect, d
    assert bool(got.loc["clean", "gopher_pass"])
    for d in ("short", "symbols", "numeric", "nostops", "empty", "nulldoc"):
        assert not got.loc[d, "gopher_pass"], d


def test_c4_line_clean_matches_duckdb(spark, duck):
    """C4 line-level cleanup vs an independent DuckDB recompute."""
    from timeseriesvectordbpattermatcher_spark.operators.textstats import (
        c4_line_clean,
    )

    rows = [
        ("keep", "This line has enough words and ends well.\n"
                 "short line.\n"
                 "This javascript warning line would otherwise survive here.\n"
                 "No terminal punctuation on this long enough line\n"
                 'A quoted ending line with plenty of words here."'),
        ("empty", ""),
        ("nulldoc", None),
        ("allbad", "nope\nstill nope\ntiny.\n"),
        ("exclaim", "An exclamation line with quite enough words here!"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = (
        c4_line_clean(df, min_line_words=5)
        .select("doc_id", "text_c4", "c4_lines_kept", "c4_lines_removed")
        .toPandas().set_index("doc_id").sort_index()
    )

    import pandas as pd

    duck.register("c4l_docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = duck.sql(r"""
      WITH base AS (
        SELECT doc_id, text,
          list_transform(string_split(text, chr(10)), l -> trim(l)) AS ls
        FROM c4l_docs),
      f AS (
        SELECT doc_id, text,
          list_filter(ls, l ->
            regexp_matches(l, '[.!?"]$')
            AND len(list_filter(regexp_split_to_array(l, '\s+'),
                                w -> w != '')) >= 5
            AND NOT regexp_matches(lower(l), '\bjavascript\b')) AS keep,
          list_filter(ls, l -> l != '') AS nonblank
        FROM base)
      SELECT doc_id,
        CASE WHEN text IS NULL THEN NULL
             ELSE coalesce(array_to_string(keep, chr(10)), '') END AS text_c4,
        coalesce(len(keep), 0) AS c4_lines_kept,
        coalesce(len(nonblank) - len(keep), 0) AS c4_lines_removed
      FROM f
    """).df().set_index("doc_id").sort_index()

    for doc in got.index:
        for c in ("text_c4", "c4_lines_kept", "c4_lines_removed"):
            g, w = got.loc[doc, c], want.loc[doc, c]
            assert (pd.isna(g) and pd.isna(w)) or g == w, (doc, c, g, w)

    # the kept set is exactly the compliant lines
    kept = got.loc["keep", "text_c4"].split("\n")
    assert kept == [
        "This line has enough words and ends well.",
        'A quoted ending line with plenty of words here."',
    ]
    assert got.loc["keep", "c4_lines_removed"] == 3


def test_c4_rules_match_duckdb(spark, duck):
    """C4 document-level rules vs an independent DuckDB recompute."""
    from timeseriesvectordbpattermatcher_spark.operators.textstats import (
        add_c4_rules,
    )

    rows = [
        ("clean", "One full sentence here. Another one follows! A third?"),
        ("short", "Only one sentence lives here."),
        ("lorem", "Lorem ipsum dolor sit amet. More text. And more."),
        ("brace", "Some config { nested } here. Two more. Sentences!"),
        ("bad", "This text says badx once. Another sentence. And more."),
        ("empty", ""),
        ("nulldoc", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    cols = ["c4_n_sentences", "c4_has_lorem", "c4_has_brace",
            "c4_bad_hits", "c4_pass"]
    got = (
        add_c4_rules(df, min_sentences=3, badwords=["badx", "evily"])
        .select("doc_id", *cols)
        .toPandas().set_index("doc_id").sort_index()
    )

    import pandas as pd

    duck.register("c4r_docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = duck.sql(r"""
      SELECT doc_id,
        len(regexp_extract_all(text, '[.!?](\s|$)')) AS c4_n_sentences,
        contains(lower(text), 'lorem ipsum') AS c4_has_lorem,
        contains(text, '{') AS c4_has_brace,
        (CASE WHEN regexp_matches(lower(text), '\bbadx\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(lower(text), '\bevily\b') THEN 1 ELSE 0 END
        ) AS c4_bad_hits,
        coalesce(
          len(regexp_extract_all(text, '[.!?](\s|$)')) >= 3
          AND NOT contains(lower(text), 'lorem ipsum')
          AND NOT contains(text, '{')
          AND NOT (regexp_matches(lower(text), '\bbadx\b')
                   OR regexp_matches(lower(text), '\bevily\b')),
          FALSE) AS c4_pass
      FROM c4r_docs
    """).df().set_index("doc_id").sort_index()

    for doc in got.index:
        for c in cols:
            g, w = got.loc[doc, c], want.loc[doc, c]
            assert (pd.isna(g) and pd.isna(w)) or g == w, (doc, c, g, w)
    assert bool(got.loc["clean", "c4_pass"])
    assert not any(
        got.loc[d, "c4_pass"]
        for d in ("short", "lorem", "brace", "bad", "empty", "nulldoc")
    )
