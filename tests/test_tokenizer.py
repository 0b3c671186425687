"""Word-level tokenizer vs DuckDB oracles: deterministic vocab ranking,
join-vs-broadcast encode parity, roundtrip decode, and the bridge into
the engine's native token-table shape (rollup/segmentation input)."""

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.tokenizer import (
    EOS_ID,
    UNK_ID,
    build_vocab,
    decode_tokens,
    encode_oracle_sql,
    encode_text,
    vocab_oracle_sql,
)

DOCS = [
    ("d0", "the cat sat on the mat"),
    ("d1", "the dog sat on the log"),
    ("d2", "cat and dog and cat"),
    ("d3", "Entirely-NEW words: zyx!"),  # punctuation + case fold
    ("d4", ""),  # empty -> empty tokens
    ("d5", None),  # null -> empty tokens
    ("d6", "the the the"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def _duck():
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return con


def test_vocab_matches_duckdb(docs_df):
    got = build_vocab(docs_df, vocab_size=8).toPandas()
    con = _duck()
    want = con.sql(vocab_oracle_sql("docs", 8)).df()
    con.close()
    pd.testing.assert_frame_equal(
        got.sort_values("id").reset_index(drop=True),
        want.sort_values("id").reset_index(drop=True),
        check_dtype=False,
    )
    # 'the' is the clear winner; ids start at the reserved offset with
    # count-then-token ordering (and/cat/on/sat all tie at 2/2/2/2 ...)
    by_tok = dict(zip(got.token, got.id))
    assert by_tok["the"] == 2
    assert sorted(got.id) == list(range(2, 2 + len(got)))


def test_vocab_min_count_and_validation(docs_df):
    got = build_vocab(docs_df, vocab_size=100, min_count=2).toPandas()
    assert (got["count"] >= 2).all()
    assert "zyx" not in set(got.token)
    with pytest.raises(ValueError):
        build_vocab(docs_df, vocab_size=0)


@pytest.mark.parametrize("add_eos", [False, True])
def test_encode_join_matches_duckdb(docs_df, add_eos):
    vocab = build_vocab(docs_df, vocab_size=6)
    got = (
        encode_text(docs_df, vocab, method="join", add_eos=add_eos)
        .select("doc_id", "tokens", "n_tok")
        .orderBy("doc_id")
        .toPandas()
    )
    con = _duck()
    con.register("vocab", vocab.toPandas())
    want = con.sql(
        encode_oracle_sql("docs", "vocab", add_eos=add_eos)
        + " ORDER BY doc_id"
    ).df()
    con.close()
    assert list(got.doc_id) == list(want.doc_id)
    for g, w in zip(got.itertuples(), want.itertuples()):
        assert list(g.tokens) == list(w.tokens), (g.doc_id, g.tokens, w.tokens)
        assert g.n_tok == w.n_tok


@pytest.mark.parametrize("add_eos", [False, True])
def test_encode_broadcast_equals_join(docs_df, add_eos):
    vocab = build_vocab(docs_df, vocab_size=6)
    a = (
        encode_text(docs_df, vocab, method="broadcast", add_eos=add_eos)
        .orderBy("doc_id").collect()
    )
    b = (
        encode_text(docs_df, vocab, method="join", add_eos=add_eos)
        .orderBy("doc_id").collect()
    )
    for ra, rb in zip(a, b):
        assert ra["doc_id"] == rb["doc_id"]
        assert list(ra["tokens"]) == list(rb["tokens"]), ra["doc_id"]
        assert ra["n_tok"] == rb["n_tok"]


def test_encode_semantics(docs_df):
    vocab = build_vocab(docs_df, vocab_size=6)
    rows = {
        r["doc_id"]: r
        for r in encode_text(docs_df, vocab, add_eos=True).collect()
    }
    # unk for OOV words, eos terminator everywhere (even empty/null docs)
    assert rows["d4"]["tokens"] == [EOS_ID]
    assert rows["d5"]["tokens"] == [EOS_ID]
    assert UNK_ID in rows["d3"]["tokens"]
    assert all(r["tokens"][-1] == EOS_ID for r in rows.values())
    assert all(r["n_tok"] == len(r["tokens"]) for r in rows.values())
    # every input row and column survives
    assert set(rows) == {d for d, _ in DOCS}


def test_decode_roundtrip(docs_df):
    vocab = build_vocab(docs_df, vocab_size=100)  # everything in-vocab
    enc = encode_text(docs_df, vocab)
    dec = {
        r["doc_id"]: list(r["words"])
        for r in decode_tokens(enc, vocab).collect()
    }
    assert dec["d0"] == ["the", "cat", "sat", "on", "the", "mat"]
    assert dec["d3"] == ["entirely", "new", "words", "zyx"]
    assert dec["d4"] == [] and dec["d5"] == []
    # OOV under a tiny vocab decodes to <unk>, eos to <eos>
    small = build_vocab(docs_df, vocab_size=1)
    enc2 = encode_text(docs_df, small, add_eos=True)
    dec2 = {
        r["doc_id"]: list(r["words"])
        for r in decode_tokens(enc2, small).collect()
    }
    assert dec2["d6"] == ["the", "the", "the", "<eos>"]
    assert dec2["d2"] == ["<unk>"] * 5 + ["<eos>"]


def test_encode_bad_method(docs_df):
    vocab = build_vocab(docs_df, vocab_size=4)
    with pytest.raises(ValueError):
        encode_text(docs_df, vocab, method="nope")


def test_encoded_corpus_feeds_the_token_engine(spark, docs_df):
    """The bridge contract: encode_text output + a source/ts column is a
    valid input to the engine's native token operators (rollup token
    stats + sliding segmentation) — the curated text corpus becomes the
    input_hint-shaped training table with no adapter."""
    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        add_token_stats,
    )
    from timeseriesvectordbpattermatcher_spark.operators.segmentation import (
        segment_tokens,
    )

    vocab = build_vocab(docs_df, vocab_size=8)
    table = encode_text(docs_df, vocab).withColumn(
        "source", F.lit("curated")
    )
    stats = add_token_stats(table).collect()
    by_id = {r["doc_id"]: r for r in stats}
    assert by_id["d0"]["tok_min"] is not None
    assert by_id["d4"]["tok_min"] is None  # empty doc -> null stats

    segs = segment_tokens(
        table.filter(F.col("n_tok") > 0), winsize=4, step=2
    )
    assert segs.count() > 0


def test_text_to_training_examples_chain(spark):
    """The full pipeline the tokenizer unlocks: raw TEXT -> encode ->
    pack assignment -> materialized training examples. Every token in
    every pack decodes back to a word (or eos) of its member docs, and
    the doc_offsets mask aligns with the member boundaries."""
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        materialize_packs,
        pack_sequences,
    )

    texts = [
        (f"t{i}", " ".join(f"w{(i * 7 + j) % 15}" for j in range(5 + i % 4)))
        for i in range(24)
    ]
    docs = spark.createDataFrame(texts, "doc_id string, text string")
    vocab = build_vocab(docs, vocab_size=15)
    enc = encode_text(docs, vocab, add_eos=True)
    packed = pack_sequences(enc, budget=16, seed=3)
    ex = materialize_packs(packed, budget=16, seed=3, truncate=True).collect()
    assert len(ex) > 1
    enc_by_id = {
        r["doc_id"]: list(r["tokens"]) for r in enc.collect()
    }
    total_packed = 0
    for r in ex:
        assert len(r["tokens"]) <= 16
        # the pack stream is the concatenation of its members' arrays
        stream = [t for d in r["doc_ids"] for t in enc_by_id[d]]
        assert list(r["tokens"]) == stream[:16]
        assert list(r["doc_offsets"]) == [
            sum(len(enc_by_id[d]) for d in r["doc_ids"][:k])
            for k in range(len(r["doc_ids"]))
        ]
        total_packed += r["n_tok_packed"]
    # conservation: packed + dropped == every encoded token
    dropped = sum(r["n_tok_dropped"] for r in ex)
    assert total_packed + dropped == sum(len(t) for t in enc_by_id.values())
