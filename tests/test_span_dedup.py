"""ExactSubstr-style duplicate-span removal vs a pure-python oracle that
re-derives the span hashes from the spec-derived standalone XXH64 and
applies the same keep-first + interval-union rule independently."""

import re

from tests.oracle.xxh64_pure import SPARK_SEED, hash_bytes, hash_int, to_i64
from timeseriesvectordbpattermatcher_spark.operators.dedup import (
    duplicate_span_removal,
)


def _words(text):
    cleaned = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
    return cleaned.split(" ") if cleaned else []


def _span_hashes(words, k):
    # mirror of the engine chain: word_hash = xxhash64(word) (seed 42);
    # span = fold acc -> xxhash64(acc, wh) with acc0 = 0, where
    # xxhash64(a, b) = hash_long(b, hash_long(a, 42))
    wh = [to_i64(hash_bytes(w.encode(), SPARK_SEED)) for w in words]
    out = []
    for i in range(max(len(words) - k + 1, 0)):
        acc = 0
        for h in wh[i:i + k]:
            acc = to_i64(hash_int(h % (1 << 64), hash_int(acc % (1 << 64), SPARK_SEED)))
        out.append(acc)
    return out


def _oracle(docs, k, drop_empty=True):
    """docs: list of (doc_id, text). Returns {doc_id: rebuilt_text}."""
    occ = []  # (hash, doc_id, pos)
    words = {}
    for d, t in docs:
        if t is None:
            continue
        words[d] = _words(t)
        for p, h in enumerate(_span_hashes(words[d], k)):
            occ.append((h, d, p))
    from collections import defaultdict

    by_h = defaultdict(list)
    for h, d, p in occ:
        by_h[h].append((d, p))
    starts = defaultdict(list)
    for h, dps in by_h.items():
        if len(dps) > 1:
            for d, p in sorted(dps)[1:]:
                starts[d].append(p)
    out = {}
    for d, t in docs:
        if t is None:
            out[d] = None
            continue
        if d not in starts:
            out[d] = t  # untouched docs keep original text verbatim
            continue
        cov = set()
        for s in starts[d]:
            cov.update(range(s, s + k))
        kept = [w for i, w in enumerate(words[d]) if i not in cov]
        if not kept and drop_empty:
            continue
        out[d] = " ".join(kept)
    return out


def _run(spark, docs, k, **kw):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = duplicate_span_removal(df, min_len=k, **kw).toPandas()
    return dict(zip(out.doc_id, out.text))


def test_planted_duplicate_block(spark):
    block = " ".join(f"tok{i}" for i in range(8))
    docs = [
        ("a", f"alpha opening words {block} alpha closing words"),
        ("b", f"beta intro {block} beta outro"),  # block removed here
        ("c", "gamma fully unique document body"),
        ("d", block),  # block-only doc -> drops entirely
        ("e", None),
    ]
    got = _run(spark, docs, k=8)
    want = _oracle(docs, k=8)
    assert got == want
    assert got["a"] == docs[0][1]  # first occurrence doc untouched, verbatim
    assert "tok0" not in got["b"] and got["b"] == "beta intro beta outro"
    assert "d" not in got  # dropped
    assert got["e"] is None


def test_within_doc_repeat_and_long_region(spark):
    block = " ".join(f"w{i}" for i in range(6))
    docs = [
        ("a", f"{block} middle {block}"),       # 2nd in-doc occurrence removed
        ("b", f"{block} extra tail {block} {block}"),  # long region: union covers
    ]
    got = _run(spark, docs, k=6)
    want = _oracle(docs, k=6)
    assert got == want
    assert got["a"] == f"{block} middle"


def test_unique_corpus_untouched_and_fuzz(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    vocab = [f"v{i}" for i in range(30)]
    docs = []
    for i in range(40):
        n = int(rng.integers(0, 25))
        docs.append((f"f{i:02d}", " ".join(rng.choice(vocab) for _ in range(n))))
    # small vocab + short spans: plenty of genuine collisions-by-content
    for k in (3, 5):
        got = _run(spark, docs, k=k)
        want = _oracle(docs, k=k)
        assert got == want, k
    # a corpus of fully distinct words is untouched at any k
    uniq = [(f"u{i}", " ".join(f"x{i}y{j}" for j in range(10))) for i in range(5)]
    got = _run(spark, uniq, k=3)
    assert got == dict(uniq)


def test_drop_empty_false_keeps_empty_docs(spark):
    block = " ".join(f"t{i}" for i in range(4))
    docs = [("a", block), ("b", block)]
    got = _run(spark, docs, k=4, drop_empty=False)
    assert got == {"a": block, "b": ""}
