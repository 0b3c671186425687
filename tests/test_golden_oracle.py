"""The committed golden fixtures for the oracle-backed contract queries must
equal a fresh recomputation from the pure-pandas reference-semantics oracle
(tests/oracle/pandas_oracle.py) — the CI regen gate from VERDICT r2 item 1:
a golden can no longer drift from the implementation that claims to produce
it, and the producing implementation is not the engine under test."""

from __future__ import annotations

import os

import pandas as pd
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _assert_equal(golden: pd.DataFrame, fresh: pd.DataFrame):
    assert sorted(golden.columns) == sorted(fresh.columns)
    cols = sorted(golden.columns)
    g = golden[cols].sort_values(cols).reset_index(drop=True)
    f = fresh[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, f, check_dtype=False)


@pytest.mark.parametrize(
    "name",
    [
        "multi_stop", "vcp_patterns", "trade_sim", "divergence",
        "pattern_screener", "box_detection", "trend_range",
        "minhash_dedup", "simhash_pairs",
        "token_segmentation", "matcher_pipeline", "media_features",
        "codec_roundtrip", "ann_recall",
    ],
)
def test_golden_matches_pandas_oracle(spark, name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_goldens",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "make_goldens.py"),
    )
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)
    golden = pd.read_parquet(os.path.join(GOLDEN_DIR, f"{name}.parquet"))
    fresh = mg._oracle_frame(name, spark)
    _assert_equal(golden, fresh)


def test_pure_xxh64_matches_spark(spark):
    """tests/oracle/xxh64_pure.py is the dedup oracle's hash foundation —
    pin it against F.xxhash64 itself (strings incl. unicode and >=32-byte
    stripes, string+int chaining, multi-long chaining)."""
    import random
    import string as st

    from pyspark.sql import functions as F

    from tests.oracle import xxh64_pure as X

    rng = random.Random(5)
    strs = ["", "a", "abc", "abcd", "abcdefg", "x" * 8, "y" * 31, "z" * 32,
            "w" * 33, "q" * 100, "héllo wörld", "日本語テキスト"] + [
        "".join(rng.choices(st.printable, k=rng.randint(0, 120))) for _ in range(60)
    ]
    df = spark.createDataFrame([(s,) for s in strs], "s: string")
    got = [tuple(r) for r in df.select(F.xxhash64("s"), F.xxhash64("s", F.lit(7))).collect()]
    want = [
        (X.to_i64(X.hash_bytes(s.encode("utf-8"), 42)), X.spark_xxhash64_str_int(s, 7))
        for s in strs
    ]
    assert got == want
    longs = [rng.randint(-2**63, 2**63 - 1) for _ in range(4)]
    dfl = spark.createDataFrame([tuple(longs)], "a long, b long, c long, d long")
    assert dfl.select(F.xxhash64("a", "b", "c", "d")).first()[0] == X.spark_xxhash64_longs(longs)


def test_dedup_oracle_matches_engine(spark):
    """The dedup oracle must reproduce the engine's signatures, verified
    pairs, survivors, and simhash pairs on a small adversarial corpus
    (dups, near-dups, chains, empty/null/short texts) — this is the test
    that makes the regenerated minhash/simhash goldens meaningful."""
    from pyspark.sql import functions as F

    from tests.oracle import dedup_oracle as do
    from timeseriesvectordbpattermatcher_spark.operators.dedup import (
        minhash_lsh_dedup,
        minhash_lsh_pairs,
        minhash_signature,
        simhash_pairs,
    )

    vocab = [f"w{i:03d}" for i in range(120)]
    docs = [
        ("a1", " ".join(vocab[0:60])),
        ("a2", " ".join(vocab[0:60])),                 # exact dup
        ("a3", " ".join(vocab[5:65])),                 # near dup / chain hop
        ("a4", " ".join(vocab[10:70])),                # chain hop 2
        ("b1", " ".join(reversed(vocab[40:110]))),
        ("c0", "tiny"),
        ("c1", ""),
        ("c2", None),
        ("c3", "Punct!!! and   CAPS?? normalize-me 42 42 42"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")

    eng_sig = {r["doc_id"]: list(r["minhash"]) for r in minhash_signature(df).collect()}
    ora_sig = {}
    for d, t in docs:
        s = do.minhash_signature(t)
        if s is not None:
            ora_sig[d] = s
    assert eng_sig == ora_sig

    eng_pairs = {(r["doc_a"], r["doc_b"], round(r["jaccard_est"], 9))
                 for r in minhash_lsh_pairs(df, threshold=0.4).collect()}
    ora_pairs = {(a, b, round(j, 9)) for a, b, j in do.minhash_pairs(docs, threshold=0.4)}
    assert eng_pairs == ora_pairs

    eng_surv = sorted(r["doc_id"] for r in minhash_lsh_dedup(df, threshold=0.4).collect())
    assert eng_surv == sorted(do.minhash_dedup_survivors(docs, threshold=0.4))

    eng_sp = sorted((r["doc_a"], r["doc_b"], r["hamming"])
                    for r in simhash_pairs(df, max_hamming=3, bands=4).collect())
    assert eng_sp == do.simhash_pairs(docs, max_hamming=3, bands=4)


def test_round_half_up_matches_spark(spark):
    """tests/oracle.round_half_up claims Spark F.round parity — pin it
    directly over random doubles plus constructed odd/2^k half-way ties
    (where Python's builtin banker's rounding diverges)."""
    import numpy as np
    from pyspark.sql import functions as F

    from tests.oracle import round_half_up

    rng = np.random.default_rng(29)
    vals = list(rng.normal(scale=10, size=200)) + [
        k / 128 for k in range(1, 40, 2)            # exact 6th-decimal ties
    ] + [
        987654.0 + k / 128 for k in (1, 3, 5)        # large-magnitude ties
    ] + [
        float(np.float32(x)) for x in rng.normal(size=50)  # float32-derived
    ] + [0.0, -0.0078125, -1.0234375, 1e-7, -1e-7]
    sdf = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = [r[0] for r in sdf.select(F.round("x", 6).alias("r")).collect()]
    want = [round_half_up(v, 6) for v in vals]
    assert got == want, [
        (v, g, w) for v, g, w in zip(vals, got, want) if g != w
    ][:5]
