"""DSIR hashed importance weighting + Gumbel top-k resampling vs a
pure-python oracle (standalone XXH64 from tests/oracle — no engine
imports in the recompute)."""

import math
import re

import pytest

from tests.oracle.xxh64_pure import SPARK_SEED, hash_bytes, hash_int, to_i64
from timeseriesvectordbpattermatcher_spark.operators.dsir import (
    dsir_log_weight,
    dsir_resample,
)
from timeseriesvectordbpattermatcher_spark.operators.lm import (
    train_bigram_counts,
)

TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox sleeps by the fence",
    "a lazy dog sleeps over the fence",
    "the dog jumps and the fox jumps again",
]

RAW = [
    ("r0", "the quick brown fox jumps"),        # in-domain
    ("r1", "lazy dog sleeps by the fence"),     # in-domain
    ("r2", "zxqv wvut kjih gfed mlkj"),         # out-of-domain gibberish
    ("r3", "buy cheap pills now click here"),   # out-of-domain spam
    ("r4", "the fox and the dog"),              # in-domain
    ("r5", ""),                                 # no words -> NULL
    ("r6", None),                               # NULL text -> NULL
    ("r7", "!!! ..."),                          # punctuation-only -> NULL
]

B = 1 << 12
ALPHA = 0.5
GRES = 1 << 53


def _words(text):
    if text is None:
        return []
    cleaned = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
    return cleaned.split(" ") if cleaned else []


def _b(s):
    return to_i64(hash_bytes(s.encode(), SPARK_SEED)) % B


def _feats(text):
    ws = _words(text)
    out = [_b(w) for w in ws]
    out += [_b(" ".join(ws[i:i + 2])) for i in range(len(ws) - 1)]
    return out


def _bag(texts):
    cnt = {}
    for t in texts:
        for f in _feats(t):
            cnt[f] = cnt.get(f, 0) + 1
    return cnt, sum(cnt.values())


def _oracle_logw(text, p_bag, p_n, q_bag, q_n):
    fs = _feats(text)
    if not fs:
        return None
    tot = 0.0
    for f in fs:
        tot += math.log(p_bag.get(f, 0) + ALPHA) - math.log(p_n + ALPHA * B)
        tot -= math.log(q_bag.get(f, 0) + ALPHA) - math.log(q_n + ALPHA * B)
    return tot


def _gumbel_key(logw, doc_id, seed):
    h = to_i64(hash_bytes(doc_id.encode(), hash_int(seed, SPARK_SEED)))
    u = ((h % GRES) + 0.5) / float(GRES)
    return logw - math.log(-math.log(u))


@pytest.fixture(scope="module")
def frames(spark):
    tgt = spark.createDataFrame([(t,) for t in TARGET], "text string")
    raw = spark.createDataFrame(RAW, "doc_id string, text string")
    tc = train_bigram_counts(tgt, n_buckets=B)
    rc = train_bigram_counts(raw, n_buckets=B)
    scored = dsir_log_weight(
        raw, tc, rc, n_buckets=B, alpha=ALPHA
    ).cache()
    yield raw, scored
    scored.unpersist()


def test_log_weight_matches_pure_oracle(frames):
    _, scored = frames
    p_bag, p_n = _bag(TARGET)
    q_bag, q_n = _bag([t for _, t in RAW])
    got = {r["doc_id"]: r["dsir_logw"] for r in scored.collect()}
    assert set(got) == {d for d, _ in RAW}  # every row survives
    for doc_id, text in RAW:
        want = _oracle_logw(text, p_bag, p_n, q_bag, q_n)
        if want is None:
            assert got[doc_id] is None
        else:
            assert got[doc_id] == pytest.approx(want, rel=1e-9)


def test_in_domain_outranks_out_of_domain(frames):
    _, scored = frames
    got = {r["doc_id"]: r["dsir_logw"] for r in scored.collect()}
    # every in-domain doc should beat every out-of-domain doc
    for good in ("r0", "r1", "r4"):
        for bad in ("r2", "r3"):
            assert got[good] > got[bad]


def test_resample_matches_oracle_gumbel_topk(frames):
    _, scored = frames
    p_bag, p_n = _bag(TARGET)
    q_bag, q_n = _bag([t for _, t in RAW])
    keys = {}
    for doc_id, text in RAW:
        lw = _oracle_logw(text, p_bag, p_n, q_bag, q_n)
        if lw is not None:
            keys[doc_id] = _gumbel_key(lw, doc_id, seed=7)
    want_order = sorted(keys, key=keys.get, reverse=True)

    got = dsir_resample(scored, 3, seed=7).collect()
    assert [r["doc_id"] for r in got] == want_order[:3]
    for r in got:
        assert r["dsir_key"] == pytest.approx(keys[r["doc_id"]], rel=1e-9)

    # k beyond the non-null population returns exactly the population
    all_rows = dsir_resample(scored, 100, seed=7).collect()
    assert [r["doc_id"] for r in all_rows] == want_order


def test_resample_deterministic_and_seed_sensitive(frames):
    _, scored = frames
    a = [r["doc_id"] for r in dsir_resample(scored, 3, seed=1).collect()]
    b = [r["doc_id"] for r in dsir_resample(scored, 3, seed=1).collect()]
    assert a == b
    assert len(set(a)) == 3


def test_resample_rejects_bad_k(frames):
    _, scored = frames
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_resample(scored, 0)


def test_plan_shapes(spark, frames):
    raw, scored = frames
    # a FRESH plan (the fixture's is AQE-finalized, whose toString
    # repeats operators across initial/final sections): both count
    # lookups are broadcast joins; the ONLY shuffle-join is the
    # corpus-sized join-back of per-doc weights
    tgt = spark.createDataFrame([(t,) for t in TARGET], "text string")
    fresh = dsir_log_weight(
        raw,
        train_bigram_counts(tgt, n_buckets=B),
        train_bigram_counts(raw, n_buckets=B),
        n_buckets=B,
        alpha=ALPHA,
    )
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 1
    # resample: top-k executes as TakeOrdered, not a global Sort+Limit
    rplan = (
        dsir_resample(scored, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in rplan
