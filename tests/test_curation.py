"""Curation operators: deterministic sampling / shuffle / packing /
incremental dedup — engine-free oracles (pure-python XXH64 + DuckDB)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.curation import (
    SAMPLE_RESOLUTION,
    bloom_might_contain,
    digest_bloom_words,
    incremental_exact_dedup,
    merge_bloom_words,
    incremental_minhash_dedup,
    pack_sequences,
    sample_quota,
    sample_stratified,
    shuffle_deterministic,
    upsample_stratified,
)
from timeseriesvectordbpattermatcher_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
)

from tests.oracle.xxh64_pure import SPARK_SEED, hash_bytes, hash_int, to_i64


def _h_seed_str(seed: int, s: str) -> int:
    """Pure-python ``F.xxhash64(F.lit(seed), F.col(strCol))``."""
    return to_i64(hash_bytes(s.encode("utf-8"), hash_int(seed, SPARK_SEED)))


def _mk_docs(spark, n=600):
    rows = []
    for i in range(n):
        src = ["web", "books", "code"][i % 3]
        text = " ".join(f"w{(i * 7 + j) % 101}" for j in range(20))
        rows.append((f"d{i:05d}", text, src, 20 + (i % 50)))
    return (
        spark.createDataFrame(
            rows, "doc_id string, text string, source string, n_tok int"
        ),
        rows,
    )


# --------------------------------------------------------------------------
# sample_stratified
# --------------------------------------------------------------------------


def test_sample_stratified_matches_pure_oracle(spark):
    df, rows = _mk_docs(spark)
    fr = {"web": 0.3, "books": 1.0}
    got = sorted(
        r["doc_id"]
        for r in sample_stratified(
            df, fr, seed=11, default_fraction=0.5
        ).collect()
    )
    want = []
    for doc_id, _t, src, _n in rows:
        frac = fr.get(src, 0.5)
        u = _h_seed_str(11, doc_id) % SAMPLE_RESOLUTION
        if u < int(round(frac * SAMPLE_RESOLUTION)):
            want.append(doc_id)
    assert got == sorted(want)
    assert 0 < len(got) < len(rows)


def test_sample_books_kept_verbatim(spark):
    df, rows = _mk_docs(spark)
    out = sample_stratified(df, {"books": 1.0}, seed=3, default_fraction=0.0)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        d for d, _t, s, _n in rows if s == "books"
    )


def test_sample_nested_subset(spark):
    df, _ = _mk_docs(spark)
    small = {r["doc_id"] for r in sample_stratified(df, {}, default_fraction=0.1, seed=5).collect()}
    big = {r["doc_id"] for r in sample_stratified(df, {}, default_fraction=0.3, seed=5).collect()}
    assert small <= big


def test_sample_no_shuffle(spark, tmp_path):
    df, _ = _mk_docs(spark, n=100)
    p = str(tmp_path / "docs.parquet")
    df.write.parquet(p)
    plan = (
        sample_stratified(spark.read.parquet(p), {"web": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan[:1500]


def test_sample_validation(spark):
    df, _ = _mk_docs(spark, n=10)
    with pytest.raises(ValueError):
        sample_stratified(df, {"web": 1.5})
    with pytest.raises(ValueError):
        sample_stratified(df, {}, default_fraction=-0.1)


# --------------------------------------------------------------------------
# shuffle_deterministic
# --------------------------------------------------------------------------


def test_shuffle_total_order_and_layout_independence(spark):
    df, rows = _mk_docs(spark, n=500)
    want = sorted(
        (d for d, _t, _s, _n in rows),
        key=lambda d: (_h_seed_str(9, d), d),
    )
    got_a = [r["doc_id"] for r in shuffle_deterministic(df.repartition(7), seed=9).collect()]
    got_b = [r["doc_id"] for r in shuffle_deterministic(df.repartition(3), seed=9).collect()]
    assert got_a == want
    assert got_b == want
    got_other_seed = [r["doc_id"] for r in shuffle_deterministic(df, seed=10).collect()]
    assert got_other_seed != want  # a new seed is a new epoch order


# --------------------------------------------------------------------------
# pack_sequences
# --------------------------------------------------------------------------


def _pack_oracle_duckdb(rows, budget, seed, shard_of):
    pdf = pd.DataFrame(
        {
            "doc_id": [d for d, _t, _s, _n in rows],
            "n_tok": [n for _d, _t, _s, n in rows],
            "shard": [shard_of(d, s) for d, _t, s, _n in rows],
            "ord": [_h_seed_str(seed, d) for d, _t, _s, _n in rows],
        }
    )
    con = duckdb.connect()
    con.register("t", pdf)
    return {
        (r[0]): (r[1], r[2])
        for r in con.sql(
            f"""
            SELECT doc_id, shard,
                   CAST(floor((sum(n_tok) OVER w - n_tok) / {budget}) AS BIGINT) AS pack_id
            FROM t
            WINDOW w AS (PARTITION BY shard ORDER BY ord, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            """
        ).fetchall()
    }


def test_pack_sequences_keyed_matches_duckdb(spark):
    df, rows = _mk_docs(spark)
    out = pack_sequences(df, budget=256, key_col="source", seed=4)
    got = {r["doc_id"]: (r["pack_shard"], r["pack_id"]) for r in out.collect()}
    want = _pack_oracle_duckdb(rows, 256, 4, shard_of=lambda d, s: s)
    assert got == want


def test_pack_sequences_sharded_matches_duckdb(spark):
    df, rows = _mk_docs(spark)
    out = pack_sequences(df, budget=512, key_col=None, n_shards=4, seed=4)
    got = {r["doc_id"]: (r["pack_shard"], r["pack_id"]) for r in out.collect()}
    want = _pack_oracle_duckdb(
        rows, 512, 4, shard_of=lambda d, s: _h_seed_str(5, d) % 4
    )
    assert got == want


def test_pack_boundary_invariants(spark):
    """Pack k owns the docs whose first token falls in
    [k*budget, (k+1)*budget) of the shard's concatenated stream: every
    non-final pack ends at or past its boundary, and overflow past the
    boundary is less than the pack's final doc."""
    budget = 300
    df, rows = _mk_docs(spark)
    out = pack_sequences(df, budget=budget, key_col="source", seed=2).toPandas()
    out["ord"] = [_h_seed_str(2, d) for d in out["doc_id"]]
    out = out.sort_values(["pack_shard", "ord", "doc_id"])
    for _shard, shard_rows in out.groupby("pack_shard"):
        cum = shard_rows.n_tok.cumsum()
        ends = cum.groupby(shard_rows.pack_id.values).max()
        last_docs = shard_rows.groupby("pack_id").n_tok.last()
        max_pid = shard_rows.pack_id.max()
        for pid, end in ends.items():
            if pid != max_pid:
                assert end >= (pid + 1) * budget, (_shard, pid, end)
            assert end - (pid + 1) * budget < last_docs[pid] or end < (pid + 1) * budget


def test_pack_single_exchange(spark, tmp_path):
    df, _ = _mk_docs(spark, n=100)
    p = str(tmp_path / "docs.parquet")
    df.write.parquet(p)
    plan = (
        pack_sequences(spark.read.parquet(p), budget=256, key_col="source")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange ") == 1, plan[:2000]


def test_pack_null_and_validation(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", 5)], "doc_id string, n_tok int"
    )
    out = pack_sequences(df, budget=10, key_col=None, n_shards=1)
    assert out.count() == 2  # null token count packs as 0, row kept
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)


# --------------------------------------------------------------------------
# incremental exact dedup
# --------------------------------------------------------------------------


def _two_batches(spark):
    """b1: ids 0..59; b2: ids 100..159. b2 repeats b1's text for ids
    100..119 (cross-batch exact dups) and repeats its own text at
    140..149 (in-batch dups)."""
    def text_of(i):
        return " ".join(f"t{(i * 3 + j) % 37}" for j in range(15))

    b1 = [(f"a{i:04d}", text_of(i)) for i in range(60)]
    b2 = []
    for i in range(100, 160):
        if i < 120:
            t = text_of(i - 100)          # dup of batch 1
        elif 140 <= i < 150:
            t = text_of(i - 10 - 100)     # dup of b2's own 130..139
        else:
            t = text_of(i)
        b2.append((f"b{i:04d}", t))
    schema = "doc_id string, text string"
    return spark.createDataFrame(b1, schema), spark.createDataFrame(b2, schema)


def test_incremental_exact_equals_batch_rerun(spark):
    b1, b2 = _two_batches(spark)
    s1, d1 = incremental_exact_dedup(b1, None)
    s2, d2 = incremental_exact_dedup(b2, d1)
    folded = sorted(r["doc_id"] for r in s1.unionByName(s2).collect())
    batch = sorted(
        r["doc_id"] for r in exact_dedup(b1.unionByName(b2)).collect()
    )
    assert folded == batch
    # the store never holds a digest twice across the two appends
    all_digests = [r["digest"] for r in d1.unionByName(d2).collect()]
    assert len(all_digests) == len(set(all_digests))


def test_incremental_exact_null_text_passthrough(spark):
    df = spark.createDataFrame(
        [("x1", None), ("x2", "hello world"), ("x3", None)],
        "doc_id string, text string",
    )
    surv, digs = incremental_exact_dedup(df, None)
    assert surv.count() == 3
    assert digs.count() == 1
    surv2, digs2 = incremental_exact_dedup(
        spark.createDataFrame([("y1", None), ("y2", "hello world")],
                              "doc_id string, text string"),
        digs,
    )
    got = sorted(r["doc_id"] for r in surv2.collect())
    assert got == ["y1"]  # y2 is in the store; y1's NULL passes through
    assert digs2.count() == 0


# --------------------------------------------------------------------------
# digest bloom + broadcast store probe
# --------------------------------------------------------------------------


# engine-free oracle (standalone XXH64) shared with the stream tests
from tests.oracle.dedup_oracle import (  # noqa: E402
    bloom_contains_oracle as _bloom_oracle_contains,
    bloom_words_oracle as _bloom_oracle,
)


def _md5(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_digest_bloom_words_match_pure_oracle(spark):
    m_bits, k = 1 << 12, 4
    digests = [_md5(f"doc {i}") for i in range(200)]
    df = spark.createDataFrame([(d,) for d in digests] + [(None,)], "digest string")
    got = digest_bloom_words(df, m_bits=m_bits, k=k)
    assert got == _bloom_oracle(digests, m_bits, k)


def test_bloom_merge_equals_union(spark):
    m_bits, k = 1 << 10, 3
    d1 = [_md5(f"a{i}") for i in range(80)]
    d2 = [_md5(f"b{i}") for i in range(80)]
    w1 = _bloom_oracle(d1, m_bits, k)
    w2 = _bloom_oracle(d2, m_bits, k)
    assert merge_bloom_words(w1, w2) == _bloom_oracle(d1 + d2, m_bits, k)
    with pytest.raises(ValueError, match="m_bits mismatch"):
        merge_bloom_words(w1, w1[:-1])


def test_bloom_might_contain_exact_and_no_false_negatives(spark):
    m_bits, k = 1 << 10, 3  # deliberately small: force some false positives
    members = [_md5(f"m{i}") for i in range(150)]
    others = [_md5(f"o{i}") for i in range(150)]
    words = _bloom_oracle(members, m_bits, k)
    df = spark.createDataFrame(
        [(d,) for d in members + others] + [(None,)], "digest string"
    )
    got = {
        r["digest"]: r["bloom_hit"]
        for r in bloom_might_contain(df, words, m_bits, k).collect()
    }
    for d in members:
        assert got[d] is True  # no false negatives, ever
    for d in others:  # exact oracle agreement, false positives included
        assert got[d] == _bloom_oracle_contains(words, d, m_bits, k)
    assert got[None] is False
    fps = sum(got[d] for d in others)
    assert fps < len(others)  # the small bloom still rejects most non-members


def test_incremental_broadcast_probe_parity(spark):
    b1, b2 = _two_batches(spark)
    _, d1 = incremental_exact_dedup(b1, None)
    want = sorted(
        r["doc_id"] for r in incremental_exact_dedup(b2, d1)[0].collect()
    )
    # plain broadcast probe
    s_b, dg_b = incremental_exact_dedup(b2, d1, probe="broadcast")
    assert sorted(r["doc_id"] for r in s_b.collect()) == want
    # bloom-pruned broadcast probe (bloom built over the store)
    m_bits, k = 1 << 12, 5
    words = digest_bloom_words(d1, m_bits=m_bits, k=k)
    s_f, dg_f = incremental_exact_dedup(
        b2, d1, probe="broadcast", bloom_words=words,
        bloom_m_bits=m_bits, bloom_k=k,
    )
    assert sorted(r["doc_id"] for r in s_f.collect()) == want
    assert sorted(r["digest"] for r in dg_f.collect()) == sorted(
        r["digest"] for r in dg_b.collect()
    )
    with pytest.raises(ValueError, match="probe"):
        incremental_exact_dedup(b2, d1, probe="nope")
    with pytest.raises(ValueError, match="broadcast"):
        incremental_exact_dedup(b2, d1, probe="shuffle", bloom_words=words)
    # probe='auto' + bloom resolves to broadcast (no raise), same rows
    s_a, _ = incremental_exact_dedup(
        b2, d1, bloom_words=words, bloom_m_bits=m_bits, bloom_k=k,
    )
    assert sorted(r["doc_id"] for r in s_a.collect()) == want


def test_incremental_broadcast_skip_scan_when_clean(spark):
    b1, b2 = _two_batches(spark)
    disjoint = spark.createDataFrame(
        [(f"z{i}", f"totally new text {i}") for i in range(30)],
        "doc_id string, text string",
    )
    _, d1 = incremental_exact_dedup(b1, None)
    m_bits, k = 1 << 14, 5
    words = digest_bloom_words(d1, m_bits=m_bits, k=k)
    surv, digs = incremental_exact_dedup(
        disjoint, d1, probe="broadcast", bloom_words=words,
        bloom_m_bits=m_bits, bloom_k=k, skip_scan_when_clean=True,
    )
    assert surv.count() == 30 and digs.count() == 30
    # overlapping batch still probes the store correctly with the flag on
    surv2, _ = incremental_exact_dedup(
        b2, d1, probe="broadcast", bloom_words=words,
        bloom_m_bits=m_bits, bloom_k=k, skip_scan_when_clean=True,
    )
    want = sorted(r["doc_id"] for r in incremental_exact_dedup(b2, d1)[0].collect())
    assert sorted(r["doc_id"] for r in surv2.collect()) == want


def test_incremental_broadcast_store_never_shuffles(spark, tmp_path):
    """The whole point of probe='broadcast': zero Exchange on the store
    side — the store parquet is scanned, broadcast-semi-joined, and never
    hash-partitioned (the only hashpartitioning keys in the plan are the
    batch's own: exact_dedup internals + the candidate distinct)."""
    b1, b2 = _two_batches(spark)
    _, d1 = incremental_exact_dedup(b1, None)
    store = str(tmp_path / "digest_store")
    d1.write.parquet(store)
    seen = spark.read.parquet(store)
    # emulate the big-store regime: no auto-broadcast — only the explicit
    # broadcast() hints of the probe may produce BroadcastHashJoins
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fresh, _ = incremental_exact_dedup(b2, seen, probe="broadcast")
        plan = fresh._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(digest" not in plan, plan[:3000]
        assert "Exchange hashpartitioning(_dg" not in plan, plan[:3000]
        assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
        # the default shuffle probe, by contrast, hash-partitions the store
        fresh_sh, _ = incremental_exact_dedup(b2, seen, probe="shuffle")
        plan_sh = fresh_sh._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(_dg" in plan_sh, plan_sh[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


# --------------------------------------------------------------------------
# incremental minhash dedup
# --------------------------------------------------------------------------

_MH = dict(threshold=0.5, num_perm=32, bands=8, n=3)


def _near_docs(spark):
    base = " ".join(f"q{j}" for j in range(40))
    ws = base.split()
    near = " ".join(ws[:20] + ["zzz"] + ws[21:])          # ~1 shingle band of edits
    uniq = " ".join(f"u{j * 13 % 97}" for j in range(40))
    b1 = spark.createDataFrame(
        [("m0001", base), ("m0002", uniq)], "doc_id string, text string"
    )
    b2 = spark.createDataFrame(
        [
            ("n0001", near),                               # near-dup of stored m0001
            ("n0002", " ".join(f"v{j * 11 % 89}" for j in range(40))),  # unique
            ("n0003", " ".join(f"v{j * 11 % 89}" for j in range(40))),  # dup of n0002
        ],
        "doc_id string, text string",
    )
    return b1, b2


def test_incremental_minhash_first_increment_matches_batch(spark):
    b1, _ = _near_docs(spark)
    surv, sigs = incremental_minhash_dedup(b1, None, **_MH)
    want = sorted(r["doc_id"] for r in minhash_lsh_dedup(b1, **_MH).collect())
    assert sorted(r["doc_id"] for r in surv.collect()) == want
    assert sorted(r["doc_id"] for r in sigs.collect()) == want


def test_incremental_minhash_cross_batch(spark):
    b1, b2 = _near_docs(spark)
    s1, sigs1 = incremental_minhash_dedup(b1, None, **_MH)
    assert sorted(r["doc_id"] for r in s1.collect()) == ["m0001", "m0002"]
    s2, sigs2 = incremental_minhash_dedup(b2, sigs1, **_MH)
    got = sorted(r["doc_id"] for r in s2.collect())
    # n0001 collides with stored m0001; n0003 dedups against n0002 in-batch
    assert got == ["n0002"]
    assert sorted(r["doc_id"] for r in sigs2.collect()) == ["n0002"]


def test_incremental_minhash_short_text_passthrough(spark):
    df = spark.createDataFrame(
        [("s1", "one two"), ("s2", None)], "doc_id string, text string"
    )
    surv, sigs = incremental_minhash_dedup(df, None, **_MH)
    assert surv.count() == 2   # no shingles -> no signature -> passes through
    assert sigs.count() == 0


# --------------------------------------------------------------------------
# sample_quota / upsample_stratified
# --------------------------------------------------------------------------


def test_sample_quota_exact_counts_and_oracle(spark):
    df, rows = _mk_docs(spark)
    out = sample_quota(df, {"web": 30, "books": 10_000}, seed=8).toPandas()
    counts = out.groupby("source").size().to_dict()
    n_books = sum(1 for _d, _t, s, _n in rows if s == "books")
    n_code = sum(1 for _d, _t, s, _n in rows if s == "code")
    assert counts["web"] == 30
    assert counts["books"] == n_books  # quota above stratum size -> all kept
    assert counts["code"] == n_code    # unlisted stratum kept whole
    # oracle: the kept web rows are exactly the 30 smallest (hash, id)
    web = sorted(
        (d for d, _t, s, _n in rows if s == "web"),
        key=lambda d: (_h_seed_str(8, d), d),
    )[:30]
    assert sorted(out[out.source == "web"].doc_id) == sorted(web)
    # nested-prefix property: top-10 is a prefix of top-30
    out10 = sample_quota(df, {"web": 10}, seed=8).toPandas()
    assert set(out10[out10.source == "web"].doc_id) <= set(web)


def test_sample_quota_validation(spark):
    df, _ = _mk_docs(spark, n=10)
    with pytest.raises(ValueError):
        sample_quota(df, {"web": -1})


def test_upsample_matches_pure_oracle(spark):
    df, rows = _mk_docs(spark)
    out = (
        upsample_stratified(df, {"books": 2.5, "web": 0.25}, seed=6)
        .groupBy("doc_id").count().toPandas()
    )
    got = dict(zip(out.doc_id, out["count"]))
    want = {}
    for d, _t, s, _n in rows:
        f = {"books": 2.5, "web": 0.25}.get(s, 1.0)
        u = _h_seed_str(6, d) % SAMPLE_RESOLUTION
        n = int(f) + (1 if u < round((f - int(f)) * SAMPLE_RESOLUTION) else 0)
        if n:
            want[d] = n
    assert got == want
    # every copy carries a distinct epoch 0..n-1
    epochs = (
        upsample_stratified(df, {"books": 2.5}, seed=6)
        .filter(F.col("source") == "books")
        .groupBy("doc_id").agg(F.sort_array(F.collect_list("epoch")).alias("e"))
        .toPandas()
    )
    assert all(list(e) == list(range(len(e))) for e in epochs.e)


def test_upsample_expected_mass(spark):
    df, rows = _mk_docs(spark, n=600)
    n_books = sum(1 for _d, _t, s, _n in rows if s == "books")
    got = upsample_stratified(df, {"books": 2.5}, seed=1).filter(
        F.col("source") == "books").count()
    assert abs(got - 2.5 * n_books) < 0.15 * n_books  # hash-uniform draw


def test_pack_sequences_keyed_subsharded_matches_duckdb(spark):
    """A hot key fans out across n_shards sub-shards ('key/i'), packs stay
    key-homogeneous, and pack assignment still matches the DuckDB window."""
    df, rows = _mk_docs(spark)
    out = pack_sequences(df, budget=256, key_col="source", n_shards=3, seed=4)
    got = {r["doc_id"]: (r["pack_shard"], r["pack_id"]) for r in out.collect()}
    want = _pack_oracle_duckdb(
        rows, 256, 4,
        shard_of=lambda d, s: f"{s}/{_h_seed_str(5, d) % 3}",
    )
    assert got == want
    shards = {shard for shard, _p in got.values()}
    assert shards == {f"{s}/{i}" for s in ("web", "books", "code") for i in range(3)}


# --------------------------------------------------------------------------
# hypothesis property sweep (packing)
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4000), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=2000),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_pack_properties_hypothesis(spark, toks, budget, seed):
    """For arbitrary token counts / budgets / seeds: pack_id equals the
    cumsum formula (recomputed in pure python from the XXH64 order), packs
    are contiguous runs in hash order, and every non-final pack ends at or
    past its boundary."""
    rows = [(f"h{i:03d}", n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    out = pack_sequences(df, budget=budget, key_col=None, n_shards=1, seed=seed)
    got = {r["doc_id"]: r["pack_id"] for r in out.collect()}
    order = sorted(rows, key=lambda r: (_h_seed_str(seed, r[0]), r[0]))
    cum = 0
    want = {}
    for d, n in order:
        want[d] = cum // budget
        cum += n
    assert got == want


def test_shuffle_salt_cols_spreads_upsampled_copies(spark):
    """After upsampling, shuffle with salt_cols=['epoch'] orders by the
    (id, epoch)-hash — copies of a doc scatter instead of clumping, and
    the order matches the pure-python chain exactly."""
    from tests.oracle.xxh64_pure import hash_long, to_u64

    df, rows = _mk_docs(spark, n=200)
    up = upsample_stratified(df, {"web": 3.0, "books": 3.0, "code": 3.0}, seed=2)
    out = shuffle_deterministic(up, seed=4, salt_cols=["epoch"])
    got = [(r["doc_id"], r["epoch"]) for r in out.select("doc_id", "epoch").collect()]

    def h(d, e):
        acc = hash_int(4, SPARK_SEED)
        acc = hash_bytes(d.encode(), acc)
        return to_i64(hash_long(to_u64(e), acc))

    want = sorted(got, key=lambda t: (h(*t), t[0], t[1]))
    assert got == want
    # copies of the same doc are NOT adjacent (they would be without salt)
    adjacent_same = sum(1 for a, b in zip(got, got[1:]) if a[0] == b[0])
    assert adjacent_same < len(rows) * 0.05
    unsalted = [r["doc_id"] for r in shuffle_deterministic(up, seed=4).select("doc_id").collect()]
    clumped = sum(1 for a, b in zip(unsalted, unsalted[1:]) if a == b)
    assert clumped >= len(rows)  # every doc's 3 copies clump without salt


def test_pack_salt_cols_spreads_upsampled_copies(spark):
    """3x-upsampled docs packed with salt_cols=['epoch'] scatter: no pack
    holds all of a doc's copies (unsalted, every doc's copies are adjacent
    and usually co-packed)."""
    df, rows = _mk_docs(spark, n=120)
    up = upsample_stratified(df, {"web": 3.0, "books": 3.0, "code": 3.0}, seed=2)
    salted = pack_sequences(up, budget=200, key_col=None, n_shards=2,
                            seed=4, salt_cols=["epoch"]).toPandas()
    per_doc_packs = salted.groupby("doc_id").apply(
        lambda g: len(set(zip(g.pack_shard, g.pack_id))), include_groups=False
    )
    assert (per_doc_packs > 1).mean() > 0.9  # copies nearly always split up
    unsalted = pack_sequences(up, budget=200, key_col=None, n_shards=2,
                              seed=4).toPandas()
    same_pack_unsalted = unsalted.groupby("doc_id").apply(
        lambda g: len(set(zip(g.pack_shard, g.pack_id))) == 1, include_groups=False
    )
    same_pack_salted = (per_doc_packs == 1)
    # unsalted copies are adjacent, so they co-pack whenever they don't
    # straddle a boundary (~half the time at 3x~45 tokens vs budget 200);
    # salted copies co-pack only by chance — the gap is the point
    assert same_pack_unsalted.mean() > same_pack_salted.mean() + 0.3


def test_assign_splits_deterministic_disjoint(spark):
    """Hash-based train/val/test assignment: exact per-row agreement with
    the pure-python XXH64 oracle, exhaustive+disjoint coverage, stability
    under corpus growth (a doc's split never changes when rows are added),
    and loud rejection of malformed weights."""
    import pytest as _pytest

    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        SAMPLE_RESOLUTION,
        assign_splits,
    )

    ids = [f"doc{i:05d}" for i in range(2000)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_splits(df, weights, seed=7).toPandas()

    # oracle: same draw as the engine, pure python
    b_train = int(round(0.8 * SAMPLE_RESOLUTION))
    b_val = int(round(0.9 * SAMPLE_RESOLUTION))

    def want(doc_id):
        u = _h_seed_str(7, doc_id) % SAMPLE_RESOLUTION
        return "train" if u < b_train else ("val" if u < b_val else "test")

    got = dict(zip(out.doc_id, out.split))
    assert got == {i: want(i) for i in ids}
    # exhaustive+disjoint is structural (one column, always set); check the
    # mix lands near the weights at n=2000
    frac_train = sum(1 for s in got.values() if s == "train") / len(ids)
    assert 0.75 < frac_train < 0.85
    assert set(got.values()) == {"train", "val", "test"}

    # growth stability: assigning over a 10x corpus keeps every old doc's split
    more = spark.createDataFrame(
        [(f"doc{i:05d}",) for i in range(20000)], "doc_id string")
    grown = dict(
        zip(*(lambda p: (p.doc_id, p.split))(
            assign_splits(more, weights, seed=7).toPandas()))
    )
    assert all(grown[i] == got[i] for i in ids)

    with _pytest.raises(ValueError):
        assign_splits(df, {"train": 0.5, "val": 0.4})  # sums to 0.9
    with _pytest.raises(ValueError):
        assign_splits(df, {"train": 1.2, "val": -0.2})
    with _pytest.raises(ValueError):
        assign_splits(df, {})


# ---------------------------------------------------------------- vocab stats


def _seqs_with_null(spark, tmp_path, n=400):
    from timeseriesvectordbpattermatcher_spark.sources.synth import synth_seqs

    seqs = synth_seqs(spark, n, seed=7).select("doc_id", "tokens", "source")
    null_row = spark.createDataFrame(
        [("docnull", None, "web")], "doc_id string, tokens array<int>, source string"
    )
    path = str(tmp_path / "seqs")
    seqs.unionByName(null_row).write.parquet(path)
    return spark.read.parquet(path), path


def test_token_histogram_matches_duckdb(spark, tmp_path):
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        token_histogram,
    )

    df, path = _seqs_with_null(spark, tmp_path)
    got = (
        token_histogram(df).orderBy("source", "token").toPandas()
    )
    con = duckdb.connect()
    want = con.sql(
        f"""SELECT source, token, count(*) AS cnt
            FROM (SELECT source, unnest(tokens) AS token FROM '{path}/*.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()
    assert got.source.tolist() == want.source.tolist()
    assert got.token.tolist() == want.token.tolist()
    assert got.cnt.tolist() == want.cnt.tolist()
    # global histogram (by=None) sums the per-source one
    tot = token_histogram(df, by=None).agg(F.sum("cnt")).collect()[0][0]
    assert tot == got.cnt.sum()


def test_vocab_coverage_and_oov_match_duckdb(spark, tmp_path):
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        oov_stats,
        token_histogram,
        vocab_coverage,
    )

    df, path = _seqs_with_null(spark, tmp_path)
    got = (
        vocab_coverage(token_histogram(df), top_k=50)
        .orderBy("source")
        .toPandas()
    )
    con = duckdb.connect()
    want = con.sql(
        f"""WITH h AS (
              SELECT source, token, count(*) AS cnt
              FROM (SELECT source, unnest(tokens) AS token FROM '{path}/*.parquet')
              GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY source ORDER BY cnt DESC, token) AS rk FROM h)
            SELECT source, count(*) AS n_distinct, sum(cnt) AS total_tokens,
                   sum(CASE WHEN rk <= 50 THEN cnt ELSE 0 END)::DOUBLE
                     / sum(cnt) AS topk_mass_frac
            FROM r GROUP BY 1 ORDER BY 1"""
    ).df()
    assert got.source.tolist() == want.source.tolist()
    assert got.n_distinct.tolist() == want.n_distinct.tolist()
    assert got.total_tokens.tolist() == want.total_tokens.tolist()
    assert got.topk_mass_frac.tolist() == pytest.approx(want.topk_mass_frac.tolist())

    # OOV: pick a cutoff below the synth vocab (50257) so some tokens are out
    o = oov_stats(df, vocab_size=25000).orderBy("source").toPandas()
    wo = con.sql(
        f"""SELECT source, count(*) AS total_tokens,
                   sum(CASE WHEN token < 0 OR token >= 25000 THEN 1 ELSE 0 END)
                     AS oov_tokens
            FROM (SELECT source, unnest(tokens) AS token FROM '{path}/*.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).df()
    assert o.source.tolist() == wo.source.tolist()
    assert o.total_tokens.tolist() == wo.total_tokens.tolist()
    assert o.oov_tokens.tolist() == wo.oov_tokens.tolist()
    assert (o.oov_frac == o.oov_tokens / o.total_tokens).all()
    assert (o.oov_frac > 0).any()  # cutoff actually bites


def test_oov_stats_plan_is_narrow(spark, tmp_path):
    """The OOV numerator/denominator are per-row codegen'd exprs: the plan
    must contain exactly one Exchange (the tiny final groupBy) and no
    Python eval nodes."""
    from timeseriesvectordbpattermatcher_spark.operators.curation import oov_stats

    df, _ = _seqs_with_null(spark, tmp_path)
    plan = oov_stats(df, vocab_size=1000)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "EvalPython" not in plan


# --------------------------------------------------------------------------
# best-fit-decreasing packing
# --------------------------------------------------------------------------


def _bfd_oracle(rows, budget, seed=0, n_shards=4):
    """Engine-free replay of pack_sequences_bestfit: shard by pure XXH64,
    sort (n_tok desc, hash, id), best-fit via linear scan over bins."""
    shards = {}
    for doc_id, n_tok in rows:
        s = _h_seed_str(seed + 1, doc_id) % n_shards
        shards.setdefault(str(s), []).append((doc_id, n_tok or 0))
    out = {}
    fills = {}
    for s, docs in shards.items():
        docs.sort(key=lambda d: (-d[1], _h_seed_str(seed, d[0]), d[0]))
        bins = []  # (remaining, bin_id), unordered — linear best-fit scan
        nxt = 0
        for doc_id, t in docs:
            if t >= budget:
                out[doc_id] = (s, nxt)
                fills[(s, nxt)] = t
                nxt += 1
                continue
            best = None
            for k, (r, b) in enumerate(bins):
                if r >= t and (best is None or r < bins[best][0] or
                               (r == bins[best][0] and b < bins[best][1])):
                    best = k
            if best is not None:
                r, b = bins.pop(best)
                out[doc_id] = (s, b)
                fills[(s, b)] += t
                if r - t > 0:
                    bins.append((r - t, b))
            else:
                out[doc_id] = (s, nxt)
                fills[(s, nxt)] = t
                bins.append((budget - t, nxt))
                nxt += 1
    return out, fills


def test_bestfit_matches_pure_python_oracle(spark):
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        pack_sequences_bestfit,
    )

    # heavy-tailed lengths incl. an oversized doc, a zero, and a NULL
    rows = [(f"d{i:04d}", (i * 37) % 900 + 10) for i in range(300)]
    rows += [("big0", 5000), ("zero", 0)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int").unionByName(
        spark.createDataFrame([("nul0", None)], "doc_id string, n_tok int")
    )
    got = pack_sequences_bestfit(df, budget=1024, n_shards=4).toPandas()
    want, fills = _bfd_oracle(
        [(r[0], r[1]) for r in rows] + [("nul0", None)], budget=1024
    )
    assert len(got) == 303
    for _, r in got.iterrows():
        ws, wb = want[r.doc_id]
        assert (r.pack_shard, r.pack_id) == (ws, wb), r.doc_id
        assert r.pack_fill == fills[(ws, wb)], r.doc_id


def test_bestfit_properties(spark):
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        pack_sequences_bestfit,
    )

    rows = [(f"d{i:04d}", (i * 131) % 700 + 5, ["web", "code"][i % 2])
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int, source string")
    budget = 2048
    got = pack_sequences_bestfit(
        df, budget=budget, key_col="source", n_shards=2
    ).toPandas()
    # every pack total <= budget (no oversized docs in this corpus) and
    # pack_fill is the true per-pack token sum on every row
    sums = got.groupby(["pack_shard", "pack_id"]).n_tok.sum()
    assert (sums <= budget).all()
    for (sh, pid), s in sums.items():
        assert (got[(got.pack_shard == sh) & (got.pack_id == pid)]
                .pack_fill == s).all()
    # packs never mix sources (shard prefix is the key)
    assert (got.pack_shard.str.split("/").str[0] == got.source).all()
    # BFD fill quality: all but <= n_bins tail-bins are > half full
    # (standard bound: two bins <= half full would have been merged)
    per_shard_small = (
        (sums <= budget // 2).groupby(level=0).sum()
    )
    assert (per_shard_small <= 1).all()
    # deterministic: second run identical
    again = pack_sequences_bestfit(
        df, budget=budget, key_col="source", n_shards=2
    ).toPandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_materialize_packs_matches_pure_python_oracle(spark):
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        materialize_packs,
        pack_sequences,
    )

    # deterministic token arrays; one doc oversized, one empty, one NULL
    rows = []
    for i in range(120):
        n = (i * 29) % 240 + 1
        rows.append((f"d{i:04d}", list(range(i * 1000, i * 1000 + n)), n))
    rows.append(("big0", list(range(900000, 900000 + 1500)), 1500))
    rows.append(("emp0", [], 0))
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int"
    ).unionByName(
        spark.createDataFrame(
            [("nul0", None, None)], "doc_id string, tokens array<int>, n_tok int"
        )
    )
    budget, n_shards, seed = 512, 3, 0
    packed = pack_sequences(df, budget=budget, n_shards=n_shards, seed=seed)
    got = materialize_packs(packed, budget=budget, seed=seed).toPandas()

    # ---- engine-free replay (pure-python XXH64) -------------------------
    data = {r[0]: (r[1] or []) for r in rows}
    data["nul0"] = []
    shards = {}
    for doc_id in data:
        # pack_sequences(key_col=None) keeps the shard numeric
        shards.setdefault(
            _h_seed_str(seed + 1, doc_id) % n_shards, []
        ).append(doc_id)
    want = {}
    for s, ids in shards.items():
        ids.sort(key=lambda d: (_h_seed_str(seed, d), d))
        cum = 0
        packs = {}
        for d in ids:
            pid = cum // budget
            packs.setdefault(pid, []).append((d, cum))
            cum += len(data[d])
        for pid, members in packs.items():
            base = members[0][1]
            toks = [t for d, _ in members for t in data[d]]
            want[(s, pid)] = {
                "doc_ids": [d for d, _ in members],
                "doc_offsets": [off - base for _, off in members],
                "tokens": toks[:budget],
                "n_tok_packed": min(len(toks), budget),
                "n_tok_dropped": max(len(toks) - budget, 0),
            }

    assert len(got) == len(want)
    for _, r in got.iterrows():
        w = want[(r.pack_shard, r.pack_id)]
        assert list(r.doc_ids) == w["doc_ids"], (r.pack_shard, r.pack_id)
        assert list(r.doc_offsets) == w["doc_offsets"]
        assert list(r.tokens) == w["tokens"]
        assert r.n_tok_packed == w["n_tok_packed"]
        assert r.n_tok_dropped == w["n_tok_dropped"]
    # conservation: every input token is packed or dropped, none invented
    total_in = sum(len(v) for v in data.values())
    assert got.n_tok_packed.sum() + got.n_tok_dropped.sum() == total_in


# --------------------------------------------------------------------------
# temperature_mix
# --------------------------------------------------------------------------


def _mk_skewed(spark):
    rows = []
    for src, n in (("web", 400), ("books", 100), ("code", 25)):
        for i in range(n):
            rows.append((f"{src}-{i:05d}", src, 10 + (i % 7)))
    return (
        spark.createDataFrame(rows, "doc_id string, source string, n_tok int"),
        rows,
    )


def test_temperature_mix_factors_match_formula(spark):
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        temperature_mix_factors,
    )

    df, rows = _mk_skewed(spark)
    alpha = 0.3
    sizes = {"web": 400.0, "books": 100.0, "code": 25.0}

    got = temperature_mix_factors(df, alpha=alpha, anchor="min")
    for k, n in sizes.items():
        assert got[k] == pytest.approx((n / 25.0) ** (alpha - 1.0), rel=1e-12)
    assert got["code"] == pytest.approx(1.0)
    assert all(v <= 1.0 + 1e-12 for v in got.values())

    got_max = temperature_mix_factors(df, alpha=alpha, anchor="max")
    for k, n in sizes.items():
        assert got_max[k] == pytest.approx((n / 400.0) ** (alpha - 1.0), rel=1e-12)
    assert got_max["web"] == pytest.approx(1.0)
    assert all(v >= 1.0 - 1e-12 for v in got_max.values())

    # token-weighted shares use sum(n_tok), not row counts
    tok_sizes = {}
    for _, src, nt in rows:
        tok_sizes[src] = tok_sizes.get(src, 0) + nt
    got_tok = temperature_mix_factors(
        df, alpha=alpha, anchor="min", size_col="n_tok"
    )
    ref = min(tok_sizes.values())
    for k, n in tok_sizes.items():
        assert got_tok[k] == pytest.approx((n / ref) ** (alpha - 1.0), rel=1e-12)

    # alpha=1 is the identity mix
    assert all(
        v == pytest.approx(1.0)
        for v in temperature_mix_factors(df, alpha=1.0).values()
    )


def test_temperature_mix_downsample_matches_replay(spark):
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        temperature_mix,
        temperature_mix_factors,
    )

    df, rows = _mk_skewed(spark)
    alpha, seed = 0.5, 9
    fr = temperature_mix_factors(df, alpha=alpha, anchor="min")
    want = sorted(
        doc_id
        for doc_id, src, _ in rows
        if _h_seed_str(seed, doc_id) % SAMPLE_RESOLUTION
        < round(min(1.0, fr[src]) * SAMPLE_RESOLUTION)
    )
    got = sorted(
        r["doc_id"]
        for r in temperature_mix(df, alpha=alpha, seed=seed).collect()
    )
    assert got == want
    # realized mix moved toward p^alpha: code kept whole, web thinned most
    kept = {}
    for d in got:
        kept[d.split("-")[0]] = kept.get(d.split("-")[0], 0) + 1
    assert kept["code"] == 25
    assert kept["web"] / 400 < kept["books"] / 100 < 1.0 + 1e-12


def test_temperature_mix_epoch_matches_replay(spark):
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        temperature_mix,
        temperature_mix_factors,
    )

    df, rows = _mk_skewed(spark)
    alpha, seed = 0.3, 4
    fac = temperature_mix_factors(df, alpha=alpha, anchor="max")
    assert fac["web"] == pytest.approx(1.0)

    import math

    want = {}
    for doc_id, src, _ in rows:
        f = fac[src]
        n = int(math.floor(f))
        u = _h_seed_str(seed, doc_id) % SAMPLE_RESOLUTION
        if u < round((f - math.floor(f)) * SAMPLE_RESOLUTION):
            n += 1
        if n:
            want[doc_id] = n
    got = {}
    out = temperature_mix(df, alpha=alpha, mode="epoch", seed=seed).collect()
    for r in out:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
        assert 0 <= r["epoch"] < want[r["doc_id"]]
    assert got == want
    # small sources replicate, the anchor source never does
    assert all(got[d] == 1 for d in got if d.startswith("web-"))
    assert any(got[d] > 1 for d in got if d.startswith("code-"))


def test_temperature_mix_rejects_bad_params(spark):
    from timeseriesvectordbpattermatcher_spark.operators.curation import (
        temperature_mix,
        temperature_mix_factors,
    )

    df, _ = _mk_skewed(spark)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix_factors(df, alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix_factors(df, alpha=1.5)
    with pytest.raises(ValueError, match="anchor"):
        temperature_mix_factors(df, anchor="median")
    with pytest.raises(ValueError, match="mode"):
        temperature_mix(df, mode="resample")
    empty = df.filter("1=0")
    assert temperature_mix_factors(empty) == {}
