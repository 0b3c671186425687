from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
    synth_media,
)
from timeseriesvectordbpattermatcher_spark.operators.similarity import (
    brute_force_topk,
    cosine_dup_pairs,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def emb_queries(emb):
    return (
        emb.limit(5)
        .select(
            F.concat(F.lit("q"), F.col("vec_id").cast("string")).alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
        .cache()
    )


def test_brute_force_topk_self_hit(emb, emb_queries):
    out = brute_force_topk(
        emb_queries, emb, k=3,
        query_id="query_id", query_vec="q_embedding", ref_id="vec_id", ref_vec="embedding",
    ).toPandas()
    # rank-1 of each query is its own vector at score ~1
    r1 = out[out["rank"] == 1]
    assert (r1["query_id"].str.lstrip("q").astype(int).values == r1["vec_id"].values).all()
    assert np.allclose(r1["score"], 1.0, atol=1e-6)


def test_lsh_topk_recall(emb, emb_queries):
    exact = brute_force_topk(
        emb_queries, emb, k=5,
        query_id="query_id", query_vec="q_embedding", ref_id="vec_id", ref_vec="embedding",
    ).toPandas()
    # random embeddings: top-5 neighbors sit near cos~0.3, so recall needs
    # wide buckets (4 bits) and many tables — real clustered embeddings
    # tolerate far tighter settings
    approx = lsh_topk(
        emb_queries, emb, k=5, n_bits=4, n_tables=16,
        query_id="query_id", query_vec="q_embedding", ref_id="vec_id", ref_vec="embedding",
    ).toPandas()
    # recall@5 of the approximate search vs brute force
    recall = 0.0
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        recall += len(e & a) / len(e)
    recall /= exact["query_id"].nunique()
    assert recall >= 0.6, f"LSH recall@5 too low: {recall}"
    # self-hit must survive (identical vector collides in every table)
    r1 = approx[approx["rank"] == 1]
    assert np.allclose(r1["score"], 1.0, atol=1e-6)


def test_cosine_dup_pairs_exact_vs_lsh(spark):
    rng = np.random.default_rng(4)
    base = rng.normal(size=(20, 16))
    rows = []
    for i in range(20):
        rows.append((i, base[i].tolist()))
    # plant near-dups: 100,101 are tiny perturbations of 0,1
    rows.append((100, (base[0] + rng.normal(0, 0.01, 16)).tolist()))
    rows.append((101, (base[1] + rng.normal(0, 0.01, 16)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["id_a"], r["id_b"]) for r in cosine_dup_pairs(df, tau=0.99, exact=True).collect()}
    assert (0, 100) in exact and (1, 101) in exact
    approx = {(r["id_a"], r["id_b"]) for r in cosine_dup_pairs(df, tau=0.99, n_tables=8).collect()}
    assert exact == approx  # near-identical vectors collide in every table


def test_media_pipeline(spark):
    media = synth_media(spark, 30)
    feats = extract_media_features(media, fake=True).cache()
    assert feats.count() == 30
    assert feats.filter("decode_ok = false").count() == 0
    assert feats.filter(F.size("feat") != 16).count() == 0
    # determinism: same payload digest -> same features
    a = feats.orderBy("media_id").collect()
    b = extract_media_features(media, fake=True).orderBy("media_id").collect()
    assert [r["feat"] for r in a] == [r["feat"] for r in b]
    feats.unpersist()


def test_media_decode_stub_surfaces(spark):
    media = synth_media(spark, 6)  # opaque payloads: no recognizable format
    out = extract_media_features(media, fake=False).collect()
    assert all(not r["decode_ok"] for r in out)  # flagged, not crashed
    assert all(r["decoder"] == "unsupported" for r in out)


def test_media_real_decode_end_to_end(spark):
    """fake=False over VALID WAV/PPM/BMP payloads: every row really decodes
    through the stdlib kernels and each feature vector matches a direct
    local decode of the same bytes."""
    from timeseriesvectordbpattermatcher_spark.operators.multimodal import (
        _decode_one,
        synth_real_media,
    )

    media = synth_real_media(spark, n_rows=24, seed=7)
    out = extract_media_features(media, fake=False).orderBy("media_id").collect()
    assert len(out) == 24
    assert all(r["decode_ok"] for r in out)
    assert sorted({r["decoder"] for r in out}) == ["bmp", "ppm", "wav"]
    local = {
        r["media_id"]: _decode_one(bytes(r["payload"]), r["modality"], fake=False)
        for r in media.collect()
    }
    for r in out:
        feat, dec = local[r["media_id"]]
        assert r["decoder"] == dec
        assert np.allclose(np.array(r["feat"]), feat, rtol=0, atol=0), r["media_id"]


def test_media_decoders_against_oracle_parsers():
    """Engine decoders vs the independently-written oracle parsers in
    tests/oracle/segment_oracle.py (manual RIFF chunk walk vs stdlib wave;
    regex PPM header vs byte tokenizer; separate BMP stride math): decoded
    arrays must be bit-identical, features equal under both specs."""
    import io
    import wave as wave_mod

    from tests.oracle import segment_oracle as so
    from timeseriesvectordbpattermatcher_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    # WAV: 16-bit stereo (exercises mono fold), 8-bit mono
    for nch, sw in [(2, 2), (1, 1)]:
        n = 300
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(sw)
            w.setframerate(4000)
            if sw == 2:
                w.writeframes(
                    rng.integers(-32768, 32768, n * nch).astype("<i2").tobytes()
                )
            else:
                w.writeframes(rng.integers(0, 256, n * nch, dtype=np.uint8).tobytes())
        p = buf.getvalue()
        xe, re_ = mm.decode_wav(p)
        xo, ro = so._oracle_decode_wav(p)
        assert re_ == ro and np.array_equal(xe, xo)
        assert np.array_equal(mm.audio_features(xe, re_), so._oracle_audio_features(xo, ro))
    # PPM with a comment line in the header
    img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    ppm = b"P6\n# synthetic\n13 9\n255\n" + img.tobytes()
    assert np.array_equal(mm.decode_ppm(ppm), so._oracle_decode_ppm(ppm))
    assert np.array_equal(mm.decode_ppm(ppm), img)
    # BMP round-trip incl. stride padding (w=13 -> 39 bytes padded to 40)
    bmp = mm.encode_bmp(img)
    assert np.array_equal(mm.decode_bmp(bmp), img)
    assert np.array_equal(so._oracle_decode_bmp(bmp), img)
    assert np.array_equal(
        mm.image_features(img), so._oracle_image_features(img)
    )


def test_media_corrupt_payloads_flagged_not_fatal(spark):
    """Recognized-format-but-corrupt payloads (truncated PPM, 8bpp BMP,
    compressed WAV tag) must yield decode_ok=false / decoder='error' rows,
    never a job failure."""
    from timeseriesvectordbpattermatcher_spark.operators import multimodal as mm

    img = np.zeros((4, 4, 3), np.uint8)
    good_bmp = bytearray(mm.encode_bmp(img))
    bad_bpp = bytearray(good_bmp)
    bad_bpp[28] = 8  # claim 8bpp
    rows = [
        ("c1", "image", bytearray(b"P6\n4 4\n255\n" + b"\x00" * 10), 4, 4, None, None),
        ("c2", "image", bad_bpp, 4, 4, None, None),
        ("c3", "audio", bytearray(b"RIFF\x10\x00\x00\x00WAVEjunk"), None, None, None, 8000),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_media_features(media, fake=False).collect()}
    assert len(out) == 3
    for mid in ("c1", "c2", "c3"):
        assert not out[mid]["decode_ok"], mid
        assert out[mid]["decoder"] == "error", mid


def test_frame_sample_plan(spark):
    media = synth_media(spark, 30)
    plan = frame_sample_plan(media, every_n=5)
    pdf = plan.toPandas()
    vids = media.filter("modality='video'").select("media_id", "n_frames").toPandas()
    for _, row in vids.iterrows():
        want = list(range(0, row["n_frames"], 5))
        got = sorted(pdf[pdf.media_id == row["media_id"]]["frame_idx"])
        assert got == want


def test_ivf_topk_recall(spark, emb, emb_queries):
    from timeseriesvectordbpattermatcher_spark.operators.similarity import ivf_topk

    exact = brute_force_topk(
        emb_queries, emb, k=5,
        query_id="query_id", query_vec="q_embedding", ref_id="vec_id", ref_vec="embedding",
    ).toPandas()
    approx = ivf_topk(
        emb_queries, emb, k=5, n_lists=8, nprobe=4,
        query_id="query_id", query_vec="q_embedding", ref_id="vec_id", ref_vec="embedding",
    ).toPandas()
    recall = 0.0
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        recall += len(e & a) / len(e)
    recall /= exact["query_id"].nunique()
    # probing half the lists on random data should recover well over half
    assert recall >= 0.5, f"IVF recall@5 too low: {recall}"
    # self-hit survives: the query's own vector lands in its top-1 probe list
    r1 = approx[approx["rank"] == 1]
    import numpy as np
    assert np.allclose(r1["score"], 1.0, atol=1e-6)


def test_ivf_determinism(spark, emb, emb_queries):
    from timeseriesvectordbpattermatcher_spark.operators.similarity import ivf_topk

    a = ivf_topk(emb_queries, emb, k=3, query_id="query_id", query_vec="q_embedding",
                 ref_id="vec_id", ref_vec="embedding").orderBy("query_id", "rank").collect()
    b = ivf_topk(emb_queries, emb, k=3, query_id="query_id", query_vec="q_embedding",
                 ref_id="vec_id", ref_vec="embedding").orderBy("query_id", "rank").collect()
    assert a == b


def test_ivf_training_sample_deterministic_and_sort_free(spark, emb):
    """The hash-slice training draw: (a) centroids are a pure function of
    the corpus — identical across partition layouts; (b) the sliced-sample
    plan contains a Filter on xxhash64 but NO Sort/TakeOrdered (the round-3
    orderBy(id).limit() was a full-corpus TakeOrdered); (c) the mod>1 path
    (corpus >> sample) yields ~sample rows and stays deterministic."""
    import numpy as np

    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        _ivf_sample_rows,
        train_ivf_centroids,
    )

    c1 = train_ivf_centroids(emb, n_lists=8)
    c2 = train_ivf_centroids(emb.repartition(13), n_lists=8)
    c3 = train_ivf_centroids(emb.repartition(1).sortWithinPartitions(F.desc("vec_id")), n_lists=8)
    assert np.array_equal(c1, c2) and np.array_equal(c1, c3)

    # mod > 1 path: 4000 rows, sample=500 -> P=8, expect ~500 survivors
    big = spark.range(4000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(7)] * 4).alias("embedding"),
    )
    rows_a = _ivf_sample_rows(big, "vec_id", "embedding", sample=500, n_lists=8)
    rows_b = _ivf_sample_rows(big.repartition(17), "vec_id", "embedding", sample=500, n_lists=8)
    assert [r[0] for r in rows_a] == [r[0] for r in rows_b]
    assert 250 <= len(rows_a) <= 500  # binomial around 500, truncated at 500
    ids = [r[0] for r in rows_a]
    assert ids == sorted(ids)

    # plan: the slice is filter-only — no Sort, no TakeOrdered
    sliced = big.select("vec_id", "embedding").filter(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(8)) == 0
    )
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "Sort" not in plan and "TakeOrdered" not in plan


def test_ann_paths_empty_and_null_refs(spark):
    """Empty or all-null ref sets degrade to zero matches on every ANN path
    (lsh/ivf used to crash on dim discovery / centroid training), and the
    dup-pair scan returns a typed empty frame."""
    from pyspark.sql import functions as F

    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        cosine_dup_pairs,
        ivf_topk,
        lsh_topk,
    )

    q = spark.createDataFrame([(0, [1.0] * 8)], "query_id long, q_embedding array<float>")
    kw = dict(query_id="query_id", query_vec="q_embedding",
              ref_id="vec_id", ref_vec="embedding")
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    nulls = spark.createDataFrame([(1, None), (2, None)],
                                  "vec_id long, embedding array<float>")
    for refs in (empty, nulls):
        for fn in (lsh_topk, ivf_topk):
            out = fn(q, refs, k=5, **kw)
            assert out.count() == 0
            assert [f.name for f in out.schema.fields] == ["query_id", "rank", "vec_id", "score"]
    for df in (empty, nulls):
        out = cosine_dup_pairs(df, id_col="vec_id", vec_col="embedding")
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "score"]

    # sub-k single-ref set still matches on both approximate paths
    one = spark.createDataFrame([(7, [1.0] * 8)], "vec_id long, embedding array<float>")
    assert lsh_topk(q, one, k=5, **kw).count() == 1
    assert ivf_topk(q, one, k=5, **kw).count() == 1

    # MIXED null/non-null refs: null rows must be filtered, not crash the
    # bucket/assignment UDFs' np.stack over the batch
    mixed = spark.createDataFrame(
        [(7, [1.0] * 8), (8, None), (9, [0.5] * 8)],
        "vec_id long, embedding array<float>",
    )
    for fn in (lsh_topk, ivf_topk):
        got = fn(q, mixed, k=5, **kw).toPandas()
        assert set(got["vec_id"]) == {7, 9}, fn.__name__
    dup = cosine_dup_pairs(mixed, tau=0.5, id_col="vec_id", vec_col="embedding")
    assert [tuple(r) for r in dup.select("id_a", "id_b").collect()] == [(7, 9)]


# --------------------------------------------------------------------------
# persisted IVF index
# --------------------------------------------------------------------------


def test_ivf_index_probe_matches_per_call_ivf(spark, emb, emb_queries, tmp_path):
    """build_ivf_index + ivf_probe_index must reproduce ivf_topk exactly:
    same seed -> same centroids -> same assignment -> same top-k."""
    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_index,
        ivf_topk,
    )
    from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    table = SnapshotTable(str(tmp_path / "ivf"))
    snap = build_ivf_index(emb, table, n_lists=8, seed=37)
    assert len(snap.meta["ivf_centroids"]) == 8
    got = sorted(
        map(tuple, ivf_probe_index(emb_queries, table, k=5, nprobe=3).collect())
    )
    want = sorted(
        map(tuple, ivf_topk(emb_queries, emb, k=5, n_lists=8, nprobe=3, seed=37).collect())
    )
    assert got == want and len(got) > 0


def test_ivf_index_probe_is_manifest_pruned(spark, emb, emb_queries, tmp_path):
    """A probe touches only the union of the queries' nprobe lists: fewer
    rows than the table, exactly the rows of those partitions."""
    import numpy as np

    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        build_ivf_index,
    )
    from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    table = SnapshotTable(str(tmp_path / "ivf"))
    snap = build_ivf_index(emb, table, n_lists=8, seed=37)
    cents = np.array(snap.meta["ivf_centroids"])
    one_q = emb_queries.limit(1)
    qv = np.array(one_q.first()["q_embedding"], dtype=np.float64)
    qv = qv / max(np.linalg.norm(qv), 1e-12)
    probed = sorted(np.argsort(-(qv @ cents.T))[:2].tolist())
    pruned = table.read_partitions(spark, [str(p) for p in probed])
    total = table.read(spark)
    assert pruned.count() < total.count()
    # the probe's candidate source is exactly those partitions' rows
    assert (
        pruned.count()
        == total.filter(F.col("list_id").isin([int(p) for p in probed])).count()
    )


def test_ivf_index_rebuild_is_atomic_version(spark, emb, tmp_path):
    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        build_ivf_index,
    )
    from timeseriesvectordbpattermatcher_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    table = SnapshotTable(str(tmp_path / "ivf"))
    v1 = build_ivf_index(emb, table, n_lists=4, seed=37).version
    v2 = build_ivf_index(emb, table, n_lists=4, seed=41).version
    assert v2 == v1 + 1
    # pinned read of the OLD index version still works (time travel)
    assert table.read(spark, version=v1).count() == table.read(spark).count()


def test_semantic_dedup_matches_exact_oracle(spark):
    """SemDeDup-style dedup on a corpus of 3 orthogonal clusters with
    planted near-identical groups: within-group cosine ~0.99999 (>= tau),
    cross-seed cosine ~0.98 (< tau), cross-cluster ~0 — so the engine's
    cluster-bucketed pairs must EXACTLY reproduce the clusterless numpy
    oracle (exact all-pairs cosine + keep-first drop), regardless of how
    k-means happens to carve the lists. Null embeddings pass through."""
    import numpy as np

    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(11)
    base = np.eye(8)[:3]
    rows, vid = [], 0
    for c in range(3):
        for g in range(5):
            v = base[c] + 0.05 * rng.standard_normal(8)
            for _k in range(1 + g % 3):  # groups of 1..3 near-identical copies
                vv = v + 0.001 * rng.standard_normal(8)
                rows.append((vid, [float(x) for x in vv]))
                vid += 1
    null_id = vid
    rows.append((null_id, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = semantic_dedup(df, tau=0.999, n_lists=3, seed=37)
    got = sorted(r.vec_id for r in out.collect())
    out2 = sorted(r.vec_id for r in semantic_dedup(df, tau=0.999, n_lists=3, seed=37).collect())
    assert got == out2  # deterministic across runs

    X = {i: np.asarray(v) for i, v in rows if v is not None}
    drop = set()
    ids = sorted(X)
    for i in ids:
        for j in ids:
            if i < j and X[i] @ X[j] / (
                np.linalg.norm(X[i]) * np.linalg.norm(X[j])
            ) >= 0.999:
                drop.add(j)
    want = sorted((set(X) - drop) | {null_id})
    assert got == want, (got, want)
    assert len(drop) > 0  # the planted groups actually deduped


def test_semantic_dedup_max_cluster_guard(spark):
    """Runaway-cluster guard: with n_lists=1 every row lands in one list,
    so max_cluster below the corpus size must (a) raise loudly by
    default, (b) under on_oversize='split' sub-quantize the hot list and
    still reproduce the exact all-pairs oracle (the planted groups are
    well-separated, so one finer level fully separates them), and (c)
    raise from the split path when more than max_cluster identical
    embeddings make splitting impossible."""
    import numpy as np

    from timeseriesvectordbpattermatcher_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(5)
    base = np.eye(8)[:4]
    rows, vid = [], 0
    for c in range(4):
        for _k in range(6):  # 6 near-identical copies per orthogonal seed
            vv = base[c] + 0.001 * rng.standard_normal(8)
            rows.append((vid, [float(x) for x in vv]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    with pytest.raises(ValueError, match="exceed max_cluster"):
        semantic_dedup(df, tau=0.999, n_lists=1, max_cluster=10)
    with pytest.raises(ValueError, match="on_oversize"):
        semantic_dedup(df, tau=0.999, n_lists=1, max_cluster=10,
                       on_oversize="nope")
    with pytest.raises(ValueError, match="max_cluster"):
        semantic_dedup(df, tau=0.999, n_lists=1, max_cluster=0)

    # split path == exact numpy all-pairs oracle on the survivors
    got = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, tau=0.999, n_lists=1, max_cluster=10, on_oversize="split"
        ).collect()
    )
    X = {i: np.asarray(v) for i, v in rows}
    drop = set()
    for i in sorted(X):
        for j in sorted(X):
            if i < j and X[i] @ X[j] / (
                np.linalg.norm(X[i]) * np.linalg.norm(X[j])
            ) >= 0.999:
                drop.add(j)
    want = sorted(set(X) - drop)
    assert got == want, (got, want)
    assert len(drop) == 20  # every copy after the first per seed dropped

    # unsplittable: > max_cluster IDENTICAL embeddings
    same = spark.createDataFrame(
        [(i, [1.0] + [0.0] * 7) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="still exceed"):
        semantic_dedup(same, tau=0.999, n_lists=1, max_cluster=5,
                       on_oversize="split")

    # guard off (default None): unchanged behavior — one list, no cap,
    # the pair join is the exact all-pairs rule
    base_out = sorted(
        r.vec_id for r in semantic_dedup(df, tau=0.999, n_lists=1).collect()
    )
    assert base_out == want
