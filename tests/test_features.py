from __future__ import annotations

import numpy as np
import pytest

from timeseriesvectordbpattermatcher_spark.functions.features import (
    FEATURE_DIM,
    cosine_topk_scores,
    features_40,
)


def test_shape_and_determinism():
    rng = np.random.default_rng(0)
    mat = rng.normal(size=(5, 64))
    a = features_40(mat)
    b = features_40(mat)
    assert a.shape == (5, FEATURE_DIM)
    assert np.array_equal(a, b)
    assert np.isfinite(a).all()


def test_constant_window_skipped():
    """Reference skips constant series (/root/reference/katslib/opkatsDataUtil.py:208-209)."""
    mat = np.vstack([np.full(64, 3.0), np.arange(64.0)])
    f = features_40(mat)
    assert np.isnan(f[0]).all()
    assert np.isfinite(f[1]).all()


def test_nonfinite_window_rejected():
    mat = np.vstack([np.arange(64.0), np.arange(64.0)])
    mat[0, 10] = np.inf
    f = features_40(mat)
    assert np.isnan(f[0]).all()
    assert np.isfinite(f[1]).all()


def test_batch_equals_individual():
    rng = np.random.default_rng(1)
    mat = rng.normal(size=(7, 128))
    batch = features_40(mat)
    single = np.vstack([features_40(mat[i : i + 1]) for i in range(7)])
    assert np.array_equal(batch, single)


def test_known_values():
    x = np.arange(10.0)[None, :]
    f = features_40(x).astype(np.float64)[0]
    assert f[0] == pytest.approx(4.5)  # mean
    assert f[1] == pytest.approx(np.std(np.arange(10.0)))
    assert f[2] == 0.0 and f[3] == 9.0
    assert f[8] == 0.0 and f[9] == 9.0 and f[10] == 9.0
    assert f[22] == pytest.approx(1.0)  # slope of the identity line
    assert f[24] == pytest.approx(1.0)  # perfect correlation with time
    slope, intercept = np.polyfit(np.arange(10), np.arange(10.0), 1)
    assert f[23] == pytest.approx(intercept, abs=1e-6)


def test_cosine_scores():
    q = np.array([1.0, 0.0])
    refs = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [2.0, 0.0]])
    s = cosine_topk_scores(q, refs)
    assert s == pytest.approx([1.0, 0.0, -1.0, 1.0])


# ---------------------------------------------------------------------------
# engine kernel == per-row oracle re-derivation (tests/oracle/segment_oracle):
# the segmentation/matcher goldens rest on this spec, so drive both
# implementations across random, adversarial, and structured windows
# ---------------------------------------------------------------------------


def test_features_oracle_parity_random():
    from tests.oracle.segment_oracle import features_40_one

    rng = np.random.default_rng(11)
    wins = [
        rng.normal(size=64),
        rng.normal(size=2),
        rng.normal(size=3),
        np.full(64, 3.7),                      # constant -> skipped
        np.concatenate([[np.inf], rng.normal(size=63)]),   # non-finite
        np.concatenate([[np.nan], rng.normal(size=63)]),
        rng.integers(0, 5, size=64).astype(float),         # heavy ties
        np.arange(64, dtype=float),                        # pure trend
        np.sin(np.arange(128) / 3.0),                      # periodic
        rng.normal(size=64) * 1e-300,                      # denormal scale
    ] + [rng.normal(size=rng.integers(2, 200)) for _ in range(50)]

    from timeseriesvectordbpattermatcher_spark.functions.features import features_40

    for w in wins:
        batched = features_40(w[None, :])[0]
        rowwise = features_40_one(w)
        if rowwise is None:
            assert np.isnan(batched).all(), "skip decision must agree"
        else:
            np.testing.assert_array_equal(
                batched, rowwise, err_msg="feature values must be bit-equal"
            )


def test_array_stats_vs_duckdb(spark, duck):
    """array_stats (§2.9 scalar array higher-order fns) moved out of the
    50-slot driver contract to free the slot for retention_expiry — its
    DuckDB oracle equivalence lives on here, same compare as the driver."""
    import __spark_entry__ as entrymod
    from tests.conftest import assert_df_equal

    got = entrymod.q_array_stats(spark, "/root/testdata/sf0.001")
    duck.sql(
        "CREATE VIEW embeddings AS "
        "FROM '/root/testdata/sf0.001/embeddings.parquet'"
    )
    assert_df_equal(got, duck.sql(entrymod.SQL_ARRAY_STATS), ["vec_id"])
