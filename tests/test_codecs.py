from __future__ import annotations

import numpy as np
import pytest

from timeseriesvectordbpattermatcher_spark.functions.codecs import (
    decode_dod_ints,
    decode_xor_floats,
    encode_dod_ints,
    encode_xor_floats,
)


def _roundtrip_floats(arr):
    out = decode_xor_floats(encode_xor_floats(np.asarray(arr, dtype=np.float64)))
    assert np.array_equal(
        np.asarray(arr, dtype=np.float64).view(np.uint64), out.view(np.uint64)
    ), "bit-exact roundtrip violated"


def _roundtrip_ints(arr):
    out = decode_dod_ints(encode_dod_ints(np.asarray(arr, dtype=np.int64)))
    assert np.array_equal(np.asarray(arr, dtype=np.int64), out)


def test_xor_adversarial_values():
    """FIXTURES.md F4 golden_codec cases: NaN, ±0.0, denormals."""
    _roundtrip_floats([np.nan, 0.0, -0.0, 5e-324, -5e-324, np.finfo(np.float64).tiny])
    _roundtrip_floats([1.0])
    _roundtrip_floats([])
    _roundtrip_floats([3.14159] * 100)  # constant -> 1 bit per repeat
    _roundtrip_floats([np.inf, -np.inf, np.nan, 1e308, -1e308])


def test_xor_random_walk():
    rng = np.random.default_rng(0)
    _roundtrip_floats(np.cumsum(rng.normal(size=5000)))
    _roundtrip_floats(rng.normal(size=1000) * 10.0**rng.integers(-300, 300, size=1000))


def test_xor_compresses_smooth_series():
    rng = np.random.default_rng(1)
    smooth = 100.0 + np.round(np.cumsum(rng.normal(0, 0.1, size=10000)), 2)
    blob = encode_xor_floats(smooth)
    assert len(blob) < 8 * len(smooth)  # beats raw float64


def test_dod_regular_cadence_compresses_hard():
    ts = np.arange(0, 86400, 60, dtype=np.int64)  # perfect 1-minute cadence
    blob = encode_dod_ints(ts)
    _roundtrip_ints(ts)
    assert len(blob) < len(ts) / 4 + 32  # ~1 bit per point + header


def test_dod_irregular_and_extreme():
    _roundtrip_ints([0])
    _roundtrip_ints([])
    _roundtrip_ints([-(2**62), 2**62, 0, -1, 1])
    rng = np.random.default_rng(2)
    base = np.cumsum(rng.integers(1, 10**6, size=2000))
    _roundtrip_ints(base)
    # boundary dods: ±64/±63, ±256/±255, ±2048/±2047
    deltas = np.array([1000, 1000 + 63, 1000 - 64, 1000 + 255, 1000 - 256,
                       1000 + 2047, 1000 - 2048, 1000 + 5000], dtype=np.int64)
    _roundtrip_ints(np.concatenate([[0], np.cumsum(deltas)]))


def test_spark_compress_decompress_roundtrip(spark, seqs_2k):
    from timeseriesvectordbpattermatcher_spark.operators.compression import (
        compress_rollup_segments,
        decompress_segments,
    )
    from timeseriesvectordbpattermatcher_spark.operators.rollup import (
        derive_event_ts,
        rollup_1m,
    )

    r1m = rollup_1m(derive_event_ts(seqs_2k))
    segs = compress_rollup_segments(r1m, value_col="avg_n_tok", chunk="1 hour").cache()
    assert segs.filter("n_points <= 0").count() == 0
    back = decompress_segments(segs)
    want = (
        r1m.select(
            "source",
            "bucket_ts",
            r1m["avg_n_tok"].alias("value"),
        )
        .orderBy("source", "bucket_ts")
        .collect()
    )
    got = back.orderBy("source", "bucket_ts").collect()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["source"] == w["source"]
        assert g["bucket_ts"] == w["bucket_ts"]
        assert g["value"] == w["value"]  # bit-exact
    segs.unpersist()


# ---------------------------------------------------------------------------
# hypothesis property tests (SURVEY §5.2: codec roundtrip on adversarial
# floats and irregular timestamps)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
def test_xor_roundtrip_property(vals):
    _roundtrip_floats(vals)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62 - 1),
        min_size=0,
        max_size=300,
    )
)
def test_dod_roundtrip_property(ts):
    _roundtrip_ints(ts)


# ---------------------------------------------------------------------------
# engine codec == pure oracle codec (tests/oracle/codec_oracle.py): the
# golden's compressed byte counts are pinned by an independent bit-packer,
# so hypothesis drives both implementations to byte-identical streams
# ---------------------------------------------------------------------------

from tests.oracle import codec_oracle as co


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=200,
    )
)
def test_xor_oracle_parity(vals):
    arr = np.asarray(vals, dtype=np.float64)
    blob = encode_xor_floats(arr)
    assert blob == co.encode_xor_floats_pure(arr)
    assert np.array_equal(
        co.decode_xor_floats_pure(blob).view(np.uint64),
        decode_xor_floats(blob).view(np.uint64),
    )


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62 - 1),
        min_size=0,
        max_size=200,
    )
)
def test_dod_oracle_parity(ts):
    arr = np.asarray(ts, dtype=np.int64)
    blob = encode_dod_ints(arr)
    assert blob == co.encode_dod_ints_pure(arr)
    assert np.array_equal(co.decode_dod_ints_pure(blob), decode_dod_ints(blob))


def test_bitreader_truncated_stream_raises_eof():
    """A truncated/corrupt blob must surface as a descriptive EOFError, not
    a cryptic negative-shift ValueError from deep inside the refill."""
    from timeseriesvectordbpattermatcher_spark.functions.codecs import _BitReader

    r = _BitReader(b"\xff")
    assert r.read(8) == 0xFF
    with pytest.raises(EOFError, match="bit stream exhausted"):
        r.read(1)
    r2 = _BitReader(b"\xab\xcd")
    with pytest.raises(EOFError, match="bit stream exhausted"):
        r2.read(64)
