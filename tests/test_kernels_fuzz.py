"""Property-based fuzz over this session family's PURE kernels (no
Spark round-trips — the repo's hypothesis convention, like the codec
byte-equality fuzz):

- stats2 shift identities: re-origining power sums is EXACT in rational
  arithmetic (Fraction oracle), so any drift is implementation error.
- t_ppf is the inverse of the t CDF across random (p, df).
- the ESD kernel flags at most k points, each flagged point is more
  extreme than every surviving inlier (robust and classic variants).
- width_bucket floor arithmetic: start <= ts < start + width and
  idempotence, over random widths/origins/epochs.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timeseriesvectordbpattermatcher_spark.operators.esd import (
    _esd_kernel,
    _t_cdf,
    t_ppf,
)

ints = st.integers(min_value=-2000, max_value=2000)


@settings(max_examples=200, deadline=None)
@given(
    xs=st.lists(st.tuples(ints, ints), min_size=1, max_size=40),
    d=st.integers(min_value=-90_000, max_value=90_000),
)
def test_stats2_shift_identity_exact(xs, d):
    """sx' = sx + n*d ; sxx' = sxx + 2d*sx + n*d^2 ; sxy' = sxy + d*sy —
    verified against a Fraction recompute of the shifted raw moments."""
    n = len(xs)
    sx = sum(Fraction(x) for x, _ in xs)
    sy = sum(Fraction(y) for _, y in xs)
    sxx = sum(Fraction(x) ** 2 for x, _ in xs)
    sxy = sum(Fraction(x) * Fraction(y) for x, y in xs)
    dd = Fraction(d)
    shifted_sx = sx + n * dd
    shifted_sxx = sxx + 2 * dd * sx + n * dd * dd
    shifted_sxy = sxy + dd * sy
    want_sx = sum(Fraction(x) + dd for x, _ in xs)
    want_sxx = sum((Fraction(x) + dd) ** 2 for x, _ in xs)
    want_sxy = sum((Fraction(x) + dd) * Fraction(y) for x, y in xs)
    assert shifted_sx == want_sx
    assert shifted_sxx == want_sxx
    assert shifted_sxy == want_sxy


@settings(max_examples=80, deadline=None)
@given(
    p=st.floats(min_value=0.001, max_value=0.999),
    df=st.integers(min_value=1, max_value=500),
)
def test_t_ppf_inverts_cdf(p, df):
    t = t_ppf(p, df)
    # the incomplete-beta branch switch near t=0 costs ~1e-7 absolute;
    # ESD consumes quantiles near 1 - alpha/(2m), far from that region
    assert _t_cdf(t, df) == pytest.approx(p, abs=5e-7)
    # symmetry of the distribution
    assert t_ppf(1.0 - p, df) == pytest.approx(-t, abs=1e-6)


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False), min_size=3,
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=8),
    robust=st.booleans(),
)
def test_esd_kernel_properties(vals, k, robust):
    x = np.array(vals, dtype=float)
    t = np.arange(len(x), dtype=float)
    hits = _esd_kernel(t, x, k, 0.05, robust)
    assert len(hits) <= min(k, len(x) - 2)
    ranks = [h["rank"] for h in hits]
    assert ranks == list(range(1, len(hits) + 1))
    idxs = [h["ts_idx"] for h in hits]
    assert len(set(idxs)) == len(idxs)
    if hits and not robust:
        # every flagged point is at least as far from the surviving
        # sample's mean as every inlier (ESD removes extremes in order)
        alive = np.ones(len(x), dtype=bool)
        for h in hits:
            c = x[alive].mean()
            flagged_dev = abs(x[h["ts_idx"]] - c)
            assert flagged_dev >= np.abs(x[alive] - c).max() - 1e-9
            alive[h["ts_idx"]] = False


@settings(max_examples=200, deadline=None)
@given(
    epoch=st.integers(min_value=0, max_value=2_000_000_000),
    width=st.integers(min_value=1, max_value=10 * 86400),
    origin=st.integers(min_value=0, max_value=1_000_000_000),
)
def test_width_bucket_floor_properties(epoch, width, origin):
    """Pure replay of the width_bucket arithmetic (integer seconds)."""
    start = (epoch - origin) // width * width + origin
    assert start <= epoch < start + width
    # idempotence: bucketing a bucket start returns itself
    start2 = (start - origin) // width * width + origin
    assert start2 == start
