"""Property tests (hypothesis) for the mergeable sketch kernels —
pure-numpy level, no Ray session needed: merge associativity and
error bounds must hold for ANY input distribution, not just the
fixtures the query tests use."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tilers_tools_ray.relational.ops import (
    _hibit,
    _hll_batch_registers,
    _hll_estimate,
    _thin_sorted_values,
)


@given(st.lists(st.integers(min_value=1, max_value=2**64 - 1), min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_hibit_matches_bit_length(vals):
    w = np.array(vals, dtype=np.uint64)
    expect = np.array([v.bit_length() - 1 for v in vals], dtype=np.int64)
    assert np.array_equal(_hibit(w), expect)


@given(
    st.integers(min_value=50, max_value=20_000),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=20, deadline=None)
def test_hll_estimate_within_error(n, seed):
    rng = np.random.default_rng(seed)
    # distinct values with repeats — estimate tracks DISTINCT count
    vals = rng.integers(0, n, size=3 * n)
    exact = len(np.unique(vals))
    est = _hll_estimate(_hll_batch_registers(vals, 14))
    # 1.04/sqrt(2^14) ≈ 0.8%; allow 5 sigma + small-n slack
    assert abs(est - exact) <= max(5, 0.05 * exact), (est, exact)


@given(
    st.integers(min_value=2, max_value=400),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=30, deadline=None)
def test_hll_merge_is_batch_split_invariant(cut, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 10_000, size=5_000)
    whole = _hll_batch_registers(vals, 12)
    cut = cut % (len(vals) - 1) + 1
    merged = np.maximum(
        _hll_batch_registers(vals[:cut], 12),
        _hll_batch_registers(vals[cut:], 12),
    )
    assert np.array_equal(whole, merged)  # bit-identical under any split


@given(
    st.lists(
        st.floats(min_value=-1e12, max_value=1e12, allow_nan=False),
        min_size=1,
        max_size=5_000,
    )
)
@settings(max_examples=30, deadline=None)
def test_thin_preserves_weight_and_support(vals):
    B = 64
    v, w = _thin_sorted_values(np.array(vals, dtype=np.float64), B)
    assert len(v) <= max(B, len(vals) if len(vals) <= B else B)
    assert abs(float(w.sum()) - len(vals)) < 1e-6  # total weight = n
    assert np.all(np.diff(v) >= 0)  # sorted
    assert np.isin(v, np.asarray(vals, dtype=np.float64)).all()  # support


@given(st.integers(min_value=0, max_value=2**31))
@settings(max_examples=20, deadline=None)
def test_thin_rank_error_bounded(seed):
    rng = np.random.default_rng(seed)
    n, B = 50_000, 1024
    vals = rng.lognormal(0, 2, n)
    v, w = _thin_sorted_values(vals, B)
    s = np.sort(vals)
    cw = np.cumsum(w) - 0.5 * w
    for q in (0.1, 0.5, 0.9):
        est = np.interp(q * n, cw, v)
        rank = np.searchsorted(s, est, side="right") / n
        assert abs(rank - q) <= 1.5 / B * 2 + 1e-3, (q, rank)
