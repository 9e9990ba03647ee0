"""Pure-Python property tests for the integer sketch math (no Spark):
the quantile-sketch bucket mapping and the HLL rank function must
satisfy their structural invariants on the full value domain."""

from __future__ import annotations

from hypothesis import given, strategies as st


def _bucket(cents: int) -> int:
    # mirrors events_value_quantile_sketch's SQL/Spark expression
    if cents < 64:
        return cents
    L = cents.bit_length()
    return 64 + (L - 7) * 8 + ((cents >> (L - 4)) & 7)


def _bucket_lb(b: int) -> int:
    if b < 64:
        return b
    k = b - 64
    return (8 + k % 8) << (k // 8 + 3)


@given(st.integers(0, 10**15))
def test_bucket_lb_bounds_value(cents):
    """lb(bucket(x)) <= x, and x < lb(next nonempty bucket) — i.e. the
    bucket lower bound underestimates by at most the 12.5% bucket
    width."""
    b = _bucket(cents)
    lb = _bucket_lb(b)
    assert lb <= cents
    # upper edge: lower bound of bucket b+1 (same formula) exceeds x
    assert cents < _bucket_lb(b + 1)


@given(st.integers(0, 10**15))
def test_bucket_monotone(cents):
    """bucket() is monotone: a larger value never maps to a smaller
    bucket (required for cumulative-count quantile extraction)."""
    assert _bucket(cents) <= _bucket(cents + 1)


@given(st.integers(0, (1 << 60) - 1))
def test_hll_rank_matches_bit_scan(h):
    """51 - bit_length(w) == leading-zero count of the 50-bit word
    + 1, the rho the engine computes via base-2 digit count."""
    w = h // 1024
    rho = 51 if w == 0 else 51 - w.bit_length()
    # reference: scan bits from position 49 down
    lead = 0
    for i in range(49, -1, -1):
        if (w >> i) & 1:
            break
        lead += 1
    assert rho == lead + 1
