"""The rolling-zscore membership predicate is pure integer algebra —
prove the algebra itself against the mathematical definition.

``rolling_zscore_anomalies`` (plans/catalog_windows.py) decides
|z| > 2 with the exact-integer form  3·D² > 14·M  where, over a
7-element frame of integer cents c_i with current element c0:

    D = 7·c0 − Σc_i          (700·(value − mean))
    M = 7·Σc_i² − (Σc_i)²    (7·6·var_samp·100²)

The Spark↔DuckDB parity test cannot catch a WRONG derivation shared by
both sides, so this test checks the predicate against |z| > 2 computed
in exact rational arithmetic (fractions.Fraction — no float rounding at
all) over randomized frames, including adversarial frames built to sit
exactly ON the boundary (z² = 4), where the strict > must exclude.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def exact_membership(cents: list[int]) -> bool:
    """|z| > 2 decided in exact rational arithmetic (ground truth)."""
    assert len(cents) == 7
    c0 = cents[-1]  # current row = last element of the frame
    n = 7
    mean = Fraction(sum(cents), n)
    var = sum((Fraction(c) - mean) ** 2 for c in cents) / (n - 1)
    if var == 0:
        return False
    z2 = (Fraction(c0) - mean) ** 2 / var
    return z2 > 4


def integer_predicate(cents: list[int]) -> bool:
    """The engine/oracle form: M > 0 and 3·D² > 14·M."""
    c0 = cents[-1]
    s1 = sum(cents)
    s2 = sum(c * c for c in cents)
    d = 7 * c0 - s1
    m = 7 * s2 - s1 * s1
    return m > 0 and 3 * d * d > 14 * m


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=100_000), min_size=7, max_size=7
    )
)
def test_integer_predicate_matches_exact_zscore(cents):
    assert integer_predicate(cents) == exact_membership(cents)


def test_boundary_frames_excluded_by_strict_inequality():
    # Exhaustively search small frames sitting EXACTLY on the boundary
    # (z² = 4 ⇔ 3·D² = 14·M with integers, no float blur possible) and
    # assert both the predicate and the exact-rational ground truth
    # exclude them — strict > means "on the fence is not an anomaly",
    # identically on both engines. 102 such frames exist with values
    # ≤ 12, e.g. frame (0,0,0,0,3,3 | current 8).
    from itertools import combinations_with_replacement

    found = 0
    for rest in combinations_with_replacement(range(13), 6):
        s1r = sum(rest)
        s2r = sum(c * c for c in rest)
        for c0 in range(13):
            s1 = s1r + c0
            s2 = s2r + c0 * c0
            d = 7 * c0 - s1
            m = 7 * s2 - s1 * s1
            if m > 0 and 3 * d * d == 14 * m:
                found += 1
                cents = list(rest) + [c0]
                assert not integer_predicate(cents)
                assert not exact_membership(cents)
    assert found == 102, f"boundary census changed: {found}"
