"""Deep property battery at the reference's quickcheck budget.

The reference runs every quickcheck property at 1000 tests (with up to
10000 discards, tests/tests.rs:14-16); the fast suite's Hypothesis
budgets are 50-300 examples per property. This slow-marked module
re-runs the core SA / positions / contains properties at >=1000
examples each (VERDICT r2 #10) — the nightly-depth layer:

    python -m pytest tests/test_property_deep.py -m slow -q
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from suffix_tpu import SuffixTable
from suffix_tpu.ops.naive import naive_table

pytestmark = pytest.mark.slow

DEEP = settings(max_examples=1000, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


@DEEP
@given(st.text(max_size=64))
def test_deep_prop_unicode_matches_naive(s):
    # prop_naive_equals_sais / prop_matches_naive (tests/tests.rs:73-96)
    expected = SuffixTable.new_naive(s)
    got = SuffixTable.new(s)
    assert np.array_equal(expected.table(), got.table())


@DEEP
@given(st.binary(max_size=96))
def test_deep_prop_bytes_match_naive(b):
    assert np.array_equal(naive_table(b), SuffixTable.new(b).table())


@DEEP
@given(st.text(max_size=48), st.text(min_size=1, max_size=6))
def test_deep_prop_positions(s, q):
    # prop_positions (tests/tests.rs:233-243): results == match_indices
    # (sorted before compare — SA order is unordered).
    table = SuffixTable.new(s)
    got = sorted(int(p) for p in table.positions(q))
    sb, qb = s.encode(), q.encode()
    expected, start = [], sb.find(qb)
    while start != -1:
        expected.append(start)
        start = sb.find(qb, start + 1)
    assert got == expected


@DEEP
@given(st.text(max_size=48), st.text(max_size=6))
def test_deep_prop_contains(s, q):
    # prop_contains (tests/tests.rs:223-231); empty query matches nothing.
    table = SuffixTable.new(s)
    expected = bool(q) and q.encode() in s.encode()
    assert table.contains(q) == expected
    assert (table.any_position(q) is not None) == expected


@DEEP
@given(st.text(alphabet="ab\x00", max_size=48))
def test_deep_prop_small_alphabet(s):
    # Maximal rank ties / doubling rounds.
    assert np.array_equal(
        SuffixTable.new_naive(s).table(), SuffixTable.new(s).table())
