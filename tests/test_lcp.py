"""LCP conformance: device blockwise engine vs quadratic definition & Kasai."""

import numpy as np
from hypothesis import given, settings, strategies as st

from suffix_tpu import SuffixTable
from suffix_tpu.ops.lcp import kasai_host


def quadratic_lcp(text: bytes, table: np.ndarray) -> np.ndarray:
    """The reference definition verbatim (src/table.rs:348-365)."""
    n = len(table)
    lcps = np.zeros(n, dtype=np.uint32)
    for i in range(n - 1):
        a, b = text[int(table[i]):], text[int(table[i + 1]):]
        k = 0
        for ca, cb in zip(a, b):
            if ca != cb:
                break
            k += 1
        lcps[i + 1] = k
    return lcps


def check(text):
    sa = SuffixTable.new(text)
    raw = sa.text_bytes()
    expected = quadratic_lcp(raw, sa.table())
    got_dev = sa.lcp_lens()
    got_kasai = sa.lcp_lens(method="kasai")
    assert np.array_equal(expected, got_dev)
    assert np.array_equal(expected, got_kasai)


def test_directed():
    for text in ["banana", "mississippi", "", "a", "aa", "aaaaaaaaab",
                 "☃abc☃", "the quick brown fox was quick."]:
        check(text)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=48))
def test_prop_lcp(s):
    check(s)


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=64))
def test_prop_lcp_bytes(b):
    check(b)


def test_long_runs():
    # LCP > one device block (128) exercises the multi-round path.
    check("a" * 700)
    check("ab" * 400)


def test_dna_lcp(dna_10k):
    sa = SuffixTable.new(dna_10k)
    got = sa.lcp_lens()
    expected = kasai_host(np.frombuffer(dna_10k, dtype=np.uint8), sa.table())
    assert np.array_equal(expected, got)
