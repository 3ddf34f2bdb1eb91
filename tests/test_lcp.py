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


def test_auto_routes_repetitive_to_kasai(monkeypatch):
    """A repetitive corpus (survivor mass ~ n, mean LCP ~ n) must route
    to the linear Kasai: the unbounded device refine is O(sum-of-LCPs)
    there (VERDICT r3). Bit-equality is part of the contract."""
    from suffix_tpu.ops import lcp as lcp_ops

    text = b"abracadabra-zyx!" * 512  # period 16, max LCP ~ 8k
    st_ = SuffixTable.new(text)
    kasai_calls = []
    orig = lcp_ops._kasai_route

    def spy(*a, **k):
        kasai_calls.append(True)
        return orig(*a, **k)

    monkeypatch.setattr(lcp_ops, "_kasai_route", spy)
    monkeypatch.setattr(lcp_ops, "LCP_SURV_ROUTE_MAX", 256)
    got = st_.lcp_lens()  # default method="auto"
    assert kasai_calls, "auto did not route the repetitive corpus"
    expected = kasai_host(np.frombuffer(text, np.uint8), st_.table())
    assert np.array_equal(expected, got)
    # Forced device engine still matches (unbounded refine).
    assert np.array_equal(expected, st_.lcp_lens(method="device"))


def test_auto_round_budget_fallback(monkeypatch):
    """Few survivors but deep LCPs: the survivor count alone cannot
    predict the pathology, so the bounded refine must hit its round
    budget and fall back to Kasai — still bit-equal."""
    from suffix_tpu.ops import lcp as lcp_ops

    rng = np.random.default_rng(7)
    blk = rng.integers(0, 4, size=2048, dtype=np.uint8) + 97
    filler = rng.integers(0, 26, size=8192, dtype=np.uint8) + 65
    text = (bytes(filler[:4096]) + bytes(blk) + bytes(filler[4096:])
            + bytes(blk))  # two copies of blk: ~2k survivors, LCP up to 2k
    st_ = SuffixTable.new(text)
    kasai_calls = []
    orig = lcp_ops._kasai_route

    def spy(*a, **k):
        kasai_calls.append(True)
        return orig(*a, **k)

    monkeypatch.setattr(lcp_ops, "_kasai_route", spy)
    # Budget below the deep LCPs -> unresolved lanes -> fallback.
    monkeypatch.setattr(lcp_ops, "LCP_MAX_OFF", 256)
    got = st_.lcp_lens()
    assert kasai_calls, "round budget did not trigger the Kasai fallback"
    expected = kasai_host(np.frombuffer(text, np.uint8), st_.table())
    assert np.array_equal(expected, got)
    # With the real budget the device engine resolves it without fallback.
    monkeypatch.setattr(lcp_ops, "LCP_MAX_OFF", 8192)
    kasai_calls.clear()
    got2 = st_.lcp_lens()
    assert not kasai_calls
    assert np.array_equal(expected, got2)
