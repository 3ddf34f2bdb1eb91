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
    """A degenerate repetitive corpus (survivor mass > n/4, mean LCP
    ~ n) must route to the linear Kasai: any windowed device refine is
    O(sum-of-LCPs) there (VERDICT r3). Bit-equality is the contract."""
    from suffix_tpu.ops import lcp as lcp_ops

    text = b"abracadabra-zyx!" * 512  # period 16, survivors ~ n
    st_ = SuffixTable.new(text)
    kasai_calls = []
    orig = lcp_ops._kasai_route

    def spy(*a, **k):
        kasai_calls.append(True)
        return orig(*a, **k)

    monkeypatch.setattr(lcp_ops, "_kasai_route", spy)
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
    blk = rng.integers(0, 4, size=1024, dtype=np.uint8) + 97
    filler = rng.integers(0, 26, size=8192, dtype=np.uint8) + 65
    text = (bytes(filler[:4096]) + bytes(blk) + bytes(filler[4096:])
            + bytes(blk))  # two copies of blk: ~1k survivors, LCP up to 1k
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


def test_bulk_engine_sparse_repeats(monkeypatch):
    """Sparse-repeat corpora (survivors in (2048, n/64] — genomic
    duplications, boilerplate-bearing data) must take the staged BULK
    engine and stay bit-equal to Kasai. Survivor-dense text routes to
    Kasai instead (measured faster, ops/lcp.py routing notes)."""
    from suffix_tpu.ops import lcp as lcp_ops

    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, size=1 << 19, dtype=np.uint8) + 97
    # Plant doubled 24-byte blocks (each yields ~6 surviving pairs: the
    # close copy creates overlapping matches) and one deep 600-byte
    # repeat: survivors land between LCP_SURV_CHUNKED and n/64 = 8192.
    for i in range(800):
        src = int(rng.integers(0, (1 << 19) - 2048))
        dst = src + 24 + int(rng.integers(0, 64))
        base[dst:dst + 24] = base[src:src + 24]
    deep_src = int(rng.integers(0, (1 << 19) - 4096))
    base[deep_src + 700:deep_src + 1300] = base[deep_src:deep_src + 600]
    arr = base
    st_ = SuffixTable.new(bytes(arr))
    bulk_calls, kasai_calls = [], []
    orig_bulk = lcp_ops._lcp_bulk
    orig_kasai = lcp_ops._kasai_route

    def spy_bulk(*a, **k):
        bulk_calls.append(True)
        return orig_bulk(*a, **k)

    def spy_kasai(*a, **k):
        kasai_calls.append(True)
        return orig_kasai(*a, **k)

    monkeypatch.setattr(lcp_ops, "_lcp_bulk", spy_bulk)
    monkeypatch.setattr(lcp_ops, "_kasai_route", spy_kasai)
    got = st_.lcp_lens()
    assert bulk_calls and not kasai_calls, (len(bulk_calls),
                                            len(kasai_calls))
    expected = kasai_host(arr, st_.table())
    assert np.array_equal(expected, got)

    # Bulk budget exhausted (deep lanes beyond LCP_BULK_MAX_OFF): the
    # driver returns None and auto falls back to Kasai — still equal.
    monkeypatch.setattr(lcp_ops, "LCP_BULK_LADDER",
                        (("rows", 128, 0),))
    monkeypatch.setattr(lcp_ops, "LCP_BULK_MAX_OFF", 256)
    kasai_calls.clear()
    got2 = st_.lcp_lens()
    assert kasai_calls, "bulk budget exhaustion did not fall back"
    assert np.array_equal(expected, got2)


def test_sampled_dense_short_circuit(monkeypatch):
    """>= 1 MiB survivor-dense corpora route to Kasai from a host-side
    SAMPLED census — no device staging, no exact census (which measured
    ~40 s of pure overhead at 128 MiB text)."""
    from suffix_tpu import native
    from suffix_tpu.ops import lcp as lcp_ops

    text = b"abracadabra-zyx!" * (1 << 17)  # 2 MiB, period 16
    st_ = SuffixTable.new(text)

    def boom(*a, **k):
        raise AssertionError("exact device census ran")

    monkeypatch.setattr(lcp_ops, "_survivor_count", boom)
    got = st_.lcp_lens()
    if native.available():
        expected = native.kasai(text, st_.table())
        assert np.array_equal(expected, got)


def test_sampled_rate_matches_exact_class():
    from suffix_tpu.ops import lcp as lcp_ops

    rng = np.random.default_rng(2)
    dense = np.tile(np.frombuffer(b"abcdefgh" * 4, np.uint8), 40000)
    st_d = SuffixTable.new(bytes(dense))
    assert lcp_ops._sampled_survivor_rate(dense, st_d.table()) > 0.9
    sparse = rng.integers(0, 256, size=1 << 20, dtype=np.uint8)
    st_s = SuffixTable.new(bytes(sparse))
    assert lcp_ops._sampled_survivor_rate(sparse, st_s.table()) < 0.001


def test_bulk_engine_stagea_only(monkeypatch):
    """Many shallow survivors, none deep: stage A alone must resolve
    (no compaction/deep pass) — pinned by forcing the bulk route with a
    tiny chunked threshold."""
    from suffix_tpu.ops import lcp as lcp_ops

    rng = np.random.default_rng(11)
    # 60 doubled 24-byte blocks with unique random fillers between:
    # every survivor pair shares ~24 bytes — all resolved by one
    # 128-byte window round, no deep lanes.
    pieces = []
    for _ in range(60):
        b = bytes(rng.integers(0, 4, size=24, dtype=np.uint8) + 97)
        f1 = bytes(rng.integers(0, 26, size=32, dtype=np.uint8) + 65)
        f2 = bytes(rng.integers(0, 26, size=32, dtype=np.uint8) + 65)
        pieces += [b, f1, b, f2]
    text = b"".join(pieces)
    st_ = SuffixTable.new(text)
    monkeypatch.setattr(lcp_ops, "LCP_SURV_CHUNKED", 4)
    got = st_.lcp_lens()
    expected = kasai_host(np.frombuffer(text, np.uint8), st_.table())
    assert np.array_equal(expected, got)


def test_packed_bulk_on_text_class_parity():
    """The r5 packed ladder run DIRECTLY on a survivor-dense text
    corpus must be bit-equal to Kasai (auto routes this class to the
    host Kasai — the measured end-to-end winner, see ops/lcp.py
    routing notes — but the engine itself has to stay correct for
    device-resident consumers and future routing changes)."""
    import jax.numpy as jnp

    from suffix_tpu.ops import lcp as lcp_ops
    from suffix_tpu.ops import search2 as s2
    from suffix_tpu.ops.padding import PAD, bucket_size
    from suffix_tpu.utils.textgen import text_corpus

    arr = text_corpus(1 << 18, boilerplate_bytes=1024,
                      boilerplate_copies=12)
    st_ = SuffixTable.new(bytes(arr))
    n = arr.size
    n_pad = bucket_size(n)
    t_pad = np.full((n_pad,), PAD, np.int32)
    t_pad[:n] = arr
    sa_pad = np.zeros((n_pad,), np.int32)
    sa_pad[:n] = st_.table()
    t_dev, tab_dev = jnp.asarray(t_pad), jnp.asarray(sa_pad)
    pk = s2.packed_keys_rank_order(t_dev, tab_dev, n)
    res = lcp_ops._lcp_bulk(t_dev, n, tab_dev, tuple(pk))
    assert res is not None
    assert np.array_equal(kasai_host(arr, st_.table()), res)


def test_packed_window_stage_parity():
    """_bulk_refine_packed in isolation: every phase alignment (base
    mod 3), end-of-text boundaries, and multi-round extension must
    yield the same LCPs as the host oracle."""
    import jax.numpy as jnp

    from suffix_tpu.ops import lcp as lcp_ops
    from suffix_tpu.ops.padding import PAD, bucket_size

    rng = np.random.default_rng(9)
    for trial in range(6):
        n = int(rng.integers(64, 900))
        arr = rng.integers(0, 3, size=n, dtype=np.uint8) + 97
        st_ = SuffixTable.new(bytes(arr))
        sa = st_.table()
        expected = kasai_host(arr, sa)
        n_pad = bucket_size(n)
        t_pad = np.full((n_pad,), PAD, np.int32)
        t_pad[:n] = arr
        tw = lcp_ops._text_words3(jnp.asarray(t_pad))
        # Feed every adjacent pair as an "active survivor" from lcp=0.
        a = np.zeros((n_pad,), np.int32)
        b = np.zeros((n_pad,), np.int32)
        a[1:n] = sa[1:n]
        b[1:n] = sa[: n - 1]
        flag = np.zeros((n_pad,), np.int32)
        flag[1:n] = 1
        lcp0 = np.zeros((n_pad,), np.int32)
        S = int(rng.choice([6, 15, 45]))
        out, fl, left = lcp_ops._bulk_refine_packed(
            tw, jnp.int32(n), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(lcp0), jnp.asarray(flag), n_pad, S,
            row_block=n_pad, max_rounds=4096)
        assert int(left) == 0
        got = np.asarray(out)[1:n]
        assert np.array_equal(got, expected[1:n].astype(np.int32)), \
            (trial, n, S)
