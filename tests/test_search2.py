"""Fast query engine (packed-key + LUT) vs the v1 windowed engine.

Both must produce identical (start, count) bounds on every input; v1 is
itself pinned to the reference semantics by tests/test_search.py.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from suffix_tpu import SuffixTable
from suffix_tpu.ops import search as s1
from suffix_tpu.ops import search2 as s2
from suffix_tpu.ops.padding import PAD, bucket_size


def both_engines(text: bytes, queries):
    st_ = SuffixTable.new(text)
    n = len(st_)
    n_pad = bucket_size(max(n, 1))
    t = np.full((n_pad,), PAD, dtype=np.int32)
    t[:n] = np.frombuffer(text, dtype=np.uint8)
    tab = np.zeros((n_pad,), dtype=np.int32)
    tab[:n] = st_.table()
    t_dev, tab_dev = jnp.asarray(t), jnp.asarray(tab)
    n_iters = max(1, (n_pad + 1).bit_length())
    q, qlens = s1.pack_queries(queries)
    q_dev, qlens_dev = jnp.asarray(q), jnp.asarray(qlens)

    v1 = s1.bounds_batch(t_dev, jnp.int32(n), tab_dev, jnp.int32(n),
                         q_dev, qlens_dev, n_iters)
    pk, pk_fence, pk_block, lut = s2.build_query_index(t_dev, tab_dev, jnp.int32(n))
    v2 = s2.bounds_batch_fast(t_dev, jnp.int32(n), tab_dev, jnp.int32(n),
                              pk[0], pk[1], lut, q_dev, qlens_dev,
                              n_iters, q.shape[1])
    v3 = s2.bounds_batch_merge(t_dev, jnp.int32(n), tab_dev, jnp.int32(n),
                               pk_fence, pk_block, q_dev, qlens_dev, n_iters,
                               q.shape[1])
    v1 = tuple(np.asarray(x) for x in v1)
    v3 = tuple(np.asarray(x) for x in v3)
    assert np.array_equal(v1[1], v3[1]), (text, queries, v1[1], v3[1])
    live = v1[1] > 0
    assert np.array_equal(v1[0][live], v3[0][live]), (text, queries)
    return v1, tuple(np.asarray(x) for x in v2)


def assert_same(text, queries):
    (s1_, c1), (s2_, c2) = both_engines(text, queries)
    assert np.array_equal(c1, c2), (text, queries, c1, c2)
    # start only meaningful when count > 0
    live = c1 > 0
    assert np.array_equal(s1_[live], s2_[live]), (text, queries)


def test_directed():
    text = b"the quick brown fox was quick."
    assert_same(text, ["quick", "q", "", "the quick brown fox was quick.",
                       "zebra", ".", " ", "quick.", "quick.x", "th", "qu",
                       "quicksand"])


def test_short_and_long_boundary():
    # Queries of length 5, 6, 7 straddle the packed-key width.
    text = b"abcdefabcdefabcdefxyz"
    assert_same(text, ["abcde", "abcdef", "abcdefa", "abcdefx", "bcdefa",
                       "abcdefabcdefabcdefxyz", "abcdefabcdefabcdefxyzQ"])


def test_degenerate_runs():
    assert_same(b"a" * 500, ["a", "aa", "aaaaaa", "aaaaaaa", "a" * 100,
                             "a" * 500, "a" * 501, "b"])


def test_nul_bytes():
    assert_same(b"\x00\x00a\x00b", [b"\x00", b"\x00a", b"\x00\x00",
                                    b"a\x00b", b"b\x00"])


def test_high_bytes():
    assert_same(bytes(range(250, 256)) * 9, [bytes([255]), bytes([250, 251]),
                                             bytes(range(250, 256)) * 2])


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=80),
       st.lists(st.binary(min_size=0, max_size=12), min_size=1, max_size=6))
def test_prop_engines_agree(text, queries):
    assert_same(text, queries)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="ab", max_size=60),
       st.lists(st.text(alphabet="ab", max_size=9), min_size=1, max_size=4))
def test_prop_dense(text, queries):
    assert_same(text.encode(), [q.encode() for q in queries])


def test_end_to_end_table_api(dna_10k):
    # The public API now routes through the fast engine; re-pin reference
    # semantics directly.
    st_ = SuffixTable.new(dna_10k)
    probes = [dna_10k[i:i + 7] for i in range(0, 3000, 151)]
    probes += [dna_10k[i:i + 31] for i in range(0, 3000, 307)] + [b"NOPE"]
    for q, got in zip(probes, st_.positions_batch(probes)):
        out, i = [], dna_10k.find(q)
        while i != -1:
            out.append(i)
            i = dna_10k.find(q, i + 1)
        assert sorted(got.tolist()) == out


def test_merge_engine_agrees():
    # The merge-join engine must match v1 exactly too.
    import jax.numpy as jnp
    from suffix_tpu.ops import search as s1_, search2 as s2_
    texts = [b"the quick brown fox was quick.", b"a" * 300, b"\x00ab\x00",
             bytes(range(256)) * 3, b"banana" * 20]
    queriesets = [["quick", "", "a", "an", "banana", "nanana", "\x00",
                   "the quick brown fox was quick.", "xyzzy", "aaaaaaa"]]
    for text in texts:
        for queries in queriesets:
            st_ = SuffixTable.new(text)
            n = len(st_)
            n_pad = bucket_size(max(n, 1))
            t = np.full((n_pad,), PAD, dtype=np.int32)
            t[:n] = np.frombuffer(text, dtype=np.uint8)
            tab = np.zeros((n_pad,), dtype=np.int32)
            tab[:n] = st_.table()
            t_dev, tab_dev = jnp.asarray(t), jnp.asarray(tab)
            n_iters = max(1, (n_pad + 1).bit_length())
            q, qlens = s1_.pack_queries(queries)
            v1 = s1_.bounds_batch(t_dev, jnp.int32(n), tab_dev, jnp.int32(n),
                                  jnp.asarray(q), jnp.asarray(qlens), n_iters)
            pk, pk_fence, pk_block, _ = s2_.build_query_index(
                t_dev, tab_dev, jnp.int32(n))
            v3 = s2_.bounds_batch_merge(t_dev, jnp.int32(n), tab_dev,
                                        jnp.int32(n), pk_fence, pk_block,
                                        jnp.asarray(q), jnp.asarray(qlens),
                                        n_iters, q.shape[1])
            s1a, c1 = (np.asarray(x) for x in v1)
            s3a, c3 = (np.asarray(x) for x in v3)
            assert np.array_equal(c1, c3), (text, c1, c3)
            live = c1 > 0
            assert np.array_equal(s1a[live], s3a[live]), text


def test_extended_keys_long_patterns(rng):
    """Patterns in (18, 36] resolve exactly via EXT_KEY_WORDS wide keys
    (no byte refine), and > 36 still refines — all identical to the
    reference's match_indices semantics through the public table API."""
    from suffix_tpu.ops import search2

    base = b"abracadabra_" * 60  # period 12: long repeated prefixes
    data = base + bytes(rng.integers(0, 256, size=300, dtype=np.uint8))
    st_ = SuffixTable.new(data)
    assert st_._pk_ext is None
    queries = [data[5:5 + 19], data[0:24], data[12:12 + 36],
               data[3:3 + 35], b"zz" * 10, data[700:700 + 30],
               data[2:2 + 50], b"abracadabra_abracadabra_abracadabra_"]
    got = st_.positions_batch(queries)
    assert st_._pk_ext is not None  # the wide-key path was taken
    for q, g in zip(queries, got):
        expected = sorted(
            i for i in range(len(data) - len(q) + 1)
            if data[i:i + len(q)] == q)
        assert sorted(g.tolist()) == expected, q[:20]


def test_stride_override_parity(dna_10k):
    """Explicit fence strides must not change any bound (the ladder is a
    pure performance knob; consumers read stride from pk_block.shape)."""
    text = dna_10k[:4096]
    n = len(text)
    n_pad = bucket_size(n)
    t = np.full((n_pad,), PAD, dtype=np.int32)
    t[:n] = np.frombuffer(text, dtype=np.uint8)
    st_ = SuffixTable.new(text)
    tab = np.zeros((n_pad,), dtype=np.int32)
    tab[:n] = st_.table()
    t_dev, tab_dev = jnp.asarray(t), jnp.asarray(tab)
    queries = [text[i : i + l].decode("latin-1")
               for i, l in [(0, 3), (100, 1), (5, 14), (77, 18), (9, 2)]]
    queries += ["ZZZ", ""]
    q, qlens = s1.pack_queries(queries)
    q_dev, qlens_dev = jnp.asarray(q), jnp.asarray(qlens)
    n_iters = (n_pad + 1).bit_length()
    ref = None
    for stride in (1, 4, 8, 64, 256):
        _, fence, blk, _ = s2.build_query_index(t_dev, tab_dev, jnp.int32(n),
                                                stride=stride)
        got = s2.bounds_batch_merge(t_dev, jnp.int32(n), tab_dev,
                                    jnp.int32(n), fence, blk, q_dev,
                                    qlens_dev, n_iters, q.shape[1])
        got = tuple(np.asarray(x) for x in got)
        if ref is None:
            ref = got
        else:
            assert np.array_equal(ref[1], got[1]), stride
            live = ref[1] > 0
            assert np.array_equal(ref[0][live], got[0][live]), stride


def test_with_keys_false_same_bounds(dna_10k):
    text = dna_10k[:4096]
    n = len(text)
    n_pad = bucket_size(n)
    t = np.full((n_pad,), PAD, dtype=np.int32)
    t[:n] = np.frombuffer(text, dtype=np.uint8)
    st_ = SuffixTable.new(text)
    tab = np.zeros((n_pad,), dtype=np.int32)
    tab[:n] = st_.table()
    t_dev, tab_dev = jnp.asarray(t), jnp.asarray(tab)
    q, qlens = s1.pack_queries([text[5:19].decode("latin-1"), "ZZZ", "A"])
    q_dev, qlens_dev = jnp.asarray(q), jnp.asarray(qlens)
    n_iters = (n_pad + 1).bit_length()
    pk, fence_a, blk_a, _ = s2.build_query_index(t_dev, tab_dev, jnp.int32(n))
    none_pk, fence_b, blk_b, _ = s2.build_query_index(
        t_dev, tab_dev, jnp.int32(n), with_keys=False)
    assert none_pk is None and pk is not None
    a = s2.bounds_batch_merge(t_dev, jnp.int32(n), tab_dev, jnp.int32(n),
                              fence_a, blk_a, q_dev, qlens_dev, n_iters,
                              q.shape[1])
    b = s2.bounds_batch_merge(t_dev, jnp.int32(n), tab_dev, jnp.int32(n),
                              fence_b, blk_b, q_dev, qlens_dev, n_iters,
                              q.shape[1])
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_huge_index_route_no_flat_keys(dna_10k, monkeypatch):
    """Indexes past FLAT_KEYS_MAX_PAD drop the flat key copy: the merge
    engine + byte refine must still answer every pattern length and the
    device LCP must rebuild keys on demand."""
    text = dna_10k[:8192]
    ref = SuffixTable.new(text)
    ref.query_route = "device"
    monkeypatch.setattr(SuffixTable, "FLAT_KEYS_MAX_PAD", 1 << 10)
    huge = SuffixTable.new(text)
    huge.query_route = "device"
    huge._ensure_device()
    assert huge._pk is None and huge._pk_block is not None
    queries = [text[i : i + l].decode("latin-1")
               for i, l in [(3, 2), (50, 14), (100, 19), (200, 30),
                            (400, 64)]] + ["ZZZ", "A"]
    for q in queries:
        a, b = ref.positions(q), huge.positions(q)
        assert sorted(a.tolist()) == sorted(b.tolist()), q
    np.testing.assert_array_equal(ref.lcp_lens(), huge.lcp_lens())


def test_lean_index_build_matches_monolithic(dna_10k):
    """The host-stepped lean builder (LEAN_MIN_PAD route: donated block
    buffer, one word in flight — what lets a 256 MiB index build inside
    16 GB HBM) must produce bit-identical fences and blocks to the
    one-program with_keys=False build."""
    text = dna_10k[:5000]
    n = len(text)
    n_pad = bucket_size(n)
    padded = np.full((n_pad,), PAD, np.int32)
    padded[:n] = np.frombuffer(text, np.uint8)
    t_dev = jnp.asarray(padded)
    st = SuffixTable.new(text)
    tab = np.zeros((n_pad,), np.int32)
    tab[:n] = np.asarray(st.table(), np.int32)
    tab_dev = jnp.asarray(tab)

    pk, fence_a, blk_a, lut = s2.build_query_index(
        t_dev, tab_dev, jnp.int32(n), with_keys=False)
    assert pk is None and lut is None
    stride = blk_a.shape[1] // s2.KEY_WORDS
    _, fence_b, blk_b, _ = s2._build_query_index_lean(
        t_dev, tab_dev, jnp.int32(n), s2.KEY_WORDS, stride)
    assert np.array_equal(np.asarray(blk_a), np.asarray(blk_b))
    for fa, fb in zip(fence_a, fence_b):
        assert np.array_equal(np.asarray(fa), np.asarray(fb))


def test_lean_route_through_public_entry(dna_10k, monkeypatch):
    """The LEAN_MIN_PAD routing branch of the public build_query_index
    (with_keys=False + stride>1 + huge n_pad) must actually take the
    host-stepped lean builder and serve bit-identical positions — a
    routing regression here would only surface as an OOM on real
    256 MiB TPU runs."""
    text = dna_10k[:8192]
    ref = SuffixTable.new(text)
    ref.query_route = "device"

    monkeypatch.setattr(s2, "LEAN_MIN_PAD", 1 << 10)
    monkeypatch.setattr(SuffixTable, "FLAT_KEYS_MAX_PAD", 1 << 9)
    took_lean = []
    orig = s2._build_query_index_lean

    def spy(*a, **k):
        took_lean.append(True)
        return orig(*a, **k)

    monkeypatch.setattr(s2, "_build_query_index_lean", spy)
    lean = SuffixTable.new(text)
    lean.query_route = "device"
    lean._ensure_device()
    assert took_lean, "public entry did not route to the lean builder"
    assert lean._pk is None
    queries = [text[i:i + l].decode("latin-1")
               for i, l in [(3, 2), (50, 14), (100, 19), (200, 30)]] + ["ZZ"]
    for q in queries:
        assert sorted(ref.positions(q).tolist()) == \
            sorted(lean.positions(q).tolist()), q


def test_monolithic_route_past_lean_min_pad_warns(dna_10k, monkeypatch):
    """A with_keys=True build at n_pad >= LEAN_MIN_PAD silently exceeded
    16 GB HBM before; it must now warn and point at with_keys=False."""
    import pytest

    text = dna_10k[:5000]
    n = len(text)
    n_pad = bucket_size(n)
    padded = np.full((n_pad,), PAD, np.int32)
    padded[:n] = np.frombuffer(text, np.uint8)
    st = SuffixTable.new(text)
    tab = np.zeros((n_pad,), np.int32)
    tab[:n] = np.asarray(st.table(), np.int32)
    t_dev, tab_dev = jnp.asarray(padded), jnp.asarray(tab)

    monkeypatch.setattr(s2, "LEAN_MIN_PAD", 1 << 10)
    with pytest.warns(RuntimeWarning, match="with_keys=False"):
        s2.build_query_index(t_dev, tab_dev, jnp.int32(n), with_keys=True)
    # stride<=1 override with with_keys=False also falls through: warn too.
    with pytest.warns(RuntimeWarning, match="with_keys=False"):
        s2.build_query_index(t_dev, tab_dev, jnp.int32(n), with_keys=False,
                             stride=1)


def test_deep_keyless_engine_parity(dna_10k, monkeypatch):
    """The deep keyless engine (fences + block + ext tier + compacted
    long-lane probe, round 5) must be bit-identical to the flat-key
    route on mixed batteries spanning every coverage tier: <=18 B
    (fence+block exact), 19-36 B (ext probe exact), >36 B (tail byte
    refine), plus misses and repeats-heavy text."""
    rng = np.random.default_rng(0xDEE9)
    text = bytearray(dna_10k[:6000])
    blk = bytes(text[100:400])  # fat 300-byte repeats: deep equal-ranges
    for at in rng.integers(0, 5000, size=8):
        text[at:at + 300] = blk
    text = bytes(text)
    ref = SuffixTable.new(text)
    ref.query_route = "device"
    monkeypatch.setattr(SuffixTable, "FLAT_KEYS_MAX_PAD", 1 << 10)
    deep = SuffixTable.new(text)
    deep.query_route = "device"
    deep._ensure_device()
    assert deep._pk is None and deep._ext_block is not None
    queries = []
    for l in (1, 3, 8, 14, 18, 19, 24, 36, 37, 40, 64, 90):
        for _ in range(6):
            s = int(rng.integers(0, len(text) - l))
            queries.append(text[s:s + l])
        queries.append(bytes(rng.integers(65, 91, size=l).tolist()))
    s_r, c_r = ref._bounds_batch(queries)
    s_d, c_d = deep._bounds_batch(queries)
    np.testing.assert_array_equal(s_r, s_d)
    np.testing.assert_array_equal(c_r, c_d)


def test_sorted_gather_words_match_gather_build(dna_10k):
    """packed_keys_rank_order (2-sort construction) == the per-word
    gather build, including pad masking."""
    text = dna_10k[:3000]
    st_ = SuffixTable.new(text)
    n = len(st_)
    n_pad = bucket_size(n)
    t = np.full((n_pad,), PAD, np.int32)
    t[:n] = np.frombuffer(text, np.uint8)
    tab = np.zeros((n_pad,), np.int32)
    tab[:n] = st_.table()
    t_dev, tab_dev = jnp.asarray(t), jnp.asarray(tab)
    pk_ref, _, _, _ = s2.build_query_index(t_dev, tab_dev, jnp.int32(n),
                                           stride=1)
    pk_sorted = s2.packed_keys_rank_order(t_dev, tab_dev, n)
    for a, b in zip(pk_ref, pk_sorted):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
