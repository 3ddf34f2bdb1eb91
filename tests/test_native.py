"""Native C++ oracle (SA-IS + Kasai + query bounds) conformance."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from suffix_tpu import SuffixTable
from suffix_tpu import native
from suffix_tpu.ops.naive import naive_table

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_directed():
    for text in [b"banana", b"mississippi", b"", b"a", b"aa", b"ab",
                 b"\x00", b"tgtgtgtgcaccg", "☃abc☃".encode()]:
        assert np.array_equal(native.sais(text), naive_table(text)), text


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=128))
def test_prop_sais(b):
    assert np.array_equal(native.sais(b), naive_table(b))


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=96))
def test_prop_kasai(b):
    sa = native.sais(b)
    got = native.kasai(b, sa)
    expected = SuffixTable(b, sa).lcp_lens(method="kasai")
    assert np.array_equal(got, expected)


def test_dna_cross_oracle(dna_100k):
    # The native linear-time oracle lets us conformance-check the device
    # engine on the full 100KB fixture quickly.
    sa_native = native.sais(dna_100k)
    sa_device = SuffixTable.new(dna_100k).table()
    assert np.array_equal(sa_native, sa_device)
    lcp_native = native.kasai(dna_100k, sa_native)
    lcp_device = SuffixTable(dna_100k, sa_device).lcp_lens()
    assert np.array_equal(lcp_native, lcp_device)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=64), st.binary(min_size=1, max_size=5))
def test_prop_bounds(hay, needle):
    st_ = SuffixTable.new(hay)
    starts, counts = native.bounds_batch(hay, st_.table(), [needle])
    got = sorted(st_.table()[starts[0]:starts[0] + counts[0]].tolist())
    expected = sorted(st_.positions(needle).tolist())
    assert got == expected


def test_bounds_batch_many(dna_10k):
    st_ = SuffixTable.new(dna_10k)
    queries = [dna_10k[i:i + 9] for i in range(0, 3000, 83)] + [b"zzz", b""]
    starts, counts = native.bounds_batch(dna_10k, st_.table(), queries)
    for q, s, c in zip(queries, starts, counts):
        assert sorted(st_.table()[s:s + c].tolist()) == sorted(
            st_.positions(q).tolist()
        )


# ---------------------------------------------------------------- fastpath
# The CPython extension (native/csrc/fastpath.cpp): the single-operation
# serving surface (one C call per whole positions/contains/count/
# any_position) plus the marshalling-free sais/naive builders. Each must
# be bit-identical to the ctypes + batch routes.


@pytest.fixture(scope="module")
def fastpath():
    fp = native._load_fastpath()
    if fp is None:
        pytest.skip("fastpath extension unavailable")
    return fp


def test_fastpath_builders_match_oracles(fastpath, dna_10k):
    for text in [b"", b"a", b"banana", b"mississippi", b"\x00\x00a\x00",
                 bytes(range(256)) * 2, dna_10k[:3000]]:
        golden = naive_table(text)
        assert np.array_equal(fastpath.sais(text), golden)
        assert np.array_equal(fastpath.naive(text), golden)


def test_fastpath_ops_match_batch_route(fastpath, dna_10k):
    table = native.sais(dna_10k)
    handle = native.BoundsHandle(dna_10k, table)
    assert handle._ext is not None
    queries = ([dna_10k[i:i + 7] for i in range(0, 2000, 61)]
               + [b"", b"zzz", b"C", dna_10k[-4:], dna_10k[:40]])
    starts, counts = native.bounds_batch(dna_10k, table, queries)
    for q, s, c in zip(queries, starts, counts):
        assert handle._ext.bounds(q) == (s, c)
        got = handle._ext.positions(q)
        assert got.dtype == np.uint32 and not got.flags.writeable
        assert np.array_equal(got, table[s:s + c])
        assert handle._ext.contains(q) == (c > 0)
        assert handle._ext.count(q) == c
        expected_any = int(table[s]) if c else None
        assert handle._ext.any_position(q) == expected_any


def test_fastpath_positions_view_outlives_handle(fastpath):
    text = b"abracadabra"
    table = native.sais(text)
    handle = native.BoundsHandle(text, table)
    view = handle._ext.positions(b"a")
    expected = view.copy()
    del handle, table  # view must keep the sa buffer alive (base ref)
    assert np.array_equal(view, expected)


def test_fastpath_query_coercion(fastpath):
    """The extension coerces str (UTF-8) and buffers in C — what lets
    SuffixTable bind these methods directly onto instances — and still
    rejects non-bytes-like queries."""
    handle = native.BoundsHandle(b"ab\xc3\xa9c", native.sais(b"ab\xc3\xa9c"))
    assert handle._ext.bounds("é") == handle._ext.bounds(b"\xc3\xa9")
    assert handle._ext.bounds(bytearray(b"ab")) == handle._ext.bounds(b"ab")
    assert handle._ext.bounds(memoryview(b"c")) == handle._ext.bounds(b"c")
    with pytest.raises(TypeError):
        handle._ext.bounds(123)


def test_table_host_route_uses_ext_and_matches_device(dna_10k):
    table = SuffixTable.new(dna_10k, engine="native")
    table.query_route = "host"
    dev = SuffixTable.new(dna_10k, engine="native")
    dev.query_route = "device"
    for q in [dna_10k[100:114], b"", b"C", b"zzz", dna_10k[:30],
              dna_10k[-5:]]:
        assert np.array_equal(table.positions(q), dev.positions(q))
        assert table.contains(q) == dev.contains(q)
        assert table.count(q) == dev.count(q)
        assert table.any_position(q) == dev.any_position(q)
    # toggling the route invalidates the memoized fast path
    table.query_route = "device"
    assert table._bounds_one_host(b"C") is None
    table.query_route = "host"
    assert table._bounds_one_host(b"C") is not None
