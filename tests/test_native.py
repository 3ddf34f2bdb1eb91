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
