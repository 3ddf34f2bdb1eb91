"""Sharded (multi-device) construction vs the single-device engine.

Runs on the virtualized 8-device CPU mesh (conftest). The sharded result
must be bit-identical for every mesh size — the distributed analogue of
the reference's oracle-differential strategy.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax

from suffix_tpu import SuffixTable
from suffix_tpu.ops.naive import naive_table
from suffix_tpu.parallel.dist_build import suffix_array_sharded
from suffix_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module", params=[1, 2, 4, 8])
def mesh(request):
    return make_mesh(request.param)


DIRECTED = [
    b"banana",
    b"mississippi",
    b"a",
    b"aa",
    b"ab" * 37,
    b"\x00" * 19,
    bytes(range(256)),
    b"tgtgtgtgcaccg",
    "☃abc☃".encode("utf-8"),
]


@pytest.mark.parametrize("data", DIRECTED, ids=lambda d: repr(d)[:18])
def test_directed(mesh, data):
    expected = naive_table(data)
    got = suffix_array_sharded(data, mesh)
    assert np.array_equal(expected, got)


def test_random_bytes(mesh, rng):
    for size in [5, 64, 200, 1000]:
        data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        assert np.array_equal(
            SuffixTable.new(data).table(), suffix_array_sharded(data, mesh)
        )


def test_skewed_small_alphabet(mesh, rng):
    # Heavy rank ties stress the bitonic merge-split and re-ranking.
    data = rng.integers(0, 2, size=777, dtype=np.uint8).tobytes()
    assert np.array_equal(
        SuffixTable.new(data).table(), suffix_array_sharded(data, mesh)
    )


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=1, max_size=120))
def test_prop_sharded_8dev(b):
    mesh = make_mesh(8)
    assert np.array_equal(naive_table(b), suffix_array_sharded(b, mesh))


def test_dna_sharded(dna_10k):
    mesh = make_mesh(8)
    assert np.array_equal(
        SuffixTable.new(dna_10k).table(), suffix_array_sharded(dna_10k, mesh)
    )
