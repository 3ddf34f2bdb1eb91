"""Closed-form periodic-corpus construction: exactness gate + parity.

For a VERIFIED exact global period q, the SA derives from one small SA
of V = T[:2q] ++ T[n-q+1:] plus an arithmetic-chain expansion
(ops/prefix_doubling.py, derivation note). Every case here is diffed
against the naive oracle; inexact corpora must fall through to the
doubling engines.
"""

from __future__ import annotations

import numpy as np
import pytest

from suffix_tpu.ops import prefix_doubling as pd
from suffix_tpu.ops.naive import naive_table


@pytest.fixture
def small_gate(monkeypatch):
    monkeypatch.setattr(pd, "ADAPTIVE_PACK_MIN", 16)


def tiled(block: bytes, n: int) -> np.ndarray:
    b = np.frombuffer(block, np.uint8)
    return np.tile(b, n // b.size + 1)[:n]


@pytest.mark.parametrize("block,n", [
    (b"a", 300),                      # q=1 degenerate
    (b"ab", 257),                     # q=2, truncated tile
    (b"abc", 3 * 100),                # exact tiling
    (b"aab", 1000),                   # repeated chars inside the block
    (b"abracadabra-zyx!", 16 * 40 + 7),
    (b"x" * 63 + b"y", 64 * 12 + 31),  # long run + sentinel char
    (bytes(range(97, 97 + 7)) * 1, 7 * 40 + 5),
    (bytes([0, 255, 3, 17, 0]), 5 * 64 + 2),  # full byte range
])
def test_periodic_parity(small_gate, block, n):
    arr = tiled(block, n)
    disp, label = pd.device_build_closure(arr, pd.bucket_size(n))
    assert label.startswith("periodic("), (block, label)
    got = np.asarray(disp())[pd.bucket_size(n) - n:].astype(np.uint32)
    assert np.array_equal(got, naive_table(arr.tobytes())), block


def test_periodic_long_period(small_gate, rng):
    # A 997-byte random block tiled with a partial last tile.
    block = bytes(rng.integers(0, 26, 997, dtype=np.uint8) + 97)
    n = 997 * 9 + 311
    arr = tiled(block, n)
    disp, label = pd.device_build_closure(arr, pd.bucket_size(n))
    assert label == "periodic(q=997)"
    got = np.asarray(disp())[pd.bucket_size(n) - n:].astype(np.uint32)
    assert np.array_equal(got, naive_table(arr.tobytes()))


def test_non_primitive_block_finds_min_period(small_gate):
    # Block "abab" tiled: the true minimal period is 2.
    arr = tiled(b"abab", 4 * 80 + 3)
    assert pd._exact_min_period(arr) == 2
    disp, label = pd.device_build_closure(arr, pd.bucket_size(arr.size))
    assert label == "periodic(q=2)"
    n = arr.size
    got = np.asarray(disp())[pd.bucket_size(n) - n:].astype(np.uint32)
    assert np.array_equal(got, naive_table(arr.tobytes()))


def test_inexact_period_falls_through(small_gate, rng):
    # One flipped byte breaks exactness: must NOT route periodic, and
    # the doubling engines must still be bit-correct.
    block = bytes(rng.integers(0, 4, 64, dtype=np.uint8) + 97)
    arr = tiled(block, 64 * 20)
    arr = arr.copy()
    arr[700] ^= 1
    assert pd._exact_min_period(arr) is None
    disp, label = pd.device_build_closure(arr, pd.bucket_size(arr.size))
    assert not label.startswith("periodic")
    n = arr.size
    got = np.asarray(disp())[pd.bucket_size(n) - n:].astype(np.uint32)
    assert np.array_equal(got, naive_table(arr.tobytes()))


def test_too_few_tiles_falls_through(small_gate, rng):
    # n/q < PERIODIC_MIN_TILES: doubling handles it (the derivation
    # would be correct but pointless).
    block = bytes(rng.integers(0, 4, 300, dtype=np.uint8) + 97)
    arr = tiled(block, 300 * 4)
    disp, label = pd.device_build_closure(arr, pd.bucket_size(arr.size))
    assert not label.startswith("periodic")


def test_periodic_through_public_entry(small_gate):
    arr = tiled(b"mississippi-", 12 * 30 + 5)
    got = pd.suffix_array_bytes(arr)
    assert np.array_equal(got, naive_table(arr.tobytes()))


def test_periodic_u64(small_gate):
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        arr = tiled(b"abcz", 4 * 100 + 2)
        got = pd.suffix_array_bytes(arr, index_dtype="u64")
        assert got.dtype == np.uint64
        assert np.array_equal(got.astype(np.uint32),
                              naive_table(arr.tobytes()))
    finally:
        jax.config.update("jax_enable_x64", False)


from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=1, max_size=40),
       st.integers(min_value=280, max_value=2000))
def test_prop_tiled(block, n):
    # Any tiled corpus (random block content/length, arbitrary
    # truncation) through the public entry == the oracle. Routing may
    # pick periodic, adaptive, or the ladder depending on block
    # structure — all must agree. (ADAPTIVE_PACK_MIN untouched here:
    # this also covers the small-corpus classic path.)
    arr = tiled(block, n)
    got = pd.suffix_array_bytes(arr)
    assert np.array_equal(got, naive_table(arr.tobytes()))


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=1, max_size=40),
       st.integers(min_value=280, max_value=1500))
def test_prop_tiled_forced_periodic(block, n):
    # Same corpora with the size gate forced down so the periodic route
    # actually fires whenever the exactness check allows it.
    orig = pd.ADAPTIVE_PACK_MIN
    pd.ADAPTIVE_PACK_MIN = 16
    try:
        arr = tiled(block, n)
        got = pd.suffix_array_bytes(arr)
        assert np.array_equal(got, naive_table(arr.tobytes()))
    finally:
        pd.ADAPTIVE_PACK_MIN = orig


def test_periodic_matches_doubling_at_scale(small_gate, rng):
    # Same corpus through the periodic route and the forced classic
    # adaptive engine (route bypassed by calling the packed builder):
    # identical arrays at a non-toy size.
    block = bytes(rng.integers(0, 4, 1021, dtype=np.uint8) + 97)
    n = 1021 * 60 + 123
    arr = tiled(block, n)
    n_pad = pd.bucket_size(n)
    disp, label = pd.device_build_closure(arr, n_pad)
    assert label == "periodic(q=1021)"
    got = np.asarray(disp())[n_pad - n:].astype(np.uint32)
    from suffix_tpu import native
    if native.available():
        assert np.array_equal(got, native.sais(arr.tobytes()))
    else:
        assert np.array_equal(got, naive_table(arr.tobytes()))