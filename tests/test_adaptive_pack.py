"""Alphabet-adaptive dense-coded initial sort: bit-parity + plan policy.

The adaptive path (ops/prefix_doubling.py `_adaptive_plan` /
`_suffix_array_packed`) codes a small alphabet into dense
order-preserving codes and packs 4-16 characters per initial sort word,
so low-entropy corpora (DNA etc.) clear their expected max LCP in the
first sort. Output must be bit-identical to the byte path — codes are
order-isomorphic and 0 is the sentinel.
"""

from __future__ import annotations

import numpy as np
import pytest

from suffix_tpu.ops import prefix_doubling as pd
from suffix_tpu.ops.naive import naive_table


@pytest.fixture
def small_gate(monkeypatch):
    monkeypatch.setattr(pd, "ADAPTIVE_PACK_MIN", 16)


CASES = [
    ("dna", lambda rng, n: (rng.integers(0, 4, n, dtype=np.uint8) + 97)),
    ("binary_alpha", lambda rng, n: (rng.integers(0, 2, n, dtype=np.uint8) + 65)),
    ("sigma17", lambda rng, n: rng.integers(100, 117, n, dtype=np.uint8)),
    ("all_equal", lambda rng, n: np.full(n, 97, dtype=np.uint8)),
    ("period7", lambda rng, n: np.tile(
        np.frombuffer(b"abcabz!", np.uint8), n // 7 + 1)[:n]),
]


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_adaptive_parity(small_gate, rng, name, gen):
    for n in (31, 300, 2048, 5000):
        arr = gen(rng, n)
        n_pad = pd.bucket_size(n)
        plan = pd._adaptive_plan(arr, n_pad)
        got = pd.suffix_array_bytes(arr)
        expected = naive_table(arr.tobytes())
        assert np.array_equal(got, expected), (name, n, plan)


def test_adaptive_plan_triggers_for_small_alphabets(rng):
    # DNA at 4 MiB-pad must produce a plan that covers ~2*log4(n)+slack
    # characters in one sort.
    arr = (rng.integers(0, 4, 4096, dtype=np.uint8) + 97)
    plan = pd._adaptive_plan(arr, 1 << 22)
    assert plan is not None
    lut, bits, cpw, n_words = plan
    assert bits == 3 and cpw == 10
    assert cpw * n_words >= 2 * 11 + pd.ADAPTIVE_SLACK_CHARS
    # Order-preserving codes.
    assert list(lut[[97, 98, 99, 100]]) == [1, 2, 3, 4]


def test_adaptive_plan_declines_high_entropy(rng):
    # Uniform random bytes: the 9-bit ladder is already optimal; the
    # plan must decline rather than widen past ADAPTIVE_MAX_WORDS.
    arr = rng.integers(0, 256, 65536, dtype=np.uint8)
    assert pd._adaptive_plan(arr, 1 << 26) is None


def test_repeat_lcp_lower_bound(rng):
    # Tiled corpus: the probe finds the period and the bound is exact.
    block = rng.integers(0, 4, 1000, dtype=np.uint8) + 97
    arr = np.tile(block, 50)
    assert pd._repeat_lcp_lower_bound(arr) == arr.size - 1000
    # Random corpus: no 64-byte self-repeat, no bound.
    assert pd._repeat_lcp_lower_bound(
        rng.integers(0, 256, 65536, dtype=np.uint8)) is None


def test_repeat_lever_widens_initial_words(rng):
    """The 4 MiB repeated fixture class (100 KB block tiled): the plan
    must pick the round-minimizing width (h0*4^r > maxLCP with minimal
    r), wider than the random-text estimate — and stay bit-correct."""
    block = rng.integers(0, 4, 100_001, dtype=np.uint8) + 97
    arr = np.tile(block, 42)[:1 << 22]
    plan = pd._adaptive_plan(arr, 1 << 22)
    assert plan is not None
    _, bits, cpw, n_words = plan
    assert bits == 3 and cpw == 10
    max_lcp = arr.size - 100_001

    def rounds(h0):
        r, h = 0, h0
        while h <= max_lcp:
            h, r = h * 4, r + 1
        return r

    # 7 words (h0=70) reaches 4.09M in 8 rounds; 4 words needs 9.
    assert rounds(cpw * n_words) < rounds(40)
    assert n_words == min(
        range(1, pd.ADAPTIVE_MAX_WORDS_REPEAT + 1),
        key=lambda w: (rounds(cpw * w), w))
    # Bit-parity on a small tiled corpus through the public entry.
    small = np.tile(block[:997], 20)
    got = pd.suffix_array_bytes(small)
    assert np.array_equal(got, naive_table(small.tobytes()))


def test_adaptive_u64(small_gate, rng):
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        arr = (rng.integers(0, 4, 600, dtype=np.uint8) + 97)
        got = pd.suffix_array_bytes(arr, index_dtype="u64")
        assert got.dtype == np.uint64
        assert np.array_equal(got.astype(np.uint32),
                              naive_table(arr.tobytes()))
    finally:
        jax.config.update("jax_enable_x64", False)
