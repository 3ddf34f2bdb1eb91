"""Patched-periodic (defect-tolerant) construction: parity + routing.

The engine (ops/patched.py) must be bit-identical to every other engine
whichever internal path fires — immediate phase purity, purity after
extra rounds, or the in-program classic fallback when purity never
holds. Every case here diffs against the naive oracle (the same
strategy test_periodic.py uses for the exact closed form).
"""

from __future__ import annotations

import numpy as np
import pytest

from suffix_tpu.ops import patched
from suffix_tpu.ops import prefix_doubling as pd
from suffix_tpu.ops.naive import naive_table


def near_periodic(block: bytes, n: int, mutations) -> np.ndarray:
    """Tile ``block`` to ``n`` bytes, then apply (pos, byte) patches."""
    b = np.frombuffer(block, np.uint8)
    arr = np.tile(b, n // b.size + 1)[:n].copy()
    for p, v in mutations:
        arr[p] = v
    return arr


def run_patched(arr: np.ndarray, q: int):
    """Drive the engine directly (gates live in the router, not here)."""
    n = int(arr.size)
    defects = np.flatnonzero(arr[q:] != arr[: n - q]).astype(np.int64)
    n_pad = pd.bucket_size(n)
    out = patched.patched_dispatch(arr, q, defects, n_pad)
    assert out is not None
    disp, label = out
    sa = np.asarray(disp())[n_pad - n:].astype(np.uint32)
    return sa, label


BLOCK16 = b"gattacacgtagGCA!"
BLOCK7 = b"zyx?abc"


@pytest.mark.parametrize("block,n,mutations", [
    # Single mutation mid-corpus.
    (BLOCK16, 16 * 40 + 7, [(333, ord("Q"))]),
    # Mutation at position 0 and at the last byte.
    (BLOCK16, 16 * 40 + 7, [(0, ord("Q")), (16 * 40 + 6, ord("R"))]),
    # Mutations inside the partial tail tile only.
    (BLOCK16, 16 * 40 + 9, [(16 * 40 + 2, ord("T"))]),
    # Mutations hugging a row boundary (columns q-1 and 0).
    (BLOCK16, 16 * 32, [(16 * 10 - 1, ord("#")), (16 * 10, ord("%"))]),
    # Adjacent mutations (one two-byte edit).
    (BLOCK7, 7 * 64 + 3, [(100, ord("J")), (101, ord("K"))]),
    # A mutation that COPIES another row's byte (rows collapse classes).
    (BLOCK16, 16 * 24, [(16 * 5 + 3, BLOCK16[3])]),
    # Exact multiple length (t = 0), one mutation.
    (BLOCK16, 16 * 48, [(77, ord("Q"))]),
    # Exact multiple, defect-free (degenerate patched == periodic).
    (BLOCK16, 16 * 48, []),
    # Partial tail, defect-free.
    (BLOCK7, 7 * 100 + 5, []),
    # Many mutations, same column in every second row.
    (BLOCK16, 16 * 40, [(16 * r + 5, ord("0") + r % 8)
                        for r in range(0, 40, 2)]),
    # Low-entropy block: long runs, mutation inside a run.
    (b"x" * 13 + b"y", 14 * 50 + 6, [(200, ord("z"))]),
    # Full byte-range block incl 0 and 255.
    (bytes([0, 255, 3, 17, 0, 128, 9]), 7 * 60 + 2, [(150, 254), (151, 1)]),
])
def test_patched_parity(block, n, mutations):
    arr = near_periodic(block, n, mutations)
    sa, label = run_patched(arr, len(block))
    assert label.startswith("patched("), label
    assert np.array_equal(sa, naive_table(arr.tobytes())), (block, mutations)


def test_patched_q1_runs():
    # q = 1: a single repeated byte with sparse mutations; every suffix
    # pair is "same phase", the walk rank carries the whole order.
    arr = near_periodic(b"m", 500, [(100, ord("a")), (399, ord("z"))])
    sa, _ = run_patched(arr, 1)
    assert np.array_equal(sa, naive_table(arr.tobytes()))


def test_patched_internal_repeat_block():
    # The period itself is repetitive (block = "aab"*5 + "x"): rotations
    # share long prefixes, so phase A may need real rounds before purity.
    block = b"aab" * 5 + b"x"
    arr = near_periodic(block, 16 * 33 + 4, [(250, ord("q"))])
    sa, _ = run_patched(arr, 16)
    assert np.array_equal(sa, naive_table(arr.tobytes()))


def test_patched_wrong_q_falls_back_correct():
    # A deliberately wrong period on random text: the defect set is
    # exact for that q (dense), purity never holds, and the in-program
    # classic fallback must still produce the exact SA.
    rng = np.random.default_rng(7)
    arr = rng.integers(97, 110, 700, dtype=np.uint8)
    sa, _ = run_patched(arr, 13)
    assert np.array_equal(sa, naive_table(arr.tobytes()))


def test_patched_table_budget_refuses():
    rng = np.random.default_rng(3)
    q, k = 4096, 40
    arr = rng.integers(0, 256, q * k, dtype=np.uint8)
    defects = np.flatnonzero(arr[q:] != arr[:-q]).astype(np.int64)
    # Dense defects spread over ~q distinct columns: the interval table
    # sweep would be cubic-ish — the dispatcher must refuse, not crawl.
    assert defects.size > 100_000
    assert patched.patched_dispatch(arr, q, defects, q * k) is None


@pytest.fixture
def small_gate(monkeypatch):
    monkeypatch.setattr(pd, "ADAPTIVE_PACK_MIN", 16)


def test_routing_picks_patched(small_gate):
    # Near-periodic (one mutation far from the probe windows) routes to
    # the patched engine and stays bit-exact.
    block = bytes(np.random.default_rng(11).integers(97, 123, 101,
                                                     dtype=np.uint8))
    n = 101 * 37 + 19
    arr = near_periodic(block, n, [(2020, ord("!"))])
    n_pad = pd.bucket_size(n)
    disp, label = pd.device_build_closure(arr, n_pad)
    assert label.startswith("patched(q=101,defects="), label
    got = np.asarray(disp())[n_pad - n:].astype(np.uint32)
    assert np.array_equal(got, naive_table(arr.tobytes()))


def test_routing_exact_still_periodic(small_gate):
    block = b"abracadabra-zyx!"
    arr = near_periodic(block, 16 * 40 + 7, [])
    disp, label = pd.device_build_closure(arr, pd.bucket_size(arr.size))
    assert label.startswith("periodic("), label


def test_routing_mutation_near_head_uses_backup_anchor(small_gate):
    # A mutation inside the first probe window breaks the anchor-0
    # probe; the backup anchors must still find the period.
    block = bytes(np.random.default_rng(5).integers(97, 123, 211,
                                                    dtype=np.uint8))
    n = 211 * 41 + 55
    arr = near_periodic(block, n, [(40, ord("@"))])
    n_pad = pd.bucket_size(n)
    disp, label = pd.device_build_closure(arr, n_pad)
    assert label.startswith("patched(q=211,"), label
    got = np.asarray(disp())[n_pad - n:].astype(np.uint32)
    assert np.array_equal(got, naive_table(arr.tobytes()))


def test_routing_random_text_untouched(small_gate):
    rng = np.random.default_rng(23)
    arr = rng.integers(0, 256, 5000, dtype=np.uint8)
    _, label = pd.device_build_closure(arr, pd.bucket_size(5000))
    assert not label.startswith("patched"), label
    assert not label.startswith("periodic"), label


def test_patched_matches_classic_engine():
    # Cross-engine pin on a mid-size corpus: patched output equals the
    # classic doubling engine's bit for bit (64 KiB, 6 mutations).
    block = bytes(np.random.default_rng(2).integers(65, 91, 997,
                                                    dtype=np.uint8))
    n = 1 << 16
    muts = [(int(p), int(v)) for p, v in
            zip(np.random.default_rng(4).integers(0, n, 6),
                np.random.default_rng(6).integers(33, 127, 6))]
    arr = near_periodic(block, n, muts)
    sa_p, label = run_patched(arr, 997)
    assert label.startswith("patched(")
    sa_c = pd.suffix_array_bytes(arr)
    assert np.array_equal(sa_p, sa_c.astype(np.uint32))


@pytest.mark.parametrize("seed", range(6))
def test_patched_fuzz(seed):
    rng = np.random.default_rng(seed)
    q = int(rng.integers(4, 61))
    k = int(rng.integers(8, 31))
    t = int(rng.integers(0, q))
    n = q * k + t
    sigma = int(rng.choice([2, 4, 26]))
    block = rng.integers(97, 97 + sigma, q, dtype=np.uint8)
    n_mut = int(rng.integers(0, 9))
    muts = [(int(rng.integers(0, n)), int(rng.integers(32, 127)))
            for _ in range(n_mut)]
    arr = near_periodic(block.tobytes(), n, muts)
    sa, _ = run_patched(arr, q)
    assert np.array_equal(sa, naive_table(arr.tobytes())), (seed, q, k, muts)
