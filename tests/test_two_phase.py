"""Two-phase (tie-compacted) construction engine: bit parity + routing.

Phase 1 runs full-width positional-rank rounds until the tie mass fits
the compact budget; phase 2 refines only the tied lanes (sorted within
their disjoint positional-rank intervals). The output must be
bit-identical to every other engine on every corpus class — positional
and dense ranks are order-isomorphic, and tie groups refine in place.
"""

from __future__ import annotations

import numpy as np
import pytest

from suffix_tpu.ops import prefix_doubling as pd
from suffix_tpu.ops.naive import naive_table


@pytest.fixture
def small_gates(monkeypatch):
    # Force BOTH the adaptive packing and the two-phase routing at test
    # sizes (and past the sigma/repeat class gate) so every
    # (plan x phase) combination is exercised.
    monkeypatch.setattr(pd, "ADAPTIVE_PACK_MIN", 16)
    monkeypatch.setattr(pd, "TWO_PHASE_MIN", 16)
    monkeypatch.setattr(pd, "TWO_PHASE_FORCE", True)


CASES = [
    ("text_like", lambda rng, n: _textish(rng, n)),
    ("dna", lambda rng, n: rng.integers(0, 4, n, dtype=np.uint8) + 97),
    ("tiled", lambda rng, n: np.tile(
        np.frombuffer(b"abracadabra-zyx!", np.uint8), n // 16 + 1)[:n]),
    ("all_equal", lambda rng, n: np.full(n, 97, np.uint8)),
    ("binary", lambda rng, n: rng.integers(0, 2, n, dtype=np.uint8) + 48),
    ("random_bytes", lambda rng, n: rng.integers(0, 256, n,
                                                 dtype=np.uint8)),
    ("sparse_repeats", lambda rng, n: _planted(rng, n)),
]


def _textish(rng, n):
    from suffix_tpu.utils.textgen import text_corpus
    return text_corpus(max(n, 64), seed=int(rng.integers(1 << 30)),
                       boilerplate_bytes=64, boilerplate_copies=4)[:n]


def _planted(rng, n):
    base = rng.integers(0, 26, n, dtype=np.uint8) + 97
    for _ in range(max(1, n // 200)):
        src = int(rng.integers(0, max(1, n - 64)))
        dst = int(rng.integers(0, max(1, n - 64)))
        base[dst:dst + 24] = base[src:src + 24]
    return base


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_two_phase_parity(small_gates, rng, name, gen):
    for n in (33, 500, 2048, 6000):
        arr = gen(rng, n)
        got = pd.suffix_array_bytes(arr)
        expected = naive_table(arr.tobytes())
        assert np.array_equal(got, expected), (name, n)


def test_phase2_actually_engages(small_gates, rng, monkeypatch):
    """The compact phase must run (not silently resolve in phase 1) on
    a survivor-sparse corpus — and still match the oracle."""
    rounds = []
    orig = pd._phase2_round

    def spy(*a, **k):
        rounds.append(True)
        return orig(*a, **k)

    monkeypatch.setattr(pd, "_phase2_round", spy)
    arr = _planted(np.random.default_rng(5), 4096)
    got = pd.suffix_array_bytes(arr)
    assert rounds, "phase 2 never ran on a sparse-repeat corpus"
    assert np.array_equal(got, naive_table(arr.tobytes()))


def test_tie_mass_not_tie_count(small_gates, rng):
    """Regression (caught at 128 MiB on the TPU): phase-2 capacity must
    be bucketed on the tie MASS (sum of group sizes), not the smaller
    distinct-deficit n - #classes. With all-size-2 groups the mass is
    2x the deficit, and bucketing on the deficit truncated group
    members, leaving their order unrefined."""
    pieces = []
    for _ in range(300):
        b = bytes(rng.integers(0, 4, size=24, dtype=np.uint8) + 97)
        f1 = bytes(rng.integers(0, 26, size=8, dtype=np.uint8) + 65)
        f2 = bytes(rng.integers(0, 26, size=8, dtype=np.uint8) + 65)
        pieces += [b, f1, b, f2]
    arr = np.frombuffer(b"".join(pieces), np.uint8)
    got = pd.suffix_array_bytes(arr)
    assert np.array_equal(got, naive_table(arr.tobytes()))


def test_two_phase_u64(small_gates, rng):
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        arr = _planted(rng, 1500)
        got = pd.suffix_array_bytes(arr, index_dtype="u64")
        assert got.dtype == np.uint64
        assert np.array_equal(got.astype(np.uint32),
                              naive_table(arr.tobytes()))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_two_phase_at_production_threshold(rng):
    """One real >= TWO_PHASE_MIN build (no monkeypatching): the
    production route must equal the native linear-time engine."""
    from suffix_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    arr = _planted(rng, pd.TWO_PHASE_MIN + 12345)
    got = pd.suffix_array_bytes(arr)
    assert np.array_equal(got, native.sais(arr.tobytes()))