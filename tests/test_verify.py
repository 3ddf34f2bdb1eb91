"""O(n) suffix-array verifier (utils/verify.py): accepts exactly the
true SA, rejects every perturbation — on both the host and the
sort-based device form."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from suffix_tpu import SuffixTable
from suffix_tpu.utils.verify import verify_suffix_array

CASES = ["banana", "mississippi", "", "a", "aa", "aaaa", "abab",
         "tgtgtgtgcaccg", "\x00\x00a", "☃abc☃"]


@pytest.mark.parametrize("device", [False, True])
@pytest.mark.parametrize("text", CASES)
def test_accepts_true_sa(text, device):
    st_ = SuffixTable.new(text)
    assert verify_suffix_array(st_.text_bytes(), st_.table(),
                               device=device)
    assert st_.verify(device=device)


@pytest.mark.parametrize("device", [False, True])
def test_rejects_perturbations(device):
    rng = np.random.default_rng(4)
    for trial in range(20):
        n = int(rng.integers(2, 200))
        sigma = int(rng.choice([2, 4, 26]))
        raw = bytes(rng.integers(97, 97 + sigma, size=n,
                                 dtype=np.uint8).tolist())
        sa = SuffixTable.new(raw).table().astype(np.int64)
        # swap two adjacent entries -> no longer sorted
        i = int(rng.integers(0, n - 1))
        bad = sa.copy()
        bad[i], bad[i + 1] = bad[i + 1], bad[i]
        assert not verify_suffix_array(raw, bad, device=device)
        # duplicate an entry -> not a permutation
        bad2 = sa.copy()
        bad2[i] = bad2[i + 1]
        assert not verify_suffix_array(raw, bad2, device=device)
        # out-of-range entry
        bad3 = sa.copy()
        bad3[i] = n
        assert not verify_suffix_array(raw, bad3, device=device)
    # wrong length
    assert not verify_suffix_array(b"abc", np.array([0, 1], np.uint32))


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=2, max_size=80), st.integers(0, 10**9))
def test_qc_reject_random_permutations(raw, seed):
    rng = np.random.default_rng(seed)
    sa = SuffixTable.new(raw).table().astype(np.int64)
    perm = rng.permutation(len(raw))
    expect = bool(np.array_equal(perm, sa))
    assert verify_suffix_array(raw, perm) == expect


def test_prefix_suffix_ordering_cases():
    # Prefix suffixes (the sentinel rule): "aa...a" is the adversarial
    # case — every suffix is a prefix of the previous rank's.
    for raw in (b"aaaaaaa", b"abababab", b"aabaab"):
        sa = SuffixTable.new(raw).table()
        assert verify_suffix_array(raw, sa, device=True)
        rev = sa[::-1].copy()
        assert not verify_suffix_array(raw, rev)
