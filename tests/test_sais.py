"""SA-IS-structured engine: components + full derivation vs the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest
from hypothesis import given, settings, strategies as st

from suffix_tpu import SuffixTable
from suffix_tpu.ops import sais
from suffix_tpu.ops.naive import naive_table
from suffix_tpu.ops.padding import PAD


def pad_text(b: bytes, extra: int = 0):
    arr = np.frombuffer(b, dtype=np.uint8)
    out = np.full(len(b) + extra, PAD, np.int32)
    out[: len(b)] = arr
    return jnp.asarray(out)


def ref_types(b: bytes):
    """Reference semantics (src/table.rs:592-615), host re-derivation."""
    n = len(b)
    is_s = [False] * n
    if n == 0:
        return is_s, [False] * n
    # last char is L (Descending)
    for i in range(n - 2, -1, -1):
        if b[i] < b[i + 1]:
            is_s[i] = True
        elif b[i] == b[i + 1]:
            is_s[i] = is_s[i + 1]
    is_lms = [bool(i > 0 and is_s[i] and not is_s[i - 1]) for i in range(n)]
    return is_s, is_lms


@pytest.mark.parametrize("text", [b"banana", b"mississippi", b"aab",
                                  b"tgtgtgtgcaccg", b"\x00\xff\x00",
                                  b"cabbage", b"zyxwv"])
def test_classify_types(text):
    exp_s, exp_lms = ref_types(text)
    is_s, is_lms = sais.classify_types(pad_text(text))
    got_s = np.asarray(is_s)[: len(text)].tolist()
    got_lms = np.asarray(is_lms)[: len(text)].tolist()
    assert got_s == exp_s, text
    assert got_lms == exp_lms, text


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=1, max_size=64))
def test_prop_classify(b):
    exp_s, exp_lms = ref_types(b)
    is_s, is_lms = sais.classify_types(pad_text(b, extra=5))
    assert np.asarray(is_s)[: len(b)].tolist() == exp_s
    assert np.asarray(is_lms)[: len(b)].tolist() == exp_lms


def test_run_decompose():
    t = pad_text(b"aaabbc")
    m, gamma = sais.run_decompose(t)
    assert np.asarray(m).tolist() == [3, 2, 1, 2, 1, 1]
    assert np.asarray(gamma).tolist() == [3, 3, 3, 5, 5, 6]


def test_bucket_layout():
    t = pad_text(b"banana", extra=2)
    counts, heads, tails = sais.bucket_layout(t)
    c = np.asarray(counts)
    assert c[0] == 2  # PAD padding
    assert c[ord("a") + 1] == 3
    assert c[ord("b") + 1] == 1
    assert c[ord("n") + 1] == 2
    h = np.asarray(heads)
    assert h[ord("a") + 1] == 2  # after the two PAD slots


DIRECTED = [b"banana", b"mississippi", b"apple", b"tgtgtgtgcaccg", b"a",
            b"aa", b"ab", b"ba", b"\x00", b"abcabcabc", b"zzzzza",
            b"azzzzz", b"aaaaabaaaaab", bytes(range(256)),
            bytes(reversed(range(256))), "☃abc☃".encode()]


@pytest.mark.parametrize("text", DIRECTED, ids=lambda b: repr(b)[:16])
def test_sais_directed(text):
    assert np.array_equal(sais.suffix_array_sais(text), naive_table(text))


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=1, max_size=96))
def test_prop_sais(b):
    assert np.array_equal(sais.suffix_array_sais(b), naive_table(b))


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="ab\x00", min_size=1, max_size=64))
def test_prop_sais_small_alphabet(s):
    b = s.encode()
    assert np.array_equal(sais.suffix_array_sais(b), naive_table(b))


def test_sais_dna(dna_10k):
    assert np.array_equal(
        sais.suffix_array_sais(dna_10k), SuffixTable.new(dna_10k).table()
    )


def test_descending_chain():
    # Maximal strictly-descending chains stress the round bound.
    b = bytes(range(255, -1, -1)) * 2
    assert np.array_equal(sais.suffix_array_sais(b), naive_table(b))


# ---- genuine recursion path ----

from suffix_tpu.ops.sais import suffix_array_sais_recursive

TRICKY = [
    b"mmiissiissiippii",   # classic SA-IS exercise string
    b"baabaabac",
    b"abaabababbabbb",
    b"cabbage",
    b"aacaacaab",
    b"abab",
    b"abaaba",              # LMS-substring prefix cases
    b"yabbadabbado",
    b"aaabbbcccdddaaa",
    b"zzyzxzyzyx",
]


@pytest.mark.parametrize("text", TRICKY, ids=lambda b: repr(b)[:16])
def test_sais_recursive_tricky(text):
    assert np.array_equal(suffix_array_sais_recursive(text),
                          naive_table(text)), text


@pytest.mark.parametrize("text", DIRECTED, ids=lambda b: repr(b)[:16])
def test_sais_recursive_directed(text):
    assert np.array_equal(suffix_array_sais_recursive(text),
                          naive_table(text))


@settings(max_examples=250, deadline=None)
@given(st.binary(min_size=1, max_size=96))
def test_prop_sais_recursive(b):
    assert np.array_equal(suffix_array_sais_recursive(b), naive_table(b))


@settings(max_examples=120, deadline=None)
@given(st.text(alphabet="ab", min_size=1, max_size=72))
def test_prop_sais_recursive_binary_alpha(s):
    # Binary alphabets maximize LMS-substring prefix/tie cases.
    b = s.encode()
    assert np.array_equal(suffix_array_sais_recursive(b), naive_table(b))


def test_sais_recursive_dna(dna_10k):
    assert np.array_equal(
        suffix_array_sais_recursive(dna_10k),
        SuffixTable.new(dna_10k).table(),
    )


# ---- multi-level recursion (reference src/table.rs:496-506 semantics) ----


def _fib_word(k: int) -> bytes:
    a, b = "a", "ab"
    for _ in range(k):
        a, b = b, b + a
    return b.encode()


def _thue_morse(k: int) -> bytes:
    s = "0"
    for _ in range(k):
        s = s + "".join("1" if c == "0" else "0" for c in s)
    return s.encode()


@pytest.mark.parametrize(
    "name,text,min_depth",
    [
        ("fibonacci", _fib_word(10), 2),
        ("thue_morse", _thue_morse(8), 2),
        ("fibonacci_big", _fib_word(14), 3),
        ("period3", b"abcabcabcabcabcabcabcabcabcabd" * 4, 1),
    ],
)
def test_sais_recursion_depth(name, text, min_depth):
    # Words whose level-1 reduced name strings still carry duplicate
    # names force the recursion past the first reduction — depth must be
    # taken genuinely (>1 for Fibonacci/Thue-Morse), and the result must
    # stay oracle-exact at every depth.
    stats = {}
    sa = suffix_array_sais_recursive(text, stats=stats)
    assert stats["depth"] >= min_depth, (name, stats)
    assert np.array_equal(sa, naive_table(text)), name


def test_sais_inner_level_matches_int_oracle():
    # The recursion's inner level (_sa_padded_sais_ints) against the
    # standalone integer-alphabet doubling builder on random name-like
    # strings: same padded-SA contract, independent algorithms.
    from suffix_tpu.ops.padding import bucket_size
    from suffix_tpu.ops.sais import _sa_padded_sais_ints, _suffix_array_ints

    rng = np.random.default_rng(7)
    for n, hi in [(5, 2), (13, 3), (29, 5), (64, 9), (200, 4)]:
        vals = rng.integers(0, hi, size=n).astype(np.int32)
        n_pad = bucket_size(n)
        padded = np.full((n_pad,), -1, np.int32)
        padded[:n] = vals
        dev = jnp.asarray(padded)
        got = np.asarray(_sa_padded_sais_ints(dev, depth=1))
        want = np.asarray(_suffix_array_ints(dev))
        assert np.array_equal(got, want), (n, hi)
