"""Construction conformance: device engine vs the naive oracle.

Mirrors the reference's oracle-differential test architecture
(tests/tests.rs:18-96): the naive construction is ground truth, the fast
engine must match it exactly, on the directed corpus plus randomized
property tests.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from suffix_tpu import SuffixTable
from suffix_tpu.ops.naive import naive_table, naive_table_np

# The reference's directed corpus (tests/tests.rs:22-70).
DIRECTED = [
    "apple",
    "banana",
    "mississippi",
    "tgtgtgtgcaccg",
    "",
    "a",
    "ab",
    "aa",
    "\x00",
    "☃abc☃",
]


@pytest.mark.parametrize("text", DIRECTED, ids=lambda t: repr(t)[:20])
def test_directed_matches_naive(text):
    expected = SuffixTable.new_naive(text)
    got = SuffixTable.new(text)
    assert np.array_equal(expected.table(), got.table())
    assert expected == got


def test_naive_oracles_agree():
    for text in [b"banana", b"mississippi", b"", b"\x00\x00a", b"zzzaz"]:
        assert np.array_equal(naive_table(text), naive_table_np(text))


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=64))
def test_prop_unicode_matches_naive(s):
    # prop_naive_equals_sais / prop_matches_naive (tests/tests.rs:73-96)
    expected = SuffixTable.new_naive(s)
    got = SuffixTable.new(s)
    assert np.array_equal(expected.table(), got.table())


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=96))
def test_prop_bytes_match_naive(b):
    expected = naive_table(b)
    got = SuffixTable.new(b).table()
    assert np.array_equal(expected, got)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab\x00", max_size=48))
def test_prop_small_alphabet(s):
    # Small alphabets maximize rank ties and doubling rounds.
    assert np.array_equal(
        SuffixTable.new_naive(s).table(), SuffixTable.new(s).table()
    )


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 300))
def test_prop_runs(n):
    # Degenerate single-char runs: worst case for prefix doubling ties.
    s = "a" * n
    expected = np.arange(n - 1, -1, -1, dtype=np.uint32)
    assert np.array_equal(SuffixTable.new(s).table(), expected)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=64))
def test_prop_length(s):
    # prop_length (tests/tests.rs:216-221): len == byte count.
    assert SuffixTable.new(s).len() == len(s.encode("utf-8"))


def test_is_permutation(rng):
    data = rng.integers(0, 4, size=5000, dtype=np.uint8).tobytes()
    table = SuffixTable.new(data).table()
    assert sorted(table.tolist()) == list(range(5000))


def test_dna_fixture_small(dna_10k):
    got = SuffixTable.new(dna_10k).table()
    expected = naive_table_np(dna_10k)
    assert np.array_equal(got, expected)


def test_text_len_cap_enforced():
    # The u32 cap itself (src/table.rs:69-77) can't be allocated in a test;
    # check the guard exists via the internal path.
    from suffix_tpu import table as table_mod

    assert table_mod.MAX_TEXT_LEN == 2**32 - 1


def test_parts_roundtrip():
    # parts test (tests/tests.rs:170-179) on "poëzie".
    sa = SuffixTable.new("poëzie")
    text, table = sa.into_parts()
    sa3 = SuffixTable.from_parts(text, table)
    assert sa == sa3


def test_from_parts_length_mismatch():
    with pytest.raises(ValueError):
        SuffixTable.from_parts("abc", np.array([0, 1], dtype=np.uint32))


def test_anatomy_debug_dump():
    # Debug impl parity (src/table.rs:296-312, examples/anatomy.rs).
    st_ = SuffixTable.new("the quick brown fox was quick.")
    r = repr(st_)
    assert "SUFFIX TABLE" in r
    assert "text: the quick brown fox was quick." in r
    assert f"suffix[0] {int(st_.table()[0])}," in r


def test_unicode_mixed_script_corpus(rng):
    """BASELINE config: mixed-script UTF-8 corpus, byte-index semantics.

    Codepoint-aware indexing == byte indexing over UTF-8 (self-
    synchronizing; reference contract src/table.rs:66 + unicode_snowman).
    """
    pools = [
        "the quick brown fox ",
        "αβγδεζηθικλμνξο ",
        "суффиксный массив ",
        "接尾辞配列 ",
        "🌲🌳🌴",
        "ação café naïve ",
    ]
    parts = [pools[i] for i in rng.integers(0, len(pools), size=4000)]
    corpus = "".join(parts)  # ~100-300 KB of mixed-width UTF-8
    st = SuffixTable.new(corpus)
    raw = corpus.encode("utf-8")
    assert st.len() == len(raw)

    queries = ["fox", "αβγ", "суффикс", "接尾辞", "🌳", "café", "zzzz", "ξο α"]
    for q, hits in zip(queries, st.positions_batch(queries)):
        qb = q.encode("utf-8")
        expected, i = [], raw.find(qb)
        while i != -1:
            expected.append(i)
            i = raw.find(qb, i + 1)
        assert sorted(hits.tolist()) == expected, q
        # every hit is a codepoint boundary (UTF-8 self-synchronization)
        for h in hits.tolist():
            assert (raw[h] & 0xC0) != 0x80


def test_fine_padding_bit_exact(rng):
    # "fine" padding (<=12.5% overhead) must not change the output.
    for size in [17, 1000, 5000, 9001]:
        data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        a = SuffixTable.new(data).table()
        b = SuffixTable.new(data, padding="fine").table()
        assert np.array_equal(a, b)
