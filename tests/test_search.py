"""Query-engine conformance: the reference's directed battery + properties.

Directed cases are the reference's exact tests (tests/tests.rs:100-213);
property tests mirror prop_contains / prop_positions (tests/tests.rs:223-243).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from suffix_tpu import SuffixTable


def sais(text):
    return SuffixTable.new(text)


def test_empty_find_empty():
    sa = sais("")
    assert sa.positions("").tolist() == []
    assert not sa.contains("")


def test_empty_find_one():
    sa = sais("")
    assert sa.positions("a").tolist() == []
    assert not sa.contains("a")


def test_empty_find_two():
    sa = sais("")
    assert sa.positions("ab").tolist() == []
    assert not sa.contains("ab")


def test_one_find_empty():
    sa = sais("a")
    assert sa.positions("").tolist() == []
    assert not sa.contains("")


def test_one_find_one_notexists():
    sa = sais("a")
    assert sa.positions("b").tolist() == []
    assert not sa.contains("b")


def test_one_find_one_exists():
    sa = sais("a")
    assert sa.positions("a").tolist() == [0]
    assert sa.contains("a")


def test_two_find_one_exists():
    sa = sais("ab")
    assert sa.positions("b").tolist() == [1]
    assert sa.contains("b")


def test_two_find_two_exists():
    sa = sais("aa")
    # Unordered SA-slice semantics: [1, 0] exactly (tests/tests.rs:149-154).
    assert sa.positions("a").tolist() == [1, 0]
    assert sa.contains("a")


def test_many_exists():
    sa = sais("zzzzzaazzzzz")
    assert sa.positions("a").tolist() == [5, 6]
    assert sa.contains("a")


def test_many_exists_long():
    sa = sais("zzzzabczzzzzabczzzzzz")
    assert sa.positions("abc").tolist() == [4, 12]
    assert sa.contains("abc")


def test_query_longer():
    sa = sais("az")
    assert sa.positions("mnomnomnomnomnomnomno").tolist() == []
    assert not sa.contains("mnomnomnomnomnomnomno")


def test_query_longer_less():
    sa = sais("zz")
    assert sa.positions("mnomnomnomnomnomnomno").tolist() == []
    assert not sa.contains("mnomnomnomnomnomnomno")


def test_query_longer_greater():
    sa = sais("aa")
    assert sa.positions("mnomnomnomnomnomnomno").tolist() == []
    assert not sa.contains("mnomnomnomnomnomnomno")


def test_query_spaces():
    sa = sais("The quick brown fox was very quick.")
    assert sa.positions("quick").tolist() == [4, 29]


def test_unicode_snowman():
    # Byte-offset Unicode contract (tests/tests.rs:209-213).
    sa = sais("☃abc☃")
    assert sa.contains("☃")
    assert sa.positions("☃").tolist() == [6, 0]


def test_readme_example():
    # examples/basic.rs + lib.rs doc example.
    st_ = sais("the quick brown fox was quick.")
    assert st_.positions("quick").tolist() == [4, 24]
    assert st_.contains("quick")
    assert not st_.contains("faux")


def test_any_position():
    st_ = sais("The quick brown fox was very quick.")
    assert st_.any_position("quick") in (4, 29)
    assert st_.any_position("zebra") is None
    assert st_.any_position("") is None


def test_count():
    st_ = sais("banana")
    assert st_.count("an") == 2
    assert st_.count("a") == 3
    assert st_.count("x") == 0


def test_batched_queries():
    st_ = sais("the quick brown fox was quick.")
    queries = ["quick", "fox", "zebra", "", "the", "."]
    res = st_.positions_batch(queries)
    for q, got in zip(queries, res):
        assert sorted(got.tolist()) == sorted(st_.positions(q).tolist())
    mask = st_.contains_batch(queries)
    assert mask.tolist() == [True, True, False, False, True, True]
    counts = st_.count_batch(queries)
    assert counts.tolist() == [2, 1, 0, 0, 1, 1]


def _py_match_indices(hay: bytes, needle: bytes) -> list[int]:
    # Overlapping occurrences, like str::match_indices semantics for
    # 1-char needles; general overlapping find for our tests.
    out, i = [], hay.find(needle)
    while i != -1:
        out.append(i)
        i = hay.find(needle, i + 1)
    return out


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=48), st.integers(0, 255))
def test_prop_contains_positions(s, c):
    # prop_contains / prop_positions (tests/tests.rs:223-243).
    needle = chr(c)
    sa = sais(s)
    hay, nb = s.encode("utf-8"), needle.encode("utf-8")
    expected = _py_match_indices(hay, nb)
    got = sorted(sa.positions(needle).tolist())
    assert got == expected
    assert sa.contains(needle) == (nb in hay)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=64), st.binary(min_size=1, max_size=6))
def test_prop_binary_queries(hay, needle):
    sa = sais(hay)
    got = sorted(sa.positions(needle).tolist())
    assert got == _py_match_indices(hay, needle)
    assert sa.contains(needle) == (needle in hay)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="ab", max_size=32), st.text(alphabet="ab", min_size=1, max_size=5))
def test_prop_dense_overlaps(hay, needle):
    sa = sais(hay)
    got = sorted(sa.positions(needle).tolist())
    assert got == _py_match_indices(hay.encode(), needle.encode())


def test_dna_queries(dna_10k):
    sa = SuffixTable.new(dna_10k)
    probes = [dna_10k[i : i + 14] for i in range(0, 2000, 97)] + [b"NOPE!"]
    res = sa.positions_batch(probes)
    for q, got in zip(probes, res):
        assert sorted(got.tolist()) == _py_match_indices(dna_10k, q)


def test_giant_batch_chunks(monkeypatch):
    st_ = sais("the quick brown fox was quick.")
    monkeypatch.setattr(type(st_), "MAX_QUERY_BATCH", 8)
    queries = (["quick", "fox", "zzz", ""] * 7)[:25]  # 25 > 3 chunks of 8
    res = st_.positions_batch(queries)
    assert len(res) == 25
    for q, got in zip(queries, res):
        assert sorted(got.tolist()) == sorted(st_.positions(q).tolist())
