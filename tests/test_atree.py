"""Array-native suffix tree (tree/atree.py) vs the host fold.

The fold (tree/stree.py) mirrors the reference crate's builder
(suffix_tree/src/lib.rs:392-505) and is itself pinned by
tests/test_tree.py; here the device-array derivation is held to FULL
structural equality with it — node-by-node children keys, label bytes,
exact label offsets, terminal lists, path lengths — plus byte-identical
GraphViz output, and the reference's three invariants at the 100 KB
fixture scale (suffix_tree/src/lib.rs:507-567) checked directly on the
arrays.
"""

import pathlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from suffix_tpu import SuffixTable
from suffix_tpu.tree.atree import ArraySuffixTree
from suffix_tpu.tree.dot import to_dot
from suffix_tpu.tree.stree import SuffixTree

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

DIRECTED = [
    "banana", "apple", "mississippi", "tgtgtgtgcaccg",
    "", "a", "ab", "ba", "aa", "aaaa", "aaaab", "abab", "ababab",
    "\x00", "☃abc☃", "the quick brown fox was quick.",
]


def assert_tree_equal(a_st: ArraySuffixTree, f_st: SuffixTree):
    stack = [(a_st.root(), f_st.root())]
    while stack:
        a, f = stack.pop()
        assert sorted(a.suffixes) == sorted(f.suffixes)
        assert a_st.label(a) == f_st.label(f)
        assert (a.start, a.end) == (f.start, f.end)
        assert a.path_len == f.path_len
        ak, fk = sorted(a.children), sorted(f.children)
        assert ak == fk
        for k in ak:
            stack.append((a.children[k], f.children[k]))


@pytest.mark.parametrize("text", DIRECTED)
def test_directed_equal(text):
    tab = SuffixTable.new(text)
    assert_tree_equal(ArraySuffixTree.from_suffix_table(tab),
                      SuffixTree.from_suffix_table(tab))


@pytest.mark.parametrize("text", ["banana", "mississippi", "aaaa",
                                  "☃abc☃"])
def test_dot_identical(text):
    tab = SuffixTable.new(text)
    assert to_dot(ArraySuffixTree.from_suffix_table(tab)) == \
        to_dot(SuffixTree.from_suffix_table(tab))


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=48))
def test_qc_equal_unicode(s):
    tab = SuffixTable.new(s)
    assert_tree_equal(ArraySuffixTree.from_suffix_table(tab),
                      SuffixTree.from_suffix_table(tab))


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=64))
def test_qc_equal_bytes(s):
    tab = SuffixTable.new(s)
    assert_tree_equal(ArraySuffixTree.from_suffix_table(tab),
                      SuffixTree.from_suffix_table(tab))


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 200), st.integers(2, 3), st.integers(0, 999))
def test_qc_small_sigma(n, sigma, seed):
    # Small alphabets maximize deep/nested lcp intervals.
    rng = np.random.default_rng(seed)
    raw = bytes(rng.integers(97, 97 + sigma, size=n,
                             dtype=np.uint8).tolist())
    tab = SuffixTable.new(raw)
    assert_tree_equal(ArraySuffixTree.from_suffix_table(tab),
                      SuffixTree.from_suffix_table(tab))


def test_fixture_100kb_invariants():
    """The reference's three tree invariants, checked directly on the
    device-built arrays at the 100 KB fixture scale (a size the
    pointer fold cannot reach in reasonable time)."""
    raw = (FIXTURES / "AP009048_100000.fasta").read_bytes()
    tab = SuffixTable.new(raw, engine="auto")
    tree = ArraySuffixTree.from_suffix_table(tab)
    n = len(raw)
    # (1) every rank is exactly one of: leaf child, node terminal.
    n_term = int(tree.is_term.sum())
    assert n_term == int((tree.node_term >= 0).sum())
    assert (n - n_term) + n_term == n
    # leaves() = nodes with terminals and non-empty label: every true
    # leaf (non-empty by construction) + terminal-carrying internals.
    leaf_like = (n - n_term) + int(
        ((tree.node_term >= 0) & (tree.node_end > tree.node_start)).sum())
    assert leaf_like == n  # == byte length (lib.rs:529-534)
    # (2) internal nodes: >= 2 children, or >= 1 child + a terminal.
    e_parent = tree._ensure_edges()[0]
    counts = np.bincount(e_parent[e_parent >= 0].astype(np.int64),
                         minlength=tree.m)
    has_term = tree.node_term >= 0
    assert np.all((counts >= 2) | (has_term & (counts >= 1)))
    # (3) preorder suffix indices enumerate the SA in order
    # (lib.rs:551-566) — spot-check the first 2000 via the lazy view.
    sa = tab.table()
    for i, sufi in enumerate(tree.root().suffix_indices()):
        assert sufi == int(sa[i])
        if i >= 2000:
            break
    # parent depths strictly increase down every edge.
    pd = np.where(tree.node_parent >= 0,
                  tree.node_d[np.maximum(tree.node_parent, 0)], 0)
    assert np.all(tree.node_d > pd)


def test_empty_and_single():
    for text in ("", "x"):
        tab = SuffixTable.new(text)
        tree = ArraySuffixTree.from_suffix_table(tab)
        assert tree.root().suffixes == [len(text.encode())]
        assert_tree_equal(tree, SuffixTree.from_suffix_table(tab))


def test_new_entrypoint():
    tree = ArraySuffixTree.new("banana")
    ref = SuffixTree.new("banana")
    assert to_dot(tree) == to_dot(ref)
