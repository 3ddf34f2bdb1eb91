"""Suffix-tree invariants (reference: suffix_tree/src/lib.rs:507-567)."""

from hypothesis import given, settings, strategies as st

from suffix_tpu import SuffixTable, SuffixTree
from suffix_tpu.tree.dot import to_dot


def test_basic_builds():
    for s in ["banana", "apple", "mississippi"]:
        SuffixTree.new(s)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_qc_n_leaves(s):
    # Leaf count == byte length (suffix_tree/src/lib.rs:529-534).
    tree = SuffixTree.new(s)
    assert sum(1 for _ in tree.root().leaves()) == len(s.encode("utf-8"))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_qc_internals_have_at_least_two_children(s):
    tree = SuffixTree.new(s)
    for node in tree.root().preorder():
        if not node.has_terminals():
            assert len(node.children) >= 2


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_qc_tree_enumerates_suffixes(s):
    # Preorder suffix indices enumerate the SA in order
    # (suffix_tree/src/lib.rs:551-566).
    sa = SuffixTable.new(s)
    tree = SuffixTree.from_suffix_table(sa)
    raw = sa.text_bytes()
    for i, sufi in enumerate(tree.root().suffix_indices()):
        assert raw[sufi:] == sa.suffix_bytes(i)


def test_dot_output():
    tree = SuffixTree.new("banana")
    dot = to_dot(tree)
    assert dot.startswith("digraph tree {")
    assert 'label=<<FONT POINT-SIZE="20">banana</FONT>>;' in dot
    assert "shape=box" in dot
    assert dot.rstrip().endswith("}")


def test_label_and_ancestors():
    tree = SuffixTree.new("banana")
    for node in tree.root().preorder():
        if not node.is_root():
            assert node.path_len == node.parent.path_len + len(node)
            assert list(node.ancestors())[-1] is tree.root()


def test_tree_from_sharded_index():
    from suffix_tpu.parallel.dist_query import ShardedQueryIndex
    from suffix_tpu.parallel.mesh import make_mesh

    text = b"banana bandana"
    ref = SuffixTree.new(text)
    idx = ShardedQueryIndex(text, make_mesh(8))
    got = SuffixTree.from_sharded(idx)
    assert [n.suffixes for n in got.root().preorder()] == \
           [n.suffixes for n in ref.root().preorder()]
    assert list(got.root().suffix_indices()) == \
           list(ref.root().suffix_indices())
