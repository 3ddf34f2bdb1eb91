"""Generalized (multi-doc) suffix index tests (reference: README.md:60-74)."""

import pytest

from suffix_tpu import MultiDocIndex


def test_basic():
    idx = MultiDocIndex(["the quick fox", "a lazy dog", "quick quick"])
    assert idx.num_docs == 3
    hits = idx.positions("quick")
    assert sorted(hits) == [(0, 4), (2, 0), (2, 6)]
    assert idx.docs_containing("quick") == [0, 2]
    assert idx.contains("lazy")
    assert not idx.contains("zebra")


def test_no_cross_document_matches():
    # "ab" at the end of doc0 + "cd" at the start of doc1 must not match
    # a query "abcd" spanning the separator.
    idx = MultiDocIndex(["xxab", "cdyy"])
    assert idx.positions("abcd") == []
    assert idx.positions("ab") == [(0, 2)]
    assert idx.positions("cd") == [(1, 0)]


def test_rejects_nul():
    with pytest.raises(ValueError):
        MultiDocIndex(["a\x00b"])
    idx = MultiDocIndex(["ab"])
    with pytest.raises(ValueError):
        idx.positions("a\x00")


def test_locate():
    idx = MultiDocIndex(["abc", "de", "f"])
    # joined: abc\0de\0f -> starts [0, 4, 7]
    assert idx.locate(0) == (0, 0)
    assert idx.locate(2) == (0, 2)
    assert idx.locate(4) == (1, 0)
    assert idx.locate(7) == (2, 0)


def test_bytes_docs():
    idx = MultiDocIndex([b"\xff\xfe", b"\xfe\xff"])
    assert sorted(idx.positions(b"\xfe")) == [(0, 1), (1, 0)]


def test_empty_docs():
    idx = MultiDocIndex(["", "a", ""])
    assert idx.positions("a") == [(1, 0)]


def test_multidoc_sharded_mesh():
    from suffix_tpu.parallel.mesh import make_mesh

    docs = ["the quick fox", "a lazy dog", "quick quick"]
    ref = MultiDocIndex(docs)
    got = MultiDocIndex(docs, mesh=make_mesh(8))
    for q in ["quick", "dog", "zebra", "q"]:
        assert got.positions(q) == ref.positions(q)
