"""CLI surface (reference binaries: src/main.rs, stree_cmd/src/main.rs)."""

import pathlib

import numpy as np
import pytest

from suffix_tpu.cli import main

FIXTURE = str(pathlib.Path(__file__).parent / "fixtures" / "AP009048_10000.fasta")


def test_build_prints_suffix_count(capsys):
    assert main(["build", FIXTURE]) == 0
    out = capsys.readouterr().out
    assert "Suffixes: 10001" in out


def test_build_engines_agree(tmp_path, capsys):
    for engine in ["device", "native", "naive", "sharded"]:
        assert main(["build", FIXTURE, "-e", engine]) == 0
        assert "Suffixes: 10001" in capsys.readouterr().out


def test_build_save_search_info(tmp_path, capsys):
    idx = str(tmp_path / "i.npz")
    assert main(["build", FIXTURE, "-o", idx]) == 0
    capsys.readouterr()
    assert main(["search", "--index", idx, "AGCTT", "GATTACA"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith("AGCTT\t8\t0,67,1102")
    assert out[1] == "GATTACA\t0\t"
    assert main(["info", idx]) == 0
    out = capsys.readouterr().out
    assert "text bytes:   10001" in out


def test_search_sharded_matches(capsys):
    assert main(["search", "--file", FIXTURE, "--sharded", "AGCTT"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("AGCTT\t8\t0,67,1102,3458,3772,4800,5995,8912")


def test_stree_dot(capsys):
    assert main(["stree", "banana"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("digraph tree {")
    assert "banana" in out


def test_warmup_small(capsys):
    assert main(["warmup", "--size", "500", "--batches", "8",
                 "--qlens", "8"]) == 0
    assert "warmed" in capsys.readouterr().out


def test_stree_array_engine_identical(capsys):
    from suffix_tpu.cli import main

    assert main(["--platform", "cpu", "stree", "banana"]) == 0
    dot_fold = capsys.readouterr().out
    assert main(["--platform", "cpu", "stree", "banana", "--array"]) == 0
    dot_array = capsys.readouterr().out
    assert dot_array == dot_fold
    assert dot_array.startswith("digraph tree {")
