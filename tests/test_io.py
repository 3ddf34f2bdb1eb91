"""Streamed corpus ingestion (utils/io.py)."""

import numpy as np

from suffix_tpu import SuffixTable
from suffix_tpu.ops.padding import PAD
from suffix_tpu.parallel.dist_build import suffix_array_sharded
from suffix_tpu.parallel.mesh import make_mesh
from suffix_tpu.utils.io import device_corpus, open_corpus


def test_open_corpus_memmap(tmp_path):
    p = tmp_path / "c.bin"
    p.write_bytes(b"mississippi")
    v = open_corpus(str(p))
    assert bytes(v) == b"mississippi"
    assert not v.flags.writeable


def test_device_corpus_single(tmp_path):
    p = tmp_path / "c.bin"
    p.write_bytes(b"banana")
    arr, n = device_corpus(str(p))
    assert n == 6
    host = np.asarray(arr)
    assert host[:6].tolist() == list(b"banana")
    assert (host[6:] == PAD).all()


def test_device_corpus_sharded_blocks(tmp_path, rng):
    data = rng.integers(0, 256, size=777, dtype=np.uint8)
    p = tmp_path / "c.bin"
    p.write_bytes(data.tobytes())
    mesh = make_mesh(8)
    arr, n = device_corpus(str(p), mesh)
    assert n == 777
    host = np.asarray(arr)
    assert host.shape[0] % 8 == 0
    assert np.array_equal(host[:777], data.astype(np.int32))
    assert (host[777:] == PAD).all()


def test_sharded_build_from_path(tmp_path, dna_10k):
    p = tmp_path / "dna.fasta"
    p.write_bytes(dna_10k)
    mesh = make_mesh(8)
    got = suffix_array_sharded(str(p), mesh)
    assert np.array_equal(SuffixTable.new(dna_10k).table(), got)
