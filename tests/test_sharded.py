"""Sharded (multi-device) construction vs the single-device engine.

Runs on the virtualized 8-device CPU mesh (conftest). The sharded result
must be bit-identical for every mesh size — the distributed analogue of
the reference's oracle-differential strategy.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax

from suffix_tpu import SuffixTable
from suffix_tpu.ops.naive import naive_table
from suffix_tpu.parallel.dist_build import suffix_array_sharded
from suffix_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module", params=[1, 2, 4, 8])
def mesh(request):
    return make_mesh(request.param)


DIRECTED = [
    b"banana",
    b"mississippi",
    b"a",
    b"aa",
    b"ab" * 37,
    b"\x00" * 19,
    bytes(range(256)),
    b"tgtgtgtgcaccg",
    "☃abc☃".encode("utf-8"),
]


@pytest.mark.parametrize("data", DIRECTED, ids=lambda d: repr(d)[:18])
def test_directed(mesh, data):
    expected = naive_table(data)
    got = suffix_array_sharded(data, mesh)
    assert np.array_equal(expected, got)


def test_random_bytes(mesh, rng):
    for size in [5, 64, 200, 1000]:
        data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        assert np.array_equal(
            SuffixTable.new(data).table(), suffix_array_sharded(data, mesh)
        )


def test_skewed_small_alphabet(mesh, rng):
    # Heavy rank ties stress the bitonic merge-split and re-ranking.
    data = rng.integers(0, 2, size=777, dtype=np.uint8).tobytes()
    assert np.array_equal(
        SuffixTable.new(data).table(), suffix_array_sharded(data, mesh)
    )


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=1, max_size=120))
def test_prop_sharded_8dev(b):
    mesh = make_mesh(8)
    assert np.array_equal(naive_table(b), suffix_array_sharded(b, mesh))


def test_dna_sharded(dna_10k):
    mesh = make_mesh(8)
    assert np.array_equal(
        SuffixTable.new(dna_10k).table(), suffix_array_sharded(dna_10k, mesh)
    )


def test_stepped_checkpoint_resume(tmp_path, rng):
    """Failure recovery: interrupt after some rounds, resume, bit-exact."""
    from suffix_tpu.parallel.dist_build import suffix_array_sharded_stepped

    mesh = make_mesh(4)
    data = rng.integers(0, 8, size=600, dtype=np.uint8).tobytes()
    expected = SuffixTable.new(data).table()

    ckpt = str(tmp_path / "build.npz")
    # Uninterrupted stepped build matches.
    got = suffix_array_sharded_stepped(data, mesh, checkpoint_path=ckpt)
    assert np.array_equal(expected, got)

    # Simulate a crash: rewind the checkpoint to an early round by
    # rebuilding it partially (run with a tampered loop via resume of the
    # saved state at round 1), then resume to completion.
    import numpy as _np
    from suffix_tpu.parallel import dist_build as db
    import jax as _jax
    import jax.numpy as _jnp

    n_dev = 4
    n = len(data)
    n_local = max(8, -(-n // n_dev))
    n_total = n_local * n_dev
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard = NamedSharding(mesh, P(db.AXIS))
    padded = _np.full((n_total,), -1, _np.int32)
    padded[:n] = _np.frombuffer(data, _np.uint8)
    rank = _jax.device_put(padded + 1, shard)
    # run exactly 2 rounds, save, then resume from the file
    k = 0
    for _ in range(2):
        rank, sa, next_k, done = db._dist_step_jit(rank, _jnp.int32(k),
                                                   n_local, n_dev, mesh)
        k = int(next_k)
    _np.savez(ckpt, rank=_np.asarray(rank), sa=_np.asarray(sa),
              k=_np.int64(k), done=_np.bool_(False),
              n_total=_np.int64(n_total))
    resumed = suffix_array_sharded_stepped(data, mesh, checkpoint_path=ckpt,
                                           resume=True)
    assert np.array_equal(expected, resumed)


def test_collective_bins(rng):
    """psum bucket histogram == single-process Bins values."""
    import jax.numpy as jnp
    from suffix_tpu.ops.sais import bucket_layout
    from suffix_tpu.parallel.collective_bins import global_bucket_layout

    mesh = make_mesh(8)
    data = rng.integers(0, 256, size=1024, dtype=np.uint8)
    text = data.astype(np.int32)
    c, h, t = global_bucket_layout(text, mesh)
    c1, h1, t1 = bucket_layout(jnp.asarray(text))
    assert np.array_equal(c, np.asarray(c1))
    assert np.array_equal(h, np.asarray(h1))
    assert np.array_equal(t, np.asarray(t1))


def test_non_pow2_mesh_rejected():
    import pytest

    mesh = make_mesh(6)
    with pytest.raises(ValueError, match="power-of-two"):
        suffix_array_sharded(b"banana", mesh)


def test_shape_bucketing_reuses_executable(rng):
    """Different corpus sizes in the same power-of-two bucket must reuse
    one compiled executable (VERDICT r2 #4: per-size compiles cost
    minutes each through the TPU tunnel)."""
    from suffix_tpu.parallel import dist_build as db

    mesh = make_mesh(8)
    sizes_same_bucket = (700, 799, 901)  # ceil(n/8) in (88, 113] -> 128
    before = db._dist_build_jit._cache_size()
    for n in sizes_same_bucket:
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        sa = suffix_array_sharded(data, mesh)
        assert np.array_equal(sa, naive_table(data))
    after = db._dist_build_jit._cache_size()
    assert after - before <= 1, (
        f"{after - before} fresh compiles for one shape bucket")
    # A size in a different bucket is allowed (and expected) to compile.
    assert db._local_bucket(700, 8) == db._local_bucket(901, 8) == 128
    assert db._local_bucket(5000, 8) == 1024


def test_sharded_adaptive_coded_first_round(monkeypatch, rng):
    """Dense-coded sharded first round: bit-parity with the oracle and
    with the byte path, on meshes of several sizes (the sharded
    analogue of ops/prefix_doubling's adaptive engine)."""
    from suffix_tpu.ops import prefix_doubling as pd
    from suffix_tpu.parallel import dist_build as db

    monkeypatch.setattr(pd, "ADAPTIVE_PACK_MIN", 16)
    for n_dev in (2, 8):
        mesh = make_mesh(n_dev)
        for n in (700, 4096):
            arr = (rng.integers(0, 4, n, dtype=np.uint8) + 97)
            assert db._sharded_adaptive_plan(
                arr, db._local_bucket(n, n_dev) * n_dev,
                db._local_bucket(n, n_dev)) is not None
            got = suffix_array_sharded(arr, mesh)
            assert np.array_equal(got, naive_table(arr.tobytes()))


def test_sharded_adaptive_stepped_resume(monkeypatch, tmp_path, rng):
    """The coded first round checkpoints as step 0 (k = covered chars)
    and the stepped build resumes through normal quadrupling rounds."""
    from suffix_tpu.ops import prefix_doubling as pd
    from suffix_tpu.parallel.dist_build import suffix_array_sharded_stepped

    monkeypatch.setattr(pd, "ADAPTIVE_PACK_MIN", 16)
    mesh = make_mesh(4)
    # Period-9 text: ties survive the first round, forcing resumable
    # quadrupling rounds after the coded step 0.
    arr = np.tile(np.frombuffer(b"abcabzbb!", np.uint8), 600)
    ks = []
    ckpt = str(tmp_path / "adaptive.ckpt")
    sa = suffix_array_sharded_stepped(
        arr, mesh, checkpoint_path=ckpt,
        round_hook=lambda k, done: ks.append(int(k)))
    assert np.array_equal(sa, naive_table(arr.tobytes()))
    assert ks[0] > 3 and len(ks) >= 2  # coded step 0 + >=1 round
    # Resume from the step-0 checkpoint must give the identical array.
    import os

    os.replace(ckpt + ".prev", ckpt) if os.path.exists(ckpt + ".prev") else None
    sa2 = suffix_array_sharded_stepped(arr, mesh, checkpoint_path=ckpt,
                                       resume=True)
    assert np.array_equal(sa2, sa)
