"""Auxiliary subsystems: config, checkpointing, profiling, CLI dot parity."""

import numpy as np

from suffix_tpu import SuffixTable
from suffix_tpu.utils.config import BuildConfig, build_index
from suffix_tpu.utils.checkpoint import save_index, load_index
from suffix_tpu.utils.profiling import Profile, timed_build


def test_config_build_engines():
    for engine in ["device", "sais", "native"]:
        st = build_index("banana", BuildConfig(engine=engine))
        assert st.table().tolist() == [5, 3, 1, 0, 4, 2]


def test_config_sharded(tmp_path):
    cfg = BuildConfig(sharded=True, n_devices=4,
                      checkpoint_path=str(tmp_path / "ck.npz"))
    st = build_index("mississippi", cfg)
    assert st.table().tolist() == [10, 7, 4, 1, 0, 9, 8, 6, 3, 5, 2]


def test_checkpoint_roundtrip(tmp_path):
    st = SuffixTable.new("poëzie")
    p = str(tmp_path / "idx.npz")
    save_index(p, st, lcp=st.lcp_lens())
    st2 = load_index(p)
    assert st == st2
    assert st2.text() == "poëzie"
    # Queries work after resume without rebuild.
    assert st2.positions("zie").tolist() == st.positions("zie").tolist()


def test_checkpoint_bytes(tmp_path):
    st = SuffixTable.new(b"\xff\x00binary")
    p = str(tmp_path / "idx.npz")
    save_index(p, st)
    st2 = load_index(p)
    assert st2.text() == b"\xff\x00binary"
    assert np.array_equal(st.table(), st2.table())


def test_profile_report():
    st, prof = timed_build(b"the quick brown fox was quick.")
    assert st.contains("quick")
    rep = prof.report()
    assert "suffix_array.build" in rep
    assert prof.total_seconds() > 0
    assert "bytes" in prof.to_json()


def test_profile_span_sync():
    import jax.numpy as jnp

    prof = Profile()
    x = jnp.arange(100)
    with prof.span("op", bytes_processed=400, sync=x):
        y = x * 2
    assert prof.passes[0].mb_per_s >= 0
