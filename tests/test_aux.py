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


def test_build_programs_carry_named_scopes():
    """Device traces must attribute time to per-pass scopes (SURVEY §5):
    the jitted build programs carry jax.named_scope annotations that
    surface in the lowered module's debug info (and hence in xprof)."""
    import jax.numpy as jnp

    from suffix_tpu.ops import prefix_doubling as pd
    from suffix_tpu.ops import sais

    t = jnp.zeros((256,), jnp.int32)
    txt = pd._suffix_array_padded.lower(t, init_words=4).as_text(
        debug_info=True)
    for name in ["P1_initial_sort", "P2_initial_rank", "P3_shift_ranks",
                 "P4_round_sort", "P5_dense_rerank", "P6_route_home"]:
        assert name in txt, name

    txt2 = pd._suffix_array_packed.lower(
        jnp.zeros((512,), jnp.int32), 2, 3, 10).as_text(debug_info=True)
    assert "P0_dense_pack" in txt2 and "P4_round_sort" in txt2

    ranks = jnp.zeros((256,), jnp.int32)
    txt3 = sais._derive_sa.lower(t, ranks).as_text(debug_info=True)
    for name in ["S1_classify_buckets", "S2_L_phase_round",
                 "S3_S_phase_round"]:
        assert name in txt3, name
