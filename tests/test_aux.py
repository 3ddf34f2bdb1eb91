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


# --------------------------------------------------------------- metrics

def _near_periodic_corpus():
    import numpy as np

    block = bytes(np.random.default_rng(9).integers(97, 123, 257,
                                                    dtype=np.uint8))
    arr = np.tile(np.frombuffer(block, np.uint8), 700)[: 1 << 17].copy()
    arr[70000] ^= 1
    return arr


def test_build_stats_schema():
    import numpy as np

    from suffix_tpu.utils.metrics import (REQUIRED_KEYS, build_stats,
                                          stats_json)

    rng = np.random.default_rng(0)
    data = rng.integers(65, 91, 4096, dtype=np.uint8).tobytes()
    sa, stats = build_stats(data)
    for key in REQUIRED_KEYS:
        assert key in stats, key
    assert stats["engine_family"] in ("classic", "two_phase")
    assert stats["n_bytes"] == 4096
    assert stats["bytes_per_s"] > 0
    # rounds + trajectory come from the instrumented classic engine
    assert stats["rounds"] >= 0
    assert len(stats["tie_trajectory"]) == stats["rounds"] + 1
    # the SA itself must still be exact
    from suffix_tpu.ops.naive import naive_table

    assert np.array_equal(sa, naive_table(data))
    # JSON-stable: one line, round-trips
    import json

    assert json.loads(stats_json(stats)) == json.loads(stats_json(stats))


def test_build_stats_patched_engine():
    import numpy as np

    from suffix_tpu.utils.metrics import build_stats

    arr = _near_periodic_corpus()
    sa, stats = build_stats(arr.tobytes())
    assert stats["engine_family"] == "patched"
    assert stats["period"] == 257
    assert stats["defects"] >= 1
    assert stats["closed_form"] is True
    assert stats["engine"].startswith("patched(")
    from suffix_tpu.ops.naive import naive_table

    assert np.array_equal(sa, naive_table(arr.tobytes()))


def test_build_stats_two_phase_fields():
    import numpy as np

    from suffix_tpu.ops import prefix_doubling as pd
    from suffix_tpu.utils.metrics import build_stats

    rng = np.random.default_rng(3)
    # text-class corpus: large sigma routes through two-phase when big
    # enough; force the route at test scale.
    data = rng.integers(32, 127, 1 << 17, dtype=np.uint8).tobytes()
    old = pd.TWO_PHASE_MIN
    pd.TWO_PHASE_MIN = 1 << 16
    try:
        sa, stats = build_stats(data)
    finally:
        pd.TWO_PHASE_MIN = old
    assert stats["engine_family"] == "two_phase"
    assert "tie_mass_at_switch" in stats
    assert stats["phase2_rounds"] >= 0


def test_build_stats_native_and_sais():
    from suffix_tpu.utils.metrics import build_stats

    sa_n, st_n = build_stats(b"mississippi" * 30, engine="native")
    assert st_n["engine_family"] == "native"
    sa_s, st_s = build_stats(b"mississippi" * 30, engine="sais")
    assert st_s["engine_family"] == "sais"
    assert st_s["recursion_depth"] >= 0
    import numpy as np

    assert np.array_equal(sa_n, sa_s)


def test_collect_stats_table_and_checkpoint(tmp_path):
    import numpy as np

    from suffix_tpu import SuffixTable
    from suffix_tpu.utils.checkpoint import load_index, save_index

    st = SuffixTable.new(b"abracadabra" * 50, engine="native",
                         collect_stats=True)
    assert st.build_stats["engine"] == "native-sais"
    p = str(tmp_path / "idx.npz")
    save_index(p, st, build_stats=st.build_stats)
    st2 = load_index(p)
    assert st2.build_stats["engine"] == "native-sais"
    assert np.array_equal(st2.table(), st.table())
