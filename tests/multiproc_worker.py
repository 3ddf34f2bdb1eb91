"""Worker for the multi-process collective test (test_multiprocess.py).

Runs the sharded SPMD build end-to-end under ``jax.distributed`` with
N real OS processes — the seam between the single-process virtual mesh
the rest of the suite uses and a genuine multi-host deployment: the
bitonic merge-split ppermutes, boundary exchanges, and all_gathers here
cross the JAX coordination service between processes instead of staying
in one runtime.

Usage: multiproc_worker.py <process_id> <num_processes> <port> <local_devices>
           [build|stepped] [checkpoint_path] [die_after_round]

Each process forces the CPU platform (the axon TPU plugin ignores
JAX_PLATFORMS=cpu env — see CLAUDE.md), exposes <local_devices> virtual
CPU devices, joins the coordinator, builds the same deterministic corpus,
runs the sharded build over the global mesh, and asserts that every
shard it can address is bit-identical to the single-device engine's
output. Prints MULTIPROC_OK on success.

Mode "stepped" runs the host-stepped checkpointing build
(suffix_array_sharded_stepped) with per-process checkpoints and
resume=True; if ``die_after_round`` >= 0, process 1 SIGKILLs itself
after persisting that round — the multi-host failure-injection scenario
(VERDICT r2 #9): the survivor is killed by the test harness, then BOTH
processes are relaunched and must resume from the last globally
completed round and finish bit-identically.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, local_devices = sys.argv[3], int(sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "build"
    ckpt = sys.argv[6] if len(sys.argv) > 6 else None
    die_after = int(sys.argv[7]) if len(sys.argv) > 7 else -1
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    n_dev = nproc * local_devices
    assert len(jax.devices()) == n_dev, jax.devices()

    from suffix_tpu.ops.padding import PAD
    from suffix_tpu.ops.prefix_doubling import _suffix_array_padded
    from suffix_tpu.parallel import dist_build
    from suffix_tpu.parallel.mesh import make_mesh
    from suffix_tpu.utils.io import device_corpus

    # Same deterministic corpus in every process (no cross-process IO).
    rng = np.random.default_rng(0xC0FFEE)
    n = 4096
    arr = rng.integers(97, 101, size=n, dtype=np.uint8)

    mesh = make_mesh()

    if mode == "stepped":
        # Repetitive corpus -> enough doubling rounds that die_after lands
        # mid-build (period-16 text needs ~log4(n) rounds).
        arr = np.tile(arr[:16], n // 16)
        padded_s = np.full((dist_build._local_bucket(n, n_dev) * n_dev,),
                           PAD, dtype=np.int32)
        padded_s[:n] = arr
        expected_s = np.asarray(
            _suffix_array_padded(jnp.asarray(padded_s)))
        expected_sa = expected_s[padded_s.shape[0] - n:]

        rounds = []

        def hook(k, done):
            rounds.append(int(k))
            if pid == 1 and die_after >= 0 and len(rounds) == die_after:
                print(f"MULTIPROC_DYING pid={pid} after round {die_after} "
                      f"k={k}", flush=True)
                import signal

                os.kill(os.getpid(), signal.SIGKILL)

        sa = dist_build.suffix_array_sharded_stepped(
            arr, mesh, checkpoint_path=ckpt, resume=True, round_hook=hook)
        assert np.array_equal(sa, expected_sa.astype(sa.dtype)), (
            f"process {pid}: resumed stepped SA != single-device SA")
        print(f"MULTIPROC_STEPPED_OK pid={pid} rounds={len(rounds)}",
              flush=True)
        return
    n_local = max(8, -(-n // n_dev))
    n_total = n_local * n_dev
    sharded, _ = device_corpus(arr, mesh, n_pad=n_total)
    sa = dist_build._dist_build_jit(sharded, n_local, n_dev, mesh,
                                    index_dtype=jnp.int32)

    # Expected: the single-device engine on the identically padded text,
    # run on this process's first local device (no collectives).
    padded = np.full((n_total,), PAD, dtype=np.int32)
    padded[:n] = arr
    expected = np.asarray(_suffix_array_padded(jnp.asarray(padded)))

    checked = 0
    for shard in sa.addressable_shards:
        lo = shard.index[0].start or 0
        got = np.asarray(shard.data)
        want = expected[lo:lo + got.shape[0]]
        assert np.array_equal(got, want), (
            f"process {pid} shard at {lo}: {got[:8]} != {want[:8]}")
        checked += 1
    assert checked == local_devices, checked
    print(f"MULTIPROC_OK pid={pid} shards={checked}", flush=True)


if __name__ == "__main__":
    main()
