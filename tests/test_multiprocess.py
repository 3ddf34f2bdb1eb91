"""Multi-process collective correctness (2 x jax.distributed CPU).

The rest of the suite exercises the sharded engines on a single-process
virtual mesh; this test spawns two real OS processes that join a JAX
coordination service and run the SPMD sharded build across both — the
only way to exercise the actual cross-process collective path
(ppermute/all_gather over the distributed runtime) without multi-host
hardware. See tests/multiproc_worker.py for what each process checks.
"""

from __future__ import annotations

import os
import pathlib
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.multiprocess

_WORKER = pathlib.Path(__file__).parent / "multiproc_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_sharded_build_across_two_processes():
    nproc, local_devices = 2, 2
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(pid), str(nproc), str(port),
             str(local_devices)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(_WORKER.parent.parent),
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process build timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIPROC_OK pid={pid}" in out, out


@pytest.mark.slow
def test_kill_one_process_mid_stepped_build_then_resume(tmp_path):
    """The multi-host failure story end to end (VERDICT r2 #9): process 1
    SIGKILLs itself after persisting round 2 of a stepped sharded build,
    the blocked survivor is killed by the harness, then BOTH processes
    relaunch with resume=True, agree on the last globally completed
    round (per-process checkpoints + .prev rewind), and finish with the
    bit-exact suffix array."""
    import time

    nproc, local_devices = 2, 2
    ckpt = str(tmp_path / "stepped.ckpt")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)

    def launch(port, die_after):
        return [
            subprocess.Popen(
                [sys.executable, str(_WORKER), str(pid), str(nproc),
                 str(port), str(local_devices), "stepped", ckpt,
                 str(die_after)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env, cwd=str(_WORKER.parent.parent),
            )
            for pid in range(nproc)
        ]

    # Phase 1: process 1 dies after round 2; process 0 blocks in round
    # 3's collectives and is killed by the harness (the "detect the dead
    # host, tear down the job" part a real deployment's orchestrator
    # does).
    procs = launch(_free_port(), die_after=2)
    try:
        out1, _ = procs[1].communicate(timeout=300)
    except subprocess.TimeoutExpired:
        procs[1].kill()
        out1 = procs[1].communicate()[0]
        pytest.fail("process 1 did not die as injected:\n" + out1)
    finally:
        time.sleep(2.0)  # let process 0 finish persisting its round
        procs[0].kill()
        out0 = procs[0].communicate()[0]
    assert procs[1].returncode != 0, out1
    assert "MULTIPROC_DYING pid=1 after round 2" in out1, out1
    assert "MULTIPROC_STEPPED_OK" not in out0, out0
    assert os.path.exists(ckpt + ".p0"), "process 0 wrote no checkpoint"
    assert os.path.exists(ckpt + ".p1"), "process 1 wrote no checkpoint"

    # Phase 2: both relaunch and resume to completion.
    procs = launch(_free_port(), die_after=-1)
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("resume run timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resumed process {pid} failed:\n{out}"
        assert f"MULTIPROC_STEPPED_OK pid={pid}" in out, out
        # The resume must START from the persisted round, not round one:
        # a fresh period-16 build takes ~6 rounds; the resumed run must
        # report strictly fewer.
        rounds = int(out.split("rounds=")[1].split()[0])
        assert rounds < 5, f"resume did not use the checkpoint: {out}"
