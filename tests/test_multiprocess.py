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
