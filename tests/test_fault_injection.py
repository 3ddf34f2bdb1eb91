"""Fault injection: SIGKILL a stepped sharded build mid-run, then resume.

The reference's only failure mode is a panic (src/table.rs:369-380); the
framework's stepped build must instead survive a hard process death between
collective rounds (SURVEY.md §5): the atomically-written checkpoint of the
last completed round is picked up by a fresh process and the final suffix
array is bit-identical to an uninterrupted build.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np

from suffix_tpu import SuffixTable
from suffix_tpu.parallel.dist_build import suffix_array_sharded_stepped
from suffix_tpu.parallel.mesh import make_mesh

CHILD = r"""
import os, sys, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, {repo!r})
from suffix_tpu.parallel.dist_build import suffix_array_sharded_stepped
from suffix_tpu.parallel.mesh import make_mesh

# Highly repetitive corpus: LCPs of ~n force the full round ladder
# (12 -> 48 -> 192 -> 768 -> 3072), so the kill lands mid-build.
data = b"abracadabra" * 300
mesh = make_mesh(4)
# Slow the build down so the parent can land a SIGKILL between rounds.
suffix_array_sharded_stepped(
    data, mesh, checkpoint_path={ckpt!r},
    round_hook=lambda k, done: time.sleep(0.5),
)
print("FINISHED", flush=True)
"""


def test_sigkill_between_rounds_then_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = str(tmp_path / "build.npz")
    script = tmp_path / "child.py"
    script.write_text(CHILD.format(repo=repo, ckpt=ckpt))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen([sys.executable, str(script)], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        # Wait for the first completed round's checkpoint, then kill hard.
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.exists(ckpt):
                try:
                    with np.load(ckpt) as z:
                        if int(z["k"]) >= 12 and not bool(z["done"]):
                            break
                except (OSError, ValueError, KeyError):
                    pass  # mid-rename; retry
            if proc.poll() is not None:
                out, err = proc.communicate()
                raise AssertionError(
                    f"child exited before kill: {out!r} {err!r}")
            time.sleep(0.05)
        else:
            raise AssertionError("no checkpoint appeared within deadline")
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    # The dead process left a valid checkpoint of a completed round.
    with np.load(ckpt) as z:
        k_at_death = int(z["k"])
        assert not bool(z["done"])
    assert k_at_death >= 12

    data = b"abracadabra" * 300
    mesh = make_mesh(4)
    rounds = []
    resumed = suffix_array_sharded_stepped(
        data, mesh, checkpoint_path=ckpt, resume=True,
        round_hook=lambda k, done: rounds.append(k),
    )
    # It resumed (ran fewer rounds than a fresh build would need), and the
    # result is bit-identical to the single-chip engine / reference order.
    assert rounds[0] > k_at_death
    assert np.array_equal(SuffixTable.new(data).table(), resumed)


def test_corrupt_checkpoint_restarts_clean(tmp_path):
    ckpt = str(tmp_path / "bad.npz")
    with open(ckpt, "wb") as f:
        f.write(b"not a real npz file")
    rng = np.random.default_rng(11)
    data = (rng.integers(0, 26, size=500, dtype=np.uint8) + 97).tobytes()
    mesh = make_mesh(4)
    got = suffix_array_sharded_stepped(data, mesh, checkpoint_path=ckpt,
                                       resume=True)
    assert np.array_equal(SuffixTable.new(data).table(), got)
