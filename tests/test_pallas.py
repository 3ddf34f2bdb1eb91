"""Pallas kernels: interpreter-mode + XLA-fallback equivalence.

The interpret-mode runs double as the scatter-collision assertion the
reference lacks (SURVEY.md §5): one-hot accumulation must equal the
sequential scatter-add bin for bin.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from suffix_tpu.ops.pallas_kernels import CHUNK, byte_histogram


@pytest.mark.parametrize("n", [CHUNK, CHUNK * 3, CHUNK * 4 - 7, 100])
def test_histogram_interpret_vs_xla(n, rng):
    vals = rng.integers(0, 258, size=n, dtype=np.int32)
    x = jnp.asarray(vals)
    ref = np.bincount(vals, minlength=258).astype(np.int32)
    got_xla = np.asarray(byte_histogram(x, 258, force="xla"))
    assert np.array_equal(got_xla, ref)
    if n >= CHUNK:
        got_int = np.asarray(byte_histogram(x, 258, force="interpret"))
        assert np.array_equal(got_int, ref)


def test_histogram_out_of_range(rng):
    vals = rng.integers(-5, 300, size=CHUNK * 2, dtype=np.int32)
    x = jnp.asarray(vals)
    in_range = vals[(vals >= 0) & (vals < 258)]
    ref = np.bincount(in_range, minlength=258).astype(np.int32)
    got_xla = np.asarray(byte_histogram(x, 258, force="xla"))
    got_int = np.asarray(byte_histogram(x, 258, force="interpret"))
    assert np.array_equal(got_xla, ref)
    assert np.array_equal(got_int, ref)
