"""One-off TPU probes at 64-128 MiB: init-width 3, LCP scale point.

Run alone on the TPU box (single process, sequential stages).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from suffix_tpu.utils.platform import setup_compilation_cache, sync

setup_compilation_cache()

import jax.numpy as jnp

from suffix_tpu.ops.prefix_doubling import _suffix_array_padded
from suffix_tpu.ops import search2 as s2
from suffix_tpu.ops.lcp import _lcp_keyed


def amortized(dispatch, n_iter=4):
    sync(dispatch())
    t0 = time.perf_counter()
    r = None
    for _ in range(n_iter):
        r = dispatch()
    sync(r)
    return (time.perf_counter() - t0) / n_iter


def main():
    n = 1 << 26
    rng = np.random.default_rng(0xB16)
    corpus = (rng.integers(0, 4, size=n, dtype=np.uint8) + 97).astype(np.int32)
    t_dev = jnp.asarray(corpus)
    sync(t_dev)

    for iw in (4, 3):
        dt = amortized(lambda: _suffix_array_padded(t_dev, iw))
        print(f"2^26 build iw={iw}: {dt*1e3:8.1f} ms ({n/dt/1e6:6.1f} MB/s)",
              flush=True)

    sa = _suffix_array_padded(t_dev, 4).astype(jnp.int32)
    sync(sa)
    pk, _, _, _ = s2.build_query_index(t_dev, sa, jnp.int32(n))
    sync(pk[0])
    dt = amortized(lambda: _lcp_keyed(t_dev, jnp.int32(n), sa, jnp.int32(n),
                                      tuple(pk))[0], n_iter=4)
    print(f"2^26 lcp: {dt*1e3:8.1f} ms ({n/dt/1e6:6.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
