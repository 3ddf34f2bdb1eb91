"""Measure fence-stride tradeoff for the merge-join query engine.

The batch cost is fence_sort(n/stride + 2Q) + block row-gathers(Q * stride).
Stride 8 was tuned on the 4 MiB index; large indexes want larger strides.
Run alone on the TPU box.
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

from suffix_tpu.ops.prefix_doubling import _suffix_array_padded, pick_init_words
from suffix_tpu.ops import search2 as s2


def run(log_n: int, strides, n_q=262_144, iters=8):
    n = 1 << log_n
    rng = np.random.default_rng(0xB16)
    corpus = (rng.integers(0, 4, size=n, dtype=np.uint8) + 97).astype(np.int32)
    t_dev = jnp.asarray(corpus)
    sync(t_dev)
    sa = _suffix_array_padded(t_dev, pick_init_words(n)).astype(jnp.int32)
    sync(sa)
    qlen = 14
    starts = rng.integers(0, n - qlen, size=n_q)
    queries = jnp.asarray(np.stack([corpus[s : s + qlen] for s in starts]))
    qlens = jnp.asarray(np.full((n_q,), qlen, np.int32))
    for stride in strides:
        _pk, fence, blk, _ = s2.build_query_index(
            t_dev, sa, jnp.int32(n), stride=stride)
        sync(fence)
        args = (t_dev, jnp.int32(n), sa, jnp.int32(n), fence, blk, queries,
                qlens, (n + 1).bit_length(), qlen)
        sync(s2.bounds_batch_merge(*args))
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = s2.bounds_batch_merge(*args)
        sync(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"n=2^{log_n} stride={stride:3d}: {dt*1e3:8.2f} ms "
              f"({n_q/dt/1e6:6.2f}M q/s)", flush=True)


if __name__ == "__main__":
    sizes = sys.argv[1:] or ["26"]
    for s in sizes:
        run(int(s), strides=(8, 16, 32, 64, 128))
