"""Measure XLA sort cost structure on TPU: monolithic vs batched slabs.

Question: is lax.sort's cost ~ n * log^2(sort_dim) (stage-bound) or does it
go bandwidth-bound once a slab fits VMEM?  If batched small sorts are
dramatically cheaper per element, a blocked bitonic (batched local sorts +
elementwise cross-slab minmax stages) can beat the monolithic sort that
dominates suffix-array construction.

Run alone on the TPU box (never two TPU processes at once).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from suffix_tpu.utils.platform import setup_compilation_cache, sync

setup_compilation_cache()

import jax
import jax.numpy as jnp


def amortized(dispatch, n_iter=16):
    sync(dispatch())  # warm/compile
    t0 = time.perf_counter()
    r = None
    for _ in range(n_iter):
        r = dispatch()
    sync(r)
    return (time.perf_counter() - t0) / n_iter


def main():
    rng = np.random.default_rng(7)
    n = 1 << 22
    print(f"device={jax.devices()[0]}, n={n}")

    # Operand sets matching the construction hot sorts:
    #   3-op initial sort (2 key words + payload), 5-op quadrupling round.
    ops3 = tuple(jnp.asarray(rng.integers(0, 1 << 27, size=n, dtype=np.int32))
                 for _ in range(3))
    ops5 = tuple(jnp.asarray(rng.integers(0, 1 << 22, size=n, dtype=np.int32))
                 for _ in range(5))
    sync(ops5[-1])

    @jax.jit
    def mono3(a, b, c):
        return jax.lax.sort((a, b, c), num_keys=2, is_stable=False)

    @jax.jit
    def mono5(a, b, c, d, e):
        return jax.lax.sort((a, b, c, d, e), num_keys=4, is_stable=False)

    t = amortized(lambda: mono3(*ops3))
    print(f"mono lax.sort 3op num_keys=2: {t*1e3:8.2f} ms")
    t = amortized(lambda: mono5(*ops5))
    print(f"mono lax.sort 5op num_keys=4: {t*1e3:8.2f} ms")

    # Batched: reshape to (S, L) and sort along the last axis.
    for logL in (13, 15, 17, 18, 19, 20):
        L = 1 << logL
        S = n // L

        @jax.jit
        def bat5(a, b, c, d, e, L=L, S=S):
            r = lambda x: x.reshape(S, L)
            out = jax.lax.sort(tuple(map(r, (a, b, c, d, e))), num_keys=4,
                               dimension=1, is_stable=False)
            return tuple(x.reshape(-1) for x in out)

        t = amortized(lambda: bat5(*ops5))
        print(f"batched 5op ({S:4d} x {L:8d}):   {t*1e3:8.2f} ms")

    # Elementwise cross-slab minmax stage cost (4-word lexicographic
    # comparator + 5 selects), slab stride as reshape+flip:
    @jax.jit
    def cross_stage(a, b, c, d, e, S=16):
        L = n // S
        def half(x):
            y = x.reshape(S // 2, 2, L)
            return y[:, 0, :].reshape(-1), y[:, 1, :].reshape(-1)
        (a0, a1), (b0, b1), (c0, c1), (d0, d1), (e0, e1) = map(
            half, (a, b, c, d, e))
        gt = (a0 > a1) | ((a0 == a1) & ((b0 > b1) | ((b0 == b1) & (
            (c0 > c1) | ((c0 == c1) & (d0 > d1))))))
        def mm(x0, x1):
            lo = jnp.where(gt, x1, x0)
            hi = jnp.where(gt, x0, x1)
            return jnp.stack([lo.reshape(S // 2, L), hi.reshape(S // 2, L)],
                             axis=1).reshape(-1)
        return tuple(mm(x0, x1) for (x0, x1) in
                     ((a0, a1), (b0, b1), (c0, c1), (d0, d1), (e0, e1)))

    t = amortized(lambda: cross_stage(*ops5))
    print(f"elementwise cross stage (5op):  {t*1e3:8.2f} ms")

    # Pure bandwidth reference: copy 5 operands.
    @jax.jit
    def copy5(a, b, c, d, e):
        return a + 1, b + 1, c + 1, d + 1, e + 1

    t = amortized(lambda: copy5(*ops5))
    print(f"elementwise copy (5op):         {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
