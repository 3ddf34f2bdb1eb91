"""The decisive sort-floor experiment (VERDICT r3 #3).

Round 3 left ARCHITECTURE §2a ("lax.sort is at the memory floor, no
kernel can beat it") contradicting §2b (batched 8K local sorts run the
same data 1.75x faster — so the monolithic sort is NOT at the floor).
The proposed lever was a merge hierarchy: VMEM-sized local sorts + a
cross-slab merge phase. This script measures every quantity the
decision needs, at 4M and 64M elements with the production operand set
(4 int32 key words + 1 payload — the quadrupling round's sort):

  M      — the monolithic 5-operand lax.sort;
  B(L)   — batched local sorts at L = 128K..1M (rows of a 2-D sort);
  S      — ONE elementwise compare-exchange pass over all operands
           (the floor cost of any merge stage that reads+writes all
           data once);
  LVL(L) — one REAL pairwise bitonic merge level built in XLA
           (flip stage + log2(L) half-cleaners), and the resulting
           full hierarchy cost B(L) + levels*LVL.

Decision rule: the hierarchy wins only if
    B(L) + ceil(log2(n/L)) * LVL(L) < M,
and since LVL >= S by construction, a measured S > (M - B)/levels
retires the lever with consistent evidence.

Run: python scripts/sort_merge_study.py [--n 22|26] > /tmp/r4_sort.log
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))


def main():
    n_log = 26 if "--n" in sys.argv and "26" in sys.argv else 22
    from suffix_tpu.utils.platform import setup_compilation_cache, sync

    setup_compilation_cache()
    import functools

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    n = 1 << n_log
    rng = np.random.default_rng(0x50F7)
    # Realistic round-sort operands: ranks (many ties, like mid-build
    # rounds) + 3 shifted columns + unique payload.
    ops_np = [rng.integers(0, n // 2, size=n, dtype=np.int32)
              for _ in range(4)] + [np.arange(n, dtype=np.int32)]
    ops = [jnp.asarray(x) for x in ops_np]
    for x in ops:
        sync(x)

    def amortized(fn, n_iter=8):
        sync(fn()[0])
        t0 = time.perf_counter()
        r = None
        for _ in range(n_iter):
            r = fn()
        sync(r[0])
        return (time.perf_counter() - t0) / n_iter

    # --- M: monolithic -------------------------------------------------
    mono = jax.jit(lambda *a: jax.lax.sort(a, num_keys=4, is_stable=False))
    t_m = amortized(lambda: mono(*ops))
    print(f"M  monolithic 5-op sort: {t_m*1e3:8.2f} ms", flush=True)

    # --- B(L): batched local sorts ------------------------------------
    results_b = {}
    for l_log in (13, 15, 17, 18, 19, 20):
        L = 1 << l_log
        if L > n // 2:
            continue
        batched = jax.jit(lambda *a, L=L: jax.lax.sort(
            tuple(x.reshape(-1, L) for x in a), num_keys=4,
            is_stable=False, dimension=-1))
        t_b = amortized(lambda: batched(*ops))
        results_b[L] = t_b
        print(f"B  local sorts L=2^{l_log}: {t_b*1e3:8.2f} ms "
              f"({t_m/t_b:4.2f}x vs M)", flush=True)

    # --- S: one compare-exchange pass ---------------------------------
    def cmpx(a_ops, b_ops):
        lt = None
        eq = None
        for ka, kb in zip(a_ops[:4], b_ops[:4]):
            c = ka < kb
            lt = c if lt is None else lt | (eq & c)
            e = ka == kb
            eq = e if eq is None else eq & e
        lo = [jnp.where(lt, a, b) for a, b in zip(a_ops, b_ops)]
        hi = [jnp.where(lt, b, a) for a, b in zip(a_ops, b_ops)]
        return lo, hi

    @jax.jit
    def one_stage(*a):
        # distance n/2 compare-exchange: the cheapest possible merge
        # stage shape (fully coalesced halves).
        half = [x.reshape(2, -1) for x in a]
        lo, hi = cmpx([x[0] for x in half], [x[1] for x in half])
        return tuple(jnp.concatenate([l, h]) for l, h in zip(lo, hi))

    t_s = amortized(lambda: one_stage(*ops))
    print(f"S  one compare-exchange pass: {t_s*1e3:8.2f} ms", flush=True)

    # --- LVL(L): one real bitonic merge level -------------------------
    @functools.partial(jax.jit, static_argnames=("L",))
    def merge_level(*a, L: int):
        """Pairs of adjacent sorted L-runs -> sorted 2L-runs."""
        x = [v.reshape(-1, 2 * L) for v in a]
        # Flip stage: element i vs 2L-1-i.
        left = [v[:, :L] for v in x]
        right = [v[:, L:][:, ::-1] for v in x]
        lo, hi = cmpx(left, right)
        cur = [jnp.concatenate([l, h[:, ::-1]], axis=1)
               for l, h in zip(lo, hi)]
        # Half-cleaners at distances L/2 .. 1.
        d = L // 2
        while d >= 1:
            shaped = [v.reshape(-1, 2, d) for v in cur]
            lo, hi = cmpx([v[:, 0, :] for v in shaped],
                          [v[:, 1, :] for v in shaped])
            cur = [jnp.stack([l, h], axis=1).reshape(-1, 2 * L)
                   for l, h in zip(lo, hi)]
            d //= 2
        return tuple(v.reshape(-1) for v in cur)

    for L in (1 << 17, 1 << 19):
        if L > n // 2:
            continue
        # Input: locally sorted L-runs.
        batched = jax.jit(lambda *a, L=L: jax.lax.sort(
            tuple(x.reshape(-1, L) for x in a), num_keys=4,
            is_stable=False, dimension=-1))
        runs = tuple(v.reshape(-1) for v in batched(*ops))
        t_lvl = amortized(lambda: merge_level(*runs, L=L))
        levels = (n // L).bit_length() - 1
        total = results_b.get(L, float("nan")) + levels * t_lvl
        print(f"LVL one merge level from L=2^{L.bit_length()-1}: "
              f"{t_lvl*1e3:8.2f} ms; hierarchy = B + {levels}*LVL = "
              f"{total*1e3:8.2f} ms ({'WIN' if total < t_m else 'LOSS'} "
              f"vs M {t_m*1e3:.2f})", flush=True)
        # Correctness of the level construction (first level only).
        if n_log == 22:
            got = merge_level(*runs, L=L)
            g0 = np.asarray(got[0]).reshape(-1, 2 * L)
            assert all(np.all(np.diff(r) >= 0) for r in g0[:2]), \
                "merge level did not produce sorted 2L runs"
            print("    (level output verified sorted)", flush=True)


if __name__ == "__main__":
    main()
