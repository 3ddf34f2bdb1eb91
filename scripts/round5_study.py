"""Round-5 measurement study (real TPU). Run sections INDIVIDUALLY with
generous timeouts and redirect output to a file:

    python scripts/round5_study.py gather   > /tmp/r5_gather.log 2>&1
    python scripts/round5_study.py battery  > /tmp/r5_battery.log 2>&1
    python scripts/round5_study.py nearrep  > /tmp/r5_nearrep.log 2>&1
    python scripts/round5_study.py plcp16   > /tmp/r5_plcp16.log 2>&1
    python scripts/round5_study.py plcp128  > /tmp/r5_plcp128.log 2>&1
    python scripts/round5_study.py small    > /tmp/r5_small.log 2>&1

Sections:
  gather   — device primitive rates that all round-5 designs hinge on:
             random element gathers (varied batch size), 2-consecutive
             word gathers, (lanes, W) window gathers, aligned row
             gathers, big-sort throughput (the per-batch fence-sort
             floor), scatter rate.
  battery  — 128 MiB keyless mixed-length query battery attribution
             (VERDICT r4 missing #3): full vs short-only (refine cost
             by difference), fence sort + block count split, the ext
             12-word keyless index lever, batch-size scaling.
  nearrep  — the bench's 4 MiB 16-mutation near-repeated fixture
             through device_build_closure: does it route to the
             patched-periodic engine, what rate, bit-parity vs native.
  plcp16 / plcp128
           — chunked-PLCP device prototype (text-order two-pointer,
             Kasai amortization, W-byte window compares) vs host Kasai
             on the survivor-dense text corpus. Parity + rate at both
             sizes; W ladder at 16 MiB.
  small    — host-route microbenches (no TPU): the sais_small fast
             path added at r5 start (claimed ~490 ns vs reference
             1,038 ns published), single-query ns.
  deep     — the round-5 deep keyless serving engine (8w fences + 6w
             ext tier + doubly-compacted refine) on the 128 MiB
             corpus: 16k and 131k mixed batteries, parity vs the old
             refine, short-only floors.
  lcpbulk16 / lcpbulk128
           — the retuned packed bulk LCP ladder vs host Kasai
             (per-stage verbose + end-to-end + parity).
  lcpprod  — clean-process production-path LCP at 128 MiB (the
             duplicate-array study process distorts HBM residency).
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))


def amortized(dispatch, sync, n_iter=8):
    sync(dispatch())
    t0 = time.perf_counter()
    r = None
    for _ in range(n_iter):
        r = dispatch()
    sync(r)
    return (time.perf_counter() - t0) / n_iter


def _corpus_128(n_txt):
    from suffix_tpu.utils.textgen import text_corpus

    cache = pathlib.Path(__file__).parents[1] / ".bench_cache"
    cache.mkdir(exist_ok=True)
    cpath = cache / f"text_{n_txt >> 20}MiB_v1.npy"
    if cpath.exists():
        return np.load(cpath)
    txt = text_corpus(n_txt)
    np.save(cpath, txt)
    return txt


# ---------------------------------------------------------------------------
# Chunked-PLCP prototype (promoted to ops/lcp.py once validated)
# ---------------------------------------------------------------------------


def _plcp_build_phi(sa_dev, n):
    """(isa, phi) in position order via ONE padded sort (no gathers).

    sa_dev: padded int32 SA (entries beyond n are zero). Padded rows get
    key n_pad (past every real position) so they sort to the tail.
    """
    import jax.numpy as jnp
    from jax import lax

    n_pad = sa_dev.shape[0]
    r = jnp.arange(n_pad, dtype=jnp.int32)
    key = jnp.where(r < n, sa_dev, jnp.int32(n_pad))
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sa_dev[:-1]])
    prev = jnp.where(r < n, prev, jnp.int32(-1))
    _, isa, phi = lax.sort((key, r, prev), num_keys=1, is_stable=False)
    return isa, phi  # position order; tail entries meaningless


def _plcp_kernel_factory(jax, jnp):
    from suffix_tpu.ops.padding import PAD

    @functools.partial(jax.jit, static_argnames=("L", "W", "max_steps"))
    def plcp_kernel(t_dev, phi, n, L: int, W: int, max_steps: int):
        """Per-position PLCP via L parallel text-order two-pointer lanes.

        t_dev: PAD-padded int32 text (n_pad,). phi: int32, phi[i] = SA
        predecessor position of i (-1 at rank 0 / invalid). Returns
        (plcp[n_pad], n_unfinished) — unfinished > 0 means max_steps was
        hit (caller falls back).
        """
        n_pad = t_dev.shape[0]
        chunk = -(-n_pad // L)  # ceil; lanes past n finish instantly
        starts = jnp.arange(L, dtype=jnp.int32) * chunk
        offs = jnp.arange(W, dtype=jnp.int32)

        def cond(s):
            i, h, plcp, step = s
            return jnp.any(i < chunk) & (step < max_steps)

        def body(s):
            i, h, plcp, step = s
            pos = starts + i
            live = (i < chunk) & (pos < n)
            j = jnp.take(phi, jnp.minimum(pos, n - 1), mode="clip")
            rank0 = j < 0
            base_a = pos + h
            base_b = jnp.where(rank0, 0, j) + h
            pa = base_a[:, None] + offs[None, :]
            pb = base_b[:, None] + offs[None, :]
            wa = jnp.take(t_dev, pa, mode="fill", fill_value=PAD)
            wb = jnp.take(t_dev, pb, mode="fill", fill_value=PAD)
            eq = (wa == wb) & (pa < n) & (pb < n)
            run = jnp.cumprod(eq.astype(jnp.int32), axis=1).sum(axis=1)
            cont = live & (~rank0) & (run == W)
            final = jnp.where(rank0, 0, h + run)
            fin = live & (~cont)
            plcp = plcp.at[jnp.where(fin, pos, n_pad)].set(
                final, mode="drop")
            h = jnp.where(fin, jnp.maximum(final - 1, 0),
                          jnp.where(cont, h + W, h))
            i = jnp.where(fin, i + 1, i)
            # Lanes whose next position is past the text are complete.
            i = jnp.where(starts + i >= n, chunk, i)
            return i, h, plcp, step + 1

        i0 = jnp.zeros((L,), jnp.int32)
        h0 = jnp.zeros((L,), jnp.int32)
        plcp0 = jnp.zeros((n_pad,), jnp.int32)
        i, h, plcp, step = jax.lax.while_loop(
            cond, body, (i0, h0, plcp0, jnp.int32(0)))
        unfinished = jnp.sum((i < chunk).astype(jnp.int32))
        return plcp, unfinished

    @jax.jit
    def lcp_from_plcp(plcp, isa, n):
        """LCP in rank order: sort (isa, plcp) by isa (no gathers)."""
        n_pad = plcp.shape[0]
        r = jnp.arange(n_pad, dtype=jnp.int32)
        key = jnp.where(r < n, isa, jnp.int32(n_pad))
        _, out = jax.lax.sort((key, plcp), num_keys=1, is_stable=False)
        return out

    return plcp_kernel, lcp_from_plcp


def _run_plcp(nbytes, Ws, Ls, sync, check_parity=True):
    import jax.numpy as jnp

    import jax
    from suffix_tpu.ops.padding import PAD, bucket_size
    from suffix_tpu.ops import lcp as lcp_ops
    from suffix_tpu.ops.prefix_doubling import device_build_closure

    txt = _corpus_128(nbytes)
    n = txt.size
    n_pad = bucket_size(n)
    build, label = device_build_closure(txt, n_pad)
    print(f"build engine: {label}", flush=True)
    t0 = time.perf_counter()
    sa = build()
    sync(sa)
    print(f"build: {time.perf_counter()-t0:.2f}s", flush=True)
    sa32 = sa.astype(jnp.int32)
    t_pad = np.full((n_pad,), PAD, np.int32)
    t_pad[:n] = txt
    t_dev = jnp.asarray(t_pad)
    sync(t_dev)

    plcp_kernel, lcp_from_plcp = _plcp_kernel_factory(jax, jnp)

    # phi build (one sort)
    t0 = time.perf_counter()
    isa, phi = _plcp_build_phi(sa32, jnp.int32(n))
    sync(phi)
    print(f"phi sort (cold): {time.perf_counter()-t0:.2f}s", flush=True)
    dt_phi = amortized(lambda: _plcp_build_phi(sa32, jnp.int32(n))[1],
                       sync, n_iter=3)
    print(f"phi sort (amortized): {dt_phi:.3f}s", flush=True)

    # host kasai baseline
    t0 = time.perf_counter()
    ref = lcp_ops._kasai_route(txt, np.asarray(sa32)[:n].astype(np.uint32))
    dt_kasai = time.perf_counter() - t0
    print(f"host kasai: {dt_kasai:.2f}s", flush=True)

    for L in Ls:
        for W in Ws:
            max_steps = 4 * (n_pad // L) + (1 << 16) // W
            try:
                t0 = time.perf_counter()
                plcp, unf = plcp_kernel(t_dev, phi, jnp.int32(n), L, W,
                                        max_steps)
                sync(plcp)
                cold = time.perf_counter() - t0
                dt = amortized(
                    lambda: plcp_kernel(t_dev, phi, jnp.int32(n), L, W,
                                        max_steps)[0], sync, n_iter=2)
                t0 = time.perf_counter()
                out = lcp_from_plcp(plcp, isa, jnp.int32(n))
                sync(out)
                dt_fin = time.perf_counter() - t0
                ok = "?"
                if check_parity:
                    got = np.asarray(out)[:n].astype(np.uint32)
                    ok = bool(np.array_equal(got, ref))
                print(f"L={L} W={W}: kernel cold {cold:.2f}s amortized "
                      f"{dt:.2f}s finish {dt_fin:.2f}s unfinished="
                      f"{int(unf)} parity={ok} total~"
                      f"{dt_phi + dt + dt_fin:.2f}s vs kasai {dt_kasai:.2f}s",
                      flush=True)
            except Exception as e:
                print(f"L={L} W={W}: FAILED {type(e).__name__}: {e}",
                      flush=True)


def main():
    section = sys.argv[1] if len(sys.argv) > 1 else "gather"
    if section == "small":
        small()
        return
    from suffix_tpu.utils.platform import setup_compilation_cache, sync

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    if section == "gather":
        rng = np.random.default_rng(7)
        n = 1 << 27
        big = jnp.asarray(rng.integers(0, 1 << 20, size=n, dtype=np.int32))
        sync(big)
        for k in (14, 18, 22, 25):
            idx = jnp.asarray(
                rng.integers(0, n, size=1 << k, dtype=np.int32))
            sync(idx)
            dt = amortized(lambda: jnp.take(big, idx), sync)
            rate = (1 << k) / dt
            print(f"element gather 2^{k} from 2^27: {dt*1e3:.2f} ms "
                  f"-> {rate/1e6:.0f}M el/s", flush=True)
        # 2-consecutive (packed-word pair) gathers
        for k in (18, 22):
            base = jnp.asarray(
                rng.integers(0, n - 2, size=1 << k, dtype=np.int32))
            off2 = jnp.arange(2, dtype=jnp.int32)
            sync(base)
            dt = amortized(
                lambda: jnp.take(big, base[:, None] + off2[None, :]), sync)
            print(f"2-consec gather 2^{k} pairs: {dt*1e3:.2f} ms -> "
                  f"{(1 << k) * 2 / dt / 1e6:.0f}M el/s", flush=True)
        # (lanes, W) window gathers
        for lanes_k, W in ((13, 8), (13, 16), (16, 8), (16, 4), (18, 4)):
            lanes = 1 << lanes_k
            base = jnp.asarray(
                rng.integers(0, n - W, size=lanes, dtype=np.int32))
            offs = jnp.arange(W, dtype=jnp.int32)
            sync(base)
            dt = amortized(
                lambda: jnp.take(big, base[:, None] + offs[None, :]), sync)
            print(f"window gather {lanes}x{W}: {dt*1e3:.3f} ms -> "
                  f"{lanes * W / dt / 1e6:.0f}M el/s", flush=True)
        # aligned row gathers (128-wide)
        big2d = big.reshape(-1, 128)
        for k in (13, 16):
            rows = jnp.asarray(rng.integers(0, n // 128, size=1 << k,
                                            dtype=np.int32))
            sync(rows)
            dt = amortized(lambda: jnp.take(big2d, rows, axis=0), sync)
            print(f"row gather 2^{k} x128: {dt*1e3:.3f} ms -> "
                  f"{(1 << k) * 128 / dt / 1e6:.0f}M el/s", flush=True)
        # scatter rate
        for k in (16, 22):
            idx = jnp.asarray(rng.integers(0, n, size=1 << k,
                                           dtype=np.int32))
            val = jnp.ones((1 << k,), jnp.int32)
            sync(idx)
            dt = amortized(lambda: big.at[idx].set(val, mode="drop"), sync)
            print(f"scatter 2^{k} into 2^27: {dt*1e3:.3f} ms -> "
                  f"{(1 << k) / dt / 1e6:.0f}M el/s", flush=True)
        # big sorts (fence-sort floor / phi-sort cost)
        for rows_k, n_ops in ((20, 7), (27, 3)):
            ops = tuple(
                jnp.asarray(rng.integers(0, 1 << 30, size=1 << rows_k,
                                         dtype=np.int32))
                for _ in range(n_ops))
            sync(ops[0])
            dt = amortized(
                lambda: jax.lax.sort(ops, num_keys=max(1, n_ops - 1),
                                     is_stable=False)[0], sync,
                n_iter=4)
            print(f"sort 2^{rows_k} rows x{n_ops} ops: {dt*1e3:.1f} ms",
                  flush=True)
        return

    if section in ("plcp16", "plcp128"):
        if section == "plcp16":
            _run_plcp(1 << 24, Ws=(4, 8, 16), Ls=(1 << 13, 1 << 15), sync=sync)
        else:
            _run_plcp(1 << 27, Ws=(8,), Ls=(1 << 15,), sync=sync,
                      check_parity=True)
        return

    if section == "lcpprod":
        # Production-path LCP at 128 MiB in a CLEAN process: build the
        # SA, drop every study-local device array, then time
        # SuffixTable-equivalent host-in/host-out lcp_from_sa(auto) —
        # the duplicate-array study process measured 248 s for the same
        # call that costs ~67 s standalone (HBM pressure), so the
        # routing decision uses THIS number.
        from suffix_tpu.ops import lcp as lcp_ops
        from suffix_tpu.ops.prefix_doubling import device_build_closure

        n_txt = 1 << 27
        txt = _corpus_128(n_txt)
        build, label = device_build_closure(txt, n_txt)
        sa = build()
        sync(sa)
        sa_np = np.asarray(sa)[:n_txt].astype(np.uint32)
        del sa, build
        t0 = time.perf_counter()
        out = lcp_ops.lcp_from_sa(txt, sa_np)
        dt1 = time.perf_counter() - t0
        print(f"lcp_from_sa(auto) cold: {dt1:.2f}s", flush=True)
        t0 = time.perf_counter()
        out2 = lcp_ops.lcp_from_sa(txt, sa_np)
        dt2 = time.perf_counter() - t0
        print(f"lcp_from_sa(auto) warm: {dt2:.2f}s", flush=True)
        t0 = time.perf_counter()
        ref = lcp_ops._kasai_route(txt, sa_np)
        print(f"host kasai: {time.perf_counter()-t0:.2f}s parity="
              f"{np.array_equal(out2, ref)}", flush=True)
        return

    if section == "deep":
        # Round-5 deep keyless engine on the 128 MiB corpus: sorted-
        # gather index build + ext tier + compacted long-lane refine.
        from suffix_tpu.ops import search2 as s2
        from suffix_tpu.ops.padding import bucket_size
        from suffix_tpu.ops.prefix_doubling import device_build_closure

        n_txt = 1 << 27
        txt = _corpus_128(n_txt)
        build, label = device_build_closure(txt, n_txt)
        sa = build()
        sync(sa)
        sa32 = sa.astype(jnp.int32)
        t_dev = jnp.asarray(txt.astype(np.int32))
        sync(t_dev)
        t0 = time.perf_counter()
        fences, blk, ext = s2.build_query_index_keyless(
            t_dev, sa32, jnp.int32(n_txt),
            key_words=s2.DEEP_FENCE_WORDS,
            ext_words=s2.DEEP_EXT_WORDS)
        sync(ext)
        print(f"keyless+ext sorted build: {time.perf_counter()-t0:.2f}s",
              flush=True)
        deep_syms = 3 * s2.DEEP_FENCE_WORDS
        cov = deep_syms + 3 * s2.DEEP_EXT_WORDS

        rngq = np.random.default_rng(0xBEEF)
        for nq in (16384, 131072):
            lens_q = rngq.choice([4, 8, 14, 24, 40], size=nq,
                                 p=[.25, .25, .25, .15, .10])
            starts_q = rngq.integers(0, n_txt - 64, size=nq)
            qtxt = np.zeros((nq, 64), np.int32)
            for i, (s, l) in enumerate(zip(starts_q, lens_q)):
                qtxt[i, :l] = txt[s:s + l]
            q_dev = jnp.asarray(qtxt)
            ql_dev = jnp.asarray(lens_q.astype(np.int32))
            n_long = int((lens_q > deep_syms).sum())
            n_deep = int((lens_q > cov).sum())
            B = min(nq, int(bucket_size(max(n_long, 1), minimum=8)))
            B2 = (min(B, int(bucket_size(max(n_deep, 1), minimum=8)))
                  if n_deep else 0)

            def deep():
                return s2.bounds_batch_merge_deep(
                    t_dev, jnp.int32(n_txt), sa32, jnp.int32(n_txt),
                    fences, blk, ext, q_dev, ql_dev, 64, B, B2)

            sync(deep()[0])
            dt = amortized(lambda: deep()[0], sync, n_iter=4)
            print(f"DEEP battery {nq} (B={B}, B2={B2}): {dt*1e3:.1f} ms -> "
                  f"{nq/dt:.0f} q/s", flush=True)
            # spot parity vs the old full path on the first battery
            if nq == 16384:
                s_d, c_d = deep()
                old = s2.bounds_batch_merge(
                    t_dev, jnp.int32(n_txt), sa32, jnp.int32(n_txt),
                    fences, blk, q_dev, ql_dev,
                    (n_txt + 1).bit_length(), 64)
                ok = (np.array_equal(np.asarray(s_d), np.asarray(old[0]))
                      and np.array_equal(np.asarray(c_d),
                                         np.asarray(old[1])))
                print(f"parity deep vs old refine: {ok}", flush=True)
            # short-only throughput at this batch size
            ql_s = jnp.asarray(np.minimum(lens_q, 18).astype(np.int32))
            q_s = jnp.asarray(qtxt[:, :18])

            def short():
                return s2.bounds_batch_merge(
                    t_dev, jnp.int32(n_txt), sa32, jnp.int32(n_txt),
                    fences, blk, q_s, ql_s,
                    (n_txt + 1).bit_length(), 18)

            sync(short()[0])
            dt_s = amortized(lambda: short()[0], sync, n_iter=4)
            print(f"  short-only {nq}: {dt_s*1e3:.1f} ms -> "
                  f"{nq/dt_s:.0f} q/s", flush=True)
        return

    if section in ("lcpbulk16", "lcpbulk128"):
        # Round-5 packed bulk ladder vs host Kasai on survivor-dense
        # text (the VERDICT r4 missing #2 deliverable).
        from suffix_tpu.ops import lcp as lcp_ops
        from suffix_tpu.ops import search2 as s2
        from suffix_tpu.ops.padding import PAD, bucket_size
        from suffix_tpu.ops.prefix_doubling import device_build_closure

        n_txt = 1 << (24 if section == "lcpbulk16" else 27)
        txt = _corpus_128(n_txt)
        build, label = device_build_closure(txt, n_txt)
        sa = build()
        sync(sa)
        sa32 = sa.astype(jnp.int32)
        sa_np = np.asarray(sa32)[:n_txt].astype(np.uint32)
        t_pad = np.full((bucket_size(n_txt),), PAD, np.int32)
        t_pad[:n_txt] = txt
        t_dev = jnp.asarray(t_pad)
        sync(t_dev)
        t0 = time.perf_counter()
        pk = s2.packed_keys_rank_order(t_dev, sa32, n_txt)
        sync(pk[0])
        print(f"sorted pk build: {time.perf_counter()-t0:.2f}s",
              flush=True)
        t0 = time.perf_counter()
        res = lcp_ops._lcp_bulk(t_dev, n_txt, sa32, tuple(pk),
                                verbose=True)
        dt_bulk = time.perf_counter() - t0
        print(f"packed bulk ladder: {dt_bulk:.2f}s "
              f"({'ok' if res is not None else 'BUDGET-EXHAUSTED'})",
              flush=True)
        t0 = time.perf_counter()
        ref = lcp_ops._kasai_route(txt, sa_np)
        print(f"host kasai: {time.perf_counter()-t0:.2f}s", flush=True)
        if res is not None:
            print(f"parity: {np.array_equal(res, ref)}", flush=True)
        # end-to-end public route (includes pk build + census)
        t0 = time.perf_counter()
        out = lcp_ops.lcp_from_sa(txt, sa_np)
        print(f"lcp_from_sa(auto) end-to-end: "
              f"{time.perf_counter()-t0:.2f}s parity="
              f"{np.array_equal(out, ref)}", flush=True)
        return

    if section == "battery":
        from suffix_tpu.ops import search2 as s2
        from suffix_tpu.ops.padding import PAD, bucket_size
        from suffix_tpu.ops.prefix_doubling import device_build_closure

        n_txt = 1 << 27
        txt = _corpus_128(n_txt)
        build, label = device_build_closure(txt, n_txt)
        print(f"build engine: {label}", flush=True)
        sa = build()
        sync(sa)
        sa32 = sa.astype(jnp.int32)
        t_dev = jnp.asarray(txt.astype(np.int32))
        sync(t_dev)
        t0 = time.perf_counter()
        _, fence, blk, _ = s2.build_query_index(t_dev, sa32,
                                                jnp.int32(n_txt),
                                                with_keys=False)
        sync(blk)
        print(f"keyless 6w index build: {time.perf_counter()-t0:.2f}s",
              flush=True)

        rngq = np.random.default_rng(0xBEEF)
        nq = 16384
        lens_q = rngq.choice([4, 8, 14, 24, 40], size=nq,
                             p=[.25, .25, .25, .15, .10])
        starts_q = rngq.integers(0, n_txt - 64, size=nq)
        qtxt = np.zeros((nq, 64), np.int32)
        for i, (s, l) in enumerate(zip(starts_q, lens_q)):
            qtxt[i, :l] = txt[s:s + l]
        q_dev = jnp.asarray(qtxt)
        ql_dev = jnp.asarray(lens_q.astype(np.int32))
        nit = (n_txt + 1).bit_length()

        def full():
            return s2.bounds_batch_merge(t_dev, jnp.int32(n_txt), sa32,
                                         jnp.int32(n_txt), fence, blk,
                                         q_dev, ql_dev, nit, 64)

        sync(full()[0])
        dt_full = amortized(lambda: full()[0], sync, n_iter=4)
        print(f"FULL battery 16k: {dt_full*1e3:.1f} ms -> "
              f"{nq/dt_full:.0f} q/s", flush=True)

        # short-only: same queries with qlens clipped to <=18 and
        # max_qlen static 18 (no refine phase in the program at all)
        ql_short = jnp.asarray(np.minimum(lens_q, 18).astype(np.int32))
        q_short = jnp.asarray(qtxt[:, :18])

        def short():
            return s2.bounds_batch_merge(t_dev, jnp.int32(n_txt), sa32,
                                         jnp.int32(n_txt), fence, blk,
                                         q_short, ql_short, nit, 18)

        sync(short()[0])
        dt_short = amortized(lambda: short()[0], sync, n_iter=4)
        print(f"SHORT-ONLY battery (sort+block, no refine): "
              f"{dt_short*1e3:.1f} ms; refine cost by difference: "
              f"{(dt_full-dt_short)*1e3:.1f} ms", flush=True)

        # ext 12-word keyless index
        t0 = time.perf_counter()
        _, fence12, blk12, _ = s2.build_query_index(
            t_dev, sa32, jnp.int32(n_txt), key_words=12, with_keys=False)
        sync(blk12)
        print(f"keyless 12w index build: {time.perf_counter()-t0:.2f}s",
              flush=True)

        def ext():
            return s2.bounds_batch_merge(t_dev, jnp.int32(n_txt), sa32,
                                         jnp.int32(n_txt), fence12, blk12,
                                         q_dev, ql_dev, nit, 64)

        try:
            sync(ext()[0])
            dt_ext = amortized(lambda: ext()[0], sync, n_iter=4)
            print(f"EXT-12w battery 16k: {dt_ext*1e3:.1f} ms -> "
                  f"{nq/dt_ext:.0f} q/s", flush=True)
            s_f, c_f = full()
            s_e, c_e = ext()
            ok = bool(np.array_equal(np.asarray(s_f), np.asarray(s_e))
                      and np.array_equal(np.asarray(c_f), np.asarray(c_e)))
            print(f"ext parity vs full: {ok}", flush=True)
        except Exception as e:
            print(f"EXT failed: {type(e).__name__}: {e}", flush=True)

        # batch scaling on the 6w engine: is the fence sort the floor?
        for k in (15, 17, 18):
            nqk = 1 << k
            reps = -(-nqk // nq)
            qk_np = np.tile(qtxt, (reps, 1))[:nqk]
            lk_np = np.tile(lens_q, reps)[:nqk]
            qk_dev = jnp.asarray(qk_np)
            lk_dev = jnp.asarray(lk_np.astype(np.int32))

            def fk():
                return s2.bounds_batch_merge(t_dev, jnp.int32(n_txt),
                                             sa32, jnp.int32(n_txt),
                                             fence, blk, qk_dev, lk_dev,
                                             nit, 64)

            sync(fk()[0])
            dt_k = amortized(lambda: fk()[0], sync, n_iter=3)
            print(f"batch 2^{k}: {dt_k*1e3:.1f} ms -> {nqk/dt_k:.0f} q/s",
                  flush=True)
        return

    if section == "nearrep2" or section == "nearrep":
        from suffix_tpu.ops.prefix_doubling import device_build_closure

        fixture = (pathlib.Path(__file__).parents[1] / "tests" /
                   "fixtures" / "AP009048_100000.fasta").read_bytes()
        rep_u8 = np.frombuffer((fixture * 45)[: 1 << 22], np.uint8)
        mut_u8 = rep_u8.copy()
        mut_u8[np.random.default_rng(1).integers(0, 1 << 22, 16)] ^= 1
        build, label = device_build_closure(mut_u8, 1 << 22)
        print(f"near-repeated engine: {label}", flush=True)
        t0 = time.perf_counter()
        sa = build()
        sync(sa)
        print(f"cold: {time.perf_counter()-t0:.2f}s", flush=True)
        dt = amortized(build, sync)
        print(f"amortized: {dt*1e3:.1f} ms -> {(1<<22)/dt/1e6:.1f} MB/s",
              flush=True)
        from suffix_tpu import native

        if native.available():
            t0 = time.perf_counter()
            ref = native.sais(mut_u8.tobytes())
            print(f"native sais: {time.perf_counter()-t0:.2f}s", flush=True)
            got = np.asarray(sa)[: 1 << 22].astype(np.uint32)
            print(f"parity vs native: {np.array_equal(got, ref)}",
                  flush=True)
        # also the exact repeated fixture for reference
        build_r, label_r = device_build_closure(rep_u8, 1 << 22)
        sync(build_r())
        dt_r = amortized(build_r, sync)
        print(f"exact repeated [{label_r}]: {dt_r*1e3:.1f} ms -> "
              f"{(1<<22)/dt_r/1e6:.1f} MB/s", flush=True)
        return

    print(f"unknown section {section}", flush=True)


def small():
    import time

    from suffix_tpu import SuffixTable, native

    if not native.available():
        print("native unavailable", flush=True)
        return
    native.sais(b"warm")
    n_small = 20000
    t0 = time.perf_counter()
    for _ in range(n_small):
        native.sais(b"mississippi")
    print(f"native.sais(mississippi): "
          f"{(time.perf_counter()-t0)/n_small*1e9:.0f} ns", flush=True)
    t0 = time.perf_counter()
    for _ in range(n_small):
        SuffixTable.new(b"mississippi", engine="native")
    print(f"SuffixTable.new(native): "
          f"{(time.perf_counter()-t0)/n_small*1e9:.0f} ns", flush=True)
    t0 = time.perf_counter()
    for _ in range(n_small):
        SuffixTable.new(b"mississippi", engine="auto")
    print(f"SuffixTable.new(auto): "
          f"{(time.perf_counter()-t0)/n_small*1e9:.0f} ns", flush=True)
    fixture = (pathlib.Path(__file__).parents[1] / "tests" / "fixtures" /
               "AP009048_100000.fasta").read_bytes()
    st = SuffixTable.new(fixture, engine="native")
    st.query_route = "host"
    pat = fixture[5000:5014]
    st.positions(pat)
    pos_fn = st.positions
    t0 = time.perf_counter()
    for _ in range(n_small):
        pos_fn(pat)
    print(f"positions(14B, bound): "
          f"{(time.perf_counter()-t0)/n_small*1e9:.0f} ns", flush=True)


if __name__ == "__main__":
    main()
