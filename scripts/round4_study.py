"""Round-4 measurement study (real TPU). Run sections INDIVIDUALLY with
generous timeouts and redirect output to a file (tail through a killed
pipe loses everything):

    python scripts/round4_study.py repeat  > /tmp/r4_repeat.log 2>&1
    python scripts/round4_study.py text16  > /tmp/r4_text16.log 2>&1
    python scripts/round4_study.py text128 > /tmp/r4_text128.log 2>&1
    python scripts/round4_study.py d1      > /tmp/r4_d1.log 2>&1

Sections:
  repeat    — the 4 MiB repeated fixture: initial-word width ladder for
              the dense-coded first sort (the h0=40 vs 70 vs 80 round
              question, VERDICT r3 next-round #5) + parity.
  text16/
  text128   — enwik8-class corpus: engine routing (adaptive 7-bit vs
              byte ladder), build, LCP survivor census + bulk engine,
              10k mixed-length query battery, CPU baselines.
  textlcp16/
  textlcp128 — focused LCP-only re-measurement (bulk ladder vs Kasai,
              per-stage verbose breakdown).
  twophase  — production two-phase route vs classic on text/repeated/
              DNA at 16 MiB-128 MiB (+ parity).
  periodic  — closed-form periodic engine vs doubling on the repeated
              fixture, plus the near-periodic fall-through.
  stride32  — fence-stride ladder with split fence-sort/block-count
              attribution at 4 MiB ("stride32-26": the 64 MiB point).
  d1        — SPMD sharded build on a 1-device mesh vs the single-chip
              engine at 64 MiB: wall + device-only overhead anchors
              (VERDICT #7) + staging-path comparison.
"""

from __future__ import annotations

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


def main():
    section = sys.argv[1] if len(sys.argv) > 1 else "repeat"
    from suffix_tpu.utils.platform import setup_compilation_cache, sync

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from suffix_tpu.ops import prefix_doubling as pd
    from suffix_tpu.ops import search2 as s2

    print("devices:", jax.devices(), flush=True)

    def load_fixture():
        import pathlib
        p = (pathlib.Path(__file__).parents[1] / "tests" / "fixtures"
             / "AP009048_100000.fasta")
        return p.read_bytes()

    if section == "repeat":
        fixture = load_fixture()
        rep_u8 = np.frombuffer((fixture * 45)[: 1 << 22], np.uint8)
        n = rep_u8.size
        plan = pd._adaptive_plan(rep_u8, n)
        print("plan:", None if plan is None else plan[1:], flush=True)
        lut, bits, cpw, n_words_auto = plan
        codes = np.zeros((n,), np.int32)
        codes[:] = lut[rep_u8]
        c_dev = jnp.asarray(codes)
        sync(c_dev)
        golden = None
        for w in (4, 5, 6, 7, 8):
            fn = lambda w=w: pd._suffix_array_packed(c_dev, w, bits, cpw)
            sync(fn())
            dt = amortized(fn, sync)
            print(f"  words={w} (h0={cpw*w}): {dt*1e3:8.1f} ms "
                  f"({n/dt/1e6:6.1f} MB/s)"
                  f"{'  <-- auto' if w == n_words_auto else ''}", flush=True)
            if golden is None:
                golden = np.asarray(fn())
            else:
                assert np.array_equal(golden, np.asarray(fn())), w
        print("parity: all widths identical", flush=True)
        return

    if section in ("text16", "text128"):
        from suffix_tpu.utils.textgen import text_corpus, corpus_stats

        n = 1 << (24 if section == "text16" else 27)
        t0 = time.perf_counter()
        arr = text_corpus(n)
        print(f"gen: {time.perf_counter()-t0:.1f}s {corpus_stats(arr)}",
              flush=True)
        plan = pd._adaptive_plan(arr, n)
        print("plan:", None if plan is None else plan[1:], flush=True)

        # Build: the routed engine (adaptive if plan) AND the byte ladder.
        if plan is not None:
            lut, bits, cpw, n_words = plan
            codes = np.zeros((n,), np.int32)
            codes[:arr.size] = lut[arr]
            c_dev = jnp.asarray(codes)
            sync(c_dev)
            fn_a = lambda: pd._suffix_array_packed(c_dev, n_words, bits, cpw)
            t0 = time.perf_counter()
            sa = fn_a()
            sync(sa)
            print(f"adaptive first-run (compile+run): "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            dt = amortized(fn_a, sync, n_iter=4)
            print(f"adaptive({bits}b x {cpw*n_words}ch): {dt*1e3:8.1f} ms "
                  f"({n/dt/1e6:6.1f} MB/s)", flush=True)
        padded = np.full((n,), pd.PAD, np.int32)
        padded[:arr.size] = arr
        t_dev = jnp.asarray(padded)
        sync(t_dev)
        iw = pd.pick_init_words(n)
        fn_b = lambda: pd._suffix_array_padded(t_dev, iw)
        t0 = time.perf_counter()
        sa_b = fn_b()
        sync(sa_b)
        print(f"ladder first-run (compile+run): {time.perf_counter()-t0:.1f}s",
              flush=True)
        dt_b = amortized(fn_b, sync, n_iter=4)
        print(f"ladder({iw}w): {dt_b*1e3:8.1f} ms ({n/dt_b/1e6:6.1f} MB/s)",
              flush=True)
        if plan is not None:
            assert np.array_equal(np.asarray(sa), np.asarray(sa_b))
            print("parity: adaptive == ladder", flush=True)

        # CPU SA-IS baseline (median of 3 at 16 MiB, 1 run at 128 MiB).
        from suffix_tpu import native
        iters = 3 if section == "text16" else 1
        times = []
        data = arr.tobytes()
        for _ in range(iters):
            t0 = time.perf_counter()
            native.sais(data)
            times.append(time.perf_counter() - t0)
        print(f"native cpu sais: {n/np.median(times)/1e6:6.2f} MB/s",
              flush=True)

        # LCP: survivor census + the auto engine end to end.
        from suffix_tpu.ops import lcp as lcp_ops
        sa32 = (sa_b if plan is None else sa).astype(jnp.int32)
        pk, _, _, _ = s2.build_query_index(t_dev, sa32, jnp.int32(n),
                                           stride=1)
        sync(pk[0])
        n_surv = int(lcp_ops._survivor_count(tuple(pk), jnp.int32(n)))
        print(f"LCP survivors (pairs with LCP>=18): {n_surv} "
              f"({n_surv/n*100:.2f}% of n)", flush=True)
        # Staged BULK engine (the auto route for this class).
        t0 = time.perf_counter()
        bulk = lcp_ops._lcp_bulk(t_dev, n, sa32, tuple(pk))
        print(f"bulk LCP first-run (compile+run): "
              f"{time.perf_counter()-t0:.1f}s "
              f"{'(budget exhausted)' if bulk is None else ''}", flush=True)
        if bulk is not None:
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                bulk = lcp_ops._lcp_bulk(t_dev, n, sa32, tuple(pk))
                times.append(time.perf_counter() - t0)
            dt_l = float(np.median(times))
            print(f"bulk LCP: {dt_l*1e3:8.1f} ms ({n/dt_l/1e6:6.1f} MB/s)",
                  flush=True)
        t0 = time.perf_counter()
        kas = native.kasai(data, np.asarray(sa32).astype(np.uint32)[:n])
        print(f"native kasai: {time.perf_counter()-t0:.1f}s", flush=True)
        if bulk is not None:
            assert np.array_equal(bulk, kas)
            print("LCP parity: bulk == kasai", flush=True)

        # 10k mixed-length query battery (incl. >18-byte refine path).
        rng = np.random.default_rng(0xBEEF)
        lengths = rng.choice([4, 8, 14, 24, 40], size=10_000,
                             p=[.25, .25, .25, .15, .10])
        starts = rng.integers(0, n - 64, size=10_000)
        m_pad = 64
        qarr = np.zeros((16384, m_pad), np.int32)
        qlens = np.zeros((16384,), np.int32)
        for i, (st_, l) in enumerate(zip(starts, lengths)):
            qarr[i, :l] = arr[st_:st_ + l]
            qlens[i] = l
        pkq, fence, blk, _ = s2.build_query_index(
            t_dev, sa32, jnp.int32(n),
            with_keys=(n <= (1 << 26)))
        sync(fence)
        args = (t_dev, jnp.int32(n), sa32, jnp.int32(n), fence, blk,
                jnp.asarray(qarr), jnp.asarray(qlens),
                (n + 1).bit_length(), m_pad)
        t0 = time.perf_counter()
        sync(s2.bounds_batch_merge(*args)[0])
        print(f"query battery first-run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        dt_q = amortized(lambda: s2.bounds_batch_merge(*args)[0], sync,
                         n_iter=8)
        print(f"10k mixed battery: {dt_q*1e3:8.1f} ms "
              f"({10_000/dt_q:,.0f} q/s incl. refine; batch shape 16384)",
              flush=True)
        # Spot-check bounds vs native.
        st_host, ct_host = (np.asarray(x) for x in
                            s2.bounds_batch_merge(*args))
        qs = [bytes(arr[s:s + l]) for s, l in zip(starts[:200],
                                                  lengths[:200])]
        ns_, nc_ = native.bounds_batch(data, np.asarray(sa32)[:n].astype(
            np.uint32), qs)
        assert np.array_equal(st_host[:200], ns_.astype(np.int64) \
            .astype(st_host.dtype))
        assert np.array_equal(ct_host[:200], nc_.astype(ct_host.dtype))
        print("query parity: 200-sample bounds == native", flush=True)
        return

    if section == "periodic":
        # Closed-form periodic engine vs the doubling engines on the
        # repeated fixture (exactly periodic, q=100001) + parity.
        fixture = load_fixture()
        rep_u8 = np.frombuffer((fixture * 45)[:1 << 22], np.uint8)
        n = rep_u8.size
        disp, label = pd.device_build_closure(rep_u8, n)
        print("route:", label, flush=True)
        t0 = time.perf_counter()
        sa = disp()
        sync(sa)
        print(f"first-run (compile+run): {time.perf_counter()-t0:.1f}s",
              flush=True)
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            sa = disp()
            sync(sa)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(f"periodic: {dt*1e3:8.2f} ms ({n/dt/1e6:7.1f} MB/s)",
              flush=True)
        from suffix_tpu import native
        golden = native.sais(rep_u8.tobytes())
        got = np.asarray(sa).astype(np.uint32)  # n_pad == n here
        assert np.array_equal(got, golden)
        print("parity: periodic == native SA-IS", flush=True)
        # Near-periodic (16 mutations): must fall through to doubling.
        mut = rep_u8.copy()
        idxs = np.random.default_rng(1).integers(0, n, 16)
        mut[idxs] ^= 1
        disp2, label2 = pd.device_build_closure(mut, n)
        print("near-periodic route:", label2, flush=True)
        sync(disp2())
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            sa2 = disp2()
            sync(sa2)
            times.append(time.perf_counter() - t0)
        dt2 = float(np.median(times))
        print(f"near-periodic: {dt2*1e3:8.1f} ms ({n/dt2/1e6:6.1f} MB/s)",
              flush=True)
        assert np.array_equal(np.asarray(sa2).astype(np.uint32),
                              native.sais(mut.tobytes()))
        print("parity: near-periodic == native SA-IS", flush=True)
        return

    if section == "twophase":
        # Production-route (two-phase) vs classic engine, device input
        # staged once; the two-phase driver's per-round scalar syncs are
        # part of its honest cost.
        from suffix_tpu.utils.textgen import text_corpus

        def measure(label, arr):
            n = arr.size
            plan = pd._adaptive_plan(arr, n)
            m_cap = n // pd.TIE_CAP_FRAC
            if plan is not None:
                lut, bits, cpw, n_words = plan
                codes = np.zeros((n,), np.int32)
                codes[:] = lut[arr]
                dev = jnp.asarray(codes)
                sync(dev)
                classic = lambda: pd._suffix_array_packed(
                    dev, n_words, bits, cpw)
                two = lambda: pd._two_phase_build(
                    pd._phase1_packed(dev, n_words, bits, cpw, jnp.int32,
                                      m_cap), n)
                eng = f"adaptive({bits}b x {cpw*n_words}ch)"
            else:
                padded = np.full((n,), pd.PAD, np.int32)
                padded[:n] = arr
                dev = jnp.asarray(padded)
                sync(dev)
                iw = pd.pick_init_words(n)
                classic = lambda: pd._suffix_array_padded(dev, iw)
                two = lambda: pd._two_phase_build(
                    pd._phase1_padded(dev, iw, jnp.int32, m_cap), n)
                eng = f"ladder({iw}w)"
            t0 = time.perf_counter()
            sa_t = two()
            sync(sa_t)
            print(f"{label} two-phase first-run ({eng}): "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                sa_t = two()
                sync(sa_t)
                times.append(time.perf_counter() - t0)
            dt2 = float(np.median(times))
            sync(classic())
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                sa_c = classic()
                sync(sa_c)
                times.append(time.perf_counter() - t0)
            dtc = float(np.median(times))
            print(f"{label}: two-phase {dt2*1e3:8.1f} ms "
                  f"({n/dt2/1e6:6.1f} MB/s) vs classic {dtc*1e3:8.1f} ms "
                  f"({n/dtc/1e6:6.1f} MB/s) -> {dtc/dt2:.2f}x", flush=True)
            assert np.array_equal(np.asarray(sa_t), np.asarray(sa_c)), label
            print(f"{label}: parity ok", flush=True)

        measure("text 16MiB", text_corpus(1 << 24))
        fixture = load_fixture()
        measure("repeated 4MiB",
                np.frombuffer((fixture * 45)[:1 << 22], np.uint8))
        rng = np.random.default_rng(0xD4A)
        measure("dna 64MiB", rng.integers(0, 4, size=1 << 26,
                                          dtype=np.uint8) + 97)
        measure("text 128MiB", text_corpus(1 << 27))
        return

    if section in ("textlcp16", "textlcp128"):
        # Focused LCP-only re-measurement (after bulk-engine changes).
        from suffix_tpu.utils.textgen import text_corpus
        from suffix_tpu.ops import lcp as lcp_ops
        from suffix_tpu import native

        n = 1 << (24 if section == "textlcp16" else 27)
        arr = text_corpus(n)
        padded = arr.astype(np.int32)
        t_dev = jnp.asarray(padded)
        sync(t_dev)
        plan = pd._adaptive_plan(arr, n)
        if plan is not None:
            lut, bits, cpw, n_words = plan
            codes = np.zeros((n,), np.int32)
            codes[:] = lut[arr]
            sa32 = pd._suffix_array_packed(jnp.asarray(codes), n_words,
                                           bits, cpw).astype(jnp.int32)
        else:
            sa32 = pd._suffix_array_padded(
                t_dev, pd.pick_init_words(n)).astype(jnp.int32)
        sync(sa32)
        pk, _, _, _ = s2.build_query_index(t_dev, sa32, jnp.int32(n),
                                           stride=1)
        sync(pk[0])
        n_surv = int(lcp_ops._survivor_count(tuple(pk), jnp.int32(n)))
        print(f"survivors: {n_surv} ({n_surv/n*100:.2f}%)", flush=True)
        t0 = time.perf_counter()
        bulk = lcp_ops._lcp_bulk(t_dev, n, sa32, tuple(pk), verbose=True)
        print(f"ladder bulk LCP first-run: {time.perf_counter()-t0:.1f}s "
              f"{'(budget exhausted)' if bulk is None else ''}", flush=True)
        if bulk is not None:
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                bulk = lcp_ops._lcp_bulk(t_dev, n, sa32, tuple(pk),
                                         verbose=True)
                times.append(time.perf_counter() - t0)
            dt_l = float(np.median(times))
            print(f"ladder bulk LCP: {dt_l*1e3:8.1f} ms "
                  f"({n/dt_l/1e6:6.1f} MB/s)", flush=True)
        data = arr.tobytes()
        sa_host = np.asarray(sa32)[:n].astype(np.uint32)
        t0 = time.perf_counter()
        kas = native.kasai(data, sa_host)
        print(f"native kasai: {time.perf_counter()-t0:.1f}s", flush=True)
        if bulk is not None:
            assert np.array_equal(bulk, kas)
            print("LCP parity: ladder bulk == kasai", flush=True)
        return

    if section.startswith("stride32"):
        # Localize the stride-32 pathology (search2._fence_stride: "32 is
        # reproducibly pathological at every size"): time the two engine
        # halves separately per stride — the fence sort (scales n/stride)
        # and the blocked row-gather + column compare (_block_count).
        # "stride32-26" runs the 64 MiB point.
        rng = np.random.default_rng(0xD4A)
        n = 1 << (26 if section.endswith("-26") else 22)
        arr = rng.integers(0, 4, size=n, dtype=np.uint8) + 97
        padded = arr.astype(np.int32)
        t_dev = jnp.asarray(padded)
        sync(t_dev)
        sa = pd._suffix_array_padded(t_dev, pd.pick_init_words(n)) \
            .astype(jnp.int32)
        sync(sa)
        n_q = 1 << 18
        qlen = 14
        starts = rng.integers(0, n - qlen, size=n_q)
        qarr = np.stack([padded[s:s + qlen] for s in starts])
        qlens = np.full((n_q,), qlen, np.int32)
        q_dev, ql_dev = jnp.asarray(qarr), jnp.asarray(qlens)

        @jax.jit
        def fences_only(fences, q, ql):
            qk, qk_hi = s2._batch_query_keys(q, ql)
            return s2._fence_ranks_both(list(fences), qk, qk_hi)

        @jax.jit
        def blocks_only(blk, q, ql, blocks_idx):
            qk, _ = s2._batch_query_keys(q, ql)
            return s2._block_count(blk, blocks_idx, qk, less_equal=False)

        strides = ((16, 32, 64, 128) if section.endswith("-26")
                   else (8, 16, 32, 64))
        for stride in strides:
            _, fences, blk, _ = s2.build_query_index(
                t_dev, sa, jnp.int32(n), stride=stride)
            sync(blk)
            dt_f = amortized(
                lambda: fences_only(fences, q_dev, ql_dev)[0], sync)
            bidx = jnp.asarray(
                rng.integers(0, n // stride, size=n_q).astype(np.int32))
            dt_b = amortized(
                lambda: blocks_only(blk, q_dev, ql_dev, bidx), sync)
            full = (t_dev, jnp.int32(n), sa, jnp.int32(n), fences, blk,
                    q_dev, ql_dev, (n + 1).bit_length(), qlen)
            dt_full = amortized(
                lambda: s2.bounds_batch_merge(*full)[0], sync)
            print(f"stride={stride:3d}: fence_sort {dt_f*1e3:7.1f} ms  "
                  f"block_count {dt_b*1e3:7.1f} ms  "
                  f"full {dt_full*1e3:7.1f} ms "
                  f"({n_q/dt_full/1e6:5.2f}M q/s)", flush=True)
        return

    if section == "d1":
        from suffix_tpu.parallel.dist_build import suffix_array_sharded
        from suffix_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(0xD4A)
        n = 1 << 26
        arr = rng.integers(0, 4, size=n, dtype=np.uint8) + 97
        mesh = make_mesh(1)
        t0 = time.perf_counter()
        sa_sh = suffix_array_sharded(arr, mesh)
        print(f"sharded D=1 first-run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sa_sh = suffix_array_sharded(arr, mesh)
            times.append(time.perf_counter() - t0)
        dt_sh = float(np.median(times))
        print(f"sharded D=1: {dt_sh*1e3:8.1f} ms ({n/dt_sh/1e6:6.1f} MB/s)",
              flush=True)
        t0 = time.perf_counter()
        sa_single = pd.suffix_array_bytes(arr)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sa_single = pd.suffix_array_bytes(arr)
            times.append(time.perf_counter() - t0)
        dt_si = float(np.median(times))
        print(f"single-chip:  {dt_si*1e3:8.1f} ms ({n/dt_si/1e6:6.1f} MB/s)",
              flush=True)
        print(f"SPMD D=1 wall overhead (incl. host staging/readback): "
              f"{dt_sh/dt_si:.2f}x", flush=True)
        assert np.array_equal(sa_sh, sa_single)
        print("parity: sharded == single", flush=True)

        # DEVICE-ONLY comparison (the actual SPMD-program overhead):
        # both engines on pre-staged device input, amortized dispatches.
        from suffix_tpu.parallel import dist_build as db
        from suffix_tpu.utils.io import device_corpus

        n_local = db._local_bucket(n, 1)
        n_total = n_local
        plan_full = db._sharded_adaptive_plan(arr, n_total, n_local)
        lut, plan = plan_full
        coded_sh, _ = device_corpus(arr, mesh, n_pad=n_total, lut=lut,
                                    fill=0)
        sync(coded_sh)
        fn_sh = lambda: db._dist_build_jit(coded_sh, n_local, 1, mesh,
                                           plan=plan)
        sync(fn_sh())
        dt_shd = amortized(fn_sh, sync, n_iter=4)
        print(f"sharded D=1 device-only: {dt_shd*1e3:8.1f} ms "
              f"({n/dt_shd/1e6:6.1f} MB/s)", flush=True)
        splan = pd._adaptive_plan(arr, n_total)
        lut1, bits, cpw, n_words = splan
        codes = np.zeros((n_total,), np.int32)
        codes[:n] = lut1[arr]
        c_dev = jnp.asarray(codes)
        sync(c_dev)
        fn_si = lambda: pd._suffix_array_packed(c_dev, n_words, bits, cpw)
        sync(fn_si())
        dt_sid = amortized(fn_si, sync, n_iter=4)
        print(f"single-chip device-only: {dt_sid*1e3:8.1f} ms "
              f"({n/dt_sid/1e6:6.1f} MB/s)", flush=True)
        print(f"SPMD D=1 device overhead: {dt_shd/dt_sid:.2f}x", flush=True)

        # Host-staging path comparison (explains the wall gap): one
        # jnp.asarray of the int32 copy vs the shard-callback route.
        staged = arr.astype(np.int32)
        t0 = time.perf_counter()
        x = jnp.asarray(staged)
        sync(x)
        t_asarray = time.perf_counter() - t0
        t0 = time.perf_counter()
        y, _ = device_corpus(arr, None, n_pad=n_total)
        sync(y)
        t_cb = time.perf_counter() - t0
        print(f"staging 256MB int32: jnp.asarray {t_asarray:.2f}s vs "
              f"callback {t_cb:.2f}s", flush=True)
        return

    raise SystemExit(f"unknown section {section!r}")


if __name__ == "__main__":
    main()
