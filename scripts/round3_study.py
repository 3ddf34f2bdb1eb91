"""Round-3 measurement battery (VERDICT r2 items 1, 2, 3, 6).

Sections (run each alone on an otherwise-idle box; TPU sections never
overlap another TPU process):

  bw        — achievable HBM bandwidth: Pallas copy kernel vs XLA
              elementwise vs lax.sort, 1 and 5 int32 operands at 4M.
              Decides whether a Pallas sort has real headroom or the
              box is bandwidth-capped (ARCHITECTURE.md "sorts near
              bandwidth" was inferred from XLA numbers only).
  repeated  — the repetitive-corpus engine shootout ON TPU (VERDICT
              says the round-1 "SA-IS loses" call was a 256 KB CPU
              microbench): doubling vs suffix_array_sais_recursive vs
              the sais hybrid on the 4 MiB repeated fixture, plus
              _derive_sa isolated.
  native    — trustworthy same-box CPU baselines: median of >=5 runs,
              per corpus class (random 4M, repeated 4M, random 64M).
  stages64  — stage-by-stage cost of the 64 MiB build (initial sort,
              invert, quadrupling round, cumsum) to locate the gap
              between 68 MB/s and the stage-sum floor.
  crossover — native CPU build vs WARM device build latency at
              64K/256K/1M/4M (drives AUTO_NATIVE_MAX, table.py).

Usage: python scripts/round3_study.py <section> [...]
"""
from __future__ import annotations

import json
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


def walled(fn, n_iter=5):
    """Median wall-clock of a host-stepped pipeline (syncs inside)."""
    fn()  # warm/compile
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def emit(**kv):
    print(json.dumps(kv), flush=True)


def fixture_bytes():
    import pathlib
    p = (pathlib.Path(__file__).parent.parent / "tests" / "fixtures"
         / "AP009048_100000.fasta")
    return p.read_bytes()


# ---------------------------------------------------------------- bw --
def section_bw():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 1 << 22
    rng = np.random.default_rng(3)
    mk = lambda: jnp.asarray(
        rng.integers(0, 1 << 22, size=n, dtype=np.int32))
    xs = tuple(mk() for _ in range(5))
    sync(xs[-1])
    emit(section="bw", device=str(jax.devices()[0]), n=n)

    # XLA elementwise, 1 and 5 operands (the round-2 reference points).
    @jax.jit
    def copy1(a):
        return a + 1

    @jax.jit
    def copy5(a, b, c, d, e):
        return a + 1, b + 1, c + 1, d + 1, e + 1

    t1 = amortized(lambda: copy1(xs[0]))
    t5 = amortized(lambda: copy5(*xs))
    emit(op="xla_copy1", ms=round(t1 * 1e3, 3),
         gbps=round(2 * 4 * n / t1 / 1e9, 1))
    emit(op="xla_copy5", ms=round(t5 * 1e3, 3),
         gbps=round(10 * 4 * n / t5 / 1e9, 1))

    # Pallas copy kernel, blocked (R,128) int32, grid-pipelined.
    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    R = n // 128
    BR = 2048  # 2048*128*4 = 1 MiB per block

    def pallas_copy(x):
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    pc1 = jax.jit(lambda a: pallas_copy(a.reshape(R, 128)))
    t = amortized(lambda: pc1(xs[0]))
    emit(op="pallas_copy1", ms=round(t * 1e3, 3),
         gbps=round(2 * 4 * n / t / 1e9, 1))

    def copy_kernel5(a, b, c, d, e, oa, ob, oc, od, oe):
        oa[:] = a[:]
        ob[:] = b[:]
        oc[:] = c[:]
        od[:] = d[:]
        oe[:] = e[:]

    BR5 = 512  # 5 in + 5 out + double buffering must fit 16M VMEM
    def pallas_copy5(*arrs):
        spec = pl.BlockSpec((BR5, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            copy_kernel5,
            out_shape=tuple(jax.ShapeDtypeStruct((R, 128), jnp.int32)
                            for _ in range(5)),
            grid=(R // BR5,),
            in_specs=[spec] * 5,
            out_specs=tuple([spec] * 5),
        )(*arrs)

    pc5 = jax.jit(lambda *a: pallas_copy5(*(x.reshape(R, 128) for x in a)))
    t = amortized(lambda: pc5(*xs))
    emit(op="pallas_copy5", ms=round(t * 1e3, 3),
         gbps=round(10 * 4 * n / t / 1e9, 1))

    # VPU sustained throughput inside VMEM: K compare-exchange stages on
    # the resident block (what a fused in-VMEM bitonic stage costs).
    K = 16

    def vpu_kernel(x_ref, o_ref):
        v = x_ref[:]
        for s in range(K):
            w = pltpu.roll(v, shift=1 + s, axis=0)
            lo = jnp.minimum(v, w)
            hi = jnp.maximum(v, w)
            v = jnp.where((jax.lax.broadcasted_iota(
                jnp.int32, v.shape, 0) & 1) == 0, lo, hi)
        o_ref[:] = v

    def pallas_vpu(x):
        return pl.pallas_call(
            vpu_kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    pv = jax.jit(lambda a: pallas_vpu(a.reshape(R, 128)))
    t = amortized(lambda: pv(xs[0]))
    emit(op=f"pallas_minmax_x{K}", ms=round(t * 1e3, 3),
         stage_ms=round(t * 1e3 / K, 3),
         el_per_s_per_stage=round(n * K / t / 1e9, 2))

    # lax.sort reference points in the same process.
    @jax.jit
    def sort5(a, b, c, d, e):
        return jax.lax.sort((a, b, c, d, e), num_keys=4, is_stable=False)

    t = amortized(lambda: sort5(*xs))
    emit(op="lax_sort5", ms=round(t * 1e3, 3))

    @jax.jit
    def sort2(a, b):
        return jax.lax.sort((a, b), num_keys=1, is_stable=False)

    t = amortized(lambda: sort2(xs[0], xs[1]))
    emit(op="lax_sort2", ms=round(t * 1e3, 3))


# ---------------------------------------------------------- repeated --
def section_repeated():
    from suffix_tpu.ops.padding import PAD
    from suffix_tpu.ops.prefix_doubling import _suffix_array_padded
    from suffix_tpu.ops import sais as sais_mod

    fx = fixture_bytes()
    n = 1 << 22
    rep = np.frombuffer((fx * 45)[:n], np.uint8)
    rng = np.random.default_rng(0xD4A)
    rnd = (rng.integers(0, 4, size=n, dtype=np.uint8) + 97)
    emit(section="repeated", device=str(jax.devices()[0]), n=n)

    for name, corpus in (("repeated", rep), ("random_dna", rnd)):
        t_dev = jnp.asarray(corpus.astype(np.int32))
        sync(t_dev)
        dt = amortized(lambda: _suffix_array_padded(t_dev), n_iter=8)
        emit(engine="doubling", corpus=name, s=round(dt, 4),
             MBps=round(n / dt / 1e6, 2))

        # Stratified derive alone, fed doubling's LMS ranks (the hybrid
        # engine end-to-end = doubling + this, so this isolates it).
        lr = sais_mod._lms_class_rank_from_doubling(t_dev)
        sync(lr)
        dt = amortized(lambda: sais_mod._derive_sa(t_dev, lr), n_iter=4)
        emit(engine="derive_sa_only", corpus=name, s=round(dt, 4),
             MBps=round(n / dt / 1e6, 2))

        # Substring-rank + naming pass alone (level-0 reduction cost).
        dt = amortized(
            lambda: sais_mod._lms_substring_ranks_jit(t_dev)[0], n_iter=4)
        emit(engine="lms_substring_ranks", corpus=name, s=round(dt, 4))

    # Full recursive engine, wall-clock (host-stepped, includes
    # transfers — the honest end-to-end number).
    data = rep.tobytes()
    stats = {}
    dt = walled(lambda: sais_mod.suffix_array_sais_recursive(data,
                                                             stats=stats),
                n_iter=3)
    emit(engine="sais_recursive", corpus="repeated", s=round(dt, 4),
         MBps=round(n / dt / 1e6, 2), depth=stats.get("depth"))

    # And doubling through the same bytes-in/bytes-out wall-clock path.
    from suffix_tpu.ops.prefix_doubling import suffix_array_bytes
    dt = walled(lambda: suffix_array_bytes(data), n_iter=3)
    emit(engine="doubling_wall", corpus="repeated", s=round(dt, 4),
         MBps=round(n / dt / 1e6, 2))


# ------------------------------------------------------------ native --
def section_native():
    from suffix_tpu import native

    fx = fixture_bytes()
    emit(section="native")
    cases = [
        ("random_4M", np.random.default_rng(0xD4A).integers(
            0, 4, size=1 << 22, dtype=np.uint8) + 97, 5),
        ("repeated_4M", np.frombuffer((fx * 45)[:1 << 22], np.uint8), 5),
        ("random_64M", np.random.default_rng(1).integers(
            0, 4, size=1 << 26, dtype=np.uint8) + 97, 3),
    ]
    for name, arr, iters in cases:
        data = arr.tobytes()
        native.sais(data[: 1 << 16])  # load/warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            native.sais(data)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        emit(corpus=name, n=len(data), s=round(med, 3),
             MBps=round(len(data) / med / 1e6, 2),
             spread=[round(t, 3) for t in sorted(times)])


# ---------------------------------------------------------- stages64 --
def section_stages64():
    from suffix_tpu.ops.prefix_doubling import (_suffix_array_padded,
                                                _initial_words,
                                                pick_init_words)

    emit(section="stages64", device=str(jax.devices()[0]))
    for logn in (22, 26):
        n = 1 << logn
        rng = np.random.default_rng(7)
        corpus = (rng.integers(0, 4, size=n, dtype=np.uint8) + 97).astype(
            np.int32)
        t_dev = jnp.asarray(corpus)
        sync(t_dev)
        iw = pick_init_words(n)
        n_iter = 8 if logn == 22 else 3

        dt = amortized(lambda: _suffix_array_padded(t_dev, iw),
                       n_iter=n_iter)
        emit(n=n, stage="full_build", init_words=iw, ms=round(dt * 1e3, 2),
             MBps=round(n / dt / 1e6, 1))

        words = jax.jit(_initial_words, static_argnums=1)(t_dev, iw)
        sync(words)
        idx = jnp.arange(n, dtype=jnp.int32)

        @jax.jit
        def init_sort(ws, idx):
            return jax.lax.sort(tuple(ws) + (idx,), num_keys=len(ws),
                                is_stable=False)

        dt = amortized(lambda: init_sort(words, idx), n_iter=n_iter)
        emit(n=n, stage=f"initial_sort_{iw}w", ms=round(dt * 1e3, 2))

        @jax.jit
        def invert(sa, vals):
            return jax.lax.sort((sa, vals), num_keys=1, is_stable=False)

        dt = amortized(lambda: invert(idx, idx), n_iter=n_iter)
        emit(n=n, stage="invert_keysort", ms=round(dt * 1e3, 2))

        rk = jnp.asarray(rng.permutation(n).astype(np.int32))
        s1 = jnp.roll(rk, -9)
        s2 = jnp.roll(rk, -18)
        s3 = jnp.roll(rk, -27)
        sync(s3)

        @jax.jit
        def round_sort(a, b, c, d, idx):
            return jax.lax.sort((a, b, c, d, idx), num_keys=4,
                                is_stable=False)

        dt = amortized(lambda: round_sort(rk, s1, s2, s3, idx),
                       n_iter=n_iter)
        emit(n=n, stage="round_sort_5op", ms=round(dt * 1e3, 2))

        @jax.jit
        def densify(a, b, c, d):
            diff = ((a[1:] != a[:-1]) | (b[1:] != b[:-1])
                    | (c[1:] != c[:-1]) | (d[1:] != d[:-1]))
            flag = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), diff.astype(jnp.int32)])
            return jnp.cumsum(flag)

        dt = amortized(lambda: densify(rk, s1, s2, s3), n_iter=n_iter)
        emit(n=n, stage="densify_cumsum", ms=round(dt * 1e3, 2))


# --------------------------------------------------------- crossover --
def section_crossover():
    from suffix_tpu import native
    from suffix_tpu.ops.padding import PAD, bucket_size
    from suffix_tpu.ops.prefix_doubling import (_suffix_array_padded,
                                                pick_init_words)

    emit(section="crossover", device=str(jax.devices()[0]))
    rng = np.random.default_rng(5)
    for logn in (16, 18, 20, 22):
        n = 1 << logn
        arr = (rng.integers(0, 4, size=n, dtype=np.uint8) + 97)
        data = arr.tobytes()
        native.sais(data[:1024])
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            native.sais(data)
            times.append(time.perf_counter() - t0)
        t_native = float(np.median(times))

        n_pad = bucket_size(n)
        padded = np.full((n_pad,), PAD, np.int32)
        padded[:n] = arr
        t_dev = jnp.asarray(padded)
        sync(t_dev)
        iw = pick_init_words(n_pad)
        # Warm-device latency INCLUDING one host->device upload + sync
        # (what SuffixTable.new actually pays on the device route).
        def device_build():
            td = jnp.asarray(padded)
            sa = _suffix_array_padded(td, iw)
            return np.asarray(sa)

        device_build()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            device_build()
            times.append(time.perf_counter() - t0)
        t_device = float(np.median(times))
        emit(n=n, native_ms=round(t_native * 1e3, 2),
             device_wall_ms=round(t_device * 1e3, 2),
             winner="native" if t_native < t_device else "device")


# ---------------------------------------------------------- widesort --
def section_widesort():
    """One-shot wide initial sort vs sort+round: for corpora whose max
    LCP is below 3*init_words the build is a single sort with no invert,
    no quadrupling round, and one densify. Candidate policy: estimate
    max LCP as 2*log_sigma(n) + slack from a host-side alphabet sample
    (DNA at 64M needs ~26 chars -> 10 words; random bytes need ~7 -> the
    existing 3)."""
    from suffix_tpu.ops.prefix_doubling import _suffix_array_padded

    emit(section="widesort", device=str(jax.devices()[0]))
    rng = np.random.default_rng(7)
    for logn in (22, 26):
        n = 1 << logn
        corpus = (rng.integers(0, 4, size=n, dtype=np.uint8) + 97).astype(
            np.int32)
        t_dev = jnp.asarray(corpus)
        sync(t_dev)
        n_iter = 8 if logn == 22 else 3
        for iw in (2, 3, 10, 11):
            dt = amortized(
                lambda iw=iw: _suffix_array_padded(t_dev, iw),
                n_iter=n_iter)
            emit(n=n, init_words=iw, ms=round(dt * 1e3, 2),
                 MBps=round(n / dt / 1e6, 1))


# ------------------------------------------------------- sortentropy --
def section_sortentropy():
    """Is lax.sort cost entropy-dependent? The 4M full build (30 ms)
    costs far less than its stage sum over random-key microbenches
    (75 ms), suggesting the TPU sort exploits low-entropy keys. If so,
    sorting raw char codes is fundamentally cheaper than sorting dense
    ranks, and wide low-entropy initial sorts beat extra rounds."""
    emit(section="sortentropy", device=str(jax.devices()[0]))
    rng = np.random.default_rng(11)

    @jax.jit
    def sort5(a, b, c, d, e):
        return jax.lax.sort((a, b, c, d, e), num_keys=4, is_stable=False)

    for logn in (22, 26):
        n = 1 << logn
        idx = jnp.arange(n, dtype=jnp.int32)
        n_iter = 8 if logn == 22 else 3
        for hi, label in ((4, "2bit"), (1 << 9, "9bit"),
                          ((1 << 18), "18bit"), ((1 << 27), "27bit")):
            emit(progress=f"sortentropy n=2^{logn} {label} uploading")
            ops = tuple(jnp.asarray(rng.integers(
                0, hi, size=n, dtype=np.int32)) for _ in range(4))
            sync(ops[-1])
            emit(progress=f"sortentropy n=2^{logn} {label} measuring")
            dt = amortized(lambda: sort5(*ops, idx), n_iter=n_iter)
            emit(n=n, keys=label, ms=round(dt * 1e3, 2))


# --------------------------------------------------------- densepack --
def section_densepack():
    """One-shot build with DENSE-CODED initial words: for a sigma-letter
    alphabet each char needs ceil(log2(sigma+1)) bits, so one int32 word
    carries floor(30/bits) chars — DNA gets 10 chars/word instead of 3.
    Sorting (w1..wW, idx) with 3W' chars > max LCP finishes the build in
    ONE sort with no invert and no quadrupling round. Prototype measured
    against the production engine at 4M/64M on random DNA."""
    from suffix_tpu.ops.prefix_doubling import _suffix_array_padded

    emit(section="densepack", device=str(jax.devices()[0]))
    rng = np.random.default_rng(7)

    def build_dense(text, n_words, bits, cpw):
        # text: int32, PAD=-1; DNA codes 1..4 (0 = past-end sentinel).
        n = text.shape[0]
        code = jnp.where(text < 0, 0, text - 96)  # 'a'=97 -> 1..4, pad -> 0
        ext = jnp.concatenate(
            [code, jnp.zeros((n_words * cpw - 1,), jnp.int32)])
        words = []
        for w in range(n_words):
            acc = jnp.zeros((n,), jnp.int32)
            for j in range(cpw):
                acc = (acc << bits) | jax.lax.dynamic_slice(
                    ext, (w * cpw + j,), (n,))
            words.append(acc)
        idx = jnp.arange(n, dtype=jnp.int32)
        srt = jax.lax.sort(tuple(words) + (idx,), num_keys=n_words,
                           is_stable=False)
        return srt[-1]

    build_dense_jit = jax.jit(build_dense, static_argnums=(1, 2, 3))

    for logn in (22, 26):
        n = 1 << logn
        corpus = (rng.integers(0, 4, size=n, dtype=np.uint8) + 97).astype(
            np.int32)
        t_dev = jnp.asarray(corpus)
        sync(t_dev)
        n_iter = 8 if logn == 22 else 3
        # 3 bits/char, 10 chars/word; words to cover ~2*log4(n)+12 chars.
        est = 2 * (logn // 2) + 12
        n_words = -(-est // 10)
        sa = build_dense_jit(t_dev, n_words, 3, 10)
        # Correctness spot check vs production engine.
        sa_ref = _suffix_array_padded(t_dev)
        ok = bool(jnp.array_equal(sa, sa_ref))
        dt = amortized(lambda: build_dense_jit(t_dev, n_words, 3, 10),
                       n_iter=n_iter)
        emit(n=n, engine="densepack_oneshot", words=n_words,
             chars=n_words * 10, ms=round(dt * 1e3, 2),
             MBps=round(n / dt / 1e6, 1), matches_production=ok)


SECTIONS = {
    "bw": section_bw,
    "repeated": section_repeated,
    "native": section_native,
    "stages64": section_stages64,
    "crossover": section_crossover,
    "widesort": section_widesort,
    "sortentropy": section_sortentropy,
    "densepack": section_densepack,
}

if __name__ == "__main__":
    import traceback

    for name in sys.argv[1:]:
        try:
            SECTIONS[name]()
        except Exception:
            traceback.print_exc()
            emit(section=name, error="failed, see traceback above")
