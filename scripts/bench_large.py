"""North-star config 4: enwik8-scale single-chip stress (BASELINE.json).

Builds a large (default 64 MiB, up to 128 MiB) corpus on the single TPU,
then runs a large batched pattern search over the device index. Prints one
JSON line per stage. The 4 MiB headline lives in bench.py; this script
makes the large-corpus claims in README.md reproducible.

Run alone on the TPU box: python scripts/bench_large.py [--size-mib 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mib", type=int, default=64)
    ap.add_argument("--queries", type=int, default=262_144,
                    help="batched 14-char patterns (0 = skip search)")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from suffix_tpu.utils.platform import setup_compilation_cache, sync
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from suffix_tpu.ops.prefix_doubling import (_adaptive_plan,
                                                _suffix_array_packed,
                                                _suffix_array_padded,
                                                pick_init_words)
    from suffix_tpu.ops import search2 as search_ops

    n = args.size_mib << 20
    assert n & (n - 1) == 0, "size must be a power of two MiB"
    rng = np.random.default_rng(0xB16)
    corpus_u8 = rng.integers(0, 4, size=n, dtype=np.uint8) + 97
    corpus = corpus_u8.astype(np.int32)
    t_dev = jnp.asarray(corpus)
    sync(t_dev)
    # Production routing: the alphabet-adaptive packed engine when the
    # corpus class qualifies (it does for this DNA corpus).
    plan = _adaptive_plan(corpus_u8, n)
    if plan is not None:
        lut, bits, cpw, n_words = plan
        codes = jnp.asarray(lut[corpus_u8].astype(np.int32))
        sync(codes)
        build = lambda: _suffix_array_packed(codes, n_words, bits, cpw)
    else:
        iw = pick_init_words(n)
        build = lambda: _suffix_array_padded(t_dev, iw)

    t0 = time.perf_counter()
    sa = build()
    sync(sa)
    compile_and_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    r = None
    for _ in range(args.iters):
        r = build()
    sync(r)
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "stage": "construct", "size_mib": args.size_mib,
        "seconds": round(dt, 3), "MBps": round(n / dt / 1e6, 1),
        "first_call_s": round(compile_and_first, 1),
        "device": str(jax.devices()[0]),
    }), flush=True)

    if args.queries:
        sa32 = sa.astype(jnp.int32)
        sync(sa32)
        # Drop every client-held build buffer before the index build: the
        # timing copy r, the original-dtype sa, and the packed codes the
        # build closure captured each hold ~n*4 bytes of HBM — at 256 MiB
        # that is 3 GB the query-index build needs back.
        del r, sa, build
        if plan is not None:
            del codes
        # with_keys=False: the merge engine needs only fences + blocks;
        # the flat key copy would OOM the 128 MiB corpus on 16 GB HBM.
        _pk, fence, blk, _ = search_ops.build_query_index(
            t_dev, sa32, jnp.int32(n), with_keys=False)
        sync(fence)
        qlen = 14
        starts = rng.integers(0, n - qlen, size=args.queries)
        queries = np.stack([corpus[s : s + qlen] for s in starts])
        qlens = np.full((args.queries,), qlen, np.int32)
        qargs = (t_dev, jnp.int32(n), sa32, jnp.int32(n), fence, blk,
                 jnp.asarray(queries), jnp.asarray(qlens),
                 (n + 1).bit_length(), qlen)
        sync(search_ops.bounds_batch_merge(*qargs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = search_ops.bounds_batch_merge(*qargs)
        sync(r)
        dt_q = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "stage": "search", "size_mib": args.size_mib,
            "batch": args.queries, "seconds": round(dt_q, 4),
            "queries_per_s": round(args.queries / dt_q),
        }), flush=True)


if __name__ == "__main__":
    main()
