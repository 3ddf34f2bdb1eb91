"""Microbenchmarks mirroring the reference's named #[bench] targets.

Each row reproduces one bench from the reference's tests/bench.rs (corpus,
pattern, and operation identical) and prints ours vs the published
ns/iter (reference README.md:86-116, author's machine, hot cache).

Three columns of "ours":
- host   — the hybrid serving route a user actually gets for single
           operations (native C++ via the CPython extension, ctypes
           fallback; engine="auto", query_route="host"). Includes all
           Python-interpreter cost of the call.
- C-only — the same operation timed inside a pure C loop (no
           interpreter, no FFI): the apples-to-apples row against the
           reference's in-process #[bench] numbers, which pay no
           language-boundary cost either.
- device — amortized per-op device time when the same operation is
           batched on the TPU (only with --device; requires the TPU and
           a warm compile cache; per-query = batch time / batch size).

Usage: python bench_micro.py [--device] [--json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time

import numpy as np

_FIXTURES = pathlib.Path(__file__).parent / "tests" / "fixtures"
FIXTURE_10K = str(_FIXTURES / "AP009048_10000.fasta")
FIXTURE_100K = str(_FIXTURES / "AP009048_100000.fasta")

# Published numbers (ns/iter): reference README.md:86-116.
PUBLISHED = {
    "naive_small": 228,
    "sais_small": 1_038,
    "sais_small_table": 1_038,  # the ref row IS its full constructor
    "naive_dna_small": 1_785_734,
    "sais_dna_small": 712_938,
    "naive_dna_medium": 22_307_313,
    "sais_dna_medium": 7_514_327,
    "search_scan_not_exists": 84_645,
    "search_suffix_not_exists": 177,
    "search_suffix_not_exists_contains": 50,
    "search_scan_exists_one": 19,
    "search_suffix_exists_one": 162,
    "search_suffix_exists_one_contains": 8,
    "search_scan_exists_many": 2_964,
    "search_suffix_exists_many": 228,
    "search_suffix_exists_many_contains": 102,
}

MANY = "ACTTACGTGTCTGC"  # 14-char hit (tests/bench.rs:110-133)


def timeit(fn, *args, min_time=0.3, max_iter=200_000) -> float:
    """ns per call, repeated until min_time total.

    ``args`` are passed straight to ``fn`` inside the timed loop —
    timing ``fn(q)`` itself rather than a capturing lambda, whose extra
    Python frame (~70 ns) would swamp the C-extension rows."""
    fn(*args)  # warm
    n, total = 0, 0.0
    while total < min_time and n < max_iter:
        batch = max(1, n or 8)
        t0 = time.perf_counter()
        if args:
            (a,) = args
            for _ in range(batch):
                fn(a)
        else:
            for _ in range(batch):
                fn()
        total += time.perf_counter() - t0
        n += batch
    return total / n * 1e9


def host_rows() -> tuple[dict[str, float], dict[str, float]]:
    """(host_ns, c_only_ns) per bench row."""
    from suffix_tpu import SuffixTable
    from suffix_tpu.ops.naive import naive_table_np

    with open(FIXTURE_100K, "rb") as f:
        dna_medium = f.read()
    with open(FIXTURE_10K, "rb") as f:
        dna_small = f.read()

    rows = {}
    c_rows = {}
    rows["naive_small"] = timeit(lambda: naive_table_np(b"mississippi"))

    try:
        from suffix_tpu import native
        if not native.available():
            raise RuntimeError("native lib not built")
        native.sais(b"warm")
        rows["sais_small"] = timeit(lambda: native.sais(b"mississippi"))
        # The apples-to-apples row: the reference's sais_small times its
        # full SuffixTable::new (tests/bench.rs:17-23); this is OUR full
        # Python-visible constructor (fast path: table.py _new_small).
        SuffixTable.new(b"warm", engine="native")
        rows["sais_small_table"] = timeit(
            lambda: SuffixTable.new(b"mississippi", engine="native"))
        rows["sais_dna_small"] = timeit(lambda: native.sais(dna_small),
                                        min_time=1.0)
        rows["sais_dna_medium"] = timeit(lambda: native.sais(dna_medium),
                                         min_time=1.0, max_iter=256)
        fp = native._load_fastpath()
        if fp is not None:
            c_rows["sais_small"] = fp.sais_bench(b"mississippi", 200_000)
            c_rows["sais_dna_small"] = fp.sais_bench(dna_small, 1_000)
            c_rows["sais_dna_medium"] = fp.sais_bench(dna_medium, 100)
            # The reference-shaped naive oracle (std::sort of offsets,
            # full suffix compares — src/table.rs:367-376) in C.
            c_rows["naive_small"] = fp.naive_bench(b"mississippi", 200_000)
            c_rows["naive_dna_small"] = fp.naive_bench(dna_small, 200)
            c_rows["naive_dna_medium"] = fp.naive_bench(dna_medium, 20)

        # naive_dna_*: the reference times ITS O(n^2 log n) oracle on the
        # fixtures (tests/bench.rs:25-47). Ours is the vectorized lexsort
        # oracle; at fixture scale the exact comparison window is
        # maxLCP+1 bytes (every suffix pair resolves within it, -1 pad =
        # end sentinel) — asserted against the linear engine before timing.
        for name, corpus in (("naive_dna_small", dna_small),
                             ("naive_dna_medium", dna_medium)):
            golden = native.sais(corpus)
            w = int(native.kasai(corpus, golden).max(initial=0)) + 1
            assert np.array_equal(naive_table_np(corpus, max_len=w), golden)
            rows[name] = timeit(
                lambda c=corpus, w=w: naive_table_np(c, max_len=w),
                min_time=1.0, max_iter=512)

        st = SuffixTable.new(dna_medium, engine="native")
        st.query_route = "host"
        for name, q, op in (
            ("search_suffix_not_exists", b"H", "positions"),
            ("search_suffix_not_exists_contains", b"H", "contains"),
            ("search_suffix_exists_one", b"C", "positions"),
            ("search_suffix_exists_one_contains", b"C", "contains"),
            ("search_suffix_exists_many", MANY.encode(), "positions"),
            ("search_suffix_exists_many_contains", MANY.encode(),
             "contains"),
        ):
            getattr(st, op)(q)  # first call routes + binds the C method
            fn = getattr(st, op)  # re-resolve: the instance-bound method
            rows[name] = timeit(fn, q)
            c = st._ensure_host_handle().bench_c_only(q, op=op)
            if c is not None:
                c_rows[name] = c
    except Exception as e:  # pragma: no cover
        print(f"[native unavailable: {e}]")

    # The reference's std-scan comparison rows (str::contains): the
    # moral equivalent is bytes.find over the same corpus.
    rows["search_scan_not_exists"] = timeit(lambda: dna_medium.find(b"H"))
    rows["search_scan_exists_one"] = timeit(lambda: dna_medium.find(b"C"))
    rows["search_scan_exists_many"] = timeit(
        lambda: dna_medium.find(MANY.encode()))
    return rows, c_rows


def device_rows() -> dict[str, float]:
    """Amortized per-op device numbers for the batched architecture."""
    from suffix_tpu.utils.platform import setup_compilation_cache, sync
    setup_compilation_cache()
    import jax.numpy as jnp
    from suffix_tpu.ops.padding import PAD, bucket_size
    from suffix_tpu.ops.prefix_doubling import (_suffix_array_padded,
                                                pick_init_words)
    from suffix_tpu.ops import search2 as search_ops

    with open(FIXTURE_100K, "rb") as f:
        dna = f.read()
    rows = {}
    n = len(dna)
    n_pad = bucket_size(n)
    padded = np.full((n_pad,), PAD, np.int32)
    padded[:n] = np.frombuffer(dna, np.uint8)
    t_dev = jnp.asarray(padded)
    iw = pick_init_words(n_pad)
    sync(_suffix_array_padded(t_dev, iw))
    t0 = time.perf_counter()
    it = 16
    r = None
    for _ in range(it):
        r = _suffix_array_padded(t_dev, iw)
    sync(r)
    rows["sais_dna_medium"] = (time.perf_counter() - t0) / it * 1e9

    sa = _suffix_array_padded(t_dev, iw).astype(jnp.int32)
    _pk, fence, blk, _ = search_ops.build_query_index(t_dev, sa, jnp.int32(n))
    sync(fence)
    n_q, qlen = 262_144, len(MANY)
    qarr = np.zeros((n_q, qlen), np.int32)
    qarr[:] = np.frombuffer(MANY.encode(), np.uint8)
    qlens = np.full((n_q,), qlen, np.int32)
    args = (t_dev, jnp.int32(n), sa, jnp.int32(n), fence, blk,
            jnp.asarray(qarr), jnp.asarray(qlens), (n_pad + 1).bit_length(),
            qlen)
    sync(search_ops.bounds_batch_merge(*args))
    t0 = time.perf_counter()
    for _ in range(it):
        r = search_ops.bounds_batch_merge(*args)
    sync(r)
    per_batch = (time.perf_counter() - t0) / it
    rows["search_suffix_exists_many"] = per_batch / n_q * 1e9
    rows["search_suffix_exists_many_contains"] = per_batch / n_q * 1e9

    # 1-char hit ("C") and miss ("H") batches share one compiled shape.
    for name, ch in (("search_suffix_exists_one", b"C"),
                     ("search_suffix_not_exists", b"H")):
        q1 = np.full((n_q, 1), ch[0], np.int32)
        l1 = np.full((n_q,), 1, np.int32)
        a1 = (t_dev, jnp.int32(n), sa, jnp.int32(n), fence, blk,
              jnp.asarray(q1), jnp.asarray(l1), (n_pad + 1).bit_length(), 1)
        sync(search_ops.bounds_batch_merge(*a1))
        t0 = time.perf_counter()
        for _ in range(it):
            r = search_ops.bounds_batch_merge(*a1)
        sync(r)
        per = (time.perf_counter() - t0) / it / n_q * 1e9
        rows[name] = per
        rows[name + "_contains"] = per
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true",
                    help="also measure amortized batched device numbers")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    if not args.device:
        import jax
        jax.config.update("jax_platforms", "cpu")

    host, c_only = host_rows()
    dev = device_rows() if args.device else {}

    if args.json:
        print(json.dumps({"host_ns": host, "c_only_ns": c_only,
                          "device_amortized_ns": dev,
                          "published_ns": PUBLISHED}))
        return

    hdr = (f"{'bench (tests/bench.rs)':36s} {'published':>12s} "
           f"{'host':>12s} {'C-only':>12s} {'device*':>12s} {'vs pub':>8s}")
    print(hdr)
    print("-" * len(hdr))
    for name, pub in PUBLISHED.items():
        h = host.get(name)
        c = c_only.get(name)
        d = dev.get(name)
        best = (min(x for x in (h, c, d) if x is not None)
                if (h or c or d) else None)
        ratio = f"{pub / best:7.2f}x" if best else "     n/a"
        print(f"{name:36s} {pub:>10d}ns "
              f"{(f'{h:>10.0f}ns' if h is not None else '         -')} "
              f"{(f'{c:>10.0f}ns' if c is not None else '         -')} "
              f"{(f'{d:>10.1f}ns' if d is not None else '         -')} "
              f"{ratio}")
    print("\n* device = per-op share of an amortized 256k-query / 16-build "
          "batch on the TPU (the batched architecture's habitat); host = "
          "single-op hybrid route (Python-visible, CPython extension); "
          "C-only = same operation in a pure C loop, the apples-to-apples "
          "comparison against the reference's in-process #[bench] numbers. "
          "Published = reference README.md:86-116, author's machine.")


if __name__ == "__main__":
    main()
