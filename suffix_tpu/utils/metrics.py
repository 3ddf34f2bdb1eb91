"""Structured per-build metrics — the deployment-scrapable stats surface.

The reference ships no instrumentation (its TODO:29-32 asks for
profiling); SURVEY.md §5 mandates a metrics subsystem a deployment can
scrape. This module turns the engines' internal counters (routing
facts, doubling rounds, tie-mass trajectories, SA-IS recursion depth,
sharded collective volume) into one JSON-stable dict:

    sa, stats = build_stats(data)          # library
    python -m suffix_tpu build F --stats   # CLI (one JSON line)
    python -m suffix_tpu info saved.npz    # prints stats saved with -o

Schema (pinned by tests/test_aux.py::test_build_stats_schema): every
dict carries the REQUIRED_KEYS below; engine-specific extras (rounds,
tie_trajectory, period, recursion_depth, collective, ...) appear when
the engine that ran produces them. Instrumented engine variants are
separate compiles — the un-instrumented hot path never pays for this.
"""

from __future__ import annotations

import json
import time

import numpy as np

SCHEMA_VERSION = 1

REQUIRED_KEYS = (
    "schema", "engine", "engine_family", "n_bytes", "n_pad",
    "index_dtype", "elapsed_s", "bytes_per_s", "device",
)


def _device_name() -> str:
    import jax

    try:
        return str(jax.devices()[0].device_kind)
    except Exception:  # pragma: no cover - backend-less environments
        return "unknown"


def build_stats(data, engine: str = "device", index_dtype: str = "u32",
                padding: str = "pow2", mesh=None):
    """(suffix array, stats dict) for one instrumented build.

    ``engine``: "device" (production routing: periodic / patched /
    adaptive / two-phase / classic — the same closure the benches time),
    "native" (C SA-IS), "sais" (recursive device SA-IS), or "sharded"
    (block-bitonic SPMD over ``mesh``).
    """
    from suffix_tpu.ops.padding import bucket_size

    arr = (np.frombuffer(bytes(data), np.uint8)
           if isinstance(data, (bytes, bytearray))
           else np.asarray(data, np.uint8))
    n = int(arr.size)
    stats: dict = {"schema": SCHEMA_VERSION, "n_bytes": n,
                   "index_dtype": index_dtype, "device": _device_name()}
    if engine == "native":
        from suffix_tpu import native

        t0 = time.perf_counter()
        sa = native.sais(arr)
        dt = time.perf_counter() - t0
        stats.update(engine="native-sais", engine_family="native", n_pad=n)
    elif engine == "sais":
        from suffix_tpu.ops.sais import suffix_array_sais_recursive

        s: dict = {}
        t0 = time.perf_counter()
        sa = suffix_array_sais_recursive(arr, stats=s)
        dt = time.perf_counter() - t0
        stats.update(engine="sais-device", engine_family="sais",
                     n_pad=bucket_size(max(n, 1)),
                     recursion_depth=s.get("depth", 0))
    elif engine == "sharded":
        from suffix_tpu.parallel.dist_build import suffix_array_sharded
        from suffix_tpu.parallel.mesh import make_mesh

        mesh = mesh if mesh is not None else make_mesh(1)
        d = int(np.prod(list(mesh.shape.values())))
        rounds = []
        t0 = time.perf_counter()
        sa = suffix_array_sharded(arr, mesh, index_dtype=index_dtype)
        dt = time.perf_counter() - t0
        del rounds
        logd = max(1, d).bit_length() - 1
        stats.update(
            engine=f"sharded(d={d})", engine_family="sharded", n_pad=n,
            devices=d,
            collective={
                # The analytic per-round volume the dryrun telemetry
                # reports (__graft_entry__.py): bitonic merge-split
                # stages + halo window shifts, bytes per device.
                "bitonic_stages_per_round": logd * (logd + 1) // 2,
                "bytes_per_device_per_stage": 3 * 8 * (n // max(d, 1)),
            })
    else:
        from suffix_tpu.ops.padding import bucket_size_fine
        from suffix_tpu.ops.prefix_doubling import device_build_closure

        import jax.numpy as jnp

        n_pad = (bucket_size(max(n, 1)) if padding == "pow2"
                 else bucket_size_fine(max(n, 1)))
        dtype = jnp.int64 if index_dtype == "u64" else jnp.int32
        dispatch, label = device_build_closure(arr, n_pad, dtype,
                                               stats=stats)
        t0 = time.perf_counter()
        sa_full = np.asarray(dispatch())
        dt = time.perf_counter() - t0
        sa = sa_full[n_pad - n:].astype(
            np.uint64 if index_dtype == "u64" else np.uint32)
        stats.update(engine=label, n_pad=n_pad)
        stats.setdefault("engine_family", "device")
    stats.update(elapsed_s=round(dt, 6),
                 bytes_per_s=round(n / max(dt, 1e-12), 1))
    return np.asarray(sa), stats


def stats_json(stats: dict) -> str:
    """One deterministic JSON line (stable key order for log scraping)."""
    return json.dumps(stats, sort_keys=True, default=str)
