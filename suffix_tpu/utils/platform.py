"""Platform/caching setup shared by benches and CLIs."""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache (compiles through a remote
    TPU tunnel can take minutes; the disk cache makes repeat runs fast)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def default_backend() -> str:
    """The default JAX backend name ("tpu", "cpu", ...), lazily."""
    import jax

    return jax.default_backend()


_dispatch_expensive: bool | None = None


def dispatch_is_expensive() -> bool:
    """True when a device dispatch costs milliseconds (accelerator,
    possibly tunneled) rather than microseconds (host CPU backend).

    Used by the hybrid routing in ``SuffixTable``: on accelerators,
    single queries and tiny builds run faster on the host CPU via the
    native library than as a device program launch. Memoized: the
    default backend is fixed for the process, and jax.default_backend()
    costs ~1 us — real money on the sub-microsecond query path.
    """
    global _dispatch_expensive
    if _dispatch_expensive is None:
        _dispatch_expensive = default_backend() != "cpu"
    return _dispatch_expensive


def sync(x) -> None:
    """Force completion of a device computation.

    ``block_until_ready`` can be a no-op on remote-tunneled backends, so
    synchronize by fetching one element to the host.
    """
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "__getitem__") and getattr(leaf, "ndim", 0) >= 1:
            _ = leaf[tuple(0 for _ in range(leaf.ndim))].item()
        elif hasattr(leaf, "item"):
            _ = leaf.item()
