"""Streamed corpus ingestion for multi-GiB builds.

The reference reads the whole file into a String (src/main.rs:9-11); at
framework scale that costs 5x the corpus in host RAM (1x bytes + 4x the
int32 device staging copy). This module streams instead:

- ``open_corpus``: zero-copy read-only ``np.memmap`` view of the file;
- ``device_corpus``: PAD-padded int32 device array, uploaded shard by
  shard through ``jax.make_array_from_callback`` — each device's block is
  converted uint8 -> int32 on the fly from the memmap, so peak host
  memory is one shard, not the corpus.
"""

from __future__ import annotations

import numpy as np

from suffix_tpu.ops.padding import PAD, bucket_size


def open_corpus(path: str) -> np.ndarray:
    """Read-only uint8 view of ``path`` (OS page cache does the buffering)."""
    return np.memmap(path, dtype=np.uint8, mode="r")


def device_corpus(path_or_bytes, mesh=None, n_pad: int | None = None,
                  lut: np.ndarray | None = None, fill: int = PAD):
    """PAD-padded int32 corpus on device, streamed from disk.

    With ``mesh``, the result is sequence-sharded over the mesh's first
    axis (the layout the sharded build consumes); otherwise it lives on
    the default device. Returns (array, n) with n the true byte length.

    ``lut`` recodes each byte through a 256-entry table on the fly (the
    alphabet-adaptive dense coding) and ``fill`` sets the padding value
    (0 for coded corpora — the code-space sentinel) — still one shard of
    host memory at a time, never a full int32 staging copy.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from suffix_tpu.parallel.mesh import AXIS

    if isinstance(path_or_bytes, str):
        raw = open_corpus(path_or_bytes)
    elif isinstance(path_or_bytes, np.ndarray):
        raw = path_or_bytes  # zero-copy (memmaps included)
        assert raw.dtype == np.uint8
    else:
        raw = np.frombuffer(bytes(path_or_bytes), dtype=np.uint8)
    n = int(raw.shape[0])
    if n_pad is None:
        n_pad = bucket_size(max(n, 1))
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        n_pad = -(-n_pad // n_dev) * n_dev
        sharding = NamedSharding(mesh, P(AXIS))
    else:
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def _block(index) -> np.ndarray:
        # index: tuple of slices into the global (n_pad,) shape.
        sl = index[0]
        lo = 0 if sl.start is None else sl.start
        hi = n_pad if sl.stop is None else sl.stop
        out = np.full((hi - lo,), fill, dtype=np.int32)
        take = min(hi, n) - lo
        if take > 0:
            seg = raw[lo:lo + take]
            out[:take] = lut[seg] if lut is not None else seg
        return out

    arr = jax.make_array_from_callback((n_pad,), sharding, _block)
    return arr, n


def device_table(sa: np.ndarray, n_pad: int, mesh) -> "object":
    """Zero-padded int32 suffix table on device, sequence-sharded —
    staged one shard at a time (no full host int32 copy)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from suffix_tpu.parallel.mesh import AXIS

    n = int(sa.shape[0])

    def _block(index) -> np.ndarray:
        sl = index[0]
        lo = 0 if sl.start is None else sl.start
        hi = n_pad if sl.stop is None else sl.stop
        out = np.zeros((hi - lo,), dtype=np.int32)
        take = min(hi, n) - lo
        if take > 0:
            out[:take] = sa[lo:lo + take]
        return out

    return jax.make_array_from_callback(
        (n_pad,), NamedSharding(mesh, P(AXIS)), _block)
