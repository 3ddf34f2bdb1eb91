"""Pallas TPU kernels for ops where XLA's generic lowering loses.

Kernel inventory (each exists because a measured XLA primitive was the
bottleneck — see ARCHITECTURE.md):

- ``byte_histogram``: XLA lowers ``zeros(B).at[x].add(1)`` to a serial
  scatter-add (~27 ms for 4M int32 on v5e). The kernel streams the input
  once and accumulates per-block one-hot partial sums in VMEM on the VPU —
  bandwidth-bound instead of scatter-bound. Used by the SA-IS engine's
  bucket machinery (the reference's Bins::find_sizes, src/table.rs:686-704).

On non-TPU backends the public functions fall back to the XLA path, so
the package stays portable; kernels are also exercised in interpreter
mode by the test suite (scatter/collision semantics identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8
CHUNK = LANE * SUB  # elements per grid step; (8, 128) tile, TPU-aligned
NB = 512  # padded bin count (power of two >= 258)


def _hist_kernel(x_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    chunk = x_ref[:]  # (SUB, LANE)
    # 3-D one-hot, no reshapes (Mosaic rejects (8,128)->(1024,1) casts):
    # compare against the bin iota along a trailing axis and reduce the
    # lane axis, accumulating (SUB, NB) partials across grid steps.
    bins = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE, NB), 2)
    onehot = (chunk[:, :, None] == bins).astype(jnp.int32)
    out_ref[:] += jnp.sum(onehot, axis=1)  # (SUB, NB)


def _hist_pallas(x2d: jax.Array, interpret: bool = False) -> jax.Array:
    n_steps = x2d.shape[0] // SUB
    out = pl.pallas_call(
        _hist_kernel,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, NB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, NB), jnp.int32),
        interpret=interpret,
    )(x2d)
    return jnp.sum(out, axis=0)


def byte_histogram(values: jax.Array, n_bins: int,
                   force: str | None = None) -> jax.Array:
    """Histogram of int32 ``values`` in [0, n_bins); n_bins <= NB.

    Values outside [0, n_bins) land in the padded tail bins and are
    dropped. ``force`` overrides backend dispatch: "pallas", "interpret",
    or "xla".
    """
    n = values.shape[0]
    mode = force
    if mode is None:
        mode = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    if mode == "xla" or n < CHUNK:
        clipped = jnp.clip(values, 0, n_bins - 1)
        safe = jnp.where((values >= 0) & (values < n_bins), clipped, n_bins - 1)
        hist = jnp.zeros((n_bins,), jnp.int32).at[safe].add(
            jnp.where((values >= 0) & (values < n_bins), 1, 0)
        )
        return hist
    n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK
    x = jnp.full((n_pad,), NB - 1, jnp.int32)
    x = jax.lax.dynamic_update_slice(x, values, (0,))
    x = jnp.where((x >= 0) & (x < NB), x, NB - 1)
    x2d = x.reshape(-1, LANE)
    hist = _hist_pallas(x2d, interpret=(mode == "interpret"))
    # Subtract the padding contribution from the sink bin.
    hist = hist.at[NB - 1].add(-(n_pad - n))
    return hist[:n_bins]
