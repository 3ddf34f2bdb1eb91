"""Collective bucket machinery over a device mesh.

The distributed form of the reference's ``Bins`` (src/table.rs:671-750):
each shard histograms its own characters (Pallas kernel on TPU), the
histograms reduce across the mesh with ``psum`` — one all-reduce of a
tiny (258,) vector over ICI — and the global head/tail bucket pointers
follow from local prefix sums of the reduced counts. Every device ends up
with identical global bucket boundaries, exactly matching the
single-process values (SURVEY.md §2.3 contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from suffix_tpu.parallel.mesh import AXIS

N_SYM = 258


def _bins_shard(text_local: jax.Array):
    from suffix_tpu.ops.pallas_kernels import byte_histogram

    sym = (text_local + 1).astype(jnp.int32)
    local_counts = byte_histogram(sym, N_SYM)
    counts = jax.lax.psum(local_counts, AXIS)
    tails = jnp.cumsum(counts)
    heads = tails - counts
    return counts, heads, tails


@functools.partial(jax.jit, static_argnames=("mesh",))
def _bins_jit(text_sharded: jax.Array, mesh: Mesh):
    return jax.shard_map(
        _bins_shard, mesh=mesh, in_specs=P(AXIS),
        out_specs=(P(), P(), P()), check_vma=False,
    )(text_sharded)


def global_bucket_layout(text_padded: np.ndarray, mesh: Mesh):
    """(counts, heads, tails) for a text sharded across ``mesh``.

    ``text_padded`` length must divide evenly by the mesh size.
    """
    sharded = jax.device_put(
        np.asarray(text_padded, dtype=np.int32),
        NamedSharding(mesh, P(AXIS)),
    )
    counts, heads, tails = _bins_jit(sharded, mesh)
    return np.asarray(counts), np.asarray(heads), np.asarray(tails)
