"""LCP arrays on device.

Reference contract (src/table.rs:348-361): ``lcp[0] = 0`` and for i > 0,
``lcp[i] = lcp_len(suffix[table[i-1]], suffix[table[i]])`` — the number of
equal leading *bytes* of lexicographically adjacent suffixes. The reference
computes this with a quadratic per-pair byte zip (its linear Kasai variant
is disabled, src/table.rs:314-346); only the *output* is contractual, so we
use parallel algorithms that produce the same array.

Device algorithm: all n-1 adjacent pairs are resolved simultaneously in
blocks of W bytes. Each round gathers a (n, W) window for both sides of
every still-unresolved pair, finds the first mismatch with vector compares,
and advances survivors by W. Rounds needed = max_lcp / W, which is tiny for
real text; every round is pure gather + VPU compare at full HBM bandwidth
(vs. the reference's one-byte-at-a-time scalar loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from suffix_tpu.ops.padding import PAD


@functools.partial(jax.jit, static_argnames=("block",))
def _lcp_padded(text: jax.Array, n_text: jax.Array, table: jax.Array,
                n_table: jax.Array, block: int = 128) -> jax.Array:
    """LCP for the (padded) table; entry 0 and padded entries are 0."""
    n_pad = table.shape[0]
    a = table  # suffix i-1 side shifted below
    prev = jnp.concatenate([table[:1], table[:-1]])  # table[i-1]

    offs = jnp.arange(block, dtype=jnp.int32)

    def gather(base, off):
        pos = base[:, None] + off[None, :]
        w = jnp.take(text, pos, mode="fill", fill_value=PAD)
        return jnp.where(pos < n_text, w, PAD)

    def cond(state):
        _, active, _ = state
        return jnp.any(active)

    def body(state):
        lcp, active, off = state
        wa = gather(prev.astype(jnp.int32), offs + off)
        wb = gather(a.astype(jnp.int32), offs + off)
        # Mismatch also triggers at text end (PAD != real byte); two PADs
        # only coincide when both suffixes ended, which cannot happen for
        # distinct suffixes before a mismatch.
        eq = wa == wb
        # Count of equal leading bytes in this window.
        run = jnp.cumprod(eq.astype(jnp.int32), axis=1).sum(axis=1)
        lcp = jnp.where(active, lcp + run, lcp)
        active = active & (run == block)
        return lcp, active, off + block

    idx = jnp.arange(n_pad, dtype=jnp.int32)
    lcp0 = jnp.zeros((n_pad,), jnp.int32)
    active0 = (idx > 0) & (idx < n_table)
    lcp, _, _ = jax.lax.while_loop(cond, body, (lcp0, active0, jnp.int32(0)))
    return jnp.where(active0 | (idx == 0), lcp, 0)


def lcp_from_sa(text_bytes: np.ndarray, sa: np.ndarray, block: int = 128) -> np.ndarray:
    """Host wrapper: LCP array (uint32) from text bytes and its SA."""
    from suffix_tpu.ops.padding import bucket_size

    n = int(sa.shape[0])
    if n == 0:
        return np.empty((0,), dtype=np.uint32)
    n_pad = bucket_size(n)
    t_np = np.asarray(text_bytes, dtype=np.uint8)
    t_pad = np.full((n_pad,), PAD, dtype=np.int32)
    t_pad[:n] = t_np
    sa_pad = np.zeros((n_pad,), dtype=np.int32)
    sa_pad[:n] = sa
    out = _lcp_padded(jnp.asarray(t_pad), jnp.int32(n), jnp.asarray(sa_pad),
                      jnp.int32(n), block=block)
    return np.asarray(out)[:n].astype(np.uint32)


def kasai_host(text_bytes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Linear-time Kasai LCP on host (numpy scalar loop) — test oracle.

    Works on raw bytes, so the Unicode pitfall that forced the reference to
    disable its linear variant (src/table.rs:336-343: decrementing by one
    *character* vs one *byte*) does not apply.
    """
    t = np.asarray(text_bytes, dtype=np.uint8)
    n = int(sa.shape[0])
    lcp = np.zeros(n, dtype=np.uint32)
    if n == 0:
        return lcp
    rank = np.zeros(n, dtype=np.int64)
    rank[sa.astype(np.int64)] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == 0:
            h = 0
            continue
        j = int(sa[r - 1])
        while i + h < n and j + h < n and t[i + h] == t[j + h]:
            h += 1
        lcp[r] = h
        if h > 0:
            h -= 1
    return lcp
