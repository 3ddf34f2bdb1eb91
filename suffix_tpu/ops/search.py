"""Batched substring queries over a device-resident suffix array.

Reference semantics (src/table.rs:197-293):

- ``positions(query)``  -> the sub-slice ``table[start..end]`` where
  ``start`` is the first rank whose suffix is >= query (full byte
  comparison) and ``end`` is the first rank after ``start`` whose suffix
  does not start with query. The slice is returned in SA order (unordered
  by position). Empty query or empty text -> empty slice
  (src/table.rs:228-235).
- ``contains(query)``   -> existence; empty query is NOT contained
  (src/table.rs:281-283 via any_position).
- ``any_position(query)`` -> an arbitrary matching byte offset or None.

The reference runs one O(m log n) binary search per call. Here every query
in a batch runs the two bounds as a *branchless fixed-trip* binary search
(ceil(log2(n+1)) probes), vmapped across the batch: each probe gathers an
m-byte window of the text and resolves the three-way comparison with pure
vector ops. All fast-path rejects of the reference fall out of the same
comparison algebra, so no special-casing is needed for bit-parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from suffix_tpu.ops.padding import PAD


def _cmp_suffix_query(text: jax.Array, n_text: jax.Array, sufi: jax.Array,
                      query: jax.Array, qlen: jax.Array):
    """Compare suffix(text, sufi) with query[:qlen] as byte strings.

    Returns (lt_full, gt_prefix):
      lt_full   — suffix <  query under *full* comparison (a proper-prefix
                  suffix is smaller: sentinel PAD < any byte).
      gt_prefix — suffix[:qlen] > query under *prefix* comparison
                  (equality through qlen bytes means "starts_with", which
                  is NOT greater; reference upper bound src/table.rs:247-250).
    """
    m = query.shape[0]
    offs = sufi + jnp.arange(m, dtype=jnp.int32)
    window = jnp.where(offs < n_text,
                       jnp.take(text, offs, mode="fill", fill_value=PAD),
                       PAD)
    qpos = jnp.arange(m, dtype=jnp.int32)
    valid_q = qpos < qlen
    # Position of the first byte mismatch within the query's live range.
    neq = (window != query) & valid_q
    any_neq = jnp.any(neq)
    first = jnp.argmax(neq)  # 0 when no mismatch; guarded by any_neq
    w_at = jnp.take(window, first)
    q_at = jnp.take(query, first)
    lt_full = any_neq & (w_at < q_at)
    gt_prefix = any_neq & (w_at > q_at)
    return lt_full, gt_prefix


def _bounds_one(text: jax.Array, n_text: jax.Array, table: jax.Array,
                n_table: jax.Array, query: jax.Array, qlen: jax.Array,
                n_iters: int):
    """(start, end) rank bounds for one query; branchless binary searches."""

    def lower_step(_, lr):
        left, right = lr
        active = left < right
        mid = (left + right) // 2
        sufi = jnp.take(table, mid, mode="fill", fill_value=0).astype(jnp.int32)
        lt, _ = _cmp_suffix_query(text, n_text, sufi, query, qlen)
        # pred: query <= suffix  <=>  not (suffix < query)
        pred = jnp.logical_not(lt)
        new_left = jnp.where(pred, left, mid + 1)
        new_right = jnp.where(pred, mid, right)
        return (jnp.where(active, new_left, left),
                jnp.where(active, new_right, right))

    def upper_step(_, lr):
        left, right = lr
        active = left < right
        mid = (left + right) // 2
        sufi = jnp.take(table, mid, mode="fill", fill_value=0).astype(jnp.int32)
        _, gt = _cmp_suffix_query(text, n_text, sufi, query, qlen)
        # pred: suffix does not start with query AND suffix > query
        # (within the lower-bounded region this is exactly "> under prefix
        # comparison": everything below start compares < or starts_with).
        new_left = jnp.where(gt, left, mid + 1)
        new_right = jnp.where(gt, mid, right)
        return (jnp.where(active, new_left, left),
                jnp.where(active, new_right, right))

    lo0 = (jnp.int32(0), n_table)
    start, _ = jax.lax.fori_loop(0, n_iters, lower_step, lo0)
    up0 = (start, n_table)
    end, _ = jax.lax.fori_loop(0, n_iters, upper_step, up0)
    empty = (qlen == 0) | (n_table == 0)
    start = jnp.where(empty, 0, start)
    end = jnp.where(empty, 0, end)
    return start, jnp.maximum(end - start, 0)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def bounds_batch(text: jax.Array, n_text: jax.Array, table: jax.Array,
                 n_table: jax.Array, queries: jax.Array, qlens: jax.Array,
                 n_iters: int):
    """Vectorized (start, count) for a (Q, m) padded query batch."""
    fn = functools.partial(_bounds_one, text, n_text, table, n_table,
                           n_iters=n_iters)
    return jax.vmap(fn)(queries, qlens)


def pack_queries(queries, pad_to: int | None = None):
    """Encode a list of str/bytes queries into (Q, m) int32 + lengths."""
    bs = [q.encode("utf-8") if isinstance(q, str) else bytes(q) for q in queries]
    m = max([len(b) for b in bs] + [1])
    if pad_to is not None:
        m = max(m, pad_to)
    out = np.full((len(bs), m), PAD, dtype=np.int32)
    lens = np.zeros((len(bs),), dtype=np.int32)
    for i, b in enumerate(bs):
        if b:
            out[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    return out, lens
