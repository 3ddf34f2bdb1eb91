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
        # distinct suffixes before a mismatch. The off < n_text guard
        # bounds the loop even on contract-violating inputs (duplicate
        # table entries), whose windows never mismatch.
        eq = wa == wb
        # Count of equal leading bytes in this window.
        run = jnp.cumprod(eq.astype(jnp.int32), axis=1).sum(axis=1)
        lcp = jnp.where(active, lcp + run, lcp)
        active = active & (run == block) & (off + block < n_text)
        return lcp, active, off + block

    idx = jnp.arange(n_pad, dtype=jnp.int32)
    lcp0 = jnp.zeros((n_pad,), jnp.int32)
    active0 = (idx > 0) & (idx < n_table)
    lcp, _, _ = jax.lax.while_loop(cond, body, (lcp0, active0, jnp.int32(0)))
    return jnp.where(active0 | (idx == 0), lcp, 0)


# Auto-routing thresholds (lcp_from_sa(method="auto")): the keyed device
# refine scans max_lcp/block rounds per surviving chunk, which is
# O(sum-of-LCPs) — quadratic-class on repetitive corpora (mean LCP ~ n).
# Route to the linear native Kasai when the survivor count (adjacent
# pairs sharing all KEY_SYMS leading bytes) exceeds LCP_SURV_ROUTE_MAX
# (more chunks than the refine amortizes), or when the bounded refine
# exhausts LCP_MAX_OFF bytes without resolving every pair (huge-LCP
# corpora that the count alone cannot predict). Both arms are pinned
# bit-equal to Kasai by tests/test_lcp.py.
LCP_SURV_ROUTE_MAX = 16384   # 8 chunks of 2048 survivors
LCP_MAX_OFF = 8192           # ~64 refine rounds of 128 bytes


@jax.jit
def _survivor_count(pk: tuple, n_table: jax.Array) -> jax.Array:
    """Number of adjacent (valid) rank pairs equal through all packed
    key words — the lanes the windowed refine would have to walk."""
    n_pad = pk[0].shape[0]
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    eq = (idx > 0) & (idx < n_table)
    for word in pk:
        prev = jnp.concatenate([word[:1], word[:-1]])
        eq = eq & (word == prev)
    return jnp.sum(eq.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("block", "max_off"))
def _lcp_keyed(text: jax.Array, n_text: jax.Array, table: jax.Array,
               n_table: jax.Array, pk: tuple, block: int = 128,
               max_off: int = 0) -> jax.Array:
    """LCP via the packed rank-order prefix keys.

    Lexicographically adjacent suffixes sit in adjacent slots of the
    packed key arrays, so the first KEY_SYMS bytes of every pair compare
    with pure contiguous vector ops — no gathers. Only pairs sharing all
    KEY_SYMS leading bytes (rare outside pathological texts) fall back to
    the windowed compare, with the while_loop exiting once they resolve.
    """
    from suffix_tpu.ops import search2

    n_pad = table.shape[0]
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    valid = (idx > 0) & (idx < n_table)

    lcp = jnp.zeros((n_pad,), jnp.int32)
    undecided = valid
    for w, word in enumerate(pk):
        prev = jnp.concatenate([word[:1], word[:-1]])
        eq_word = word == prev
        # First differing symbol within this word (words pack 3 symbols
        # of 9 bits, most-significant first).
        s_cur = [(word >> (18 - 9 * j)) & 0x1FF for j in range(3)]
        s_prv = [(prev >> (18 - 9 * j)) & 0x1FF for j in range(3)]
        within = jnp.where(
            s_cur[0] != s_prv[0], 0, jnp.where(s_cur[1] != s_prv[1], 1, 2)
        )
        # A symbol pair (0,0) means both suffixes ended: contributes no
        # extra matched bytes; symbol equality over real bytes extends lcp.
        matched = jnp.where(eq_word, 3, within)
        # Count only real matched bytes (symbol 0 = past end: if the
        # mismatch position has a 0 on either side, matching stopped at
        # the end anyway and 'within' already counts the equal prefix).
        lcp = jnp.where(undecided, lcp + matched, lcp)
        undecided = undecided & eq_word
    # Pairs equal through all KEY_SYMS symbols truly share KEY_SYMS real
    # bytes (a 0 end-symbol on one side would mismatch the other's real
    # byte). Such survivors are rare on real text, so compact them to the
    # front (one key-sort) and refine in fixed chunks — a chunk whose
    # lanes are all resolved skips its loop body entirely, so the
    # windowed gathers only ever run over chunks that contain survivors.
    a = table
    prev_t = jnp.concatenate([table[:1], table[:-1]])
    offs = jnp.arange(block, dtype=jnp.int32)

    num_surv = jnp.sum(undecided.astype(jnp.int32))
    not_surv = jnp.where(undecided, 0, 1).astype(jnp.int32)
    # Unstable: lanes refine independently, so the order within the
    # survivor/non-survivor groups is irrelevant; perm un-permutes later.
    # Activity is positional after compaction (survivors sort first), so
    # it is not carried as a sort operand.
    _, p_a, p_prev, p_lcp, perm = jax.lax.sort(
        (not_surv, a, prev_t, lcp, idx), num_keys=1, is_stable=False,
    )

    cap = min(n_pad, 2048)
    n_chunks = -(-n_pad // cap)

    # Survivor windows are unaligned; fetching the two ALIGNED rows that
    # cover each window and extracting in-row is ~2.5x cheaper than an
    # element gather of the window (measured on v5e: 8.6 vs 4.3 ms per
    # 2048x128x2 at 4M — coalesced row DMA + a lane-local gather).
    aligned = n_pad % block == 0 and n_pad >= 2 * block
    if aligned:
        text2d = text.reshape(-1, block)
        last_row = n_pad // block - 1

    def gather_rows(base, off):
        pos = base[:, None] + off[None, :]
        if aligned:
            first = base + off[0]
            row = first // block
            shift = first % block
            r0 = jnp.take(text2d, jnp.minimum(row, last_row), axis=0,
                          mode="fill", fill_value=PAD)
            r1 = jnp.take(text2d, jnp.minimum(row + 1, last_row), axis=0,
                          mode="fill", fill_value=PAD)
            wide = jnp.concatenate([r0, r1], axis=1)  # (cap, 2*block)
            cols = shift[:, None] + jnp.arange(block, dtype=jnp.int32)[None, :]
            w = jnp.take_along_axis(wide, cols, axis=1)
        else:
            w = jnp.take(text, pos, mode="fill", fill_value=PAD)
        return jnp.where(pos < n_text, w, PAD)

    def chunk_step(state):
        c, lcp_perm, unres = state
        start = c * cap
        ca = jax.lax.dynamic_slice(p_a, (start,), (cap,))
        cp = jax.lax.dynamic_slice(p_prev, (start,), (cap,))
        cl = jax.lax.dynamic_slice(lcp_perm, (start,), (cap,))
        cact = start + jnp.arange(cap, dtype=jnp.int32) < num_surv

        def cond(state):
            _, active, off = state
            alive = jnp.any(active)
            if max_off:  # static round budget (method="auto" routing)
                alive = alive & (off < max_off)
            return alive

        def body(state):
            l, active, off = state
            wa = gather_rows(cp.astype(jnp.int32), offs + off)
            wb = gather_rows(ca.astype(jnp.int32), offs + off)
            eq = wa == wb
            run = jnp.cumprod(eq.astype(jnp.int32), axis=1).sum(axis=1)
            l = jnp.where(active, l + run, l)
            # off guard: terminate even on duplicate table entries.
            active = active & (run == block) & (off + block < n_text)
            return l, active, off + block

        cl, act_fin, _ = jax.lax.while_loop(
            cond, body, (cl, cact, jnp.int32(search2.KEY_SYMS))
        )
        return (c + 1, jax.lax.dynamic_update_slice(lcp_perm, cl, (start,)),
                unres + jnp.sum(act_fin.astype(jnp.int32)))

    # Survivors are compacted to the FRONT, so chunks form an active
    # prefix: stop at the first chunk past num_surv instead of visiting
    # all n_pad/cap chunks (the per-chunk dispatch overhead dominated the
    # whole LCP on real text — measured 28 ms of 44 at 4M with 146
    # survivors; one chunk suffices there).
    _, lcp_perm, unresolved = jax.lax.while_loop(
        lambda s: (s[0] * cap < num_surv) & (s[0] < n_chunks),
        chunk_step, (jnp.int32(0), p_lcp, jnp.int32(0)),
    )
    # Un-permute: key-sort by the original index.
    _, lcp = jax.lax.sort((perm, lcp_perm), num_keys=1, is_stable=False)
    return jnp.where(valid | (idx == 0), lcp, 0), unresolved


def _kasai_route(text_bytes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Linear-time host route for the auto fallback (native, else numpy)."""
    from suffix_tpu import native

    if native.available():
        return native.kasai(np.asarray(text_bytes, np.uint8).tobytes(), sa)
    return kasai_host(text_bytes, sa)


def lcp_from_sa(text_bytes: np.ndarray, sa: np.ndarray, block: int = 128,
                pk: tuple | None = None, method: str = "auto") -> np.ndarray:
    """Host wrapper: LCP array (uint32) from text bytes and its SA.

    ``method="auto"`` (default) bounds the device wall time on
    repetitive corpora: if the survivor count exceeds
    ``LCP_SURV_ROUTE_MAX``, or the round-budgeted refine exhausts
    ``LCP_MAX_OFF`` bytes with lanes still unresolved, the computation
    routes to the linear host Kasai (the reference's own linear variant
    is *disabled*, src/table.rs:314-346 — this engine keeps the device
    fast path AND a bounded worst case). ``method="device"`` forces the
    unbounded keyed refine (O(sum-of-LCPs) on pathological corpora).
    """
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
    t_dev = jnp.asarray(t_pad)
    tab_dev = jnp.asarray(sa_pad)
    if pk is None:
        from suffix_tpu.ops import search2

        # stride=1: fences alias the keys and no blocked copy is built —
        # the LCP refinement only reads the flat keys.
        pk, _, _, _ = search2.build_query_index(t_dev, tab_dev, jnp.int32(n),
                                                stride=1)
    if method == "auto":
        n_surv = int(_survivor_count(tuple(pk), jnp.int32(n)))
        if n_surv > LCP_SURV_ROUTE_MAX:
            return _kasai_route(t_np, sa)
        out, unresolved = _lcp_keyed(t_dev, jnp.int32(n), tab_dev,
                                     jnp.int32(n), tuple(pk), block=block,
                                     max_off=LCP_MAX_OFF)
        if int(unresolved) > 0:
            return _kasai_route(t_np, sa)
    else:
        out, _ = _lcp_keyed(t_dev, jnp.int32(n), tab_dev, jnp.int32(n),
                            tuple(pk), block=block)
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
