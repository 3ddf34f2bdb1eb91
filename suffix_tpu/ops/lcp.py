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


# Auto-routing thresholds (lcp_from_sa(method="auto")). The chunked
# keyed refine (_lcp_keyed) runs its survivor chunks as thousands of
# small dependent device steps — measured 29.5 s for a 16 MiB text
# corpus with 331k survivors (scripts/round4_study.py text16), i.e.
# dispatch-depth-bound, not bandwidth-bound. Routing:
#   survivors <= LCP_SURV_CHUNKED .. the chunked engine (few survivors:
#                                    one chunk, minimal dispatches)
#   survivors <= n/8 ............. the staged BULK engine (_lcp_bulk):
#                                    packed-symbol window ladder with
#                                    inter-stage compaction (r5; covers
#                                    sparse repeats AND text-class
#                                    survivor-dense corpora — at
#                                    128 MiB text the packed tier
#                                    resolves 4.64M survivors to 160k
#                                    in one 15-symbol round)
#   else / budget exhausted ...... linear host Kasai (degenerate
#                                    repetition: survivor mass ~ n with
#                                    LCP depth ~ n)
# The r4 ladder fetched whole byte windows at element-gather rate
# (~70M el/s on v5e — round5_study gather) and lost to host Kasai on
# text; the r5 ladder packs 3 bytes per gathered element, compacts
# between rounds, and sizes row blocks so the block loop cannot
# serialize (see LCP_BULK_LADDER notes). All arms are pinned bit-equal
# to Kasai by tests/test_lcp.py.
LCP_SURV_CHUNKED = 2048      # one refine chunk
LCP_SURV_ROUTE_MAX = 16384   # legacy chunked budget (method="device")
LCP_MAX_OFF = 8192           # chunked path: ~64 refine rounds of 128 B
LCP_BULK_DEEP_W = 2048       # bulk deep-pass window bytes per round
LCP_BULK_MAX_OFF = 1 << 16   # bulk budget: beyond 64 KiB LCPs -> Kasai


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


# ---------------------------------------------------------------------------
# Staged BULK survivor refine — many survivors, few device dispatches.
#
# The chunked engine above walks survivors 2048 at a time with a
# while_loop per chunk: thousands of small dependent device steps on
# text-class corpora (measured 29.5 s at 16 MiB / 331k survivors —
# latency-bound, round4_study text16). The bulk engine instead runs a
# CONSTANT number of dispatches: one compaction sort, ONE 128-byte
# window round over every survivor simultaneously (row-blocked fori for
# occupancy), one prefix re-compaction + deep pass (2 KiB windows) over
# the few unresolved lanes, and one un-permute — each step big enough to
# be bandwidth- not dispatch-bound.
# ---------------------------------------------------------------------------


def _keyed_base(table: jax.Array, pk: tuple, n_table: jax.Array):
    """Per-pair LCP over the first KEY_SYMS bytes from the packed keys
    (the shared key phase of the chunked and bulk engines)."""
    n_pad = table.shape[0]
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    valid = (idx > 0) & (idx < n_table)
    lcp = jnp.zeros((n_pad,), jnp.int32)
    undecided = valid
    for word in pk:
        prev = jnp.concatenate([word[:1], word[:-1]])
        eq_word = word == prev
        s_cur = [(word >> (18 - 9 * j)) & 0x1FF for j in range(3)]
        s_prv = [(prev >> (18 - 9 * j)) & 0x1FF for j in range(3)]
        within = jnp.where(
            s_cur[0] != s_prv[0], 0, jnp.where(s_cur[1] != s_prv[1], 1, 2)
        )
        matched = jnp.where(eq_word, 3, within)
        lcp = jnp.where(undecided, lcp + matched, lcp)
        undecided = undecided & eq_word
    return lcp, undecided, valid, idx


@jax.jit
def _lcp_base_compact(table: jax.Array, n_table: jax.Array, pk: tuple):
    """Stage 0: keyed LCP + one full compaction sort. Survivor rows
    (suffix, predecessor-suffix, partial lcp, active flag, original
    rank) land in the array prefix; rows move as a unit so later stages
    may re-permute freely — the finish step un-permutes by rank."""
    lcp, undecided, _, idx = _keyed_base(table, pk, n_table)
    prev_t = jnp.concatenate([table[:1], table[:-1]])
    num_surv = jnp.sum(undecided.astype(jnp.int32))
    not_surv = jnp.where(undecided, 0, 1).astype(jnp.int32)
    flag = jnp.where(undecided, 1, 0).astype(jnp.int32)
    _, p_a, p_prev, p_lcp, p_flag, perm = jax.lax.sort(
        (not_surv, table, prev_t, lcp, flag, idx), num_keys=1,
        is_stable=False)
    return p_a, p_prev, p_lcp, p_flag, perm, num_surv


@functools.partial(jax.jit, static_argnames=("s_pad", "w", "row_block",
                                             "max_rounds"))
def _bulk_refine_prefix(text, n_text, a, b, lcp, flag, s_pad: int, w: int,
                        row_block: int, max_rounds: int):
    """Extend the first ``s_pad`` lanes (flag==1 active) by w-byte
    window compares, processed in ``row_block`` row blocks; each block
    loops until its lanes resolve or ``max_rounds`` rounds pass. The
    window base is the lane's current lcp (text[a+lcp+j] vs
    text[b+lcp+j]). Returns updated full (lcp, flag) and the count of
    still-active lanes in the prefix.

    Windows are fetched as ALIGNED 128-lane text rows (w//128 + 1 rows
    per lane, coalesced row DMA) and shifted in-row — measured ~2.5x
    over per-element gathers in the chunked engine; element gathers
    remain the fallback for unaligned pad sizes (tiny test corpora)."""
    offs = jnp.arange(w, dtype=jnp.int32)
    # s_pad comes from bucket_size (powers of two), so the block grid
    # tiles it exactly; a non-multiple pad would silently leave the tail
    # lanes unrefined (ADVICE r4) — refuse at trace time instead.
    assert s_pad % row_block == 0, (s_pad, row_block)
    n_blocks = s_pad // row_block
    n_pad_t = text.shape[0]
    aligned = n_pad_t % 128 == 0 and n_pad_t >= 256
    if aligned:
        text2d = text.reshape(-1, 128)
        last_row = n_pad_t // 128 - 1
        k_rows = w // 128 + 1

    def gat(base):
        if aligned:
            row0 = base // 128
            shift = base % 128
            rows = row0[:, None] + jnp.arange(k_rows, dtype=jnp.int32)
            wide = jnp.take(text2d, jnp.minimum(rows, last_row), axis=0,
                            mode="fill", fill_value=PAD)
            wide = wide.reshape(base.shape[0], k_rows * 128)
            cols = shift[:, None] + offs[None, :]
            v = jnp.take_along_axis(wide, cols, axis=1)
        else:
            v = jnp.take(text, base[:, None] + offs[None, :], mode="fill",
                         fill_value=PAD)
        pos = base[:, None] + offs[None, :]
        return jnp.where(pos < n_text, v, PAD)

    def do_block(i, carry):
        lcp, flag = carry
        st = i * row_block
        ba = jax.lax.dynamic_slice(a, (st,), (row_block,))
        bb = jax.lax.dynamic_slice(b, (st,), (row_block,))
        bl = jax.lax.dynamic_slice(lcp, (st,), (row_block,))
        bf = jax.lax.dynamic_slice(flag, (st,), (row_block,))

        def cond(s):
            _, f, r = s
            return jnp.any(f == 1) & (r < max_rounds)

        def body(s):
            l, f, r = s
            act = f == 1
            wa = gat(ba + l)
            wb = gat(bb + l)
            eq = wa == wb
            run = jnp.cumprod(eq.astype(jnp.int32), axis=1).sum(axis=1)
            l = jnp.where(act, l + run, l)
            # l < n_text guards termination on contract-violating input
            # (duplicate table entries never mismatch).
            f = jnp.where(act & (run == w) & (l < n_text), 1, 0)
            return l, f, r + 1

        bl, bf, _ = jax.lax.while_loop(cond, body, (bl, bf, jnp.int32(0)))
        return (jax.lax.dynamic_update_slice(lcp, bl, (st,)),
                jax.lax.dynamic_update_slice(flag, bf, (st,)))

    lcp, flag = jax.lax.fori_loop(0, n_blocks, do_block, (lcp, flag))
    n_active = jnp.sum(jax.lax.dynamic_slice(flag, (0,), (s_pad,)))
    return lcp, flag, n_active


@functools.partial(jax.jit, static_argnames=("s_pad",))
def _bulk_compact_prefix(a, b, lcp, flag, perm, s_pad: int):
    """Re-sort the first s_pad rows active-first (rows move as a unit),
    so the deep pass touches a dense prefix."""
    sl = lambda x: jax.lax.dynamic_slice(x, (0,), (s_pad,))
    na = 1 - sl(flag)
    _, pa, pb, pl, pf, pp = jax.lax.sort(
        (na, sl(a), sl(b), sl(lcp), sl(flag), sl(perm)), num_keys=1,
        is_stable=False)
    upd = lambda x, v: jax.lax.dynamic_update_slice(x, v, (0,))
    return (upd(a, pa), upd(b, pb), upd(lcp, pl), upd(flag, pf),
            upd(perm, pp))


@jax.jit
def _bulk_finish(lcp_perm, perm, n_table):
    _, lcp = jax.lax.sort((perm, lcp_perm), num_keys=1, is_stable=False)
    idx = jnp.arange(lcp.shape[0], dtype=jnp.int32)
    valid = (idx > 0) & (idx < n_table)
    return jnp.where(valid, lcp, 0)


# ---------------------------------------------------------------------------
# Packed-window refine stage.
#
# Round-5 measurement (scripts/round5_study.py gather): random element
# gathers run at ~70M el/s on v5e regardless of window shape — a
# 128-byte window fetched bytewise costs 128 slow elements to advance
# 128 bytes, and the aligned-row trick (2x128-element rows) costs 256
# elements at row rate. Packing THREE 9-bit symbols per int32 (the
# packed-key encoding) moves 3 bytes per gathered element, so a
# 15-symbol window costs 7 elements instead of 15-256: the shallow
# refinement tiers (where the survivor mass is) become ~5x cheaper per
# matched byte. Deep lanes (multi-KiB boilerplate LCPs) still switch to
# the row-DMA stage where the row rate (~2.4G el/s) wins.
# ---------------------------------------------------------------------------


@jax.jit
def _text_words3(text: jax.Array) -> jax.Array:
    """9-bit-symbol packing of the padded text, 3 symbols per int32
    (symbol = byte + 1; PAD and past-the-end pack as 0)."""
    n_pad = text.shape[0]
    sym = jnp.where(text >= 0, text + 1, 0).astype(jnp.int32)
    n_w = n_pad // 3 + 2
    pad = jnp.zeros((3 * n_w - n_pad,), jnp.int32)
    s = jnp.concatenate([sym, pad])
    return (s[0::3][:n_w] << 18) | (s[1::3][:n_w] << 9) | s[2::3][:n_w]


def _packed_window(tw: jax.Array, base: jax.Array, S: int) -> jax.Array:
    """(lanes, S) symbol windows starting at byte offset ``base`` —
    ceil(S/3)+1 element gathers per lane plus register shifts.

    The in-lane alignment has only THREE phases (base mod 3), so the
    symbol extraction is unrolled statically per phase and selected —
    a dynamic take_along_axis here measured 8.04 s for the 8.4M-lane
    round at 128 MiB where the gather itself is ~1 s (round5_study
    lcpbulk128d)."""
    K = S // 3 + 2
    q = base // 3
    r = base % 3
    w = jnp.take(tw, q[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :],
                 mode="clip")
    outs = []
    for p in range(3):
        syms = [
            (w[:, (p + j) // 3] >> (18 - 9 * ((p + j) % 3))) & 0x1FF
            for j in range(S)
        ]
        outs.append(jnp.stack(syms, axis=1))
    return jnp.where((r == 0)[:, None], outs[0],
                     jnp.where((r == 1)[:, None], outs[1], outs[2]))


@functools.partial(jax.jit, static_argnames=("s_pad", "S", "row_block",
                                             "max_rounds"))
def _bulk_refine_packed(tw, n_text, a, b, lcp, flag, s_pad: int, S: int,
                        row_block: int, max_rounds: int):
    """Packed-symbol analogue of _bulk_refine_prefix: extend the first
    ``s_pad`` lanes by S-symbol packed compares per round."""
    assert s_pad % row_block == 0, (s_pad, row_block)
    n_blocks = s_pad // row_block
    offs = jnp.arange(S, dtype=jnp.int32)
    # Symbol 0 = past-the-end on both sides would spuriously match;
    # the in-bounds masks below supply the boundary mismatch instead.

    def do_block(i, carry):
        lcp, flag = carry
        st = i * row_block
        ba = jax.lax.dynamic_slice(a, (st,), (row_block,))
        bb = jax.lax.dynamic_slice(b, (st,), (row_block,))
        bl = jax.lax.dynamic_slice(lcp, (st,), (row_block,))
        bf = jax.lax.dynamic_slice(flag, (st,), (row_block,))

        def cond(s):
            _, f, r = s
            return jnp.any(f == 1) & (r < max_rounds)

        def body(s):
            l, f, r = s
            act = f == 1
            pa = ba + l
            pb = bb + l
            va = _packed_window(tw, pa, S)
            vb = _packed_window(tw, pb, S)
            in_a = pa[:, None] + offs[None, :] < n_text
            in_b = pb[:, None] + offs[None, :] < n_text
            eq = (va == vb) & in_a & in_b
            run = jnp.cumprod(eq.astype(jnp.int32), axis=1).sum(axis=1)
            l = jnp.where(act, l + run, l)
            f = jnp.where(act & (run == S) & (l < n_text), 1, 0)
            return l, f, r + 1

        bl, bf, _ = jax.lax.while_loop(cond, body, (bl, bf, jnp.int32(0)))
        return (jax.lax.dynamic_update_slice(lcp, bl, (st,)),
                jax.lax.dynamic_update_slice(flag, bf, (st,)))

    lcp, flag = jax.lax.fori_loop(0, n_blocks, do_block, (lcp, flag))
    n_active = jnp.sum(jax.lax.dynamic_slice(flag, (0,), (s_pad,)))
    return lcp, flag, n_active


# Refine ladder for the bulk engine: (kind, window, rounds) stages with
# re-compaction between them. Shallow tiers use packed-symbol windows
# (3 bytes per gathered element — see the measured rationale above);
# the deep tier keeps the aligned-row DMA windows. Coverage: 18 (keyed
# base) + 15*6 + 45*4 = 288 B through the packed tiers, then 2 KiB row
# windows until LCP_BULK_MAX_OFF. Measured shape (round5_study
# lcpbulk128, 128 MiB text): p15 resolves 4.64M -> 160k survivors;
# what remains is almost entirely the multi-kB boilerplate class, so
# the middle tier runs few rounds and the deep tier does the rest in
# ~2 window rounds.
# Stages keep round counts LOW and re-compact between stages instead:
# a gather runs for every lane of a block whether live or not (masking
# applies after the fetch), so a 6-round stage pays ~6x the round-1
# traffic while ~95% of lanes die in round 1 (measured decay at
# 128 MiB: 4.64M -> 160k). One compaction sort (~0.3 s at 8M rows) is
# far cheaper than a dead-lane gather round.
# The deep tier is SPLIT (2048-byte windows for 4 rounds, then 16 KiB
# windows to the budget): a single 2048-window stage ran its straggler
# lanes 32 rounds with every block lane re-fetched per round — 34.97 s
# of the 69.8 s warm ladder at 128 MiB (round5_study lcpbulk128d);
# after 4 rounds the stage re-compacts (stragglers are a handful of
# overlapping-boilerplate lanes) and the wide stage finishes them in
# <= 3 rounds of cheap few-lane row fetches.
LCP_BULK_LADDER = (("packed", 15, 1), ("packed", 15, 2), ("packed", 45, 3),
                   ("rows", 2048, 4), ("rows", 16384, 0))


def _lcp_bulk(text_dev, n: int, tab_dev, pk: tuple,
              block: int = 128, verbose: bool = False) -> np.ndarray | None:
    """Bulk-refine driver (host-staged; ~8 device dispatches). Returns
    the final uint32 LCP array, or None when lanes deeper than
    LCP_BULK_MAX_OFF remain (caller falls back to linear Kasai)."""
    import time as _time

    from suffix_tpu.ops.padding import bucket_size

    t0 = _time.perf_counter()
    n_pad = int(tab_dev.shape[0])
    p_a, p_prev, p_lcp, p_flag, perm, num_surv = _lcp_base_compact(
        tab_dev, jnp.int32(n), tuple(pk))
    n_act = int(num_surv)  # sync point
    if verbose:
        print(f"  [bulk] base+compact: {_time.perf_counter()-t0:.2f}s "
              f"surv={n_act}", flush=True)
    tw = None
    first = True
    for stage_i, (kind, w, rounds) in enumerate(LCP_BULK_LADDER):
        if n_act == 0:
            break
        t0 = _time.perf_counter()
        if not first:
            # Re-compact the active lanes to a dense prefix (rows move
            # as a unit; the finish sort un-permutes by rank anyway).
            s_prev = min(bucket_size(prev_act, minimum=256), n_pad)
            p_a, p_prev, p_lcp, p_flag, perm = _bulk_compact_prefix(
                p_a, p_prev, p_lcp, p_flag, perm, s_prev)
        s_pad = min(bucket_size(n_act, minimum=256), n_pad)
        last = stage_i == len(LCP_BULK_LADDER) - 1
        if last and rounds == 0:
            rounds = max(1, LCP_BULK_MAX_OFF // w)
        def pow2_block(budget: int) -> int:
            # row_block must tile s_pad (a power of two): round the
            # per-block lane budget DOWN to a power of two. Budgets are
            # sized so a block's window transient stays ~1 GB — small
            # blocks SERIALIZE (the block fori carries the while_loop:
            # 64 blocks x 32 rounds of 4096-lane gathers measured 18 s
            # of pure latency at 16 MiB before this sizing).
            return min(s_pad, max(256, 1 << (budget.bit_length() - 1)))

        if kind == "packed":
            if tw is None:
                tw = _text_words3(text_dev)
            p_lcp, p_flag, n_left = _bulk_refine_packed(
                tw, jnp.int32(n), p_a, p_prev, p_lcp, p_flag,
                s_pad, w, pow2_block((1 << 25) // w), max_rounds=rounds)
        else:
            p_lcp, p_flag, n_left = _bulk_refine_prefix(
                text_dev, jnp.int32(n), p_a, p_prev, p_lcp, p_flag,
                s_pad, w, pow2_block((1 << 27) // w), max_rounds=rounds)
        prev_act = n_act
        n_act = int(n_left)  # sync point
        if verbose:
            print(f"  [bulk] {kind} w={w} s_pad={s_pad} rounds<={rounds}: "
                  f"{_time.perf_counter()-t0:.2f}s left={n_act}",
                  flush=True)
        first = False
    if n_act > 0:
        return None  # beyond the bulk budget: linear Kasai wins
    t0 = _time.perf_counter()
    out = _bulk_finish(p_lcp, perm, jnp.int32(n))
    res = np.asarray(out)[:n].astype(np.uint32)
    if verbose:
        print(f"  [bulk] finish: {_time.perf_counter()-t0:.2f}s",
              flush=True)
    return res


def _kasai_route(text_bytes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Linear-time host route for the auto fallback (native, else numpy)."""
    from suffix_tpu import native

    if native.available():
        return native.kasai(np.asarray(text_bytes, np.uint8).tobytes(), sa)
    return kasai_host(text_bytes, sa)


# Sampled pre-census: above this estimated survivor fraction the corpus
# is clearly survivor-dense (the Kasai route wins by the measured
# routing table) and the device staging + exact census are skipped
# entirely. 2x the bulk bound (1/64) so borderline corpora still get
# the exact device census. With 64k samples the binomial CI at the
# threshold is ~±0.1%, far from flipping a 2/64-vs-1/64 decision.
LCP_SAMPLE_DENSE_FRAC = 2 / 64
LCP_SAMPLE_K = 1 << 16


def _sampled_survivor_rate(t_np: np.ndarray, sa: np.ndarray,
                           k: int = LCP_SAMPLE_K) -> float:
    """Estimated fraction of adjacent SA pairs sharing >= KEY_SYMS
    bytes — a host-side numpy probe (~ms) that lets survivor-dense
    corpora route to Kasai without touching the device. Pairs where a
    suffix ENDS inside the window count as survivors (conservative:
    overestimates push toward Kasai, and the exact census still decides
    anything near the boundary)."""
    from suffix_tpu.ops import search2

    n = int(sa.shape[0])
    if n < 2:
        return 0.0
    k = min(k, n - 1)
    rng = np.random.default_rng(0x5A17)
    ranks = rng.integers(1, n, size=k)
    offs = np.arange(search2.KEY_SYMS, dtype=np.int64)
    a = sa[ranks].astype(np.int64)[:, None] + offs
    b = sa[ranks - 1].astype(np.int64)[:, None] + offs
    in_a = a < n
    in_b = b < n
    wa = t_np[np.minimum(a, n - 1)]
    wb = t_np[np.minimum(b, n - 1)]
    eq = (wa == wb) & in_a & in_b
    surv = np.all(eq | ~in_a | ~in_b, axis=1)
    return float(surv.mean())


def lcp_from_sa(text_bytes: np.ndarray, sa: np.ndarray, block: int = 128,
                pk: tuple | None = None, method: str = "auto") -> np.ndarray:
    """Host wrapper: LCP array (uint32) from text bytes and its SA.

    ``method="auto"`` (default) routes by survivor census so wall time
    is bounded on every corpus class: few survivors -> the chunked
    refine; many (<= n/4) -> the staged bulk engine (constant dispatch
    count); degenerate repetition or beyond-budget LCP depth -> the
    linear host Kasai (the reference's own linear variant is
    *disabled*, src/table.rs:314-346 — this engine keeps a device fast
    path AND a bounded worst case). ``method="device"`` forces the
    unbounded chunked refine (O(sum-of-LCPs) on pathological corpora).
    """
    from suffix_tpu.ops.padding import bucket_size

    n = int(sa.shape[0])
    if n == 0:
        return np.empty((0,), dtype=np.uint32)
    n_pad = bucket_size(n)
    t_np = np.asarray(text_bytes, dtype=np.uint8)
    if method == "auto" and pk is None and n >= (1 << 20):
        # Survivor-dense corpora (text-class, repetition) route to the
        # linear Kasai without staging anything on device: a sampled
        # host census (~ms) decides clearly-dense cases — measured
        # ~40 s of staging + exact-census overhead at 128 MiB whose
        # only outcome was "use Kasai".
        if _sampled_survivor_rate(t_np, sa) > LCP_SAMPLE_DENSE_FRAC:
            return _kasai_route(t_np, sa)
    t_pad = np.full((n_pad,), PAD, dtype=np.int32)
    t_pad[:n] = t_np
    sa_pad = np.zeros((n_pad,), dtype=np.int32)
    sa_pad[:n] = sa
    t_dev = jnp.asarray(t_pad)
    tab_dev = jnp.asarray(sa_pad)
    if pk is None:
        from suffix_tpu.ops import search2

        # Flat rank-order keys through the sort unit: the per-word
        # gather build measured 12.7 s at 128 MiB vs ~2 s for the
        # 2-sort construction (round5_study gather/battery).
        pk = search2.packed_keys_rank_order(t_dev, tab_dev, n)
    if method == "auto":
        n_surv = int(_survivor_count(tuple(pk), jnp.int32(n)))
        if n_surv <= LCP_SURV_CHUNKED:
            out, unresolved = _lcp_keyed(t_dev, jnp.int32(n), tab_dev,
                                         jnp.int32(n), tuple(pk),
                                         block=block, max_off=LCP_MAX_OFF)
            if int(unresolved) > 0:
                return _kasai_route(t_np, sa)
        elif n_surv <= n // 64:
            # Sparse-repeat corpora stay on device. Survivor-DENSE
            # text (~3.5% of n) was tried on the r5 packed ladder and
            # still loses end-to-end: 70 s ladder + ~10 s result
            # readback vs 14-17 s host Kasai at 128 MiB (round5_study
            # lcpbulk128 warm per-stage) — the 70M el/s gather plateau
            # prices the 4.64M-survivor packed round at ~8 s alone, so
            # the host's linear pass keeps the host-out route.
            res = _lcp_bulk(t_dev, n, tab_dev, tuple(pk), block=block)
            if res is None:
                return _kasai_route(t_np, sa)
            return res
        else:
            # Survivor-dense corpus (text-class or repetition): the
            # linear host Kasai measured faster than any windowed
            # device refine (see routing notes above).
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
