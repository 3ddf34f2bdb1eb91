"""SA-IS re-derived for TPU: sample + stratified induced derivation.

The reference's engine (src/table.rs:388-574) is SA-IS: classify suffixes
S/L/LMS (P2), bucket by first byte (P3/P4), sort the LMS sample (P5-P11),
then two sequential induced-sort scans (P6/P7 and P13-P15) place every
suffix through per-bucket cursors. The scans read their own earlier writes
through the cursors — inherently serial, and the reason a line-for-line
port would be a terrible TPU program.

This module re-derives induced sorting as an *algebraic* rule that maps to
device sorts. Decompose any suffix as c^m·γ: m = its maximal same-char run
length, γ = the suffix right after the run.

- **L-suffixes** (run followed by a smaller char): within the bucket of c,
  L-suffixes order by (m ascending, order of γ). γ starts with a strictly
  smaller character and is either an L-suffix of a smaller bucket or an
  LMS suffix; LMS relative order comes from the sample, and the L→L
  dependency strictly decreases the first character — so all L-parts
  resolve in at most (longest strictly-descending character chain) rounds,
  each round one full-width device sort that finalizes every bucket whose
  dependencies are met.
- **S-suffixes** (run followed by a larger char; LMS included) are
  symmetric: order by (m descending, order of γ), γ in a strictly larger
  bucket, L-ranks already final — descending-character rounds.

Sample → L-phase → S-phase is exactly the reference's seed-LMS → induce-L
→ induce-S structure (src/table.rs:536-573), with cursor scans replaced by
segmented sorts. Output is bit-identical (the suffix array is unique).

Two engines share the derivation:

- ``suffix_array_sais_recursive`` — the full parity engine: LMS-substring
  sort -> naming -> RECURSIVE reduced-string build (the same pipeline at
  every level, over the integer name alphabet) -> stratified derivation,
  structurally matching the reference's recursion (src/table.rs:496-506)
  to arbitrary depth.
- ``suffix_array_sais`` — a hybrid by design: the LMS sample order comes
  from the prefix-doubling engine, the derivation is the stratified
  induce. Kept as an independent cross-check engine (two different
  sample sources must derive identical arrays).

The derivation itself never looks at full ranks — only the LMS class
ranks — and is pinned against the oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from suffix_tpu.ops.padding import PAD, bucket_size

INF = 0x7FFFFFFF
N_SYM = 258  # symbol alphabet 0..257 (PAD+1=0, bytes 1..256), one spare


def classify_types(text: jax.Array):
    """(is_s, is_lms) masks — reference P2 (src/table.rs:592-615) as an
    associative scan over the 'first non-zero from the right' semiring."""
    nxt = jnp.concatenate([text[1:], jnp.full((1,), -2, text.dtype)])
    c = jnp.sign(text - nxt).astype(jnp.int32)  # +1 L, -1 S, 0 inherit

    def op(a, b):
        return jnp.where(b != 0, b, a)

    resolved = jax.lax.associative_scan(op, c[::-1])[::-1]
    is_s = resolved == -1
    prev_s = jnp.concatenate([jnp.ones((1,), bool), is_s[:-1]])
    is_lms = is_s & jnp.logical_not(prev_s)
    return is_s, is_lms


def _int_histogram(values: jax.Array, n_bins: int) -> jax.Array:
    """Histogram over an arbitrary integer alphabet (recursion levels,
    where names range over [0, w)). The Pallas byte kernel caps at 512
    bins; larger alphabets use the XLA scatter-add — the parity engine's
    recursion levels are at most half the parent size, so this is never
    the dominant cost."""
    from suffix_tpu.ops.pallas_kernels import byte_histogram

    if n_bins <= 512:
        return byte_histogram(values, n_bins)
    ok = (values >= 0) & (values < n_bins)
    safe = jnp.where(ok, values, 0)
    return jnp.zeros((n_bins,), jnp.int32).at[safe].add(
        jnp.where(ok, 1, 0))


def bucket_layout(text: jax.Array, n_sym: int = N_SYM):
    """(counts, heads, tails) per symbol — the device Bins
    (src/table.rs:686-720): histogram (Pallas on TPU) +
    exclusive/inclusive scans. ``n_sym`` generalizes the bucket table to
    the reduced-name alphabets of the recursion (the reference's
    ``LexNames`` text, src/table.rs:823-866)."""
    sym = (text + 1).astype(jnp.int32)
    counts = _int_histogram(sym, n_sym)
    tails = jnp.cumsum(counts)
    heads = tails - counts
    return counts, heads, tails


def run_decompose(text: jax.Array):
    """(m, gamma): maximal same-char run length at each position and the
    index right after the run — segmented backward count scan."""
    n = text.shape[0]
    nxt = jnp.concatenate([text[1:], jnp.full((1,), -2, text.dtype)])
    run_end = text != nxt

    def op(x, y):
        cx, bx = x
        cy, by = y
        return jnp.where(by, cy, cx + cy), bx | by

    ones = jnp.ones((n,), jnp.int32)
    cnt_rev, _ = jax.lax.associative_scan(op, (ones[::-1], run_end[::-1]))
    m = cnt_rev[::-1]
    gamma = jnp.arange(n, dtype=jnp.int32) + m
    return m, gamma


def _own_segment_end_value(seg_key: jax.Array, values: jax.Array):
    """For each element of a segment-sorted array: ``values`` at the last
    element of its own segment (nearest segment end at or to the right).
    ``values`` must be strictly positive at segment ends to distinguish
    from interior zeros."""
    is_end = jnp.concatenate([seg_key[1:] != seg_key[:-1],
                              jnp.ones((1,), bool)])
    planted = jnp.where(is_end, values, 0)

    def op(a, b):
        # first non-zero from the right
        return jnp.where(b != 0, b, a)

    return jax.lax.associative_scan(op, planted[::-1])[::-1]


def _segment_positions(seg_key: jax.Array):
    """For a sorted key array: position of each element within its equal-key
    segment, and the segment-start index array."""
    n = seg_key.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), seg_key[1:] != seg_key[:-1]]
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, 0)
    )
    return idx - seg_start, seg_start


@functools.partial(jax.jit, static_argnames=("max_rounds", "n_sym"))
def _derive_sa(text: jax.Array, lms_class_rank: jax.Array,
               max_rounds: int = N_SYM, n_sym: int = N_SYM) -> jax.Array:
    """Full SA from LMS class ranks via stratified L/S derivation.

    ``n_sym`` is the symbol-alphabet size (258 for the byte level; the
    padded name count + 1 for recursion levels). The round bound follows
    the strictly-descending character-chain depth, which is < n_sym.
    """
    n = text.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sym = (text + 1).astype(jnp.int32)

    with jax.named_scope("S1_classify_buckets"):
        is_s, is_lms = classify_types(text)
        is_l = jnp.logical_not(is_s)
        m, gamma = run_decompose(text)
        counts, heads, tails = bucket_layout(text, n_sym)
    g_clip = jnp.minimum(gamma, n - 1)
    g_sym = jnp.take(sym, gamma, mode="fill", fill_value=-1)  # -1: text end
    g_is_lms = jnp.take(is_lms, g_clip) & (gamma < n)

    # ---------------- L-phase ----------------
    # γ of an L-suffix: text end, an LMS suffix, or an L-suffix of a
    # strictly smaller bucket. Surrogate γ-key: (bucket*2 + class, rank)
    # with class L=0 < LMS=1; rank = resolved L-rank or LMS class rank.
    l_seg_key = jnp.where(is_l, sym, jnp.int32(n_sym))  # non-L sink segment

    def l_cond(state):
        l_rank, rounds = state
        return jnp.any(is_l & (l_rank == INF)) & (rounds < max_rounds)

    def l_round(state):
        with jax.named_scope("S2_L_phase_round"):
            l_rank, rounds = state
            g_lrank = jnp.take(l_rank, g_clip)
            g_hi = jnp.where(
                gamma >= n, -1,
                g_sym * 2 + jnp.where(g_is_lms, 1, 0),
            )
            g_lo = jnp.where(gamma >= n, 0,
                             jnp.where(g_is_lms,
                                       jnp.take(lms_class_rank, g_clip),
                                       g_lrank))
            ready = (gamma >= n) | g_is_lms | (g_lrank != INF)
            not_ready = jnp.where(ready, 0, 1).astype(jnp.int32)
            sk, srdy, _, _, _, sidx = jax.lax.sort(
                (l_seg_key, not_ready, m, g_hi, g_lo, idx), num_keys=5
            )
            pos, seg_start = _segment_positions(sk)
            # A bucket finalizes only when every candidate in it is ready;
            # unready ones sort to the segment end, so each element checks
            # its OWN segment's last element via a 'nearest end to the
            # right' scan (2 = ready end, 1 = unready end, 0 = interior).
            seg_end_ready = _own_segment_end_value(sk, 2 - srdy)
            bucket_head = jnp.take(heads, jnp.minimum(sk, n_sym - 1))
            cand = bucket_head + pos
            ok = (sk < n_sym) & (seg_end_ready == 2)
            new_rank = jnp.full((n,), INF, jnp.int32).at[sidx].set(
                jnp.where(ok, cand, INF)
            )
            return new_rank, rounds + 1

    l_rank0 = jnp.full((n,), INF, jnp.int32)
    l_rank, _ = jax.lax.while_loop(l_cond, l_round, (l_rank0, jnp.int32(0)))

    # ---------------- S-phase ----------------
    # γ of an S-suffix starts with a strictly larger character and is an
    # L-suffix (absolute rank final) or an S-suffix of a larger bucket.
    # Absolute ranks are comparable directly (L-parts precede S-parts and
    # bucket layout is global), so the γ-key is one word.
    from suffix_tpu.ops.pallas_kernels import byte_histogram

    s_count = _int_histogram(jnp.where(is_s, sym, -1), n_sym)
    s_part_start = tails - s_count
    s_seg_key = jnp.where(is_s, sym, jnp.int32(n_sym))

    def s_cond(state):
        s_rank, rounds = state
        return jnp.any(is_s & (s_rank == INF)) & (rounds < max_rounds)

    def s_round(state):
        with jax.named_scope("S3_S_phase_round"):
            s_rank, rounds = state
            g_l = jnp.take(is_l, g_clip)
            g_abs = jnp.where(g_l, jnp.take(l_rank, g_clip),
                              jnp.take(s_rank, g_clip))
            ready = g_abs != INF  # S γ always exists (PAD tail is L-typed)
            not_ready = jnp.where(ready, 0, 1).astype(jnp.int32)
            neg_m = -m
            sk, srdy, _, _, sidx = jax.lax.sort(
                (s_seg_key, not_ready, neg_m, g_abs, idx), num_keys=4
            )
            pos, _ = _segment_positions(sk)
            seg_end_ready = _own_segment_end_value(sk, 2 - srdy)
            base = jnp.take(s_part_start, jnp.minimum(sk, n_sym - 1))
            cand = base + pos
            ok = (sk < n_sym) & (seg_end_ready == 2)
            new_rank = jnp.full((n,), INF, jnp.int32).at[sidx].set(
                jnp.where(ok, cand, INF)
            )
            return new_rank, rounds + 1

    s_rank0 = jnp.full((n,), INF, jnp.int32)
    s_rank, _ = jax.lax.while_loop(s_cond, s_round, (s_rank0, jnp.int32(0)))

    rank = jnp.where(is_l, l_rank, s_rank)
    sa = jnp.zeros((n,), jnp.int32).at[rank].set(idx)
    return sa


@functools.partial(jax.jit, static_argnames=())
def _lms_class_rank_from_doubling(text: jax.Array) -> jax.Array:
    """LMS class ranks via the doubling engine (recursion stand-in)."""
    from suffix_tpu.ops.prefix_doubling import _suffix_array_padded

    n = text.shape[0]
    _, is_lms = classify_types(text)
    sa = _suffix_array_padded(text)
    flag = jnp.take(is_lms, sa).astype(jnp.int32)
    class_rank_sorted = jnp.cumsum(flag) - flag
    return jnp.zeros((n,), jnp.int32).at[sa].set(class_rank_sorted)


def suffix_array_sais(data: bytes | np.ndarray) -> np.ndarray:
    """Suffix array via the SA-IS-structured engine (uint32 offsets)."""
    arr = (
        np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, (bytes, bytearray))
        else np.asarray(data, dtype=np.uint8)
    )
    n = int(arr.shape[0])
    if n == 0:
        return np.empty((0,), dtype=np.uint32)
    n_pad = bucket_size(n)
    padded = np.full((n_pad,), PAD, dtype=np.int32)
    padded[:n] = arr
    t = jnp.asarray(padded)
    lms_rank = _lms_class_rank_from_doubling(t)
    sa_full = np.asarray(_derive_sa(t, lms_rank))
    return sa_full[n_pad - n:].astype(np.uint32)


# ---------------------------------------------------------------------------
# Genuine SA-IS recursion: LMS-substring sort -> naming -> reduced string
# ---------------------------------------------------------------------------
#
# Pass-1 of the reference (src/table.rs:411-463) induced-sorts LMS
# *substrings* and names them with a type-aware equality
# (src/table.rs:802-820). Here the substrings are sorted directly by
# prefix-tripling over 10-bit (char,type) symbols — (char+1)*2 + is_S, so
# L < S at equal characters, substring end (0) below everything — which
# reproduces the induced substring order without a sequential pass. Equal
# names = equal (char,type) sequences of equal length, exactly
# wstring_equal. If names repeat, the reduced string of names (text
# order) is built and its suffix array gives the LMS sample order — the
# reference's recursion (src/table.rs:496-506) as a device build.


def _lms_substring_ranks(text: jax.Array, max_rounds: int = 2048):
    """(rank, is_lms, num_names, w): dense substring rank per LMS position
    (equal substrings share a rank), under the SA-IS substring order."""
    n = text.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_s, is_lms = classify_types(text)
    sym10 = ((text + 1) * 2 + jnp.where(is_s, 1, 0)).astype(jnp.int32)

    # Inclusive substring end: next LMS position strictly after i (n if
    # none) — reversed min-scan of planted LMS indices.
    planted = jnp.where(is_lms, idx, n)
    nxt_incl = jax.lax.associative_scan(jnp.minimum, planted[::-1])[::-1]
    sub_end = jnp.concatenate([nxt_incl[1:], jnp.full((1,), n, jnp.int32)])

    sym_ext = jnp.concatenate([sym10, jnp.zeros((n,), jnp.int32)])
    end_ext = jnp.concatenate([sub_end, jnp.full((n,), -1, jnp.int32)])

    def word_at(starts, off):
        """Pack 3 substring symbols at offset ``off`` (0 past the end)."""
        s_clip = jnp.minimum(starts, 2 * n - 1)
        ends = jnp.take(end_ext, s_clip)
        out = jnp.zeros((n,), jnp.int32)
        for j in range(3):
            pos = starts + off + j
            v = jnp.take(sym_ext, jnp.minimum(pos, 2 * n - 1))
            v = jnp.where(pos <= ends, v, 0)
            out = (out << 10) | v
        return out

    INFK = jnp.int32(INF)
    w_lms = jnp.sum(is_lms.astype(jnp.int32))

    # Round 0: rank by the first 3 symbols.
    key0 = jnp.where(is_lms, word_at(idx, 0), INFK)
    k_s, order = jax.lax.sort((key0, idx), num_keys=1)
    flag = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (k_s[1:] != k_s[:-1]).astype(jnp.int32)]
    )
    dense = jnp.cumsum(flag)
    rank = jnp.full((n,), INFK, jnp.int32).at[order].set(
        jnp.where(k_s == INFK, INFK, dense)
    )
    # A group stays active while its members tie AND their substrings
    # have not both ended (word != 0 at the next offset).
    def cond(state):
        _, active_any, _, rounds = state
        return active_any & (rounds < max_rounds)

    def body(state):
        rank, _, off, rounds = state
        word = jnp.where(is_lms, word_at(idx, off), 0)
        r_s, w_s, order = jax.lax.sort(
            (rank, word, idx), num_keys=3
        )
        tie = (r_s[1:] == r_s[:-1]) & (w_s[1:] == w_s[:-1])
        flag = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.logical_not(tie).astype(jnp.int32)]
        )
        dense = jnp.cumsum(flag)
        new_rank = jnp.full((n,), INFK, jnp.int32).at[order].set(
            jnp.where(r_s == INFK, INFK, dense)
        )
        # Still-active ties: tied AND the word was non-zero (substring
        # continues). Tied with word 0 == equal substrings, final.
        still = tie & (w_s[1:] != 0) & (r_s[1:] != INFK)
        return new_rank, jnp.any(still), off + 3, rounds + 1

    rank, _, _, _ = jax.lax.while_loop(
        cond, body, (rank, jnp.bool_(True), jnp.int32(3), jnp.int32(0))
    )
    # Dense 0-based names over LMS positions only.
    lms_sorted = jnp.sort(jnp.where(is_lms, rank, INFK))
    uniq_flag = jnp.concatenate(
        [
            (lms_sorted[:1] != INFK).astype(jnp.int32),
            ((lms_sorted[1:] != lms_sorted[:-1])
             & (lms_sorted[1:] != INFK)).astype(jnp.int32),
        ]
    )
    num_names = jnp.sum(uniq_flag)
    return rank, is_lms, num_names, w_lms


@functools.partial(jax.jit, static_argnames=())
def _suffix_array_ints(vals: jax.Array) -> jax.Array:
    """Suffix array of an int32 sequence (values >= 0; -1 = padding).

    The recursion base: prefix-quadrupling over an arbitrary integer
    alphabet (no byte packing).
    """
    n = vals.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    neg = jnp.full((n,), -1, jnp.int32)

    r_sorted, sa0 = jax.lax.sort((vals, idx), num_keys=1)
    flag = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         (r_sorted[1:] != r_sorted[:-1]).astype(jnp.int32)]
    )
    dense0 = jnp.cumsum(flag)
    _, rank = jax.lax.sort((sa0, dense0), num_keys=1)
    done0 = dense0[-1] == n - 1

    def cond(state):
        _, _, k, done = state
        return jnp.logical_and(jnp.logical_not(done), k < 2 * n)

    def body(state):
        rank, _, k, _ = state
        rank_ext = jnp.concatenate([rank, neg])

        def shifted(mult):
            off = jnp.minimum(mult * k, n)
            return jax.lax.dynamic_slice(rank_ext, (off,), (n,))

        s1, s2, s3 = shifted(1), shifted(2), shifted(3)
        r1, r2, r3, r4, sa = jax.lax.sort(
            (rank, s1, s2, s3, idx), num_keys=5
        )
        diff = (
            (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
            | (r3[1:] != r3[:-1]) | (r4[1:] != r4[:-1])
        )
        flag = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), diff.astype(jnp.int32)]
        )
        dense = jnp.cumsum(flag)
        done = dense[-1] == n - 1
        new_rank = jax.lax.cond(
            done, lambda: rank,
            lambda: jax.lax.sort((sa, dense), num_keys=1)[1],
        )
        return (new_rank, sa, k * 4, done)

    _, sa, _, _ = jax.lax.while_loop(cond, body, (rank, sa0, jnp.int32(1), done0))
    return sa


_lms_substring_ranks_jit = jax.jit(_lms_substring_ranks)


def _lms_substring_ranks_wide(text: jax.Array, max_rounds: int = 1 << 30):
    """(rank, is_lms, num_names, w): like ``_lms_substring_ranks`` but for
    arbitrary integer alphabets (the recursion's name strings, the
    reference's ``LexNames`` text, src/table.rs:823-866), where (char,type)
    symbols no longer fit a 10-bit packing. Each round sorts by three
    separate int32 symbol operands instead of one packed word."""
    n = text.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_s, is_lms = classify_types(text)
    # (char+1)*2 + is_S: L < S at equal characters, substring end (0)
    # below everything — same symbol order as the packed byte path.
    sym2 = ((text + 1) * 2 + jnp.where(is_s, 1, 0)).astype(jnp.int32)

    planted = jnp.where(is_lms, idx, n)
    nxt_incl = jax.lax.associative_scan(jnp.minimum, planted[::-1])[::-1]
    sub_end = jnp.concatenate([nxt_incl[1:], jnp.full((1,), n, jnp.int32)])

    sym_ext = jnp.concatenate([sym2, jnp.zeros((n,), jnp.int32)])
    end_ext = jnp.concatenate([sub_end, jnp.full((n,), -1, jnp.int32)])

    def sym_at(starts, off, j):
        """Substring symbol at offset ``off + j`` (0 past the end)."""
        s_clip = jnp.minimum(starts, 2 * n - 1)
        ends = jnp.take(end_ext, s_clip)
        pos = starts + off + j
        v = jnp.take(sym_ext, jnp.minimum(pos, 2 * n - 1))
        return jnp.where(pos <= ends, v, 0)

    INFK = jnp.int32(INF)
    w_lms = jnp.sum(is_lms.astype(jnp.int32))

    # Round 0: rank by the first 3 symbols (three operands, unpacked).
    k0 = jnp.where(is_lms, sym_at(idx, 0, 0), INFK)
    k1 = jnp.where(is_lms, sym_at(idx, 0, 1), 0)
    k2 = jnp.where(is_lms, sym_at(idx, 0, 2), 0)
    k0s, k1s, k2s, order = jax.lax.sort((k0, k1, k2, idx), num_keys=3)
    diff = ((k0s[1:] != k0s[:-1]) | (k1s[1:] != k1s[:-1])
            | (k2s[1:] != k2s[:-1]))
    flag = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), diff.astype(jnp.int32)]
    )
    dense = jnp.cumsum(flag)
    rank = jnp.full((n,), INFK, jnp.int32).at[order].set(
        jnp.where(k0s == INFK, INFK, dense)
    )

    def cond(state):
        _, active_any, _, rounds = state
        return active_any & (rounds < max_rounds)

    def body(state):
        rank, _, off, rounds = state
        wa = jnp.where(is_lms, sym_at(idx, off, 0), 0)
        wb = jnp.where(is_lms, sym_at(idx, off, 1), 0)
        wc = jnp.where(is_lms, sym_at(idx, off, 2), 0)
        r_s, a_s, b_s, c_s, order = jax.lax.sort(
            (rank, wa, wb, wc, idx), num_keys=4
        )
        tie = ((r_s[1:] == r_s[:-1]) & (a_s[1:] == a_s[:-1])
               & (b_s[1:] == b_s[:-1]) & (c_s[1:] == c_s[:-1]))
        flag = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.logical_not(tie).astype(jnp.int32)]
        )
        dense = jnp.cumsum(flag)
        new_rank = jnp.full((n,), INFK, jnp.int32).at[order].set(
            jnp.where(r_s == INFK, INFK, dense)
        )
        # Still-active ties: tied AND some symbol in the window was real
        # (the substring continues past it).
        cont = (a_s[1:] != 0) | (b_s[1:] != 0) | (c_s[1:] != 0)
        still = tie & cont & (r_s[1:] != INFK)
        return new_rank, jnp.any(still), off + 3, rounds + 1

    rank, _, _, _ = jax.lax.while_loop(
        cond, body, (rank, jnp.bool_(True), jnp.int32(3), jnp.int32(0))
    )
    lms_sorted = jnp.sort(jnp.where(is_lms, rank, INFK))
    uniq_flag = jnp.concatenate(
        [
            (lms_sorted[:1] != INFK).astype(jnp.int32),
            ((lms_sorted[1:] != lms_sorted[:-1])
             & (lms_sorted[1:] != INFK)).astype(jnp.int32),
        ]
    )
    num_names = jnp.sum(uniq_flag)
    return rank, is_lms, num_names, w_lms


_lms_substring_ranks_wide_jit = jax.jit(_lms_substring_ranks_wide)


@functools.partial(jax.jit, static_argnames=("w_pad",))
def _build_reduced(sub_rank: jax.Array, is_lms: jax.Array, w_pad: int):
    """Reduced string of LMS-substring names in text order (padded to
    ``w_pad``) and each position's LMS ordinal (reference P13 list,
    src/table.rs:512-530)."""
    lms_ord = jnp.cumsum(is_lms.astype(jnp.int32)) - is_lms.astype(jnp.int32)
    reduced = jnp.full((w_pad,), -1, jnp.int32)
    reduced = reduced.at[jnp.where(is_lms, lms_ord, w_pad)].set(
        jnp.where(is_lms, sub_rank, 0), mode="drop"
    )
    return reduced, lms_ord


@jax.jit
def _rank_from_reduced_sa(is_lms: jax.Array, lms_ord: jax.Array,
                          sa_reduced: jax.Array, w_lms: jax.Array):
    """Map reduced-suffix ranks back to LMS class ranks per position."""
    w_pad = sa_reduced.shape[0]
    # Pads (-1) sort first and occupy the lowest (w_pad - w_lms) ranks.
    red_rank = jnp.zeros((w_pad,), jnp.int32).at[sa_reduced].set(
        jnp.arange(w_pad, dtype=jnp.int32) - (w_pad - w_lms)
    )
    return jnp.where(
        is_lms, jnp.take(red_rank, jnp.minimum(lms_ord, w_pad - 1)), 0
    )


@jax.jit
def _mask_lms_rank(is_lms: jax.Array, sub_rank: jax.Array) -> jax.Array:
    return jnp.where(is_lms, sub_rank, 0)


_MAX_RECURSION_DEPTH = 64  # w halves per level; 64 covers any int32 text


def _lms_rank_via_reduction(text: jax.Array, w_pad: int, *,
                            depth: int = 0,
                            stats: dict | None = None) -> jax.Array:
    """LMS class ranks via the genuine SA-IS reduction, host-stepped and
    RECURSIVE (reference src/table.rs:496-506).

    Sorts LMS substrings, names them, and — only when names repeat —
    builds the reduced string of names in text order, suffix-sorts it by
    running THIS SAME PIPELINE on the integer name alphabet (classify →
    LMS-substring sort → naming → recurse → stratified derivation), and
    maps reduced ranks back to LMS positions. When every name is unique
    the substring ranks already ARE the LMS suffix order and the
    recursion terminates — the reference's direct inverse permutation
    branch (src/table.rs:501-506). The reduced string has at most half
    the parent's length, so the depth is bounded by log2(n), exactly as
    the reference's in-place recursion (src/table.rs:466-468).

    Host-stepping keeps each device program small: the substring sort,
    the reduced-string build, the per-level derivation, and the map-back
    compile independently (and cache independently), instead of one
    monolithic multi-loop program.

    ``stats`` (optional) records {"depth": max recursion depth reached}
    so tests can pin that deep inputs (Fibonacci/Thue-Morse words)
    genuinely recurse past level 1.
    """
    if depth >= _MAX_RECURSION_DEPTH:  # pragma: no cover - log2 bound
        raise RuntimeError("SA-IS recursion exceeded its log2(n) bound")
    if stats is not None:
        stats["depth"] = max(stats.get("depth", 0), depth)
    if depth == 0:
        sub_rank, is_lms, num_names, w_lms = _lms_substring_ranks_jit(text)
    else:
        sub_rank, is_lms, num_names, w_lms = (
            _lms_substring_ranks_wide_jit(text))
    if int(num_names) == int(w_lms):
        return _mask_lms_rank(is_lms, sub_rank)
    reduced, lms_ord = _build_reduced(sub_rank, is_lms, w_pad)
    sa_reduced = _sa_padded_sais_ints(reduced, depth=depth + 1, stats=stats)
    return _rank_from_reduced_sa(is_lms, lms_ord, sa_reduced, w_lms)


def _sa_padded_sais_ints(vals: jax.Array, *, depth: int,
                         stats: dict | None = None) -> jax.Array:
    """Full padded SA of an int32 name string (values >= 0, -1 padding at
    the end) via one SA-IS level: reduction (recursing further if names
    repeat) + stratified induced derivation over the integer alphabet.

    This is the recursion's inner level — the reference runs ``sais`` on
    ``&LexNames(reduced)`` (src/table.rs:499); here the identical device
    pipeline runs with the symbol alphabet widened to the name space.
    """
    n_pad = vals.shape[0]
    w_pad = bucket_size(max(n_pad // 2, 8))
    lms_rank = _lms_rank_via_reduction(vals, w_pad, depth=depth,
                                       stats=stats)
    # Name alphabet: PAD+1 = 0 plus names shifted to 1..n_pad; chain
    # depth (and so the derivation round bound) is < n_sym.
    n_sym = n_pad + 2
    return _derive_sa(vals, lms_rank, max_rounds=n_sym, n_sym=n_sym)


def suffix_array_sais_recursive(data: bytes | np.ndarray,
                                stats: dict | None = None) -> np.ndarray:
    """Suffix array via the full SA-IS pipeline with genuine multi-level
    recursion (substring sort -> naming -> recursive reduced-string build
    -> stratified induced derivation). uint32 offsets.

    ``stats`` (optional dict) receives {"depth": N} — the deepest
    recursion level taken (0 = no reduction needed)."""
    arr = (
        np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, (bytes, bytearray))
        else np.asarray(data, dtype=np.uint8)
    )
    n = int(arr.shape[0])
    if n == 0:
        return np.empty((0,), dtype=np.uint32)
    n_pad = bucket_size(n)
    padded = np.full((n_pad,), PAD, dtype=np.int32)
    padded[:n] = arr
    t = jnp.asarray(padded)
    w_pad = bucket_size(max(n_pad // 2, 8))
    lms_rank = _lms_rank_via_reduction(t, w_pad, stats=stats)
    sa_full = np.asarray(_derive_sa(t, lms_rank))
    return sa_full[n_pad - n:].astype(np.uint32)
