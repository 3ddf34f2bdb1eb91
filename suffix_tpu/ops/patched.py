"""Defect-tolerant periodic construction — the "patched periodic" engine.

The reference's own scaling stress corpus is a repeated FASTA fixture
(NOTES.md:66-79, the 10 MB tiled build that took its SA-IS 212.7 s).
Round 4 added a closed-form derivation for EXACTLY periodic corpora
(ops/prefix_doubling.py `_periodic_dispatch`); real near-duplicate
corpora, however, carry sparse defects — point mutations, patch edits —
and any inexactness used to fall back to full doubling: ~log4(n/q)
global 5-operand sorts (ARCHITECTURE.md "the repeated-corpus floor").

This engine shatters that floor for VERIFIED near-periodic corpora:

probe    A candidate period q plus its exact defect set
         D = {x : T[x] != T[x+q]} (one vectorized compare — computed,
         never assumed; prefix_doubling._period_probe).

phase A  The standard adaptive initial sort, plus quadrupling rounds
         only if needed, until every surviving tie group is PHASE-PURE:
         all members congruent mod q (checked on device each round).
         For a primitive-ish period this holds immediately — distinct
         rotations of the period separate within the packed initial
         width, so only same-phase suffixes can still tie.

closed   Same-phase order then has a closed form built from D alone.
form     Rows R_a = T[aq:(a+1)q] differ pairwise ONLY at the defect
         columns C = {d mod q : d in D}: for any column j not in C,
         T[aq+j] = T[(a+1)q+j] = ... telescopes through every
         non-defect q-shift. Hence
           - row order, and the order of row TAILS T[c+aq:(a+1)q]
             from any column c, are functions of the tiny (k x |C|)
             byte signature matrix (with the partial tail row as one
             extra truncated signature);
           - comparing two same-phase suffixes (c,a) vs (c,b) reduces
             to (row-tail order from c, then the walk over following
             whole rows), and the walk order is the suffix order of
             the length <= k+1 string of row symbols, computed on host
             in microseconds.
         The in-group key rides every phase-A sort as one trailing
         operand, so the sort that REACHES purity emits the SA
         directly (r5: the separate finish sort was one of three
         full-width passes and is gone).

Soundness never rests on the probe being "right": the defect set is
exact by construction, phase purity is verified on device, and an
impure state simply keeps doubling to completion inside the same
compiled program (classic-engine behavior, bit-identical output).
Reference behavior matched: src/table.rs:78-85 (`SuffixTable::new`
order semantics); parity pinned by tests/test_patched.py against the
naive oracle and the classic engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from suffix_tpu.ops.padding import PAD, bucket_size

# Routing gates (checked by prefix_doubling.device_build_closure):
# enough tiles that doubling would pay real rounds, few enough that the
# host-side signature tables stay trivial.
PATCH_MIN_TILES = 8
PATCH_KMAX = 4096
# Width cap for the rotation-separation lever: phase A may widen the
# initial packed sort to this many words to reach purity WITHOUT any
# quadrupling round (each round costs a 5-operand sort plus a scatter
# — ~60 ms of the 88.7 ms round-5-start build on the 4 MiB fixture,
# round5_study nearrep — while extra sort operands are far cheaper).
PATCH_MAX_WORDS = 16
# Host table work is O(n_intervals * n_classes * |cols|); refuse corpora
# where that product stops being negligible next to the device build.
PATCH_TABLE_BUDGET = 1 << 26


def _host_suffix_ranks(s: np.ndarray) -> np.ndarray:
    """Suffix ranks of a tiny integer string (standard host doubling).

    rank[a] = number of suffixes of ``s`` strictly below the suffix
    starting at a, under the usual "a proper prefix sorts first" rule
    (the sentinel semantics of the main engine, padding.py): the shifted
    key past the end is -1, below every real rank.
    """
    s = np.asarray(s, np.int64)
    m = int(s.size)
    if m == 0:
        return np.zeros((0,), np.int32)
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    h = 1
    while h < m and int(rank.max()) < m - 1:
        key2 = np.full(m, -1, np.int64)
        key2[:m - h] = rank[h:]
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        neq = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        newr = np.zeros(m, np.int64)
        newr[1:] = np.cumsum(neq)
        rank = np.empty(m, np.int64)
        rank[order] = newr
        h *= 2
    return rank.astype(np.int32)


def _patch_tables(arr: np.ndarray, q: int, defects: np.ndarray):
    """Host-side closed-form tables for the patched-periodic engine.

    Returns None when over budget, else a dict of small numpy arrays:

      bnds     interval boundaries over the column c = i mod q: the
               restricted column set {cols >= c} loses a column exactly
               when c passes it (boundary col+1), and the tail row dies
               when c reaches the tail length t (boundary t); the
               interval id is v(c) = #(bnds <= c)
      cls      per-row class id, rows 0..k-1 plus the tail row as its
               own class (index n_cls-1)
      rankT    (n_intervals x n_classes) dense rank WITH TIES of the
               row tails from any column in the interval — a tie means
               equal tail strings, resolved by the walk rank
      rank_s   walk order: suffix ranks of the row-symbol string, with
               a trailing -1 for the empty walk (ends smallest — the
               sentinel rule)
    """
    n = int(arr.size)
    k = n // q
    t = n - k * q
    cols = np.unique(np.asarray(defects, np.int64) % q)
    U = int(cols.size)
    if (k + 2) * (U + 2) * (U + 2) > PATCH_TABLE_BUDGET:
        return None
    if U:
        Sig = arr[np.arange(k, dtype=np.int64)[:, None] * q + cols[None, :]]
    else:
        Sig = np.zeros((k, 0), np.uint8)
    uniq, cls_of_row = np.unique(Sig, axis=0, return_inverse=True)
    C = int(uniq.shape[0])
    n_cls = C + 1  # + the (possibly absent) tail-row class
    # cols[:ut] fall inside the tail row (length t).
    ut = int(np.searchsorted(cols, t))
    tail_sig = (arr[k * q + cols[:ut]].astype(np.int32)
                if t > 0 else np.zeros((0,), np.int32))
    bnds = np.unique(np.concatenate([cols + 1, np.asarray([t], np.int64)]))
    bnds = bnds[(bnds > 0) & (bnds < q)]
    n_int = int(bnds.size) + 1
    los = np.concatenate([np.zeros((1,), np.int64), bnds])
    rankT = np.zeros((n_int, n_cls), np.int32)
    uniq32 = uniq.astype(np.int32)
    for r in range(n_int):
        lo = int(los[r])
        u0 = int(np.searchsorted(cols, lo, side="left"))
        W = (U - u0) + 1
        M = np.zeros((n_cls, W), np.int32)
        M[:C, :W - 1] = uniq32[:, u0:]
        # Full rows carry 0 in the trailing slot; the tail row carries
        # -1 from its truncation point on: an equal-prefix comparison
        # then decides "tail ends first -> tail smaller" (the sentinel
        # rule), while full rows tie there harmlessly (equal strings).
        if t > 0 and lo < t:
            row_t = np.full((W,), -1, np.int32)
            tb = tail_sig[u0:ut]
            row_t[:tb.size] = tb
            M[C] = row_t
        else:
            M[C] = -1  # tail row dead here; never queried (c >= t)
        order = np.lexsort(M[:, ::-1].T)
        Ms = M[order]
        neq = (Ms[1:] != Ms[:-1]).any(axis=1)
        dr = np.zeros(n_cls, np.int32)
        dr[1:] = np.cumsum(neq)
        rankT[r, order] = dr
    # Walk order: row symbols are the full-string ranks (interval 0
    # restricts nothing), the tail symbol — present only when t > 0 —
    # terminates every walk it appears in (it never ties a full row:
    # different lengths).
    sym = rankT[0, cls_of_row]
    if t > 0:
        sym = np.concatenate([sym, rankT[0, C:C + 1]])
    rank_walk = _host_suffix_ranks(sym)
    # rank_s[a] ranks the walk starting at row a; the one-past-the-end
    # entry is the empty walk, strictly smallest.
    rank_s = np.concatenate([rank_walk, np.asarray([-1], np.int32)])
    cls = np.concatenate([cls_of_row.astype(np.int32),
                          np.asarray([C], np.int32)])
    return {
        "bnds": bnds.astype(np.int32),
        "cls": cls,
        "rankT": rankT.reshape(-1),
        "rank_s": rank_s.astype(np.int32),
        "n_cls": n_cls,
        "k": k,
    }


def _staged(x: np.ndarray, fill) -> jax.Array:
    """Stage a small host table on device, padded to a bucket so the
    compiled program shape does not depend on the corpus' defect count."""
    b = bucket_size(max(int(x.size), 1))
    out = np.full((b,), fill, np.int32)
    out[:x.size] = x
    return jnp.asarray(out)


def _patched_core(words, h0, index_dtype, n, q, bnds, cls_arr, rankT_flat,
                  rank_s, n_cls, rs_cap, with_stats: bool = False):
    """One compiled program: adaptive initial sort -> quadrupling rounds
    with a per-round phase-purity check -> the closed-form order FUSED
    into the sorts (pure), or classic continuation to completion
    (never pure).

    The closed-form in-group key ``small`` (a pure function of the
    suffix index — column interval x row class rank + walk rank, from
    the tiny host tables) rides EVERY sort as one extra trailing key:
    the moment a sort's leading keys reach phase purity, its tie
    groups are already ordered by ``small`` and the sorted idx column
    IS the suffix array — the separate 3-operand finish sort of the
    first r5 design (~18 ms at 4 MiB, one of three full-width passes)
    disappears. Costs one extra operand per executed sort (~6 ms).

    ``h0``, ``n``, ``q``, ``n_cls``, ``rs_cap`` are traced scalars — one
    compile per (shape bucket, pack plan), not per corpus.
    ``with_stats`` additionally returns (h_final, done, pure) — the
    metrics surface (utils/metrics.py), a separate compile.
    """
    from suffix_tpu.ops.prefix_doubling import _invert_permutation

    n_pad = words[0].shape[0]
    init_words = len(words)
    idx = jnp.arange(n_pad, dtype=index_dtype)
    neg = jnp.full((n_pad,), -1, index_dtype)

    with jax.named_scope("PP_small_key"):
        # Closed-form in-group key per suffix index (home order).
        real = idx < n
        pos = jnp.where(real, idx, 0)
        c = (pos % q).astype(jnp.int32)
        a = jnp.minimum(pos // q, cls_arr.shape[0] - 1)
        v = jnp.searchsorted(bnds, c, side="right").astype(jnp.int32)
        cls = jnp.take(cls_arr, a)
        tc = jnp.take(rankT_flat, v * n_cls + cls)
        rs = jnp.take(rank_s, jnp.minimum(a + 1, rank_s.shape[0] - 1))
        small = (tc * rs_cap + (rs + 1)).astype(index_dtype)
        # Pads: distinct keys, longer pad suffixes first (engine
        # convention — they sort below real by the leading keys).
        small = jnp.where(real, small, (n_pad - 1) - idx)

    def purity(dense_sorted, sa_sorted):
        # Every surviving tie group must be same-residue mod q. The one
        # all-PAD group (suffixes past the text, resolved by length
        # alone) is exempt — the closed form emits it positionally.
        res = sa_sorted % q
        grp = dense_sorted[1:] == dense_sorted[:-1]
        pads = sa_sorted >= n
        ok = (~grp) | (res[1:] == res[:-1]) | (pads[1:] & pads[:-1])
        return jnp.all(ok)

    with jax.named_scope("P1_initial_sort"):
        sorted_ops = jax.lax.sort(tuple(words) + (small, idx),
                                  num_keys=init_words + 1,
                                  is_stable=False)
    with jax.named_scope("P2_initial_rank"):
        sa0 = sorted_ops[-1]
        diff0 = sorted_ops[0][1:] != sorted_ops[0][:-1]
        for col in sorted_ops[1:init_words]:
            diff0 = diff0 | (col[1:] != col[:-1])
        new_flag = jnp.concatenate(
            [jnp.zeros((1,), index_dtype), diff0.astype(index_dtype)])
        dense0 = jnp.cumsum(new_flag)
        done0 = dense0[-1] == n_pad - 1
        pure0 = purity(dense0, sa0)

    # The loop state carries the SORTED view (dense ranks + suffix
    # order); the home-order rank array is derived at the START of a
    # continuing round. A round that ends on purity (the common case:
    # exactly one) therefore never pays the inverse-permutation
    # key-sort, and the closed form reads its per-suffix facts straight
    # off sa_sorted — measured 88.7 -> ~60 ms on the 4 MiB fixture.
    def cond(state):
        _, _, k, done, pure = state
        return jnp.logical_not(done | pure) & (k < 2 * n_pad)

    def body(state):
        dense_s, sa_s, k, _, _ = state
        with jax.named_scope("P6_route_home"):
            rank = _invert_permutation(sa_s, dense_s)
        with jax.named_scope("P3_shift_ranks"):
            rank_ext = jnp.concatenate([rank, neg])

            def shifted(mult):
                off = jnp.minimum(mult * k, n_pad)
                return jax.lax.dynamic_slice(rank_ext, (off,), (n_pad,))

            s1, s2, s3 = shifted(1), shifted(2), shifted(3)
        with jax.named_scope("P4_round_sort"):
            r1, r2, r3, r4, _, sa = jax.lax.sort(
                (rank, s1, s2, s3, small, idx), num_keys=5,
                is_stable=False)
        with jax.named_scope("P5_dense_rerank"):
            diff = ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
                    | (r3[1:] != r3[:-1]) | (r4[1:] != r4[:-1]))
            new_flag = jnp.concatenate(
                [jnp.zeros((1,), index_dtype), diff.astype(index_dtype)])
            dense = jnp.cumsum(new_flag)
            done = dense[-1] == n_pad - 1
            pure = purity(dense, sa)
        return (dense, sa, k * 4, done, pure)

    dense_fin, sa_sorted, k_fin, done, pure_fin = jax.lax.while_loop(
        cond, body,
        (dense0, sa0, h0.astype(index_dtype), done0, pure0))

    # done => all ranks distinct => the small key was never consulted;
    # pure => every surviving tie group is same-phase and the fused
    # small key has already ordered it => either way sa_sorted IS the
    # suffix array. (A loop that exits on the k-bound without done or
    # pure cannot happen: k doubles past every lcp.)
    del dense_fin
    sa = sa_sorted
    if with_stats:
        return sa, k_fin, done, pure_fin
    return sa


@functools.partial(jax.jit,
                   static_argnames=("n_words", "bits", "cpw", "index_dtype",
                                    "with_stats"))
def _patched_packed(codes, n_words: int, bits: int, cpw: int, index_dtype,
                    h0, n, q, bnds, cls_arr, rankT_flat, rank_s, n_cls,
                    rs_cap, with_stats: bool = False):
    from suffix_tpu.ops.prefix_doubling import _packed_words
    words = _packed_words(codes, n_words, bits, cpw)
    return _patched_core(tuple(words), h0, index_dtype, n, q, bnds,
                         cls_arr, rankT_flat, rank_s, n_cls, rs_cap,
                         with_stats=with_stats)


@functools.partial(jax.jit, static_argnames=("init_words", "index_dtype",
                                             "with_stats"))
def _patched_padded(text, init_words: int, index_dtype, h0, n, q, bnds,
                    cls_arr, rankT_flat, rank_s, n_cls, rs_cap,
                    with_stats: bool = False):
    from suffix_tpu.ops.prefix_doubling import _initial_words
    words = _initial_words(text, init_words)
    return _patched_core(tuple(words), h0, index_dtype, n, q, bnds,
                         cls_arr, rankT_flat, rank_s, n_cls, rs_cap,
                         with_stats=with_stats)


def _rotation_width(arr: np.ndarray, q: int):
    """Measured rotation-separation depth: the max LCP between two
    DIFFERENT rotations of the (defect-bearing) period, computed from
    the first two tiles' doubled string via the native SA-IS + Kasai
    (host, ~10 ms at q=100k). An initial packed width beyond this
    separates every cross-phase pair, so phase A reaches purity at the
    first sort. Defects elsewhere can stretch individual cross-phase
    ties a little past this bound — purity is VERIFIED on device, so a
    miss only costs one quadrupling round, never correctness. None if
    the native library is unavailable (fall back to the estimate)."""
    from suffix_tpu import native

    if not native.available() or 2 * q > arr.size:
        return None
    pp = np.ascontiguousarray(arr[: 2 * q])
    sa = np.asarray(native.sais(pp.tobytes()), np.int64)
    lcp = np.asarray(native.kasai(pp.tobytes(), sa), np.int64)
    first = np.flatnonzero(sa < q)  # ranks of the q rotation suffixes
    if first.size < 2:
        return 0
    # Max pairwise LCP within the subset = max over consecutive subset
    # ranks of the range-min of adjacent LCPs between them.
    starts = first[:-1] + 1
    mins = np.minimum.reduceat(lcp, starts)
    # reduceat's segment i spans [starts[i], starts[i+1]) — exactly the
    # (rank_i, rank_{i+1}] windows — except the last, which runs to the
    # array end; recompute it over its true window.
    if first[-1] + 1 > starts[-1]:
        mins[-1] = lcp[starts[-1]: first[-1] + 1].min()
    return int(mins.max())


def patched_dispatch(arr: np.ndarray, q: int, defects: np.ndarray,
                     n_pad: int, index_dtype=jnp.int32, stats=None):
    """(dispatch, label) build closure for a verified near-periodic
    corpus, or None when the host tables refuse (over budget) — the
    caller then falls through to the doubling engines.

    ``stats`` (optional dict, the metrics surface): routing facts now,
    phase-A stop state (h_final / closed_form / rounds) per dispatch."""
    from suffix_tpu.ops import prefix_doubling as pd

    tabs = _patch_tables(arr, q, defects)
    if tabs is None:
        return None
    n = int(arr.size)
    bnds_d = _staged(tabs["bnds"], fill=q)
    cls_d = _staged(tabs["cls"], fill=0)
    rank_s_d = _staged(tabs["rank_s"], fill=-1)
    rankT_d = _staged(tabs["rankT"], fill=0)
    n_cls = jnp.int32(tabs["n_cls"])
    rs_cap = jnp.int32(tabs["k"] + 3)
    n_s = jnp.int32(n)
    q_s = jnp.int32(q)
    label = f"patched(q={q},defects={int(defects.size)})"
    if stats is not None:
        stats.update(engine_family="patched", period=int(q),
                     defects=int(defects.size), tiles=tabs["k"])

    def _stats_run(run, h0_chars):
        sa, k, done, pure = run()
        rounds = 0
        h = h0_chars
        while h < int(k):
            h *= 4
            rounds += 1
        stats.update(rounds=rounds, h_final=int(k), h0=h0_chars,
                     closed_form=bool(pure) and not bool(done))
        return sa

    # Phase A only needs to separate period ROTATIONS (no corpus-wide
    # repeat to clear): the random-text width estimate, not the
    # round-minimizing repeat lever (lcp_lb=None) — then widened to the
    # MEASURED rotation-separation depth so purity holds at the initial
    # sort and no quadrupling round (sort + scatter) runs at all.
    plan = pd._adaptive_plan(arr, n_pad, lcp_lb=None)
    w_rot = _rotation_width(arr, q)
    if plan is not None:
        lut, bits, cpw, n_words = plan
        if w_rot is not None:
            want = -(-(w_rot + 12) // cpw)  # slack: defect-local ties
            # Only CHEAP widenings pay: measured on the 4 MiB fixture,
            # each extra sort operand costs ~6 ms while a quadrupling
            # round costs ~30 ms (sort) now that the round's rank
            # inversion is skipped before the closed form — widening
            # from 5 to 14 words (rotation depth 84) measured 103.8 ms
            # vs 88.7 ms for sorting narrow and paying one round
            # (round5_study nearrep, r5). Beyond +3 words, rounds win.
            if n_words < want <= min(n_words + 3, PATCH_MAX_WORDS):
                n_words = want
        codes = np.zeros((n_pad,), np.int32)
        codes[:n] = lut[arr]
        c_dev = jnp.asarray(codes)
        h0 = jnp.int32(n_words * cpw)
        if stats is not None:
            return (lambda: _stats_run(lambda: _patched_packed(
                c_dev, n_words, bits, cpw, index_dtype, h0, n_s, q_s,
                bnds_d, cls_d, rankT_d, rank_s_d, n_cls, rs_cap,
                with_stats=True), n_words * cpw), label)
        return (lambda: _patched_packed(
            c_dev, n_words, bits, cpw, index_dtype, h0, n_s, q_s, bnds_d,
            cls_d, rankT_d, rank_s_d, n_cls, rs_cap), label)
    padded = np.full((n_pad,), PAD, np.int32)
    padded[:n] = arr
    t_dev = jnp.asarray(padded)
    iw = pd.pick_init_words(n_pad)
    h0 = jnp.int32(3 * iw)
    if stats is not None:
        return (lambda: _stats_run(lambda: _patched_padded(
            t_dev, iw, index_dtype, h0, n_s, q_s, bnds_d, cls_d, rankT_d,
            rank_s_d, n_cls, rs_cap, with_stats=True), 3 * iw), label)
    return (lambda: _patched_padded(
        t_dev, iw, index_dtype, h0, n_s, q_s, bnds_d, cls_d, rankT_d,
        rank_s_d, n_cls, rs_cap), label)
