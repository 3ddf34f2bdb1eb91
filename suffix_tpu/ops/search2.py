"""Accelerated batched query engine.

Same contract as ops/search.py (reference: src/table.rs:197-293) but
engineered for device throughput — no per-probe gather chains in the hot
path:

1. **Packed prefix keys** (built once per index): for every rank r, the
   first 18 bytes of its suffix packed as six int32 words of three 9-bit
   symbols each (symbol = byte+1, 0 = past-the-end — the same sentinel
   encoding as construction); batches containing longer patterns widen to
   12 words (36 bytes) on demand. Key order == suffix order through the
   packed depth.
2. **Merge-join bounds**: because query keys are zero-padded past qlen,
   the masked lower-bound comparison ``(pk & mask) < qk`` equals the
   unmasked ``pk < qk`` (extra suffix symbols only increase pk), and the
   masked upper-bound comparison ``(pk & mask) > qk`` equals
   ``pk > qk_hi`` with the masked symbols max-filled. Both bounds are
   therefore plain searchsorted with a uniform comparator — resolved for
   the whole batch by ONE device sort of [keys ++ lower-queries ++
   upper-queries] with tie codes (-1 lower / 0 key / +1 upper), reading
   each query row's exclusive preceding-key count. For huge indexes the
   keys are strided ("fences") and one coalesced block count finishes the
   job.
3. **Refine phase** (only when some query exceeds the packed depth):
   windowed byte comparison within the narrowed range, a lockstep
   ``while_loop`` that exits as soon as every lane converges.

A probe-chain engine (``bounds_batch_fast``) is kept for cross-checking
and latency-sensitive single queries. positions()/contains()/count()
semantics are bit-identical to ops/search.py (pinned by
tests/test_search2.py which diffs the engines).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from suffix_tpu.ops.padding import PAD
from suffix_tpu.ops.search import _cmp_suffix_query

SYM_BITS = 9
SYMS_PER_WORD = 3
KEY_WORDS = 6
KEY_SYMS = KEY_WORDS * SYMS_PER_WORD  # 18
EXT_KEY_WORDS = 12  # on-demand wide keys: exact merge join to 36 bytes
LUT_SIDE = 257  # symbol alphabet: 0 (end) + 256 byte values
WORD_MASK = (1 << (SYM_BITS * SYMS_PER_WORD)) - 1  # 27 bits
PAD_KEY = 0x7FFFFFFF  # above every real key word


def _pack3(s0, s1, s2):
    return (s0 << 18) | (s1 << 9) | s2


# Above this padded size the one-program index build exceeds 16 GB HBM
# (XLA memory analysis at 2^28: 2 GiB args + 6.1 GiB output + 8 GiB temp
# = 16.1 GiB — the update-slice chain is not aliased with the output);
# route to the host-stepped lean builder with explicit buffer donation.
LEAN_MIN_PAD = 1 << 28


def build_query_index(text: jax.Array, table: jax.Array, n_table,
                      key_words: int = KEY_WORDS,
                      stride: int | None = None,
                      with_keys: bool = True):
    """Host-level entry: one-program build, or the memory-lean stepped
    build for huge corpora (see ``LEAN_MIN_PAD``). Same result tree."""
    n_pad = text.shape[0]
    eff_stride = _fence_stride(n_pad) if stride is None else stride
    if not with_keys and eff_stride > 1 and n_pad >= LEAN_MIN_PAD:
        return _build_query_index_lean(text, table, jnp.int32(n_table),
                                       key_words, eff_stride)
    if n_pad >= LEAN_MIN_PAD:
        # The one-program build at this size exceeds 16 GB HBM (see
        # LEAN_MIN_PAD); surface the routing miss instead of a raw OOM.
        import warnings

        warnings.warn(
            f"one-program query-index build at n_pad={n_pad} "
            f"(>= LEAN_MIN_PAD={LEAN_MIN_PAD}) may exceed single-chip HBM; "
            "pass with_keys=False (and stride>1) for the memory-lean "
            "stepped build", RuntimeWarning, stacklevel=2)
    return _build_query_index_jit(text, table, jnp.int32(n_table),
                                  key_words=key_words, stride=stride,
                                  with_keys=with_keys)


@functools.partial(jax.jit, static_argnames=("w", "key_words"))
def _packed_word(text: jax.Array, table: jax.Array, n_table: jax.Array,
                 w: int, key_words: int):
    """Key word ``w`` alone (rank order) — one step of the lean build."""
    n_pad = text.shape[0]
    sym = (text + 1).astype(jnp.int32)
    sym_ext = jnp.concatenate([sym, jnp.zeros((3 * key_words,), jnp.int32)])
    s = [sym_ext[k:k + n_pad] for k in range(3 * w, 3 * w + 3)]
    word = jnp.take(_pack3(s[0], s[1], s[2]), table)
    mask_real = jnp.arange(n_pad) < n_table
    return jnp.where(mask_real, word, jnp.int32(PAD_KEY))


def _blk_write_impl(pk_block: jax.Array, word: jax.Array, w: int, stride: int):
    return jax.lax.dynamic_update_slice(
        pk_block, word.reshape(-1, stride), (0, w * stride))


_blk_write_donate = functools.partial(
    jax.jit, static_argnames=("w", "stride"), donate_argnums=(0,)
)(_blk_write_impl)
_blk_write_plain = functools.partial(
    jax.jit, static_argnames=("w", "stride")
)(_blk_write_impl)


def _blk_write(pk_block, word, w: int, stride: int):
    """In-place block-column write; donation only where the backend
    honors it (the CPU test backend warns 'donated buffers not usable'
    on every call, drowning real donation regressions on TPU)."""
    fn = (_blk_write_plain if jax.default_backend() == "cpu"
          else _blk_write_donate)
    return fn(pk_block, word, w=w, stride=stride)


def _build_query_index_lean(text, table, n_table, key_words: int,
                            stride: int):
    """with_keys=False index build as key_words host-stepped programs.

    Peak HBM = block buffer (donated, updated in place) + ONE word in
    flight + the word program's temps — ~10 GB at a 256 MiB corpus vs
    16.1 GiB for the one-program form, which is what lets a 256 MiB
    index build on a single 16 GB chip. Extra cost: key_words dispatches
    (~ms) on a once-per-corpus operation.
    """
    n_pad = text.shape[0]
    pk_block = jnp.zeros((n_pad // stride, key_words * stride), jnp.int32)
    fences = []
    for w in range(key_words):
        word = _packed_word(text, table, n_table, w, key_words)
        fences.append(word[::stride])
        pk_block = _blk_write(pk_block, word, w, stride)
        del word
    return None, tuple(fences), pk_block, None


@functools.partial(jax.jit,
                   static_argnames=("key_words", "stride", "with_keys"))
def _build_query_index_jit(text: jax.Array, table: jax.Array,
                           n_table: jax.Array,
                           key_words: int = KEY_WORDS,
                           stride: int | None = None,
                           with_keys: bool = True):
    """Packed rank keys (``key_words`` words) + 2-symbol LUT.

    ``text`` is the PAD-padded int32 text, ``table`` the padded suffix
    table (entries beyond n_table are zero). ``key_words`` widens the
    exact merge-join coverage to 3*key_words bytes — built on demand for
    batches with long patterns (3 words of index memory per extra 9
    covered bytes). ``stride`` overrides the measured fence-stride ladder
    (consumers read it back from pk_block's shape). ``with_keys=False``
    drops the flat key tuple AND the probe-engine LUT from the result
    (their slots are None) — the merge engine needs only fences +
    blocks, and the flat copy is half the index's HBM footprint (it
    OOMs a 128 MiB corpus on 16 GB).
    """
    n_pad = text.shape[0]
    key_syms = 3 * key_words
    # Symbols: byte+1 in [1,256]; PAD (-1) and the appended zeros both map
    # to 0 — the end-of-text sentinel.
    sym = (text + 1).astype(jnp.int32)
    sym_ext = jnp.concatenate([sym, jnp.zeros((key_syms,), jnp.int32)])
    s = [sym_ext[k:k + n_pad] for k in range(key_syms)]
    mask_real = jnp.arange(n_pad) < n_table
    if stride is None:
        stride = _fence_stride(n_pad)

    # Blocked layout for the fence engine: a FLAT (n/stride, words*stride)
    # row per block — word w occupies columns [w*stride, (w+1)*stride) —
    # so one row-gather fetches a whole block of all key words (row
    # gathers are ~4x faster than element gathers on TPU). Flat rather
    # than (n/stride, words, stride): the rank-3 form is tiled (8, 128)
    # on its two minor dims, padding (6, 64) to (8, 128) = 2x HBM for
    # the index's largest buffer AND 2x the bytes per block fetch.
    # Fences (every stride-th key) are materialized HERE, once per index:
    # extracting them per query batch costs ~25 ms/4M of strided reads
    # (measured v5e) — half the whole engine's budget.
    # Each word is written into the preallocated block buffer as it is
    # computed (dynamic_update_slice chain, updated in place by XLA)
    # rather than concatenated at the end: with_keys=False, holding all
    # key_words word arrays alive while forming the block copy doubles
    # the peak (12+ GB at 256 MiB — the measured OOM); this way each
    # word dies once written and a 256 MiB index fits 16 GB HBM.
    pk = []
    pk_fence = []
    pk_block = (jnp.zeros((n_pad // stride, key_words * stride), jnp.int32)
                if stride > 1 else None)
    word0 = None
    for w in range(key_words):
        word_text = _pack3(s[3 * w], s[3 * w + 1], s[3 * w + 2])
        word = jnp.take(word_text, table)
        word = jnp.where(mask_real, word, jnp.int32(PAD_KEY))
        if w == 0 and with_keys:
            word0 = word
        if with_keys:
            pk.append(word)
        if stride > 1:
            pk_fence.append(word[::stride])
            pk_block = jax.lax.dynamic_update_slice(
                pk_block, word.reshape(-1, stride), (0, w * stride))
        else:
            pk_fence.append(word)

    # LUT over the leading two symbols: first rank with 2-symbol value
    # >= v. Only the probe engine (bounds_batch_fast) reads it, and the
    # probe engine needs the flat keys too — so it is gated on with_keys,
    # which also drops its n-sized intermediates from the memory-lean
    # large-corpus program.
    if with_keys:
        s0 = word0 >> (2 * SYM_BITS)
        s1 = (word0 >> SYM_BITS) & (2**SYM_BITS - 1)
        v = jnp.where(mask_real, s0 * LUT_SIDE + s1, LUT_SIDE * LUT_SIDE)
        targets = jnp.arange(LUT_SIDE * LUT_SIDE + 1, dtype=jnp.int32)
        lut = jnp.searchsorted(v, targets, side="left").astype(jnp.int32)
    else:
        lut = None

    return (tuple(pk) if with_keys else None), tuple(pk_fence), pk_block, lut


def _batch_query_keys(queries: jax.Array, qlens: jax.Array,
                      key_words: int = KEY_WORDS):
    """(qk, qk_hi): lists of ``key_words`` packed words per query.

    qk zero-fills symbols past qlen (lower-bound form); qk_hi max-fills
    them (upper-bound form).
    """
    n_q, m = queries.shape
    key_syms = 3 * key_words
    cols = jnp.arange(m, dtype=jnp.int32)
    syms = jnp.where(cols[None, :] < qlens[:, None], queries + 1, 0)
    syms = syms.astype(jnp.int32)
    pad = jnp.zeros((n_q, key_syms), jnp.int32)
    full = jnp.concatenate([syms, pad], axis=1)[:, :key_syms]
    qk, qk_hi = [], []
    for w in range(key_words):
        word = _pack3(full[:, 3 * w], full[:, 3 * w + 1], full[:, 3 * w + 2])
        k = jnp.clip(qlens - 3 * w, 0, 3)
        mask = jnp.int32(WORD_MASK) & ~((1 << (SYM_BITS * (3 - k))) - 1)
        qk.append(word)
        qk_hi.append(word | (jnp.int32(WORD_MASK) & ~mask))
    return qk, qk_hi


def _fence_ranks_both(fk: list, qk: list, qk_hi: list):
    """One sort resolves both bounds for the whole batch.

    Merge [keys ++ lower-queries ++ upper-queries]; the trailing operand
    packs the tie code and the query id into ONE int32 — tie in bits
    28-29 (lower=0 sorts before equal fences=1 sorts before upper=2,
    i.e. side='left' then side='right'), qid in the low 27 bits. Batches
    are chunked to SuffixTable.MAX_QUERY_BATCH = 2^18 <= 2^27, so the
    qid field has 9 bits of headroom — widening MAX_QUERY_BATCH past
    2^27 requires a second operand. One fewer sort operand than separate
    tie/qid words — measured 24.0 -> 15.1 ms for 65k queries over 4M keys
    on v5e together with the stride-8 fences. Each query row's exclusive
    count of preceding fence keys is its searchsorted rank.
    """
    n_f = fk[0].shape[0]
    n_q = qk[0].shape[0]
    ks = [jnp.concatenate([f, lo, hi]) for f, lo, hi in zip(fk, qk, qk_hi)]
    code = jnp.concatenate([
        jnp.full((n_f,), 1 << 28, jnp.int32),
        jnp.arange(n_q, dtype=jnp.int32),
        (2 << 28) + jnp.arange(n_q, dtype=jnp.int32),
    ])
    # Unstable: queries have distinct codes; equal-key fences share one
    # code but only their count is read, never their internal order.
    out_ops = jax.lax.sort(tuple(ks) + (code,), num_keys=len(ks) + 1,
                           is_stable=False)
    scode = out_ops[-1]
    tie = scode >> 28
    is_fence = (tie == 1).astype(jnp.int32)
    fences_before = jnp.cumsum(is_fence) - is_fence  # exclusive
    qid = jnp.where(
        tie == 1, 2 * n_q,
        (scode & ((1 << 27) - 1)) + jnp.where(tie == 2, n_q, 0),
    )
    out = jnp.zeros((2 * n_q + 1,), jnp.int32).at[qid].set(fences_before)
    return out[:n_q], out[n_q:2 * n_q]


def _block_count(pk_block, blocks, qk: list, less_equal: bool):
    """count of keys in block ``blocks[q]`` below query q's key.

    One row-gather fetches the flat (words*stride) block row per query —
    all consecutive bytes — then pure vector compares on column slices.
    """
    stride = pk_block.shape[1] // len(qk)
    rows = jnp.take(pk_block, blocks, axis=0)  # (Q, W*S)
    q_shape = (blocks.shape[0], stride)
    lt = jnp.zeros(q_shape, bool)
    eq = jnp.ones(q_shape, bool)
    for w, q in enumerate(qk):
        vals = rows[:, w * stride:(w + 1) * stride]
        qc = q[:, None]
        lt = lt | (eq & (vals < qc))
        eq = eq & (vals == qc)
    if less_equal:
        lt = lt | eq
    return jnp.sum(lt.astype(jnp.int32), axis=1)


def _fence_stride(n_pad: int) -> int:
    """Pure merge (stride 1, zero gathers) only for tiny indexes; blocked
    fences otherwise — the fence sort is far cheaper than re-sorting the
    whole key array and the block fetch is one coalesced row-gather.

    Measured ladder (v5e, 256k 14-byte queries, re-measured r4 with
    per-half attribution — scripts/round4_study.py stride32):
    4 MiB:  s8 20.9 ms, s16 17.4 (best, 15.0M q/s), s32 19.6, s64 —
    64 MiB: s16 72.4 ms, s32 47.5, s64 32.5, s128 29.7 (best, 8.8M q/s).
    The fence sort scales with n/stride (60->13 ms across the 64 MiB
    ladder) while the block row-count stays ~flat (10-14 ms), so larger
    indexes want larger strides. The round-3 claim that stride 32 was
    "reproducibly pathological" (68 ms at 4 MiB) does NOT reproduce
    after re-measurement with split timings — 32 sits exactly on the
    interpolation curve at both sizes; the old number is attributed to
    an unsplit measurement artifact and the policy no longer avoids it.
    2^24 is the unmeasured midpoint: interpolated stride 64."""
    if n_pad <= (1 << 12):
        return 1
    if n_pad <= (1 << 22):
        return 16
    if n_pad <= (1 << 24):
        return 64
    return 128


def _refine_one(text, n_text, table, query, qlen, start, end,
                sufi_off: int = 0):
    """Byte-level refinement within the prefix-equal range (qlen > 12).

    ``sufi_off`` shifts both sides of the comparison: when the range is
    already exact through ``sufi_off`` bytes (the deep keyless engine),
    pass the query TAIL (query[sufi_off:], qlen - sufi_off) and the
    probes compare suffix(sufi + off) vs that tail — same order, a
    window-sized slice less gather traffic per probe."""

    def lower_step(lr):
        left, right = lr
        active = left < right
        mid = (left + right) // 2
        sufi = jnp.take(table, mid, mode="fill", fill_value=0).astype(jnp.int32)
        lt, _ = _cmp_suffix_query(text, n_text, sufi + sufi_off, query,
                                  qlen)
        pred = jnp.logical_not(lt)
        nl = jnp.where(pred, left, mid + 1)
        nr = jnp.where(pred, mid, right)
        return jnp.where(active, nl, left), jnp.where(active, nr, right)

    def upper_step(lr):
        left, right = lr
        active = left < right
        mid = (left + right) // 2
        sufi = jnp.take(table, mid, mode="fill", fill_value=0).astype(jnp.int32)
        _, gt = _cmp_suffix_query(text, n_text, sufi + sufi_off, query,
                                  qlen)
        nl = jnp.where(gt, left, mid + 1)
        nr = jnp.where(gt, mid, right)
        return jnp.where(active, nl, left), jnp.where(active, nr, right)

    def step(state):
        (ll, lr), (ul, ur) = state
        return lower_step((ll, lr)), upper_step((ul, ur))

    def not_converged(state):
        (ll, lr), (ul, ur) = state
        return (ll < lr) | (ul < ur)

    state = ((start, end), (start, end))
    state = jax.lax.while_loop(not_converged, step, state)
    (s_lo, _), (s_up, _) = state
    return s_lo, s_up


@functools.partial(jax.jit, static_argnames=("n_iters", "max_qlen"))
def bounds_batch_merge(text, n_text, table, n_table, pk_fence, pk_block,
                       queries, qlens, n_iters: int, max_qlen: int):
    """(start, count) per query via the merge-join engine.

    ``pk_fence``/``pk_block`` come precomputed from build_query_index.
    Exact for qlen <= 3*len(pk_fence); longer queries fall through to the
    byte-refine phase on the key-equal range.
    """
    del n_iters
    key_words = len(pk_fence)
    key_syms = 3 * key_words
    qk, qk_hi = _batch_query_keys(queries, qlens, key_words)

    stride = 1 if pk_block is None else pk_block.shape[1] // key_words

    r_lo, r_up = _fence_ranks_both(list(pk_fence), qk, qk_hi)

    if stride == 1:
        start = r_lo  # first rank with pk >= qk
        end = r_up    # first rank with pk > qk_hi
    else:
        b_lo = jnp.maximum(r_lo - 1, 0)
        start = b_lo * stride + _block_count(pk_block, b_lo, qk,
                                             less_equal=False)
        b_up = jnp.maximum(r_up - 1, 0)
        end = b_up * stride + _block_count(pk_block, b_up, qk_hi,
                                           less_equal=True)

    start = jnp.minimum(start, n_table)
    end = jnp.minimum(end, n_table)

    if max_qlen > key_syms:
        long_q = qlens > key_syms

        def refine(query, qlen, rs, re):
            return _refine_one(text, n_text, table, query, qlen, rs, re)

        rs = jnp.where(long_q, start, 0)
        re = jnp.where(long_q, end, 0)
        r_start, r_end = jax.vmap(refine)(queries, qlens, rs, re)
        start = jnp.where(long_q, r_start, start)
        end = jnp.where(long_q, r_end, end)

    empty = (qlens == 0) | (n_table == 0)
    start = jnp.where(empty, 0, start)
    count = jnp.where(empty, 0, jnp.maximum(end - start, 0))
    return start, count


# ---------------------------------------------------------------------------
# Sorted-gather key construction + the deep keyless engine.
#
# Measured basis (scripts/round5_study.py gather, v5e): random element
# gathers plateau at ~70M el/s (0.28 GB/s) while a 2^27-row 3-operand
# sort is 575 ms and a 2^20-row 7-operand sort 10.5 ms — the sort unit
# moves permutations ~6x faster than the gather unit. Building the six
# packed key words with per-word `jnp.take(word_text, table)` measured
# 12.7 s at 128 MiB; routing the same permutation through two sorts
# (position->isa, then words by isa) takes ~2 s.
# ---------------------------------------------------------------------------


@jax.jit
def _isa_padded(table: jax.Array, n_table: jax.Array) -> jax.Array:
    """Inverse SA (rank per position) via ONE sort, no scatters.

    Padded rows keep unique past-every-real keys so they land in the
    tail; the returned array is position-ordered, entries >= n_table
    are the pad ranks themselves (unique, >= n_table)."""
    n_pad = table.shape[0]
    r = jnp.arange(n_pad, dtype=jnp.int32)
    key = jnp.where(r < n_table, table.astype(jnp.int32), n_pad + r)
    _, isa = jax.lax.sort((key, r), num_keys=1, is_stable=False)
    return isa


@functools.partial(jax.jit, static_argnames=("w_lo", "w_hi", "key_words"))
def _words_rank_order(text: jax.Array, isa: jax.Array, n_table: jax.Array,
                      w_lo: int, w_hi: int, key_words: int):
    """Packed key words [w_lo, w_hi) in RANK order via one sort.

    The word values are computed by streaming shifts in position order
    (no gathers) and carried as payloads of a sort by isa — the
    sorted-gather form of ``word[table[r]]``. Rows past n_table are
    masked to PAD_KEY."""
    n_pad = text.shape[0]
    sym = (text + 1).astype(jnp.int32)
    sym_ext = jnp.concatenate([sym, jnp.zeros((3 * key_words,), jnp.int32)])
    words = []
    for w in range(w_lo, w_hi):
        s = [sym_ext[k:k + n_pad] for k in range(3 * w, 3 * w + 3)]
        words.append(_pack3(s[0], s[1], s[2]))
    out = jax.lax.sort((isa, *words), num_keys=1, is_stable=False)
    rr = jnp.arange(n_pad, dtype=jnp.int32)
    mask = rr < n_table
    return tuple(jnp.where(mask, wv, jnp.int32(PAD_KEY)) for wv in out[1:])


def packed_keys_rank_order(text: jax.Array, table: jax.Array, n_table,
                           key_words: int = KEY_WORDS):
    """Flat rank-order packed keys (the LCP engines' input) through the
    sort unit — the drop-in for build_query_index(stride=1)'s key tuple
    at sizes where per-word gathers dominate."""
    isa = _isa_padded(table, jnp.int32(n_table))
    return _words_rank_order(text, isa, jnp.int32(n_table), 0, key_words,
                             key_words)


# Deep keyless index: 8 fence words (24-byte exactness straight from
# the per-batch fence sort — the 24 B pattern class then never enters
# the long-lane path at all) + 6 ext block words (coverage 42 B before
# any byte refine). Measured rationale (round5_study deep, 131k mixed
# battery): with 6-word fences the ext probe paid 6 gathers/probe over
# 18-byte-equal ranges (~190 ms) and the un-compacted byte tail
# dominated at 630 ms; 8-word fences shrink the probe ranges ~30x and
# 42 B coverage removes the tail for patterns <= 42 B. Blocks cost
# n_pad * (8+6) * 4 B together — gate to sizes where that plus
# text+table leaves serving headroom on a 16 GB chip.
DEEP_FENCE_WORDS = 8
DEEP_EXT_WORDS = 6
DEEP_EXT_MAX_PAD = 1 << 27


def build_query_index_keyless(text: jax.Array, table: jax.Array, n_table,
                              key_words: int = KEY_WORDS,
                              stride: int | None = None,
                              ext_words: int = 0):
    """(fences, block, ext_block): the keyless index for huge corpora,
    built through the sort unit (see measured basis above).

    ``ext_words`` > 0 additionally builds a SECOND flat block holding
    words key_words..key_words+ext_words-1 in the same (n/stride,
    words*stride) layout — the deep-refine tier for long patterns
    (bounds_batch_merge_deep). Fences stay key_words wide so the
    per-batch fence sort does not pay for the extra coverage."""
    n_pad = text.shape[0]
    if stride is None:
        stride = _fence_stride(n_pad)
    assert stride > 1 or ext_words == 0, "ext tier needs a blocked layout"
    total = key_words + ext_words
    isa = _isa_padded(table, jnp.int32(n_table))
    words = _words_rank_order(text, isa, jnp.int32(n_table), 0, key_words,
                              total)
    fences = tuple(w[::stride] for w in words)
    if stride == 1:
        return fences, None, None
    block = jnp.zeros((n_pad // stride, key_words * stride), jnp.int32)
    for w, wv in enumerate(words):
        block = _blk_write(block, wv, w, stride)
    del words
    ext_block = None
    if ext_words:
        # Second sort pass (same isa) so at most key_words word arrays
        # are ever alive next to the blocks — the 13-operand single
        # sort would hold 12 words + block and OOM a 16 GB chip at 2^27
        # (measured: the one-program 12w build RESOURCE_EXHAUSTED,
        # round5_study battery).
        ext = _words_rank_order(text, isa, jnp.int32(n_table), key_words,
                                total, total)
        ext_block = jnp.zeros((n_pad // stride, ext_words * stride),
                              jnp.int32)
        for w, wv in enumerate(ext):
            ext_block = _blk_write(ext_block, wv, w, stride)
        del ext
    return fences, block, ext_block


def _ext_word_at(ext_block: jax.Array, stride: int, ranks: jax.Array,
                 w: int) -> jax.Array:
    """Ext word ``w`` at each rank — one element gather into the flat
    blocked layout (rank r lives at row r//stride, col w*stride +
    r%stride)."""
    flat = ext_block.reshape(-1)
    cols = ext_block.shape[1]
    idx = (ranks // stride) * cols + w * stride + ranks % stride
    return jnp.take(flat, jnp.clip(idx, 0, flat.size - 1), mode="clip")


def _deep_probe(ext_block: jax.Array, stride: int, qke: list, qke_hi: list,
                start: jax.Array, end: jax.Array):
    """Narrow [start, end) (exact through the fence words) to exactness
    through the ext words: fused lower/upper binary search; each probe
    costs len(qke) element gathers per lane. Ranges are fence-word-equal
    runs, so iteration count is log2 of the longest common-prefix run."""
    n_ext = len(qke)

    def cmp(mid):
        lt = jnp.zeros(mid.shape, bool)
        gt = jnp.zeros(mid.shape, bool)
        eq_lo = jnp.ones(mid.shape, bool)
        eq_hi = jnp.ones(mid.shape, bool)
        for w in range(n_ext):
            v = _ext_word_at(ext_block, stride, mid, w)
            lt = lt | (eq_lo & (v < qke[w]))
            eq_lo = eq_lo & (v == qke[w])
            gt = gt | (eq_hi & (v > qke_hi[w]))
            eq_hi = eq_hi & (v == qke_hi[w])
        return lt, gt

    def step(state):
        (ll, lr), (ul, ur) = state
        l_act = ll < lr
        u_act = ul < ur
        lmid = (ll + lr) // 2
        umid = (ul + ur) // 2
        l_lt, _ = cmp(lmid)
        _, u_gt = cmp(umid)
        l_pred = jnp.logical_not(l_lt)   # key >= qk
        ll = jnp.where(l_act, jnp.where(l_pred, ll, lmid + 1), ll)
        lr = jnp.where(l_act, jnp.where(l_pred, lmid, lr), lr)
        ul = jnp.where(u_act, jnp.where(u_gt, ul, umid + 1), ul)
        ur = jnp.where(u_act, jnp.where(u_gt, umid, ur), ur)
        return (ll, lr), (ul, ur)

    def not_conv(state):
        (ll, lr), (ul, ur) = state
        return jnp.any((ll < lr) | (ul < ur))

    state = ((start, end), (start, end))
    ((s_lo, _), (s_up, _)) = jax.lax.while_loop(not_conv, step, state)
    return s_lo, s_up


@functools.partial(jax.jit, static_argnames=("max_qlen", "B", "B2"))
def bounds_batch_merge_deep(text, n_text, table, n_table, pk_fence,
                            pk_block, ext_block, queries, qlens,
                            max_qlen: int, B: int, B2: int = 0):
    """(start, count) on the deep keyless index.

    Phase 1 is the plain merge-join (exact to 3*len(pk_fence) bytes).
    Longer patterns COMPACT to a static bucket of B lanes before any
    per-probe gather runs, and the byte tail (qlen beyond the ext
    coverage) compacts AGAIN to B2 lanes before any window gather.
    PRECONDITIONS (the host caller sizes both from the actual counts):
    B >= count(qlens > 3*key_words), B2 >= count(qlens > coverage) —
    a lane left outside its bucket would keep the previous tier's
    bounds. The double compaction is what makes the engine scale with
    batch size: a lockstep byte refine gathering over every lane was
    630 ms of an 826 ms 131k battery, and probe gathers now only ever
    run for lanes whose patterns actually need that tier
    (round5_study deep)."""
    key_words = len(pk_fence)
    key_syms = 3 * key_words
    stride = pk_block.shape[1] // key_words
    ext_words = ext_block.shape[1] // stride
    cov = 3 * (key_words + ext_words)
    qk, qk_hi = _batch_query_keys(queries, qlens, key_words)
    r_lo, r_up = _fence_ranks_both(list(pk_fence), qk, qk_hi)
    b_lo = jnp.maximum(r_lo - 1, 0)
    start = b_lo * stride + _block_count(pk_block, b_lo, qk,
                                         less_equal=False)
    b_up = jnp.maximum(r_up - 1, 0)
    end = b_up * stride + _block_count(pk_block, b_up, qk_hi,
                                       less_equal=True)
    start = jnp.minimum(start, n_table)
    end = jnp.minimum(end, n_table)

    if max_qlen > key_syms and B > 0:
        nq = qlens.shape[0]
        long_q = qlens > key_syms
        selkey = jnp.where(long_q, 0, 1).astype(jnp.int32)
        _, lane = jax.lax.sort(
            (selkey, jnp.arange(nq, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        lane = lane[:B]
        act = jnp.take(long_q, lane)
        q_sel = jnp.take(queries, lane, axis=0)
        ql_sel = jnp.take(qlens, lane)
        s_sel = jnp.where(act, jnp.take(start, lane), 0)
        e_sel = jnp.where(act, jnp.take(end, lane), 0)
        qk12, qk12_hi = _batch_query_keys(q_sel, ql_sel,
                                          key_words + ext_words)
        s2, e2 = _deep_probe(ext_block, stride, qk12[key_words:],
                             qk12_hi[key_words:], s_sel, e_sel)
        if max_qlen > cov and B2 > 0:
            # Tail tier: second compaction, byte refine only on lanes
            # whose pattern outruns the ext coverage, over the
            # coverage-narrowed range.
            deep = ql_sel > cov
            selkey2 = jnp.where(deep, 0, 1).astype(jnp.int32)
            _, lane2 = jax.lax.sort(
                (selkey2, jnp.arange(B, dtype=jnp.int32)), num_keys=1,
                is_stable=False)
            lane2 = lane2[:B2]
            act2 = jnp.take(deep, lane2)
            rs = jnp.where(act2, jnp.take(s2, lane2), 0)
            re = jnp.where(act2, jnp.take(e2, lane2), 0)
            q_tail = jnp.take(q_sel, lane2, axis=0)[:, cov:]
            ql_tail = jnp.maximum(jnp.take(ql_sel, lane2) - cov, 0)

            def refine(q, ql, a, b):
                return _refine_one(text, n_text, table, q, ql, a, b,
                                   sufi_off=cov)

            r_s, r_e = jax.vmap(refine)(q_tail, ql_tail, rs, re)
            s2 = s2.at[lane2].set(
                jnp.where(act2, r_s, jnp.take(s2, lane2)))
            e2 = e2.at[lane2].set(
                jnp.where(act2, r_e, jnp.take(e2, lane2)))
        start = start.at[lane].set(
            jnp.where(act, s2, jnp.take(start, lane)))
        end = end.at[lane].set(jnp.where(act, e2, jnp.take(end, lane)))

    empty = (qlens == 0) | (n_table == 0)
    start = jnp.where(empty, 0, start)
    count = jnp.where(empty, 0, jnp.maximum(end - start, 0))
    return start, count


# ---------------------------------------------------------------------------
# Probe-chain engine (kept for cross-checks / tiny batches)
# ---------------------------------------------------------------------------

def _query_keys_one(query: jax.Array, qlen: jax.Array):
    """First-2-word packed keys + masks for a single query."""
    m = query.shape[0]
    syms = jnp.where(jnp.arange(m) < qlen, query + 1, 0).astype(jnp.int32)
    pad = jnp.zeros((6,), jnp.int32)
    full = jnp.concatenate([syms, pad])[:6]
    qk1 = _pack3(full[0], full[1], full[2])
    qk2 = _pack3(full[3], full[4], full[5])
    k1 = jnp.clip(qlen, 0, 3)
    k2 = jnp.clip(qlen - 3, 0, 3)
    full_mask = jnp.int32(WORD_MASK)
    m1 = full_mask & ~((1 << (SYM_BITS * (3 - k1))) - 1)
    m2 = full_mask & ~((1 << (SYM_BITS * (3 - k2))) - 1)
    return qk1, qk2, m1, m2


def _bounds_keys_one(pk1, pk2, lut, n_table, query, qlen, n_iters):
    """Fused (lower, upper) probe search over the first two key words.

    Exact for qlen <= 6; for longer queries returns the 6-symbol
    prefix-equal range.
    """
    qk1, qk2, m1, m2 = _query_keys_one(query, qlen)

    s0 = (qk1 >> 18) & 0x1FF
    s1 = (qk1 >> 9) & 0x1FF
    v_lo = jnp.where(qlen >= 2, s0 * LUT_SIDE + s1, s0 * LUT_SIDE)
    v_hi = jnp.where(qlen >= 2, v_lo + 1, (s0 + 1) * LUT_SIDE)
    lo0 = jnp.minimum(jnp.take(lut, v_lo), n_table)
    hi0 = jnp.minimum(jnp.take(lut, v_hi), n_table)

    def probe(bound_state):
        ll, lr, ul, ur = bound_state
        lmid = (ll + lr) // 2
        umid = (ul + ur) // 2
        la1 = jnp.take(pk1, lmid, mode="fill", fill_value=0) & m1
        la2 = jnp.take(pk2, lmid, mode="fill", fill_value=0) & m2
        ua1 = jnp.take(pk1, umid, mode="fill", fill_value=0) & m1
        ua2 = jnp.take(pk2, umid, mode="fill", fill_value=0) & m2
        l_lt = (la1 < qk1) | ((la1 == qk1) & (la2 < qk2))
        l_pred = jnp.logical_not(l_lt)
        u_pred = (ua1 > qk1) | ((ua1 == qk1) & (ua2 > qk2))
        l_act = ll < lr
        u_act = ul < ur
        ll = jnp.where(l_act, jnp.where(l_pred, ll, lmid + 1), ll)
        lr = jnp.where(l_act, jnp.where(l_pred, lmid, lr), lr)
        ul = jnp.where(u_act, jnp.where(u_pred, ul, umid + 1), ul)
        ur = jnp.where(u_act, jnp.where(u_pred, umid, ur), ur)
        return ll, lr, ul, ur

    state = (lo0, hi0, lo0, hi0)
    state = jax.lax.fori_loop(0, n_iters, lambda _, s: probe(s), state)
    start, _, end, _ = state
    return start, end


@functools.partial(jax.jit, static_argnames=("n_iters", "max_qlen"))
def bounds_batch_fast(text, n_text, table, n_table, pk1, pk2, lut,
                      queries, qlens, n_iters: int, max_qlen: int):
    """(start, count) per query via LUT + probe chains over packed keys."""

    def one(query, qlen):
        start, end = _bounds_keys_one(pk1, pk2, lut, n_table, query, qlen,
                                      n_iters)
        long_q = qlen > 6
        rs = jnp.where(long_q, start, 0)
        re = jnp.where(long_q, end, 0)
        r_start, r_end = _refine_one(text, n_text, table, query, qlen, rs, re)
        start = jnp.where(long_q, r_start, start)
        end = jnp.where(long_q, r_end, end)
        empty = (qlen == 0) | (n_table == 0)
        start = jnp.where(empty, 0, start)
        count = jnp.where(empty, 0, jnp.maximum(end - start, 0))
        return start, count

    return jax.vmap(one)(queries, qlens)