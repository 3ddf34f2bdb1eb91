"""Sharded query serving — the index larger than one chip's HBM.

The reference serves queries from a single in-process table
(src/table.rs:197-293). This layer serves the same contract from a suffix
array sharded over a device mesh:

- the suffix table and its packed 18-symbol rank keys (ops/search2.py) are
  sharded by contiguous *rank block* over the 1-D mesh;
- the text is sharded by contiguous *position block*: every per-device
  array scales with mesh size (~32/D bytes/char), so the index genuinely
  grows with total mesh HBM. Key building packs words in home layout
  (right-neighbor halo only) and routes them to rank blocks by ownership;
  the long-query byte refinement and LCP survivor windows fetch text by
  ownership + psum, the same collective pattern as the table probe;
- a batch of queries is replicated; every device runs the merge-join fence
  engine over its *local* key block, producing the per-device count of
  local keys below each query's lower/upper bound. Because rank blocks are
  contiguous and ordered, the global bounds are simply the `psum` of the
  local counts — the collective form of the binary search;
- queries longer than the 18 packed symbols refine with the same lockstep
  batched binary search as the single-chip engine, except the probe
  `table[mid]` AND the suffix text windows are resolved by ownership: the
  owning device contributes the value, everyone else zero, and one `psum`
  broadcasts it. All devices run the identical deterministic loop, so the
  collective stays in lockstep.

Results are bit-identical to the single-chip engine and the reference
(same unordered-slice, empty-query, and byte-offset semantics), pinned by
tests/test_dist_query.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from suffix_tpu.ops.padding import PAD, bucket_size
from suffix_tpu.ops import search2 as s2
from suffix_tpu.parallel.mesh import AXIS


def _gather_sharded(x_local: jax.Array, gpos: jax.Array, n_local: int):
    """x[gpos] over a block-sharded array for REPLICATED global positions
    (identical ``gpos`` on every device, e.g. the lockstep refine probes):
    the owning device contributes the value, everyone else zero, one psum
    broadcasts. NOT valid for per-device-different indices — the psum
    would sum answers to different devices' questions; use
    _collect_by_position for those."""
    me = jax.lax.axis_index(AXIS)
    base = me * n_local
    local = (gpos >= base) & (gpos < base + n_local)
    li = jnp.clip(gpos - base, 0, n_local - 1)
    v = jnp.where(local, jnp.take(x_local, li), 0)
    return jax.lax.psum(v, AXIS)


def _collect_by_position(x_home: jax.Array, gpos: jax.Array, n_local: int,
                         n_dev: int):
    """x[gpos] over a block-sharded array where every device asks for its
    OWN index set (``gpos`` differs per device, e.g. ``table_local``).

    D-step ring rotation: each step every device holds one remote block
    (O(n_local) transient — the array is never replicated) and picks the
    elements that block owns. Each global position has exactly one owner,
    so the accumulated sum is the plain gather.
    """
    owner = gpos // n_local
    li = gpos - owner * n_local
    if n_dev == 1:
        return jnp.take(x_home, li)
    me = jax.lax.axis_index(AXIS)
    perm = [(j, (j - 1) % n_dev) for j in range(n_dev)]  # rotate left

    def step(k, carry):
        blk, out = carry
        src = (me + k) % n_dev
        out = out + jnp.where(owner == src, jnp.take(blk, li), 0)
        return jax.lax.ppermute(blk, AXIS, perm), out

    _, out = jax.lax.fori_loop(
        0, n_dev, step, (x_home, jnp.zeros(gpos.shape, x_home.dtype)))
    return out


def _fetch_text(text_local: jax.Array, pos: jax.Array, n_text: jax.Array,
                n_local: int, n_dev: int):
    """text[pos] from the position-block-sharded text; PAD (-1) outside
    [0, n_text) — the sentinel semantics of the replicated-path
    ``jnp.take(text, pos, mode="fill", fill_value=PAD)``."""
    clipped = jnp.clip(pos, 0, n_local * n_dev - 1)
    v = _gather_sharded(text_local, clipped, n_local)
    return jnp.where((pos >= 0) & (pos < n_text), v, PAD)


def _build_keys_shard(text_local: jax.Array, table_local: jax.Array,
                      n_table: jax.Array, n_local: int, n_dev: int):
    """Local packed rank keys for a contiguous rank block (under shard_map).

    Same packing as ops/search2.build_query_index: 6 words of three 9-bit
    symbols; ranks at or past n_table get PAD_KEY (above every real key).
    The text arrives position-block-sharded: words pack in home layout
    (only a right-neighbor halo of KEY_SYMS-1 symbols crosses devices),
    then route to the rank block by ownership + psum.
    """
    me = jax.lax.axis_index(AXIS)
    grank = me * n_local + jnp.arange(n_local, dtype=jnp.int32)
    sym = (text_local + 1).astype(jnp.int32)  # PAD -> 0 (past-end sentinel)
    if n_dev == 1:
        halo = jnp.zeros((s2.KEY_SYMS - 1,), jnp.int32)
    else:
        # KEY_SYMS-1 symbols past the local block; may span several
        # right neighbors when the shard is tiny, so resolve by the ring
        # collect (0 past the global padded end). Per-device-different
        # positions, so ownership+psum does NOT apply here.
        gpos = (me + 1) * n_local + jnp.arange(s2.KEY_SYMS - 1,
                                               dtype=jnp.int32)
        valid = gpos < n_local * n_dev
        v = _collect_by_position(sym, jnp.where(valid, gpos, 0),
                                 n_local, n_dev)
        halo = jnp.where(valid, v, 0)
    ext = jnp.concatenate([sym, halo])
    s = [ext[k:k + n_local] for k in range(s2.KEY_SYMS)]
    mask_real = grank < n_table
    pk = []
    for w in range(s2.KEY_WORDS):
        word_home = s2._pack3(s[3 * w], s[3 * w + 1], s[3 * w + 2])
        # table_local differs per device: route home-layout words to this
        # rank block with the ring collect, not psum.
        word = _collect_by_position(word_home, table_local, n_local, n_dev)
        pk.append(jnp.where(mask_real, word, jnp.int32(s2.PAD_KEY)))
    # Fences + blocked layout, materialized once (strided extraction per
    # batch costs ~25 ms/4M on v5e — see ops/search2.build_query_index).
    stride = s2._fence_stride(n_local)
    if stride > 1:
        pk_fence = tuple(w[::stride] for w in pk)
        pk_block = jnp.concatenate(
            [w.reshape(-1, stride) for w in pk], axis=1)
    else:
        pk_fence = tuple(pk)
        pk_block = jnp.concatenate(
            [w.reshape(-1, 1) for w in pk], axis=1)
    return pk_fence, pk_block


def _local_below_counts(pk_fence, pk_block, qk, qk_hi, n_local: int):
    """(lo, up): per-query counts of local keys < qk / <= qk_hi.

    The fence sort + one block row-gather, exactly the single-chip merge
    engine (ops/search2.py) applied to the local block.
    """
    # Single source of truth with ops/search2.bounds_batch_merge: the key
    # width comes from the fence tuple, the stride from the block shape —
    # never from the module constant (a wider shard builder would
    # otherwise silently mis-slice the block columns).
    stride = pk_block.shape[1] // len(pk_fence)
    r_lo, r_up = s2._fence_ranks_both(list(pk_fence), qk, qk_hi)
    if stride == 1:
        return r_lo, r_up
    b_lo = jnp.maximum(r_lo - 1, 0)
    lo = b_lo * stride + s2._block_count(pk_block, b_lo, qk, less_equal=False)
    b_up = jnp.maximum(r_up - 1, 0)
    up = b_up * stride + s2._block_count(pk_block, b_up, qk_hi,
                                         less_equal=True)
    return lo, up


def _probe_table(table_local: jax.Array, mid: jax.Array, n_local: int):
    """table[mid] for global ranks ``mid`` (Q,), via ownership + psum."""
    me = jax.lax.axis_index(AXIS)
    base = me * n_local
    local = (mid >= base) & (mid < base + n_local)
    li = jnp.clip(mid - base, 0, n_local - 1)
    v = jnp.where(local, jnp.take(table_local, li), 0)
    return jax.lax.psum(v, AXIS)


def _refine_dist(text_local, n_text, table_local, queries, qlens, start,
                 end, n_local: int, n_dev: int):
    """Batched byte-level (lower, upper) refinement over the sharded table
    AND sharded text.

    Lockstep binary searches (identical state on every device); each probe
    resolves table[mid] with one psum and the (Q, m) suffix windows with a
    second — comparator semantics identical to ops/search._cmp_suffix_query
    (PAD past the text end = implicit sentinel; first-mismatch decides).
    """
    m = queries.shape[1]
    qpos = jnp.arange(m, dtype=jnp.int32)[None, :]

    def cmp_b(sufi):
        offs = sufi[:, None] + qpos
        window = _fetch_text(text_local, offs, n_text, n_local, n_dev)
        neq = (window != queries) & (qpos < qlens[:, None])
        any_neq = jnp.any(neq, axis=1)
        first = jnp.argmax(neq, axis=1)
        w_at = jnp.take_along_axis(window, first[:, None], axis=1)[:, 0]
        q_at = jnp.take_along_axis(queries, first[:, None], axis=1)[:, 0]
        lt_full = any_neq & (w_at < q_at)
        gt_prefix = any_neq & (w_at > q_at)
        return lt_full, gt_prefix

    def lower_step(lr):
        left, right = lr
        active = left < right
        mid = (left + right) // 2
        sufi = _probe_table(table_local, mid, n_local).astype(jnp.int32)
        lt, _ = cmp_b(sufi)
        pred = jnp.logical_not(lt)
        nl = jnp.where(pred, left, mid + 1)
        nr = jnp.where(pred, mid, right)
        return jnp.where(active, nl, left), jnp.where(active, nr, right)

    def upper_step(lr):
        left, right = lr
        active = left < right
        mid = (left + right) // 2
        sufi = _probe_table(table_local, mid, n_local).astype(jnp.int32)
        _, gt = cmp_b(sufi)
        nl = jnp.where(gt, left, mid + 1)
        nr = jnp.where(gt, mid, right)
        return jnp.where(active, nl, left), jnp.where(active, nr, right)

    def step(state):
        lo, up = state
        return lower_step(lo), upper_step(up)

    def not_converged(state):
        (ll, lr), (ul, ur) = state
        return jnp.any(ll < lr) | jnp.any(ul < ur)

    state = ((start, end), (start, end))
    (s_lo, _), (s_up, _) = jax.lax.while_loop(not_converged, step, state)
    return s_lo, s_up


def _bounds_shard(text, n_text, table_local, pk_fence, pk_block, queries,
                  qlens, n_table, n_local: int, n_dev: int, max_qlen: int):
    """Per-device body: global (start, count) per query, replicated out."""
    qk, qk_hi = s2._batch_query_keys(queries, qlens, len(pk_fence))
    lo, up = _local_below_counts(pk_fence, pk_block, qk, qk_hi, n_local)
    start = jax.lax.psum(lo, AXIS)
    end = jax.lax.psum(up, AXIS)
    start = jnp.minimum(start, n_table)
    end = jnp.minimum(end, n_table)

    if max_qlen > s2.KEY_SYMS:
        long_q = qlens > s2.KEY_SYMS
        rs = jnp.where(long_q, start, 0)
        re = jnp.where(long_q, end, 0)
        r_start, r_end = _refine_dist(text, n_text, table_local, queries,
                                      qlens, rs, re, n_local, n_dev)
        start = jnp.where(long_q, r_start, start)
        end = jnp.where(long_q, r_end, end)

    empty = (qlens == 0) | (n_table == 0)
    start = jnp.where(empty, 0, start)
    count = jnp.where(empty, 0, jnp.maximum(end - start, 0))
    return start, count


def _lcp_shard(text, n_text, table_local, pk_block, n_table,
               n_local: int, n_dev: int, key_words: int = s2.KEY_WORDS,
               block: int = 128):
    """Per-device LCP slice (under shard_map), keyed like ops/lcp.py.

    Adjacent ranks live in adjacent local slots except each device's rank
    0, whose predecessor is the left neighbor's last rank — one ppermute
    per packed word (and one for the table entry) covers the seam. The
    packed words are recovered from the blocked key layout for free.
    """
    me = jax.lax.axis_index(AXIS)
    lidx = jnp.arange(n_local, dtype=jnp.int32)
    grank = me * n_local + lidx
    valid = (grank > 0) & (grank < n_table)

    def left_of(x, fill):
        if n_dev == 1:
            incoming = jnp.full((1,), fill, x.dtype)
        else:
            perm = [(j, j + 1) for j in range(n_dev - 1)]
            incoming = jax.lax.ppermute(x[-1:], AXIS, perm)
            incoming = jnp.where(me == 0, jnp.full((1,), fill, x.dtype),
                                 incoming)
        return jnp.concatenate([incoming, x[:-1]])

    blk_stride = pk_block.shape[1] // key_words
    words = [pk_block[:, w * blk_stride:(w + 1) * blk_stride].reshape(-1)
             for w in range(key_words)]
    lcp = jnp.zeros((n_local,), jnp.int32)
    undecided = valid
    for word in words:
        prev = left_of(word, s2.PAD_KEY)
        eq_word = word == prev
        s_cur = [(word >> (18 - 9 * j)) & 0x1FF for j in range(3)]
        s_prv = [(prev >> (18 - 9 * j)) & 0x1FF for j in range(3)]
        within = jnp.where(
            s_cur[0] != s_prv[0], 0, jnp.where(s_cur[1] != s_prv[1], 1, 2)
        )
        matched = jnp.where(eq_word, 3, within)
        lcp = jnp.where(undecided, lcp + matched, lcp)
        undecided = undecided & eq_word
    # Survivors (pairs equal through all packed symbols): windowed byte
    # compare against the position-sharded text. The survivor bases differ
    # per device, so each round fetches both windows with ONE ring collect
    # (prev/cur rows stacked); the loop itself stays lockstep by carrying
    # a psum'd global-active flag — every device runs the same number of
    # rounds, which the ring's ppermutes require.
    a = table_local
    prev_t = left_of(table_local, 0)
    offs = jnp.arange(block, dtype=jnp.int32)
    n_pad = n_local * n_dev

    def gather_rows2(off):
        base = jnp.concatenate([prev_t, a]).astype(jnp.int32)
        pos = base[:, None] + (offs + off)[None, :]
        v = _collect_by_position(
            text, jnp.clip(pos, 0, n_pad - 1), n_local, n_dev)
        v = jnp.where((pos >= 0) & (pos < n_text), v, PAD)
        return v[:n_local], v[n_local:]

    def cond(state):
        _, _, _, global_active = state
        return global_active

    def body(state):
        l, active, off, _ = state
        wa, wb = gather_rows2(off)
        eq = wa == wb
        run = jnp.cumprod(eq.astype(jnp.int32), axis=1).sum(axis=1)
        l = jnp.where(active, l + run, l)
        active = active & (run == block) & (off + block < n_text)
        ga = jax.lax.psum(jnp.any(active).astype(jnp.int32), AXIS) > 0
        return l, active, off + block, ga

    ga0 = jax.lax.psum(jnp.any(undecided).astype(jnp.int32), AXIS) > 0
    lcp, _, _, _ = jax.lax.while_loop(
        cond, body, (lcp, undecided, jnp.int32(3 * key_words), ga0)
    )
    return jnp.where(valid, lcp, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_local", "n_dev", "key_words", "mesh"))
def _lcp_jit(text, n_text, table, pk_block, n_table, n_local: int,
             n_dev: int, key_words: int, mesh: Mesh):
    fn = functools.partial(_lcp_shard, n_local=n_local, n_dev=n_dev,
                           key_words=key_words)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(AXIS), P(), P(AXIS), P(AXIS), P()),
        out_specs=P(AXIS), check_vma=False,
    )(text, n_text, table, pk_block, n_table)


class ShardedQueryIndex:
    """Serve positions()/contains()/count()/any_position() mesh-sharded.

    Matches SuffixTable query semantics bit-for-bit (src/table.rs:197-293):
    unordered SA-slice positions, byte offsets, empty query matches
    nothing. The text, table, and rank keys are ALL sharded; per-device
    HBM is ~32/D bytes/char versus ~32 on one chip — the index scales
    with total mesh HBM (pinned by test_dist_query.py's per-device
    byte accounting).

    Per-HOST memory is O(n/D) as well: ingestion streams shard by shard
    (utils/io.device_corpus), a ``sa=None`` build stays device-resident
    end to end (dist_build.suffix_array_sharded_device + a collective
    rank realignment — no host table ever exists), and ``positions``
    gathers its SA slice from the rank shards with an ownership+psum
    collect instead of slicing a host copy. Pass ``host_sa=True`` (or a
    precomputed ``sa``) to keep a host-side table for zero-collective
    slicing; ``host_sa=False`` drops it even then.
    """

    def __init__(self, data, mesh: Mesh, sa: np.ndarray | None = None,
                 host_sa: bool | None = None):
        from suffix_tpu.parallel import dist_build
        from suffix_tpu.utils.io import device_corpus, device_table

        arr = dist_build._as_u8(data)
        self.mesh = mesh
        self.n = int(arr.shape[0])
        self.n_dev = dist_build._check_pow2(mesh)
        self.n_local = max(dist_build._local_bucket(self.n, self.n_dev),
                           8)
        n_pad = self.n_local * self.n_dev
        self.n_pad = n_pad

        self._text, _ = device_corpus(arr, mesh, n_pad=n_pad)
        if sa is None:
            # Device-resident build + in-place rank realignment: the
            # build's output carries the padding suffixes in the first
            # n_pad - n rank slots; one ring collect shifts them out and
            # zero-fills the tail — never touching the host.
            sa_full, n_total, n_local_b, _ = \
                dist_build.suffix_array_sharded_device(arr, mesh)
            assert (n_total, n_local_b) == (n_pad, self.n_local)
            self._table = _align_jit(sa_full.astype(jnp.int32),
                                     jnp.int32(self.n), self.n_local,
                                     self.n_dev, mesh)
            self._sa_host = (np.asarray(self._table)[:self.n]
                             .astype(np.uint32) if host_sa else None)
        else:
            self._sa_host = (np.asarray(sa, dtype=np.uint32)
                             if host_sa is not False else None)
            self._table = device_table(np.asarray(sa), n_pad, mesh)
        self._pk_fence, self._pk_block = _keys_jit(
            self._text, self._table, jnp.int32(self.n),
            self.n_local, self.n_dev, mesh)

    MAX_QUERY_BATCH = 1 << 18

    def bounds_batch(self, queries: np.ndarray, qlens: np.ndarray):
        """(start, count) arrays for a (Q, m) int batch.

        Shapes bucket to powers of two (same policy as SuffixTable) so
        the compiled executable is reused across calls; oversized batches
        stream through in chunks.
        """
        queries = np.asarray(queries, np.int32)
        qlens = np.asarray(qlens, np.int32)
        nq = int(queries.shape[0])
        if nq > self.MAX_QUERY_BATCH:
            parts = [self.bounds_batch(queries[i:i + self.MAX_QUERY_BATCH],
                                       qlens[i:i + self.MAX_QUERY_BATCH])
                     for i in range(0, nq, self.MAX_QUERY_BATCH)]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        m_pad = bucket_size(max(int(queries.shape[1]), 1), minimum=8)
        q_pad = bucket_size(max(nq, 1), minimum=8)
        full_q = np.zeros((q_pad, m_pad), np.int32)
        full_q[:nq, :queries.shape[1]] = queries
        full_lens = np.zeros((q_pad,), np.int32)
        full_lens[:nq] = qlens
        start, count = _bounds_jit(
            self._text, jnp.int32(self.n), self._table, self._pk_fence,
            self._pk_block, jnp.asarray(full_q), jnp.asarray(full_lens),
            jnp.int32(self.n), self.n_local, self.n_dev, m_pad,
            self.mesh)
        return np.asarray(start)[:nq], np.asarray(count)[:nq]

    def _encode(self, queries):
        qb = [np.frombuffer(q.encode() if isinstance(q, str) else bytes(q),
                            np.uint8) for q in queries]
        m = max((len(q) for q in qb), default=1)
        m = max(m, 1)
        out = np.zeros((len(qb), m), np.int32)
        for i, q in enumerate(qb):
            out[i, :len(q)] = q
        return out, np.array([len(q) for q in qb], np.int32)

    def table(self) -> np.ndarray:
        """Host copy of the suffix table (uint32). Materializes O(n) on
        THIS host — only whole-index consumers (tree folds, into_parts)
        need it; the serving paths never call this."""
        if self._sa_host is None:
            return np.asarray(self._table)[:self.n].astype(np.uint32)
        return self._sa_host

    def lcp_lens(self) -> np.ndarray:
        """LCP array (uint32), computed across the mesh.

        Same definition as SuffixTable.lcp_lens (src/table.rs:348-361);
        adjacent-rank pairs resolve from the sharded packed keys, seam
        pairs via one neighbor ppermute per word.
        """
        out = _lcp_jit(self._text, jnp.int32(self.n), self._table,
                       self._pk_block, jnp.int32(self.n), self.n_local,
                       self.n_dev, len(self._pk_fence), self.mesh)
        return np.asarray(out)[:self.n].astype(np.uint32)

    # Collective-slice shaping: ranks pad to power-of-two (rows, cap)
    # buckets so the gather executable is reused across batches, and a
    # chunk ceiling bounds the replicated result buffer per dispatch.
    MAX_SLICE_ELEMS = 1 << 22

    def _gather_slices(self, start: np.ndarray,
                       count: np.ndarray) -> list[np.ndarray]:
        """SA slices [start, start+count) per query, from the rank
        shards (ownership + psum) — the O(n/D)-per-host serving path."""
        q_n = len(start)
        cap = bucket_size(max(int(count.max(initial=0)), 1), minimum=8)
        rows_per = max(1, self.MAX_SLICE_ELEMS // cap)
        out: list[np.ndarray] = []
        for i in range(0, q_n, rows_per):
            s_blk = start[i:i + rows_per]
            c_blk = count[i:i + rows_per]
            rows = bucket_size(len(s_blk), minimum=1)
            ranks = np.zeros((rows, cap), np.int32)
            offs = np.arange(cap, dtype=np.int64)
            ranks[:len(s_blk)] = np.where(
                offs[None, :] < c_blk[:, None].astype(np.int64),
                s_blk[:, None] + offs[None, :], 0).astype(np.int32)
            vals = np.asarray(_take_ranks_jit(
                self._table, jnp.asarray(ranks), self.n_local, self.n_dev,
                self.mesh))
            out.extend(vals[j, :c].astype(np.uint32)
                       for j, c in enumerate(c_blk))
        return out

    def positions_batch(self, queries) -> list[np.ndarray]:
        q, ql = self._encode(queries)
        start, count = self.bounds_batch(q, ql)
        if self._sa_host is not None:
            return [self._sa_host[s:s + c] for s, c in zip(start, count)]
        return self._gather_slices(start, count)

    def positions(self, query) -> np.ndarray:
        return self.positions_batch([query])[0]

    def count_batch(self, queries) -> np.ndarray:
        q, ql = self._encode(queries)
        return self.bounds_batch(q, ql)[1]

    def contains_batch(self, queries) -> np.ndarray:
        return self.count_batch(queries) > 0

    def contains(self, query) -> bool:
        return bool(self.contains_batch([query])[0])

    def any_position_batch(self, queries) -> list:
        """One arbitrary byte offset per query, or None (src/table.rs:279-293).

        Same choice as SuffixTable.any_position: the first row of the
        SA slice, which is arbitrary-but-deterministic.
        """
        q, ql = self._encode(queries)
        start, count = self.bounds_batch(q, ql)
        if self._sa_host is not None:
            return [int(self._sa_host[s]) if c else None
                    for s, c in zip(start, count)]
        rows = bucket_size(len(start), minimum=8)
        ranks = np.zeros((rows,), np.int32)
        ranks[:len(start)] = start
        vals = np.asarray(_take_ranks_jit(
            self._table, jnp.asarray(ranks), self.n_local, self.n_dev,
            self.mesh))
        return [int(vals[j]) if c else None for j, c in enumerate(count)]

    def any_position(self, query):
        return self.any_position_batch([query])[0]


def _align_shard(sa_full, n, n_local: int, n_dev: int):
    """Shift the build's sorted layout (padding ranks first) left by
    n_pad - n and zero-fill the tail, per device (under shard_map):
    out[rank r] = sa_full[r + (n_pad - n)] for r < n. The source
    positions differ per device, so a ring collect resolves them."""
    me = jax.lax.axis_index(AXIS)
    n_pad = n_local * n_dev
    grank = me * n_local + jnp.arange(n_local, dtype=jnp.int32)
    src = grank + (n_pad - n)
    v = _collect_by_position(sa_full, jnp.where(src < n_pad, src, 0),
                             n_local, n_dev)
    return jnp.where(grank < n, v, 0)


@functools.partial(jax.jit, static_argnames=("n_local", "n_dev", "mesh"))
def _align_jit(sa_full, n, n_local: int, n_dev: int, mesh: Mesh):
    fn = functools.partial(_align_shard, n_local=n_local, n_dev=n_dev)
    return jax.shard_map(fn, mesh=mesh, in_specs=(P(AXIS), P()),
                         out_specs=P(AXIS), check_vma=False)(sa_full, n)


def _take_ranks_shard(table_local, ranks, n_local: int, n_dev: int):
    """table[ranks] for REPLICATED rank arrays (any shape): the owner of
    each rank contributes, one psum broadcasts — the collective slice
    that replaces host-side ``sa[start:start+count]``."""
    me = jax.lax.axis_index(AXIS)
    base = me * n_local
    local = (ranks >= base) & (ranks < base + n_local)
    li = jnp.clip(ranks - base, 0, n_local - 1)
    v = jnp.where(local, jnp.take(table_local, li), 0)
    return jax.lax.psum(v, AXIS)


@functools.partial(jax.jit, static_argnames=("n_local", "n_dev", "mesh"))
def _take_ranks_jit(table, ranks, n_local: int, n_dev: int, mesh: Mesh):
    fn = functools.partial(_take_ranks_shard, n_local=n_local, n_dev=n_dev)
    return jax.shard_map(fn, mesh=mesh, in_specs=(P(AXIS), P()),
                         out_specs=P(), check_vma=False)(table, ranks)


@functools.partial(jax.jit, static_argnames=("n_local", "n_dev", "mesh"))
def _keys_jit(text, table, n_table, n_local: int, n_dev: int, mesh: Mesh):
    fn = functools.partial(_build_keys_shard, n_local=n_local, n_dev=n_dev)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(P(AXIS), P(AXIS), P()),
        out_specs=((P(AXIS),) * s2.KEY_WORDS, P(AXIS)), check_vma=False,
    )(text, table, n_table)


@functools.partial(jax.jit,
                   static_argnames=("n_local", "n_dev", "max_qlen", "mesh"))
def _bounds_jit(text, n_text, table, pk_fence, pk_block, queries, qlens,
                n_table, n_local: int, n_dev: int, max_qlen: int, mesh: Mesh):
    fn = functools.partial(_bounds_shard, n_local=n_local, n_dev=n_dev,
                           max_qlen=max_qlen)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(AXIS), P(), P(AXIS), (P(AXIS),) * s2.KEY_WORDS, P(AXIS),
                  P(), P(), P()),
        out_specs=(P(), P()), check_vma=False,
    )(text, n_text, table, pk_fence, pk_block, queries, qlens, n_table)
