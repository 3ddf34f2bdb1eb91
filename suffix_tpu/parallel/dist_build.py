"""Multi-device sharded suffix-array construction.

The reference is single-process (SURVEY.md §2.3); this layer is the new
scale-out architecture. The text is sharded along the sequence axis over a
1-D device mesh and the prefix-doubling engine runs fully SPMD inside
``shard_map``:

- the global sort of (rank, rank[i+k], i) triples each round is a
  **block-bitonic sort**: every device keeps a locally sorted run of L
  elements, then log^2(D) merge-split stages exchange whole runs with a
  partner (`ppermute`), locally merge 2L elements, and keep the low or
  high half according to the bitonic direction bit. Comm volume per device
  per round is O(L log^2 D) over ICI — no host involvement;
- dense re-ranking after the sort needs one neighbor boundary exchange
  (`ppermute` shift), a local cumsum, and an exclusive scan of per-shard
  flag totals (tiny all_gather) — the collective-histogram analogue of the
  reference's bucket machinery (src/table.rs:686-720);
- ranks are routed back to their home shard by a second block-bitonic sort
  keyed on the suffix index (a global permutation → identity layout);
- the doubling shift ``rank[i + k]`` is fetched with a halo ``ppermute``:
  the needed window spans two device blocks, reached by a binary-
  decomposed block shift (log2(D) neighbor exchanges) — per-device memory
  stays O(L) and comm O(L log D), so corpus size scales with *total* mesh
  HBM rather than per-device HBM.

The result is bit-identical to the single-device engine (and therefore to
the reference): the suffix array is the unique byte-lexicographic
permutation, with PAD (-1) below the text acting as the implicit sentinel.
"""

from __future__ import annotations

import functools
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from suffix_tpu.ops.padding import PAD, bucket_size
from suffix_tpu.parallel.mesh import AXIS


def _local_bucket(n: int, n_dev: int) -> int:
    """Per-device shard length for a global text of ``n`` bytes: the
    ceil-divided shard rounded up to a power-of-two bucket (>= 8).

    Without the bucketing every distinct corpus length compiled a fresh
    XLA executable — minutes per size through the TPU tunnel. With it,
    the sharded build has the same O(log max_n) compiled-shape set as the
    single-chip engine (ops/padding.py), and utils/warmup.py can pre-fill
    the cache for a deployment's buckets. The extra padding is PAD bytes
    at the tail, whose suffixes sort strictly first and are sliced off —
    identical output (pinned by tests/test_dist_build.py, which runs
    non-power-of-two corpus sizes end to end).
    """
    return bucket_size(max(8, -(-n // n_dev)), minimum=8)


def _check_pow2(mesh: Mesh) -> int:
    """The bitonic merge-split network pairs partners by j ^ stride, which
    is only a permutation for power-of-two device counts; anything else
    would silently drop exchanges."""
    n_dev = int(mesh.devices.size)
    if n_dev & (n_dev - 1):
        raise ValueError(
            f"sharded construction needs a power-of-two device count, got "
            f"{n_dev}; use make_mesh(n) with the largest power of two")
    return n_dev

def _bitonic_global_sort(arrays, num_keys: int, n_local: int, n_dev: int):
    """Sort distributed arrays globally (ascending across the mesh).

    Each device holds an (n_local,) slice; after the call, device d holds
    global sorted positions [d*n_local, (d+1)*n_local). Valid for any
    input; keys may repeat (add a unique tie-break operand for full
    determinism).
    """
    # Unstable sorts (~20% cheaper, measured): callers include a unique
    # tie-break operand in the keys, which the merge-split consistency
    # argument REQUIRES (see _round_body).
    arrays = list(jax.lax.sort(tuple(arrays), num_keys=num_keys,
                               is_stable=False))
    if n_dev == 1:
        return arrays
    me = jax.lax.axis_index(AXIS)
    size = 2
    while size <= n_dev:
        stride = size // 2
        while stride >= 1:
            perm = [(j, j ^ stride) for j in range(n_dev)]
            partner = [jax.lax.ppermute(a, AXIS, perm) for a in arrays]
            merged = jax.lax.sort(
                tuple(jnp.concatenate([a, pa]) for a, pa in zip(arrays, partner)),
                num_keys=num_keys, is_stable=False,
            )
            up = (me & size) == 0
            am_low = (me & stride) == 0
            keep_low = up == am_low
            arrays = [
                jnp.where(keep_low, m[:n_local], m[n_local:]) for m in merged
            ]
            stride //= 2
        size *= 2
    return arrays


def _left_boundary(x: jax.Array, n_dev: int, fill) -> jax.Array:
    """Per-device: previous element of the first local element.

    Concatenates the left neighbor's last element in front and drops the
    local last; device 0 receives ``fill``.
    """
    if n_dev == 1:
        incoming = jnp.full((1,), fill, x.dtype)
    else:
        perm = [(j, j + 1) for j in range(n_dev - 1)]
        incoming = jax.lax.ppermute(x[-1:], AXIS, perm)
        me = jax.lax.axis_index(AXIS)
        incoming = jnp.where(me == 0, jnp.full((1,), fill, x.dtype), incoming)
    return jnp.concatenate([incoming, x[:-1]])


def _halo_fetch3(rank_home: jax.Array, k: jax.Array, n_local: int,
                 n_dev: int):
    """(rank[i+k], rank[i+2k], rank[i+3k]) per device, -1 past the end.

    Each window [gidx + mk, gidx + mk + L) spans at most two device
    blocks, s = mk // L and s + 1. Because ``k`` is a traced value (it
    lives inside the doubling while_loop) the block shift cannot be a
    single static ``ppermute``; instead the shift is applied bit by bit,
    each stage kept or discarded per row by the matching bit of s. Per-
    device comm is O(L log D) and memory O(L), replacing the earlier
    all_gather'd replicated rank vector (O(n) per device) that capped
    corpus size at replicated-HBM.
    """
    ks = jnp.stack([k, 2 * k, 3 * k])  # the three quadrupling shifts
    n_shift = ks.shape[0]
    if n_dev == 1:
        rank_ext = jnp.concatenate(
            [rank_home, jnp.full((n_local,), -1, rank_home.dtype)]
        )
        starts = jnp.minimum(ks, n_local)
        rows = [jax.lax.dynamic_slice(rank_ext, (starts[i],), (n_local,))
                for i in range(n_shift)]
        return tuple(rows)
    me = jax.lax.axis_index(AXIS)
    s = ks // n_local  # block shifts; row i < i*n_dev, masked below
    off = ks - s * n_local
    # All three shifted windows ride ONE stacked ppermute per stage (3x
    # payload, 1/3 the messages — ICI transfers this small are
    # latency-bound). Row i keeps/discards each power-of-two block shift
    # according to its own bit of s[i].
    x = jnp.broadcast_to(rank_home, (n_shift, n_local))
    bit = 1
    while bit < 4 * n_dev:  # s can reach 3*(n_dev-1) for the 3k shift
        perm = [(j, (j - bit) % n_dev) for j in range(n_dev)]
        moved = jax.lax.ppermute(x, AXIS, perm)
        x = jnp.where(((s & bit) != 0)[:, None], moved, x)
        bit *= 2
    # One more static shift for the s+1 blocks; mask blocks past the end
    # (wrapped/absent blocks would otherwise alias valid rank values).
    perm1 = [(j, (j - 1) % n_dev) for j in range(n_dev)]
    x1 = jax.lax.ppermute(x, AXIS, perm1)
    x = jnp.where((me + s < n_dev)[:, None], x, -1)
    x1 = jnp.where((me + s + 1 < n_dev)[:, None], x1, -1)
    both = jnp.concatenate([x, x1], axis=1)  # (3, 2L)
    rows = [jax.lax.dynamic_slice(both[i], (off[i],), (n_local,))
            for i in range(n_shift)]
    return tuple(rows)


def _coded_initial_words(codes_local: jax.Array, n_dev: int, n_words: int,
                         bits: int, cpw: int) -> list[jax.Array]:
    """Per-device dense-coded initial key words (the sharded analogue of
    ops/prefix_doubling._suffix_array_packed's packing): each word packs
    ``cpw`` order-preserving alphabet codes of ``bits`` bits, covering
    n_words*cpw leading characters. The (n_words*cpw - 1)-symbol halo
    comes from the right neighbor (codes are 0 past the global end —
    the sentinel). One ppermute of the halo, then log-ladder packing on
    the extended local array."""
    n_local = codes_local.shape[0]
    halo_len = n_words * cpw - 1
    assert halo_len < n_local, "shard shorter than the initial key window"
    if n_dev == 1:
        halo = jnp.zeros((halo_len,), jnp.int32)
    else:
        perm = [(j, j - 1) for j in range(1, n_dev)]
        halo = jax.lax.ppermute(codes_local[:halo_len], AXIS, perm)
        me = jax.lax.axis_index(AXIS)
        halo = jnp.where(me == n_dev - 1,
                         jnp.zeros((halo_len,), jnp.int32), halo)
    ext0 = jnp.concatenate([codes_local, halo])

    def shifted(arr, off):
        if off == 0:
            return arr[:n_local + halo_len]
        return jax.lax.dynamic_slice(
            jnp.concatenate([arr, jnp.zeros((off,), jnp.int32)]), (off,),
            (arr.shape[0],))

    ladder = [ext0]
    width = 1
    while 2 * width <= cpw:
        prev = ladder[-1]
        ladder.append((prev << (bits * width)) | shifted(prev, width))
        width *= 2
    comp = None
    off = 0
    for k in range(len(ladder) - 1, -1, -1):
        w = 1 << k
        if cpw & w:
            part = shifted(ladder[k], off)
            comp = part if comp is None else (comp << (bits * w)) | part
            off += w
    return [jax.lax.dynamic_slice(comp, (w * cpw,), (n_local,))
            for w in range(n_words)]


def _rerank_and_home(key_cols, idx, n_local: int, n_dev: int, dtype):
    """Dense re-rank of a globally sorted key tuple + route ranks home.

    Shared by the quadrupling rounds and the coded first round: computes
    boundary-aware difference flags over ``key_cols``, a cross-shard
    exclusive scan for global dense ranks, the done flag, and the
    key-sort that returns ranks to home (suffix-index) layout.
    """
    n_total = n_local * n_dev
    me = jax.lax.axis_index(AXIS)
    lidx = jnp.arange(n_local, dtype=dtype)
    flag = jnp.zeros((n_local,), dtype)
    for col in key_cols:
        flag = flag | (col != _left_boundary(col, n_dev, fill=-2)).astype(
            dtype
        )
    flag = jnp.where((me == 0) & (lidx == 0), 0, flag)
    local_cum = jnp.cumsum(flag)
    totals = jax.lax.all_gather(local_cum[-1], AXIS)  # (n_dev,)
    offset = jnp.sum(
        jnp.where(jnp.arange(n_dev) < me, totals, 0), dtype=dtype
    )
    dense = local_cum + offset
    last_rank = jax.lax.psum(
        jnp.where(me == n_dev - 1, dense[-1], 0), AXIS
    )
    done = (last_rank + 1) == jnp.asarray(n_total, dtype)
    _, rank_new = _bitonic_global_sort(
        [idx, dense], num_keys=1, n_local=n_local, n_dev=n_dev
    )
    return rank_new, done


def _coded_first_round(codes_local: jax.Array, n_local: int, n_dev: int,
                       n_words: int, bits: int, cpw: int, index_dtype):
    """First round over dense-coded words: global bitonic sort by the
    word tuple (+ gidx tie-break), then dense re-rank. Returns the same
    state tuple as ``_round_body`` with k = n_words*cpw, so the
    quadrupling loop continues from a much larger h0 than the byte
    path's 3 — for small alphabets the sort already separates every
    suffix and zero quadrupling rounds run (the sharded analogue of the
    single-chip adaptive engine, measured 2.2x at 64 MiB there)."""
    me = jax.lax.axis_index(AXIS)
    lidx = jnp.arange(n_local, dtype=index_dtype)
    gidx = (me * n_local + lidx).astype(index_dtype)
    words = _coded_initial_words(codes_local, n_dev, n_words, bits, cpw)
    sorted_ops = _bitonic_global_sort(
        words + [gidx], num_keys=n_words + 1,
        n_local=n_local, n_dev=n_dev,
    )
    idx = sorted_ops[-1]
    rank_new, done = _rerank_and_home(sorted_ops[:-1], idx, n_local, n_dev,
                                      index_dtype)
    k = jnp.asarray(n_words * cpw, index_dtype)
    return rank_new, idx, k, done


def _packed_initial_rank(text_local: jax.Array, n_dev: int) -> jax.Array:
    """Per-device packed 3-byte starting keys (order == first-3-char order).

    The first round's rank input need not be dense — any order-isomorphic
    key works, and the round densifies it. The 2-symbol halo comes from the
    right neighbor (sentinel 0 past the global end)."""
    sym = (text_local + 1).astype(jnp.int32)  # PAD -> 0, bytes -> 1..256
    if n_dev == 1:
        halo = jnp.zeros((2,), jnp.int32)
    else:
        perm = [(j, j - 1) for j in range(1, n_dev)]
        halo = jax.lax.ppermute(sym[:2], AXIS, perm)
        me = jax.lax.axis_index(AXIS)
        halo = jnp.where(me == n_dev - 1, jnp.zeros((2,), jnp.int32), halo)
    ext = jnp.concatenate([sym, halo])
    return (ext[:-2] << 18) | (ext[1:-1] << 9) | ext[2:]


def _round_body(rank_home: jax.Array, k: jax.Array, n_local: int, n_dev: int):
    """One quadrupling round, per-device view (under shard_map).

    With ``rank`` ordering suffixes by their first k characters, sorting by
    (rank[i], rank[i+k], rank[i+2k], rank[i+3k]) orders by 4k — log4 rounds
    of the bitonic network instead of log2, for ~1.5x the per-stage operand
    cost (same trade as the single-chip engine, ops/prefix_doubling.py).

    Returns (rank_new, sa_sorted, next_k, done); sa_sorted is the current
    global order in sorted layout (device d holds ranks [d*L, (d+1)*L)).
    """
    dtype = rank_home.dtype  # int32, or int64 for u64 builds
    me = jax.lax.axis_index(AXIS)
    lidx = jnp.arange(n_local, dtype=dtype)
    gidx = (me * n_local + lidx).astype(dtype)

    with jax.named_scope("D1_halo_shift"):
        s1, s2, s3 = _halo_fetch3(rank_home, k, n_local, n_dev)

    # gidx MUST be a key here (unlike the single-chip engine): in the
    # merge-split stages each device merges [mine ++ partner's] while the
    # partner merges [partner's ++ mine]; with tied keys the two merged
    # orders differ unless the key set is a total order, and the low/high
    # split would then drop/duplicate elements.
    with jax.named_scope("D2_global_bitonic_sort"):
        r, c1, c2, c3, idx = _bitonic_global_sort(
            [rank_home, s1, s2, s3, gidx], num_keys=5,
            n_local=n_local, n_dev=n_dev,
        )

    # Dense re-rank in sorted order + route home (shared helper).
    with jax.named_scope("D3_rerank_route_home"):
        rank_new, done = _rerank_and_home((r, c1, c2, c3), idx, n_local,
                                          n_dev, dtype)
    # k == 0 (a resumed legacy checkpoint) ordered by single chars.
    next_k = jnp.where(k == 0, 1, k * 4).astype(dtype)
    return rank_new, idx, next_k, done


def _dist_build_shard(text_local: jax.Array, n_local: int, n_dev: int,
                      index_dtype=jnp.int32, plan: tuple | None = None):
    """Per-device body (under shard_map): full build, returns the local
    SA slice in sorted layout. ``index_dtype``: int32, or int64 for
    corpora past the 2^31-byte cap (the sharded analogue of
    ops/prefix_doubling.py's u64 option). ``plan`` = (n_words, bits,
    cpw) routes the first round through dense-coded words (the input
    must then be CODES, not bytes) — for small alphabets the first
    global sort orders by n_words*cpw characters and the quadrupling
    loop usually never runs."""
    n_total = n_local * n_dev

    def round_step(state):
        rank_home, _, k, _ = state
        return _round_body(rank_home, k, n_local, n_dev)

    def cond(state):
        _, _, k, done = state
        return jnp.logical_not(done) & (k < n_total)

    if plan is not None:
        n_words, bits, cpw = plan
        state = _coded_first_round(text_local, n_local, n_dev, n_words,
                                   bits, cpw, index_dtype)
    else:
        rank0 = _packed_initial_rank(text_local, n_dev).astype(index_dtype)
        # Always run the first round (k=3: packed keys order by 3
        # characters, so the round orders by 12).
        state = _round_body(rank0, jnp.asarray(3, index_dtype), n_local,
                            n_dev)
    _, sa_local, _, _ = jax.lax.while_loop(cond, round_step, state)
    return sa_local


@functools.partial(jax.jit,
                   static_argnames=("n_local", "n_dev", "mesh",
                                    "index_dtype", "plan"))
def _dist_build_jit(text_sharded: jax.Array, n_local: int, n_dev: int,
                    mesh: Mesh, index_dtype=jnp.int32,
                    plan: tuple | None = None):
    fn = functools.partial(_dist_build_shard, n_local=n_local, n_dev=n_dev,
                           index_dtype=index_dtype, plan=plan)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS), check_vma=False
    )(text_sharded)


@functools.partial(jax.jit,
                   static_argnames=("n_local", "n_dev", "mesh",
                                    "index_dtype", "plan"))
def _coded_first_round_jit(codes_sharded: jax.Array, n_local: int,
                           n_dev: int, mesh: Mesh, index_dtype=jnp.int32,
                           plan: tuple = (4, 3, 10)):
    n_words, bits, cpw = plan
    fn = functools.partial(_coded_first_round, n_local=n_local,
                           n_dev=n_dev, n_words=n_words, bits=bits,
                           cpw=cpw, index_dtype=index_dtype)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=P(AXIS),
        out_specs=(P(AXIS), P(AXIS), P(), P()), check_vma=False,
    )(codes_sharded)


@functools.partial(jax.jit, static_argnames=("n_local", "n_dev", "mesh"))
def _dist_step_jit(rank: jax.Array, k: jax.Array, n_local: int, n_dev: int,
                   mesh: Mesh):
    """One host-driven quadrupling round over the mesh (checkpoint/resume)."""
    fn = functools.partial(_round_body, n_local=n_local, n_dev=n_dev)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS), P(), P()), check_vma=False,
    )(rank, k)


@functools.partial(jax.jit, static_argnames=("n_dev", "mesh"))
def _initial_rank_jit(text_sharded: jax.Array, n_dev: int, mesh: Mesh):
    fn = functools.partial(_packed_initial_rank, n_dev=n_dev)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS), check_vma=False
    )(text_sharded)


def _resolve_index_dtype(index_dtype: str, n_total: int):
    """(jnp dtype, np output dtype) for a sharded build of n_total slots."""
    if index_dtype == "auto":
        index_dtype = "u64" if n_total >= (1 << 31) else "u32"
    if index_dtype == "u64":
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "index_dtype='u64' requires jax_enable_x64 "
                "(jax.config.update('jax_enable_x64', True))")
        return jnp.int64, np.uint64
    if n_total >= (1 << 31):
        raise ValueError(
            "text needs >= 2^31 padded bytes: pass index_dtype='u64'")
    return jnp.int32, np.uint32


def suffix_array_sharded(data: bytes | np.ndarray | str,
                         mesh: Mesh,
                         index_dtype: str = "u32") -> np.ndarray:
    """Suffix array built across all devices of ``mesh``.

    ``data`` may be bytes, a uint8 array, or a file path — paths are
    streamed shard-by-shard from an mmap (utils/io.py), never fully
    materialized as a host int32 copy. Output is bit-identical to the
    single-device engine and the reference.

    ``index_dtype``: "u32" (default; total padded size < 2^31), "u64"
    (beyond the reference's u32 cap, src/table.rs:68-77; requires
    jax_enable_x64 — the scale-out configuration that most needs the wide
    index), or "auto".
    """
    arr = _as_u8(data)
    n = int(arr.shape[0])
    if n == 0:
        return np.empty((0,), dtype=np.uint32)
    sa_full, n_total, _, out_dtype = suffix_array_sharded_device(
        arr, mesh, index_dtype)
    return np.asarray(sa_full)[n_total - n:].astype(out_dtype)


def _as_u8(data) -> np.ndarray:
    from suffix_tpu.utils.io import open_corpus

    if isinstance(data, str):
        return open_corpus(data)
    if isinstance(data, (bytes, bytearray)):
        return np.frombuffer(bytes(data), dtype=np.uint8)
    return np.asarray(data, dtype=np.uint8)


def suffix_array_sharded_device(data, mesh: Mesh, index_dtype: str = "u32"):
    """Device-RESIDENT sharded build: (sa_sharded, n_total, n_local,
    out_dtype). ``sa_sharded`` stays sequence-sharded over the mesh with
    the padding suffixes in the first ``n_total - n`` rank slots — the
    host never materializes the table (the serving layer consumes the
    shards directly, dist_query.ShardedQueryIndex). The corpus is
    streamed through ``device_corpus`` one shard at a time, including
    the alphabet-adaptive coded route (lut applied per shard)."""
    arr = _as_u8(data)
    n = int(arr.shape[0])
    from suffix_tpu.utils.io import device_corpus

    n_dev = _check_pow2(mesh)
    n_local = _local_bucket(n, n_dev)
    n_total = n_local * n_dev
    dtype, out_dtype = _resolve_index_dtype(index_dtype, n_total)
    if n_dev == 1:
        # A 1-device mesh pays the SPMD program's measured 1.43x
        # overhead (bench: sharded_overhead_1dev) and misses the
        # class-routed single-chip engines (two-phase, periodic);
        # route through the single-chip closure — same padding-first
        # layout, same output, then commit to the mesh's sharding.
        from suffix_tpu.ops.prefix_doubling import device_build_closure

        dispatch, _ = device_build_closure(arr, n_total, index_dtype=dtype)
        sa_full = jax.device_put(dispatch(), NamedSharding(mesh, P(AXIS)))
        return sa_full, n_total, n_local, out_dtype
    plan_full = _sharded_adaptive_plan(arr, n_total, n_local)
    if plan_full is not None:
        lut, plan = plan_full
        sharded, _ = device_corpus(arr, mesh, n_pad=n_total, lut=lut,
                                   fill=0)
        sa_full = _dist_build_jit(sharded, n_local, n_dev, mesh,
                                  index_dtype=dtype, plan=plan)
    else:
        sharded, _ = device_corpus(arr, mesh, n_pad=n_total)
        sa_full = _dist_build_jit(sharded, n_local, n_dev, mesh,
                                  index_dtype=dtype)
    return sa_full, n_total, n_local, out_dtype


def _sharded_adaptive_plan(arr: np.ndarray, n_total: int, n_local: int):
    """(lut, (n_words, bits, cpw)) for the dense-coded sharded first
    round, or None. Same policy as the single-chip engine
    (ops/prefix_doubling._adaptive_plan), with the extra guard that the
    key window must fit inside one shard's halo."""
    from suffix_tpu.ops.prefix_doubling import (ADAPTIVE_PACK_MIN,
                                                _adaptive_plan)

    if n_total < ADAPTIVE_PACK_MIN:
        return None
    plan = _adaptive_plan(arr, n_total)
    if plan is None:
        return None
    lut, bits, cpw, n_words = plan
    if n_words * cpw >= n_local:
        return None  # degenerate: window wider than a shard
    return lut, (n_words, bits, cpw)


def _ckpt_path(checkpoint_path: str) -> str:
    """Per-process checkpoint file: multi-controller runs persist each
    process's addressable shards under its own name (a process cannot
    materialize the non-addressable remainder of a global array)."""
    if jax.process_count() > 1:
        return f"{checkpoint_path}.p{jax.process_index()}"
    return checkpoint_path


def _save_ckpt(checkpoint_path: str, rank, sa, k: int, done: bool,
               n_total: int) -> None:
    """Atomic per-round persist; keeps the previous round as ``.prev`` so
    a process that raced one round ahead of a crashed peer can rewind to
    the last globally-completed round on resume."""
    path = _ckpt_path(checkpoint_path)
    los, rblocks, sblocks = [], [], []
    for rs, ss in zip(rank.addressable_shards, sa.addressable_shards):
        los.append(rs.index[0].start or 0)
        rblocks.append(np.asarray(rs.data))
        sblocks.append(np.asarray(ss.data))
    tmp = path + ".tmp.npz"
    np.savez(tmp, los=np.asarray(los, np.int64),
             rank=np.stack(rblocks), sa=np.stack(sblocks),
             k=np.int64(k), done=np.bool_(done), n_total=np.int64(n_total))
    if os.path.exists(path):
        os.replace(path, path + ".prev")
    os.replace(tmp, path)


def _load_ckpt_file(path: str, n_total: int):
    """(los, rank_blocks, sa_blocks, k, done) or None."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if int(z["n_total"]) != n_total:
                return None
            return (z["los"], z["rank"], z["sa"], int(z["k"]),
                    bool(z["done"]))
    except (OSError, ValueError, KeyError, zipfile.BadZipFile):
        return None  # corrupt/partial checkpoint: caller restarts


def _resume_state(checkpoint_path: str, mesh: Mesh, n_total: int, dtype):
    """Reconstruct (rank, sa, k, done) from per-process checkpoints.

    Multi-controller: every process loads its own shard file, the
    processes agree on the most recent ROUND COMPLETED BY ALL (a crash
    can leave one process a round ahead — its ``.prev`` file holds the
    common round), and the global arrays are assembled from local
    single-device blocks. Deterministic rounds make the resumed build
    bit-identical to an uninterrupted one.
    """
    path = _ckpt_path(checkpoint_path)
    states = {}
    st = _load_ckpt_file(path, n_total)
    if st is not None:
        states[st[3]] = st
    prev = _load_ckpt_file(path + ".prev", n_total)
    if prev is not None:
        states.setdefault(prev[3], prev)
    if not states:
        return None
    k_mine = max(states)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        all_k = multihost_utils.process_allgather(np.int64(k_mine))
        k_common = int(np.min(all_k))
        if k_common not in states:
            raise RuntimeError(
                f"cannot resume: this process's checkpoints cover rounds "
                f"{sorted(states)} but the slowest peer is at {k_common}")
    else:
        k_common = k_mine
    los, rblocks, sblocks, k, done = states[k_common]
    shard = NamedSharding(mesh, P(AXIS))
    dev_of = {}
    for d, idx in shard.addressable_devices_indices_map(
            (n_total,)).items():
        dev_of[idx[0].start or 0] = d
    rank_parts, sa_parts = [], []
    for lo, rb, sb in zip(los, rblocks, sblocks):
        d = dev_of[int(lo)]
        rank_parts.append(jax.device_put(rb.astype(dtype), d))
        sa_parts.append(jax.device_put(sb.astype(dtype), d))
    order = np.argsort([int(lo) for lo in los])
    rank = jax.make_array_from_single_device_arrays(
        (n_total,), shard, [rank_parts[i] for i in order])
    sa = jax.make_array_from_single_device_arrays(
        (n_total,), shard, [sa_parts[i] for i in order])
    return rank, sa, k, done


def suffix_array_sharded_stepped(
    data: bytes | np.ndarray,
    mesh: Mesh,
    checkpoint_path: str | None = None,
    resume: bool = False,
    round_hook=None,
    index_dtype: str = "u32",
) -> np.ndarray:
    """Host-driven sharded build with checkpoint/resume between rounds.

    The failure-recovery path (SURVEY.md §5): each quadrupling round is one
    jitted SPMD step; after every round the (rank, sa, k) state is
    persisted atomically (write + rename, so a crash mid-write leaves the
    previous round's file), and a restarted process resumes from the last
    completed round — deterministic, so the final SA is bit-identical to
    an uninterrupted run. The reference has no equivalent (errors are
    panics, src/table.rs:369-380). ``round_hook(k, done)`` is called after
    each persisted round (metrics / fault-injection tests).
    """
    arr = (
        np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, (bytes, bytearray))
        else np.asarray(data, dtype=np.uint8)
    )
    n = int(arr.shape[0])
    if n == 0:
        return np.empty((0,), dtype=np.uint32)
    n_dev = _check_pow2(mesh)
    n_local = _local_bucket(n, n_dev)
    n_total = n_local * n_dev
    dtype, out_dtype = _resolve_index_dtype(index_dtype, n_total)
    shard = NamedSharding(mesh, P(AXIS))

    state = None
    if resume and checkpoint_path:
        state = _resume_state(checkpoint_path, mesh, n_total, dtype)
    if state is None:
        plan_full = _sharded_adaptive_plan(arr, n_total, n_local)
        if plan_full is not None:
            # Dense-coded first round as step 0: the checkpointed state
            # (rank, sa, k=n_words*cpw, done) resumes through the normal
            # quadrupling steps.
            lut, plan = plan_full
            codes = np.zeros((n_total,), np.int32)
            codes[:n] = lut[arr]
            codes_sharded = jax.device_put(codes, shard)
            rank, sa, k_arr, done_arr = _coded_first_round_jit(
                codes_sharded, n_local, n_dev, mesh, index_dtype=dtype,
                plan=plan)
            state = (rank, sa, int(k_arr), bool(done_arr))
            if checkpoint_path:
                _save_ckpt(checkpoint_path, rank, sa, int(k_arr),
                           bool(done_arr), n_total)
            if round_hook is not None:
                round_hook(int(k_arr), bool(done_arr))
        else:
            padded = np.full((n_total,), PAD, dtype=np.int32)
            padded[:n] = arr
            text_sharded = jax.device_put(padded, shard)
            rank0 = _initial_rank_jit(text_sharded, n_dev,
                                      mesh).astype(dtype)
            state = (rank0, None, 3, False)

    rank, sa, k, done = state
    while not done and k < n_total:
        rank, sa, next_k, done_arr = _dist_step_jit(
            rank, jnp.asarray(k, dtype), n_local, n_dev, mesh
        )
        done = bool(done_arr)
        k = int(next_k)
        if checkpoint_path:
            _save_ckpt(checkpoint_path, rank, sa, k, done, n_total)
        if round_hook is not None:
            round_hook(k, done)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        sa_full = np.asarray(multihost_utils.process_allgather(
            sa, tiled=True))
    else:
        sa_full = np.asarray(sa)
    return sa_full[n_total - n:].astype(out_dtype)
