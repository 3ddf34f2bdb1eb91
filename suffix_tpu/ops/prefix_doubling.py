"""Suffix-array construction by prefix doubling — the TPU-native engine.

The reference crate builds suffix arrays with sequential SA-IS induced
sorting (src/table.rs:388-574). Induced sorting is a loop-carried scan that
reads its own earlier writes through per-bucket cursors — a shape that maps
terribly onto a vector machine. The suffix array of a text is, however, a
*unique* permutation (strict byte-lexicographic order of all suffixes, where
padding below the text acts as the implicit sentinel), so any correct
algorithm produces bit-identical output to the reference.

This module implements the classic prefix-doubling scheme (Manber–Myers) as
a fully data-parallel XLA pipeline:

  round k: key(i)   = (rank[i], rank[i + k])   (rank past the end = -1)
           order    = sort by key               (one fused on-device sort)
           rank'    = dense rank of keys        (segment flags + cumsum)
  stop when every rank is distinct; k doubles each round.

Each round is a handful of large fused vector ops plus one `lax.sort` — all
MXU/VPU-friendly, no data-dependent control flow except the round count
(`lax.while_loop`, which XLA compiles once). Output equivalence with the
reference's SA-IS is pinned by the conformance suite (tests/test_conformance.py)
on the reference's own corpus (tests/tests.rs:22-96).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from suffix_tpu.ops.padding import PAD, bucket_size


INIT_WORDS = 2  # initial sort orders by INIT_WORDS * 3 characters


def pick_init_words(n_pad: int) -> int:
    """Size-dependent initial sort width.

    Small builds (<= 1M): extra sort operands are ~free while a saved
    round is a fixed ~1 ms (measured 8.05 vs 9.54 ms on the 100 KB
    fixture). Mid sizes: 2 words win (39.1 vs 48.9 ms at 4 MiB — the
    h-ladder 6->24 already clears the ~22-char max LCP of random text in
    one round). Huge builds (>= 16M): expected max LCP of random text
    (~2 log_sigma n) crosses 24, so the initial sort must reach h0 >= 9
    to converge after one quadrupling round (9 -> 36 covers random text
    to n ~ 2^36); 3 words beat 4 by the saved operand (68.1 vs
    62.2 MB/s at 64 MiB, scripts/scale_probe.py). Corpora whose max LCP
    lands in (36, 48] would save a round at 4 words — pass init_words
    explicitly for such classes."""
    if n_pad <= (1 << 20):
        return 4
    if n_pad >= (1 << 24):
        return 3
    return INIT_WORDS


def _initial_words(text: jax.Array, init_words: int) -> list[jax.Array]:
    """Pack the leading 3*init_words bytes into int32 words (3 x 9 bits).

    Values are shifted to [1, 256] so that the past-the-end fill (0)
    compares below every real byte — the sentinel rule. Word w holds
    characters [3w, 3w+3); sorting by all words orders suffixes by their
    first 3*init_words characters. Each extra sort operand costs ~3 ms/4M
    on v5e versus ~30 ms for a quadrupling round, so wider initial sorts
    pay off exactly when they cross the corpus' max-LCP threshold and
    remove a round (measured: on random 4 MiB DNA, max LCP ~22 < 24 means
    h0=6 already converges in one round and wider is pure overhead)."""
    n = text.shape[0]
    sym = (text + 1).astype(jnp.int32)  # PAD (-1) -> 0, bytes -> 1..256
    sym_ext = jnp.concatenate(
        [sym, jnp.zeros((3 * init_words - 1,), jnp.int32)]
    )
    s = [sym_ext[j:j + n] for j in range(3 * init_words)]
    return [
        (s[3 * w] << 18) | (s[3 * w + 1] << 9) | s[3 * w + 2]
        for w in range(init_words)
    ]


def _invert_permutation(sa: jax.Array, values: jax.Array) -> jax.Array:
    """out[sa[j]] = values[j], via a key-sort.

    On TPU a single-key sort with payload is measurably faster than the
    equivalent random scatter (sorts stream memory; scatters don't).
    ``sa`` is a permutation (all keys distinct), so the sort need not be
    stable — is_stable=False saves ~20% (measured 15.8 -> 12.6 ms/4M on
    3-operand sorts).
    """
    _, out = jax.lax.sort((sa, values), num_keys=1, is_stable=False)
    return out


@functools.partial(jax.jit, static_argnames=("init_words", "index_dtype"))
def _suffix_array_padded(text: jax.Array,
                         init_words: int = INIT_WORDS,
                         index_dtype=jnp.int32) -> jax.Array:
    """Suffix array of a PAD-padded int32 text (static length).

    Returns the full permutation of [0, n_pad); suffixes that start inside
    the padding all consist of PAD bytes only and therefore occupy the
    first ``pad_len`` slots — callers slice them off.

    Per round, every memory access is streaming: the doubling shift is a
    contiguous dynamic slice (not a gather), the sorted key columns come
    out of the sort itself (no re-gather), and the rank inverse-permute is
    a key-sort (no scatter).

    ``index_dtype``: int32 by default (texts < 2^31 bytes, covering the
    reference's entire u32 domain in practice); pass jnp.int64 (requires
    jax_enable_x64) for larger corpora — indices, ranks, and the round
    counter widen, the packed key words stay int32.
    """
    n = text.shape[0]
    idx = jnp.arange(n, dtype=index_dtype)
    neg = jnp.full((n,), -1, index_dtype)

    # Initial round: order by 3*init_words packed bytes, so the quadrupling
    # rounds start at h=3*init_words. The rank inverse-permute (a key-sort)
    # feeds the first quadrupling round only — skip it when the initial
    # sort already separated every suffix.
    words = _initial_words(text, init_words)
    # idx rides as PAYLOAD, not key: tied keys receive equal dense ranks,
    # so their payload order is irrelevant to every consumer (dense0 reads
    # key columns; invert maps equal-rank suffixes to equal values; sa0 is
    # final only when all keys are distinct). Fewer comparator words +
    # unstable sorting measured 15.8 -> 12.3 ms/4M on 3-operand sorts.
    sorted_ops = jax.lax.sort(tuple(words) + (idx,), num_keys=init_words,
                              is_stable=False)
    sa0 = sorted_ops[-1]
    diff0 = sorted_ops[0][1:] != sorted_ops[0][:-1]
    for col in sorted_ops[1:init_words]:
        diff0 = diff0 | (col[1:] != col[:-1])
    new_flag = jnp.concatenate(
        [jnp.zeros((1,), index_dtype), diff0.astype(index_dtype)]
    )
    dense0 = jnp.cumsum(new_flag)
    done0 = dense0[-1] == n - 1
    rank = jax.lax.cond(
        done0, lambda: dense0, lambda: _invert_permutation(sa0, dense0)
    )

    def cond(state):
        _, _, k, done = state
        return jnp.logical_and(jnp.logical_not(done), k < 2 * n)

    def body(state):
        # Quadrupling round: with ranks ordering by the first k chars,
        # the key (rank[i], rank[i+k], rank[i+2k], rank[i+3k]) orders by
        # 4k chars — log4 rounds instead of log2, for ~1.4x the per-round
        # sort cost (net win). Shifted ranks are contiguous slices of
        # [rank | -1...] (clamped; shift >= n => all -1).
        rank, _, k, _ = state
        rank_ext = jnp.concatenate([rank, neg])

        def shifted(mult):
            off = jnp.minimum(mult * k, n)
            return jax.lax.dynamic_slice(rank_ext, (off,), (n,))

        s1, s2, s3 = shifted(1), shifted(2), shifted(3)
        # idx is payload (see the initial sort): ties get equal dense
        # ranks, the final round has no ties.
        r1, r2, r3, r4, sa = jax.lax.sort(
            (rank, s1, s2, s3, idx), num_keys=4, is_stable=False
        )
        diff = (
            (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
            | (r3[1:] != r3[:-1]) | (r4[1:] != r4[:-1])
        )
        new_flag = jnp.concatenate(
            [jnp.zeros((1,), index_dtype), diff.astype(index_dtype)]
        )
        dense = jnp.cumsum(new_flag)
        done = dense[-1] == n - 1
        # The route-home key-sort feeds the NEXT round only; skip it on
        # the final round.
        new_rank = jax.lax.cond(
            done, lambda: rank, lambda: _invert_permutation(sa, dense)
        )
        return (new_rank, sa, k * 4, done)

    _, sa, _, _ = jax.lax.while_loop(
        cond, body, (rank, sa0, jnp.asarray(3 * init_words, index_dtype),
                     done0)
    )
    return sa


def suffix_array_bytes(data: np.ndarray | bytes,
                       padding: str = "pow2",
                       index_dtype: str = "u32") -> np.ndarray:
    """Suffix array (unsigned byte offsets) of ``data``, built on device.

    Matches ``SuffixTable::new`` (src/table.rs:78-85): strict
    byte-lexicographic order over all suffixes of the raw bytes.

    ``padding``: "pow2" (default, fewest compiled shapes) or "fine"
    (<=12.5% padded overhead — up to ~2x less compute for sizes just
    above a power of two, at the cost of more one-time compilations).

    ``index_dtype``: "u32" (default; reference parity, texts < 2^31
    bytes) or "u64" (beyond the reference's u32 cap, src/table.rs:68-77;
    requires jax_enable_x64). "auto" picks by size.
    """
    from suffix_tpu.ops.padding import bucket_size_fine

    arr = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    n = int(arr.shape[0])
    n_pad0 = bucket_size(n) if padding == "pow2" else bucket_size_fine(max(n, 1))
    if index_dtype == "auto":
        index_dtype = "u64" if n_pad0 >= (1 << 31) else "u32"
    if index_dtype == "u64":
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "index_dtype='u64' requires jax_enable_x64 "
                "(jax.config.update('jax_enable_x64', True))")
        dtype, out_dtype = jnp.int64, np.uint64
    else:
        if n_pad0 >= (1 << 31):
            raise ValueError(
                "text needs >= 2^31 padded bytes: pass index_dtype='u64'")
        dtype, out_dtype = jnp.int32, np.uint32
    if n == 0:
        return np.empty((0,), dtype=out_dtype)
    padded = np.full((n_pad0,), PAD, dtype=np.int32)
    padded[:n] = arr
    # Wider initial sorts are ~free at small sizes (operands cost O(n))
    # while a saved quadrupling round is a fixed ~1 ms win: measured
    # 8.05 ms vs 9.54 ms on the 100 KB fixture at 4 vs 2 words. At large
    # sizes the extra operands dominate (48.9 vs 39.1 ms at 4 MiB).
    sa_full = np.asarray(
        _suffix_array_padded(jnp.asarray(padded),
                             init_words=pick_init_words(n_pad0),
                             index_dtype=dtype))
    # Padding suffixes (all-PAD) sort strictly first; drop them.
    return sa_full[n_pad0 - n :].astype(out_dtype)


def suffix_array_device(text_padded: jax.Array, n_pad: int) -> jax.Array:
    """Jit-friendly entry for already-device-resident padded text."""
    del n_pad  # shape carries it
    return _suffix_array_padded(text_padded)
