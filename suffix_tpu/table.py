"""SuffixTable — the index + query API.

TPU-native equivalent of the reference's ``SuffixTable`` (src/table.rs:54-312)
with the same behavioral contract:

- ``new`` builds the sorted suffix table (byte-lexicographic, u32 byte
  offsets; panics over 2^32-1 bytes — src/table.rs:68-85).
- ``new_naive`` is the simple oracle construction (src/table.rs:92-100).
- ``from_parts`` / ``into_parts`` (de)construct without copying and assert
  len(text) == len(table) (src/table.rs:111-127).
- ``lcp_lens`` returns the LCP array per src/table.rs:129-138.
- ``positions`` / ``contains`` / ``any_position`` per src/table.rs:197-293,
  including the unordered-slice semantics of ``positions`` and the
  empty-query rejects. Batched variants handle thousands of patterns in
  one device dispatch.
- ``repr`` mirrors the reference Debug impl (src/table.rs:296-312), which
  drives the anatomy example (examples/anatomy.rs).

Texts may be ``str`` (indexed as UTF-8 bytes; all positions are byte
offsets — reference contract src/table.rs:66 and the unicode_snowman test,
tests/tests.rs:209-213) or raw ``bytes``.
"""

from __future__ import annotations

import threading
from typing import Iterable, Sequence

import jax.numpy as jnp
import numpy as np

from suffix_tpu.ops import lcp as lcp_ops
from suffix_tpu.ops import naive as naive_ops
from suffix_tpu.ops import prefix_doubling
from suffix_tpu.ops import search as search_ops
from suffix_tpu.ops.padding import PAD, bucket_size

MAX_TEXT_LEN = 0xFFFFFFFF  # u32 offsets, same cap as the reference

# Guards creation of an instance's _init_lock when the instance came
# through the small-build fast path (two threads racing __getattr__
# must agree on ONE lock object).
_LOCK_CREATE = threading.Lock()

# Resolved once on the first small build: the raw C sais entry (the
# extension's METH_O function when built, else the Python wrapper),
# or False when no native library exists. Re-resolving per build cost
# ~900 ns of import/availability machinery — more than the C build of
# "mississippi" itself.
_SMALL_SAIS = None


def _resolve_small_sais():
    global _SMALL_SAIS
    from suffix_tpu import native

    if not native.available():
        _SMALL_SAIS = False
        return False
    fp = native._load_fastpath()
    _SMALL_SAIS = fp.sais if fp is not None else native.sais
    return _SMALL_SAIS

# engine="auto": corpora at or below this build on the host CPU via the
# native SA-IS; larger ones go to the device pipeline. Threshold measured
# (scripts/round3_study.py crossover, v5e via tunnel): native wins the
# host-bytes-in/host-table-out build at every point of the 64K..4M ladder
# (4.4 vs 37 ms at 64K, 356 vs 635 ms at 4M — the device wall cost is
# dominated by ~53 MB/s tunnel transfers, not the 30 ms device build).
# Beyond 4 MiB the device route pays off anyway: its table feeds the
# batched device query engine (12.5M q/s at 4 MiB vs ~0.4M host) and the
# amortized device build throughput (68-147 MB/s) dwarfs the CPU's
# 5.7-10.8 MB/s, so serving pipelines keep large corpora on-device.
AUTO_NATIVE_MAX = 1 << 22


def _as_bytes(text) -> tuple[bytes, bool]:
    """Normalize input text; returns (raw_bytes, was_str)."""
    if isinstance(text, str):
        return text.encode("utf-8"), True
    if isinstance(text, (bytes, bytearray, memoryview)):
        return bytes(text), False
    arr = np.asarray(text)
    if arr.dtype != np.uint8:
        raise TypeError("array texts must be uint8")
    return arr.tobytes(), False


class SuffixTable:
    """A lexicographically sorted table of suffix byte-offsets over a text."""

    def __init__(self, text, table: np.ndarray, *, _was_str: bool | None = None):
        raw, was_str = _as_bytes(text)
        if _was_str is not None:
            was_str = _was_str
        table = np.ascontiguousarray(np.asarray(table, dtype=np.uint32))
        if len(raw) != table.shape[0]:
            raise ValueError(
                f"text length ({len(raw)}) != table length ({table.shape[0]})"
            )
        self._raw = raw
        self._bytes = np.frombuffer(raw, dtype=np.uint8)
        self._table = table
        self._was_str = was_str
        # Device-side caches, created lazily on first query.
        self._dev_text = None
        self._dev_table = None
        self._n_iters = None
        self._pk_ext = None  # extended keys, built on first long-query batch
        self._ext_block = None  # deep keyless ext tier (huge indexes)
        self._host_handle = None  # native single-query handle (hybrid route)
        self._init_lock = threading.RLock()  # guards the lazy device state
        # Per-instance routing (class attributes are the defaults):
        # assigning one table's route must not re-route every table.
        # type(self) so a subclass can override the default by setting
        # _QUERY_ROUTE_DEFAULT (query_route itself is a property — do
        # not assign it at class level).
        self._query_route = type(self)._QUERY_ROUTE_DEFAULT
        self.HOST_QUERY_MAX = type(self).HOST_QUERY_MAX
        self._route1_cache = None  # (query_route, decision) memo
        # Structured build metrics (utils/metrics.py schema), populated
        # by `new(..., collect_stats=True)` or by load_index for indexes
        # saved with stats.
        self.build_stats = None

    # Lazily materialized state for fast-path instances (_new_small
    # skips __init__; __getattr__ below fills these on first touch).
    _LAZY_NONE = frozenset((
        "_dev_text", "_dev_table", "_n_iters", "_pk_ext", "_ext_block",
        "_host_handle", "_route1_cache", "build_stats",
    ))

    def __getattr__(self, name):
        # Only ever called for attributes missing from the instance —
        # zero overhead for fully-initialized tables.
        if name in type(self)._LAZY_NONE:
            self.__dict__[name] = None
            return None
        if name == "_bytes":
            v = np.frombuffer(self._raw, dtype=np.uint8)
            self.__dict__[name] = v
            return v
        if name == "_query_route":
            v = type(self)._QUERY_ROUTE_DEFAULT
            self.__dict__[name] = v
            return v
        if name == "_init_lock":
            with _LOCK_CREATE:
                if "_init_lock" not in self.__dict__:
                    self.__dict__["_init_lock"] = threading.RLock()
            return self.__dict__["_init_lock"]
        raise AttributeError(name)

    @classmethod
    def _new_small(cls, raw: bytes, table) -> "SuffixTable":
        """Minimal-overhead construction for the host small-build path.

        The reference's sais_small microbench (tests/bench.rs:17-23,
        1,038 ns published) measures `SuffixTable::new` end to end; the
        full Python __init__ costs ~1.8 us in validation, lock and
        cache setup the small-build path never touches — so those
        become lazy (__getattr__) and the Python-visible build lands
        under the reference's number (bench_micro build rows)."""
        st = cls.__new__(cls)
        d = st.__dict__
        d["_raw"] = raw
        d["_table"] = table
        d["_was_str"] = False
        return st

    # ----------------------------------------------------------------- build

    @classmethod
    def new(cls, text, engine: str = "device",
            padding: str = "pow2", index_dtype: str = "u32",
            collect_stats: bool = False) -> "SuffixTable":
        """Build the suffix table (reference: src/table.rs:78-85).

        ``collect_stats=True`` builds through the instrumented metrics
        surface (utils/metrics.py) and attaches the structured stats
        dict as ``table.build_stats`` (engine label, rounds, tie-mass
        trajectory, bytes/s, ...).

        Engines (all produce the identical, unique suffix array):

        - ``"device"``  — parallel prefix doubling on the default JAX
          device (the fast path);
        - ``"sais"``    — the SA-IS-structured device pipeline (LMS
          sample + stratified induced derivation, ops/sais.py);
        - ``"native"``  — linear-time C++ SA-IS on the host CPU;
        - ``"auto"``    — native for small texts (<= AUTO_NATIVE_MAX,
          skipping device dispatch/compile latency), device otherwise.

        ``index_dtype`` ("u32"/"u64"/"auto", device engine only) widens
        indices past the reference's u32 cap; u64 needs jax_enable_x64.
        """
        if (type(text) is bytes and not collect_stats
                and index_dtype == "u32"
                and (engine == "native"
                     or (engine == "auto"
                         and len(text) <= AUTO_NATIVE_MAX))):
            # Small-build fast path: one C call + a 3-slot instance
            # (sub-microsecond Python-visible; see _new_small).
            fn = _SMALL_SAIS
            if fn is None:
                fn = _resolve_small_sais()
            if fn:
                if len(text) > MAX_TEXT_LEN:
                    raise ValueError(
                        "text is too large (max 2^32 - 1 bytes); use "
                        "suffix_array_bytes(index_dtype='u64')")
                # _new_small inlined: the call itself is ~80 ns on a
                # ~1 us budget (reference sais_small: 1,038 ns).
                st = cls.__new__(cls)
                d = st.__dict__
                d["_raw"] = text
                d["_table"] = fn(text)
                d["_was_str"] = False
                return st
        raw, was_str = _as_bytes(text)
        if engine == "auto":
            engine = "device"
            if len(raw) <= AUTO_NATIVE_MAX:
                from suffix_tpu import native

                if native.available():
                    engine = "native"
        if len(raw) > MAX_TEXT_LEN:
            # SuffixTable stores u32 offsets (reference parity). u64
            # widening helps texts in [2^31, 2^32) padded past the int32
            # engine cap; beyond 2^32-1 use ops.prefix_doubling.
            # suffix_array_bytes(index_dtype="u64") directly.
            raise ValueError("text is too large (max 2^32 - 1 bytes); use "
                             "suffix_array_bytes(index_dtype='u64')")
        if collect_stats:
            from suffix_tpu.utils.metrics import build_stats

            table, stats = build_stats(raw, engine=engine,
                                       index_dtype=index_dtype,
                                       padding=padding)
            st = cls(raw, table.astype(np.uint32), _was_str=was_str)
            st.build_stats = stats
            return st
        if engine == "device":
            table = prefix_doubling.suffix_array_bytes(
                raw, padding=padding, index_dtype=index_dtype)
        elif engine == "sais":
            from suffix_tpu.ops import sais

            table = sais.suffix_array_sais_recursive(raw)
        elif engine == "native":
            from suffix_tpu import native

            table = native.sais(raw)
        else:
            raise ValueError(f"unknown engine: {engine!r}")
        return cls(raw, table, _was_str=was_str)

    @classmethod
    def new_naive(cls, text) -> "SuffixTable":
        """Oracle construction (reference: src/table.rs:92-100)."""
        raw, was_str = _as_bytes(text)
        if len(raw) > MAX_TEXT_LEN:
            raise ValueError("text is too large (max 2^32 - 1 bytes)")
        return cls(raw, naive_ops.naive_table(raw), _was_str=was_str)

    @classmethod
    def from_parts(cls, text, table) -> "SuffixTable":
        """Zero-copy reconstruction (reference: src/table.rs:111-119).

        The suffix-table invariant is NOT checked, matching the reference.
        """
        return cls(text, table)

    def into_parts(self):
        """(text, table) — reference: src/table.rs:125-127."""
        return self.text(), self._table

    # ------------------------------------------------------------- accessors

    def table(self) -> np.ndarray:
        """The sorted suffix offsets (uint32)."""
        return self._table

    def text(self):
        """The indexed text (str if constructed from str, else bytes)."""
        return self._raw.decode("utf-8") if self._was_str else self._raw

    def text_bytes(self) -> bytes:
        return self._raw

    def __len__(self) -> int:
        return int(self._table.shape[0])

    def len(self) -> int:
        """Number of suffixes == number of bytes (src/table.rs:156-158)."""
        return len(self)

    def is_empty(self) -> bool:
        return len(self) == 0

    def suffix(self, i: int) -> str:
        """The i-th smallest suffix, as text (src/table.rs:168-170)."""
        s = self._raw[int(self._table[i]):]
        return s.decode("utf-8") if self._was_str else s

    def suffix_bytes(self, i: int) -> bytes:
        return self._raw[int(self._table[i]):]

    # ------------------------------------------------------------------- lcp

    def lcp_lens(self, method: str = "auto") -> np.ndarray:
        """LCP array (uint32), reference definition src/table.rs:348-361.

        ``method`` selects the engine: "auto" (default — parallel keyed
        device refine with bounded wall time: repetitive corpora whose
        survivor mass or LCP depth would make the device refine
        O(sum-of-LCPs) route to the linear Kasai automatically, see
        ops/lcp.py), "device" (unbounded keyed refine), "native" (C++
        Kasai, linear time), or "kasai" (host numpy oracle). All produce
        the identical array.
        """
        if method in ("auto", "device"):
            # Reuse the query index's packed keys when already built.
            pk = self._pk if self._dev_text is not None else None
            return lcp_ops.lcp_from_sa(self._bytes, self._table, pk=pk,
                                       method=method)
        if method == "native":
            from suffix_tpu import native

            return native.kasai(self._raw, self._table)
        if method == "kasai":
            return lcp_ops.kasai_host(self._bytes, self._table)
        raise ValueError(f"unknown LCP method: {method!r}")

    # ----------------------------------------------------------------- query

    def _ensure_device(self):
        if self._dev_text is not None:
            return
        with self._init_lock:  # server threads may race the lazy init
            if self._dev_text is not None:
                return
            n = len(self)
            n_pad = bucket_size(max(n, 1))
            t = np.full((n_pad,), PAD, dtype=np.int32)
            t[:n] = self._bytes
            tab = np.zeros((n_pad,), dtype=np.int32)
            tab[:n] = self._table
            dev_text = jnp.asarray(t)
            self._dev_table = jnp.asarray(tab)
            self._n_iters = max(1, (n_pad + 1).bit_length())
            # Query accelerators: packed prefix keys + 2-symbol LUT.
            # Huge indexes skip the flat key copy (half the index HBM —
            # a 128 MiB corpus OOMs 16 GB with it); the merge engine
            # needs only fences + blocks, LCP rebuilds keys on demand,
            # and long patterns byte-refine instead of widening keys.
            from suffix_tpu.ops import search2

            with_keys = n_pad <= self.FLAT_KEYS_MAX_PAD
            self._ext_block = None
            if with_keys:
                (self._pk, self._pk_fence, self._pk_block,
                 self._lut) = search2.build_query_index(
                    dev_text, self._dev_table, jnp.int32(n),
                    with_keys=True,
                )
            else:
                # Huge index: keyless layout, built through the sort
                # unit (sorted-gather, ~6x the per-word gather build at
                # 128 MiB), plus the deep-refine ext tier while it fits
                # HBM — long patterns then probe the ext words for a
                # compacted lane bucket instead of byte-refining from
                # 18-byte-equal ranges (the 492-of-511 ms r4 cliff,
                # scripts/round5_study.py battery).
                if (n_pad <= search2.DEEP_EXT_MAX_PAD
                        and n_pad < search2.LEAN_MIN_PAD):
                    (self._pk_fence, self._pk_block,
                     self._ext_block) = search2.build_query_index_keyless(
                        dev_text, self._dev_table, jnp.int32(n),
                        key_words=search2.DEEP_FENCE_WORDS,
                        ext_words=search2.DEEP_EXT_WORDS,
                    )
                else:
                    # Past the ext-tier HBM gate: the host-stepped lean
                    # builder (one word in flight) keeps the peak low
                    # enough for a 256 MiB index on a 16 GB chip.
                    (_, self._pk_fence, self._pk_block,
                     _) = search2.build_query_index(
                        dev_text, self._dev_table, jnp.int32(n),
                        with_keys=False,
                    )
                self._pk = None
                self._lut = None
            # Published last: other threads key readiness off _dev_text.
            self._dev_text = dev_text

    # Bigger batches amortize the per-dispatch launch cost: measured
    # 4.2M q/s at 64k vs 9.9M q/s at 256k per dispatch (4 MiB index).
    # Hard cap 2^27: the qid field in search2's packed tie word is 27
    # bits (ops/search2.py _batched_bounds).
    MAX_QUERY_BATCH = 1 << 18  # queries per device dispatch

    # Largest padded index that keeps the flat key copy (and the 12-word
    # extended keys for long patterns) resident; beyond it only fences +
    # blocks live on device (measured: 2^26 fits 16 GB with keys, 2^27
    # does not).
    FLAT_KEYS_MAX_PAD = 1 << 26

    # Hybrid serving: on accelerator backends a device dispatch costs
    # milliseconds (more through a tunnel), so single queries and tiny
    # batches answer faster on the host CPU (native binary search,
    # microseconds) than as a device program. Both paths produce
    # identical bounds (pinned by tests/test_hybrid.py).
    _QUERY_ROUTE_DEFAULT = "auto"  # "auto" | "device" | "host"
    HOST_QUERY_MAX = 64  # "auto": batches up to this size go to the host

    # Hot single-op methods that _route_host_one binds directly onto the
    # instance (the C extension method itself — one attribute lookup +
    # one C call per positions/contains/count/any_position).
    _EXT_BOUND_OPS = ("positions", "contains", "count", "any_position")

    @property
    def query_route(self) -> str:
        return self._query_route

    @query_route.setter
    def query_route(self, value: str) -> None:
        # Reassigning the route invalidates the single-query memo AND any
        # extension methods bound onto the instance by a previous route.
        self._query_route = value
        self._route1_cache = None
        for name in self._EXT_BOUND_OPS:
            self.__dict__.pop(name, None)

    def _route_host(self, nq: int) -> bool:
        if self.query_route == "device":
            return False
        from suffix_tpu import native

        if self.query_route == "host":
            return True  # explicit: raises NativeUnavailable if unbuilt
        if nq > self.HOST_QUERY_MAX:
            return False
        from suffix_tpu.utils.platform import dispatch_is_expensive

        return dispatch_is_expensive() and native.available()

    def _route_host_one(self):
        """Memoized single-query route: (route, ext, bounds_fn).

        The single-query path budget is sub-microsecond; re-running the
        route imports + backend/availability checks costs ~1.5 us, and
        even the BoundsHandle wrapper layer is ~50 ns. The memo holds the
        innermost callables — ``ext`` is the CPython extension object
        (one C call per whole operation: positions/contains/count/
        any_position) when it built, ``bounds_fn`` the bounds callable
        (extension or ctypes) — both None when device-routed. The memo is
        invalidated when ``query_route`` is reassigned."""
        cached = self._route1_cache
        if cached is not None and cached[0] == self.query_route:
            return cached
        if self._route_host(1):
            handle = self._ensure_host_handle()
            ext = handle._ext
            fn = ext.bounds if ext is not None else handle.bounds_one
        else:
            ext = fn = None
        cached = (self.query_route, ext, fn)
        self._route1_cache = cached
        if ext is not None:
            # Bind the extension methods straight onto the instance: the
            # next st.positions(q) is ONE instance-dict lookup + one C
            # call (no route re-check, no Python-level coercion — the C
            # side accepts bytes/str/buffer). Measured 622 -> ~190 ns.
            # The query_route setter pops these on reassignment.
            for name in self._EXT_BOUND_OPS:
                self.__dict__[name] = getattr(ext, name)
        return cached

    def _bounds_batch(self, queries: Sequence) -> tuple[np.ndarray, np.ndarray]:
        """Vector of (start, count) rank bounds for a query batch.

        Query length and batch size are bucketed to powers of two so the
        compiled executable is reused across calls (XLA compiles per
        shape); batches beyond MAX_QUERY_BATCH stream through in chunks.
        Small batches on accelerator backends short-circuit to the host
        (see ``query_route``).
        """
        nq = len(queries)
        if self._route_host(nq):
            from suffix_tpu import native

            if nq == 1:  # microsecond path: cached pointers, one call
                s, c = self._ensure_host_handle().bounds_one(queries[0])
                return np.array([s], np.int64), np.array([c], np.int64)
            starts, counts = native.bounds_batch(self._raw, self._table,
                                                 queries)
            return starts.astype(np.int64), counts.astype(np.int64)
        self._ensure_device()
        if nq > self.MAX_QUERY_BATCH:
            starts, counts = [], []
            for i in range(0, nq, self.MAX_QUERY_BATCH):
                s, c = self._bounds_batch(queries[i:i + self.MAX_QUERY_BATCH])
                starts.append(s)
                counts.append(c)
            return np.concatenate(starts), np.concatenate(counts)
        q, qlens = search_ops.pack_queries(queries)
        m_pad = bucket_size(q.shape[1], minimum=8)
        q_pad = bucket_size(nq, minimum=8)
        full_q = np.full((q_pad, m_pad), PAD, dtype=np.int32)
        full_q[:nq, : q.shape[1]] = q
        full_lens = np.zeros((q_pad,), dtype=np.int32)
        full_lens[:nq] = qlens
        from suffix_tpu.ops import search2

        pk_fence, pk_block = self._pk_fence, self._pk_block
        max_live_qlen = int(qlens.max(initial=0))
        deep_syms = 3 * len(pk_fence)
        if (max_live_qlen > deep_syms and self._pk is None
                and self._ext_block is not None):
            # Deep keyless route: merge join + compacted ext-word probe
            # + doubly-compacted byte tail. The buckets B/B2 are sized
            # from the ACTUAL per-tier counts (power-of-two bucketed
            # for compile reuse).
            stride = pk_block.shape[1] // len(pk_fence)
            cov = deep_syms + 3 * (self._ext_block.shape[1] // stride)
            n_long = int((qlens > deep_syms).sum())
            n_deep = int((qlens > cov).sum())
            B = min(q_pad, bucket_size(max(n_long, 1), minimum=8))
            B2 = (min(B, bucket_size(max(n_deep, 1), minimum=8))
                  if n_deep else 0)
            starts, counts = search2.bounds_batch_merge_deep(
                self._dev_text, jnp.int32(len(self)), self._dev_table,
                jnp.int32(len(self)), pk_fence, pk_block, self._ext_block,
                jnp.asarray(full_q), jnp.asarray(full_lens),
                m_pad, B, B2,
            )
            return np.asarray(starts)[:nq], np.asarray(counts)[:nq]
        if (max_live_qlen > search2.KEY_SYMS
                and self._pk is not None):
            # Long patterns: widen the exact merge-join coverage to
            # 3*EXT_KEY_WORDS bytes instead of probe-refining from 18.
            # Built once per table, cached; beyond the extended coverage
            # the byte refine still applies.
            with self._init_lock:
                if self._pk_ext is None:
                    (pk_e, self._pk_fence_ext, self._pk_block_ext,
                     _) = search2.build_query_index(
                        self._dev_text, self._dev_table, jnp.int32(len(self)),
                        key_words=search2.EXT_KEY_WORDS,
                    )
                    self._pk_ext = pk_e  # published last
            pk_fence, pk_block = self._pk_fence_ext, self._pk_block_ext

        starts, counts = search2.bounds_batch_merge(
            self._dev_text, jnp.int32(len(self)), self._dev_table,
            jnp.int32(len(self)), pk_fence, pk_block,
            jnp.asarray(full_q), jnp.asarray(full_lens),
            self._n_iters, m_pad,
        )
        return np.asarray(starts)[:nq], np.asarray(counts)[:nq]

    def _ensure_host_handle(self):
        if self._host_handle is None:
            from suffix_tpu import native

            with self._init_lock:  # double-checked: creation is idempotent
                if self._host_handle is None:
                    self._host_handle = native.BoundsHandle(self._raw,
                                                            self._table)
        return self._host_handle

    def _bounds_one_host(self, query):
        """(start, count) via the native handle, or None if device-routed.

        The single-query serving path: skips the batch path's array
        wrapping (~2.5 us of the ~8.6 us total measured at 100 KB).
        """
        cache = self._route1_cache
        if cache is None or cache[0] != self.query_route:
            cache = self._route_host_one()
        fn = cache[2]
        if fn is None:
            return None
        if type(query) is not bytes:
            query = (query.encode("utf-8") if isinstance(query, str)
                     else bytes(query))
        return fn(query)

    def positions(self, query) -> np.ndarray:
        """All byte offsets where ``query`` occurs, in SA (unordered) order.

        Reference: src/table.rs:223-259 — the result is the contiguous
        slice ``table[start:end]``, NOT sorted by position. The host
        route is one C call returning the zero-copy view directly.
        """
        cache = self._route1_cache
        if cache is None or cache[0] != self.query_route:
            cache = self._route_host_one()
        ext = cache[1]
        if ext is not None:
            if type(query) is not bytes:
                query = (query.encode("utf-8") if isinstance(query, str)
                         else bytes(query))
            return ext.positions(query)
        sc = self._bounds_one_host(query)
        if sc is None:
            starts, counts = self._bounds_batch([query])
            sc = int(starts[0]), int(counts[0])
        s, c = sc
        return self._table[s : s + c]

    def positions_batch(self, queries: Sequence) -> list[np.ndarray]:
        """``positions`` for many queries in one device dispatch."""
        starts, counts = self._bounds_batch(queries)
        return [self._table[int(s) : int(s) + int(c)] for s, c in zip(starts, counts)]

    def contains(self, query) -> bool:
        """Existence test (reference: src/table.rs:197-199)."""
        cache = self._route1_cache
        if cache is None or cache[0] != self.query_route:
            cache = self._route_host_one()
        ext = cache[1]
        if ext is not None:
            if type(query) is not bytes:
                query = (query.encode("utf-8") if isinstance(query, str)
                         else bytes(query))
            return ext.contains(query)
        sc = self._bounds_one_host(query)
        if sc is not None:
            return sc[1] > 0
        _, counts = self._bounds_batch([query])
        return bool(counts[0] > 0)

    def contains_batch(self, queries: Sequence) -> np.ndarray:
        _, counts = self._bounds_batch(queries)
        return counts > 0

    def count(self, query) -> int:
        """Number of occurrences (O(m log n), no slice materialization)."""
        cache = self._route1_cache
        if cache is None or cache[0] != self.query_route:
            cache = self._route_host_one()
        ext = cache[1]
        if ext is not None:
            if type(query) is not bytes:
                query = (query.encode("utf-8") if isinstance(query, str)
                         else bytes(query))
            return ext.count(query)
        sc = self._bounds_one_host(query)
        if sc is not None:
            return int(sc[1])
        _, counts = self._bounds_batch([query])
        return int(counts[0])

    def count_batch(self, queries: Sequence) -> np.ndarray:
        _, counts = self._bounds_batch(queries)
        return counts.astype(np.int64)

    def any_position(self, query):
        """An arbitrary matching byte offset, or None.

        Reference: src/table.rs:279-293 (result is *some* occurrence).
        """
        cache = self._route1_cache
        if cache is None or cache[0] != self.query_route:
            cache = self._route_host_one()
        ext = cache[1]
        if ext is not None:
            if type(query) is not bytes:
                query = (query.encode("utf-8") if isinstance(query, str)
                         else bytes(query))
            return ext.any_position(query)
        sc = self._bounds_one_host(query)
        if sc is None:
            starts, counts = self._bounds_batch([query])
            sc = int(starts[0]), int(counts[0])
        if sc[1] == 0:
            return None
        return int(self._table[sc[0]])

    def verify(self, device: bool = False) -> bool:
        """Certify that ``table()`` is exactly the suffix array of the
        text — O(n) (permutation + first-byte monotonicity + successor
        -rank induction, utils/verify.py), no re-sort. The auditing
        hook for loaded checkpoints and the checker-verified
        construction pattern (ROADMAP)."""
        from suffix_tpu.utils.verify import verify_suffix_array

        return verify_suffix_array(self._raw, self._table, device=device)

    # ------------------------------------------------------------------ misc

    def __eq__(self, other) -> bool:
        if not isinstance(other, SuffixTable):
            return NotImplemented
        return self._raw == other._raw and np.array_equal(self._table, other._table)

    def __hash__(self):
        return hash((self._raw, self._table.tobytes()))

    def __repr__(self) -> str:
        # Mirrors the reference Debug impl (src/table.rs:296-312).
        lines = ["", "-----------------------------------------", "SUFFIX TABLE"]
        try:
            lines.append(f"text: {self.text()}")
        except UnicodeDecodeError:
            lines.append(f"text: {self._raw!r}")
        for rank, sufstart in enumerate(self._table):
            suf = self._raw[int(sufstart):]
            shown = suf.decode("utf-8", errors="replace") if self._was_str else suf
            lines.append(f"suffix[{rank}] {int(sufstart)}, {shown}")
        lines.append("-----------------------------------------")
        return "\n".join(lines) + "\n"
