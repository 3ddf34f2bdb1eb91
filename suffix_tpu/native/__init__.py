"""Native (C++) host components, loaded via ctypes.

Provides the linear-time CPU oracle (SA-IS + Kasai + batched query bounds)
used for conformance testing at corpus scale and as the single-core CPU
baseline the TPU engines are benchmarked against. The shared library is
built from ``csrc/saistpu.cpp`` on first use and cached next to it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csrc", "saistpu.cpp")
_HDRS = (os.path.join(_DIR, "csrc", "bounds_core.h"),
         os.path.join(_DIR, "csrc", "sais_core.h"))
_LIB = os.path.join(_DIR, "csrc", "libsaistpu.so")
_FAST_SRC = os.path.join(_DIR, "csrc", "fastpath.cpp")

_lock = threading.Lock()
_lib = None
_load_error: "NativeUnavailable | None" = None  # cached failure: no retries
_fastpath = None  # the CPython extension module, or False if unbuildable


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True)
    except OSError as e:  # g++ missing entirely
        raise NativeUnavailable(f"cannot run g++: {e}") from e
    if proc.returncode != 0:
        raise NativeUnavailable(
            f"failed to build native library:\n{proc.stderr}"
        )


def _load() -> ctypes.CDLL:
    global _lib, _load_error
    with _lock:
        if _lib is not None:
            return _lib
        if _load_error is not None:
            raise _load_error
        try:
            srcs_mtime = max(os.path.getmtime(_SRC),
                             *(os.path.getmtime(h) for h in _HDRS))
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < srcs_mtime):
                _build()
        except NativeUnavailable as e:
            _load_error = e
            raise
        except OSError as e:
            _load_error = NativeUnavailable(f"cannot build native lib: {e}")
            raise _load_error from e
        lib = ctypes.CDLL(_LIB)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.stpu_sais_u8.argtypes = [u8p, ctypes.c_uint32, u32p]
        lib.stpu_sais_u8.restype = ctypes.c_int
        lib.stpu_kasai_u8.argtypes = [u8p, u32p, ctypes.c_uint32, u32p]
        lib.stpu_kasai_u8.restype = None
        lib.stpu_bounds_batch.argtypes = [
            u8p, ctypes.c_uint32, u32p, u8p, u32p, ctypes.c_uint32, u32p, u32p,
        ]
        lib.stpu_bounds_batch.restype = None
        lib.stpu_bounds_one.argtypes = [
            u8p, ctypes.c_uint32, u32p, ctypes.c_char_p, ctypes.c_uint32, u32p,
        ]
        lib.stpu_bounds_one.restype = None
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def _load_fastpath():
    """The CPython extension for single-query bounds, or None.

    ctypes costs ~1.5-2.5 us of marshalling per foreign call; a METH_O
    extension method costs ~100 ns. Built lazily from csrc/fastpath.cpp
    the same way libsaistpu.so is; any failure (no Python headers, odd
    platform) falls back to the ctypes route silently.
    """
    global _fastpath
    # Lock-free fast path: after the first load this is one global read
    # (~20 ns); taking the lock per call cost ~430 ns — more than the
    # whole C build of "mississippi" (bench_micro sais_small).
    fp = _fastpath
    if fp is not None:
        return fp or None
    with _lock:
        if _fastpath is not None:
            return _fastpath or None
        try:
            import sysconfig

            suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
            ext_path = os.path.join(_DIR, "_fastpath" + suffix)
            if (not os.path.exists(ext_path)
                    or os.path.getmtime(ext_path) < max(
                        os.path.getmtime(_FAST_SRC),
                        *(os.path.getmtime(h) for h in _HDRS))):
                include = sysconfig.get_paths()["include"]
                cmd = [
                    "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                    "-fPIC", f"-I{include}", f"-I{np.get_include()}",
                    _FAST_SRC, "-o", ext_path,
                ]
                proc = subprocess.run(cmd, capture_output=True, text=True)
                if proc.returncode != 0:
                    raise NativeUnavailable(proc.stderr)
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "suffix_tpu.native._fastpath", ext_path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _fastpath = mod
        except Exception:
            _fastpath = False
            return None
        return _fastpath


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _u32(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def sais(data: bytes | np.ndarray) -> np.ndarray:
    """Suffix array (uint32) via native SA-IS — linear time, single core.

    Routes through the CPython extension when built (one C call; the
    ctypes route pays ~8 us of marshalling, which dominates small
    builds — cf. the reference's 1,038 ns sais_small, README.md:116).
    """
    fp = _load_fastpath()
    if fp is not None:
        return fp.sais(data if type(data) is bytes else
                       (bytes(data) if isinstance(data, (bytes, bytearray))
                        else np.asarray(data, np.uint8).tobytes()))
    lib = _load()
    arr = np.ascontiguousarray(
        np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    )
    n = arr.shape[0]
    out = np.empty(n, dtype=np.uint32)
    if n:
        lib.stpu_sais_u8(_u8(arr), n, _u32(out))
    return out


def kasai(data: bytes | np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array (uint32) via native Kasai — linear time."""
    lib = _load()
    arr = np.ascontiguousarray(
        np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    )
    sa = np.ascontiguousarray(sa, dtype=np.uint32)
    n = arr.shape[0]
    out = np.zeros(n, dtype=np.uint32)
    if n:
        lib.stpu_kasai_u8(_u8(arr), _u32(sa), n, _u32(out))
    return out


class BoundsHandle:
    """Cached single-query handle over one (text, sa) pair.

    Pins the text/SA buffers and their ctypes pointers once, so each
    ``bounds_one`` call is a single foreign call with no per-call array
    marshalling — the microsecond-scale serving path for single queries
    (cf. the reference's 228 ns positions() microbench, README.md:89).
    """

    def __init__(self, data: bytes | np.ndarray, sa: np.ndarray):
        self._lib = _load()
        self._text = np.ascontiguousarray(
            np.frombuffer(bytes(data), dtype=np.uint8)
            if isinstance(data, (bytes, bytearray))
            else np.asarray(data, np.uint8)
        )
        self._sa = np.ascontiguousarray(sa, dtype=np.uint32)
        if self._sa.shape[0] != self._text.shape[0]:
            raise ValueError("text/sa length mismatch")
        self._n = self._text.shape[0]
        self._tp = _u8(self._text)
        self._sp = _u32(self._sa)
        self._fn = self._lib.stpu_bounds_one
        # Preferred route: the CPython extension (one C method call,
        # ~0.4 us end-to-end vs ~1.8 us via ctypes — bench_micro.py).
        fp = _load_fastpath()
        self._ext = fp.Bounds(self._text, self._sa) if fp else None
        if self._ext is not None:
            self.bounds_one = self._bounds_one_ext  # instance-level rebind

    _OUT2 = ctypes.c_uint32 * 2

    def _bounds_one_ext(self, query) -> tuple[int, int]:
        if type(query) is not bytes:
            query = (query.encode("utf-8") if isinstance(query, str)
                     else bytes(query))
        return self._ext.bounds(query)

    def bench_c_only(self, query, iters: int = 200_000,
                     op: str = "bounds") -> float | None:
        """Pure-C ns/call for one query, or None without the extension.

        The apples-to-apples row against the reference's in-process
        #[bench] loop (README.md:86-94): no interpreter or FFI cost.
        ``op``: "bounds" (both binary searches, the positions path) or
        "contains" (early-exit existence test).
        """
        if self._ext is None:
            return None
        q = query.encode("utf-8") if isinstance(query, str) else bytes(query)
        fn = (self._ext.bench_contains if op == "contains"
              else self._ext.bench)
        return fn(q, iters)

    def bounds_one(self, query) -> tuple[int, int]:
        """(start, count) rank bounds for one query.

        Thread-safe: the output scratch is per-call (the handle is shared
        across server threads), only the pinned text/SA are shared. The
        scratch is a raw ctypes array, not numpy — ndarray.ctypes costs
        ~2.7 us per cast (measured), 25x the array allocation itself,
        and dominated the single-query path (6.2 -> 1.8 us without it).
        This ctypes route is the fallback; instances rebind to the
        CPython-extension route when it builds (see __init__).
        """
        q = query.encode("utf-8") if isinstance(query, str) else bytes(query)
        out = self._OUT2()
        self._fn(self._tp, self._n, self._sp, q, len(q), out)
        return out[0], out[1]


def bounds_batch(data: bytes | np.ndarray, sa: np.ndarray, queries) -> tuple[np.ndarray, np.ndarray]:
    """(start, count) rank bounds per query — native CPU reference path."""
    lib = _load()
    arr = np.ascontiguousarray(
        np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    )
    sa = np.ascontiguousarray(sa, dtype=np.uint32)
    qbytes = [q.encode("utf-8") if isinstance(q, str) else bytes(q) for q in queries]
    offsets = np.zeros(len(qbytes) + 1, dtype=np.uint32)
    for i, q in enumerate(qbytes):
        offsets[i + 1] = offsets[i] + len(q)
    blob = np.frombuffer(b"".join(qbytes) or b"\x00", dtype=np.uint8).copy()
    starts = np.zeros(len(qbytes), dtype=np.uint32)
    counts = np.zeros(len(qbytes), dtype=np.uint32)
    if len(qbytes):
        lib.stpu_bounds_batch(
            _u8(arr), arr.shape[0], _u32(sa), _u8(blob), _u32(offsets),
            len(qbytes), _u32(starts), _u32(counts),
        )
    return starts, counts
