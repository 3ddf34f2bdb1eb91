"""Naive-oracle suffix-array construction.

The reference keeps an O(n^2 log n) ``new_naive`` as its correctness oracle
("only a couple lines of code and probably difficult to get wrong",
tests/tests.rs:18-20; implementation src/table.rs:367-376). We keep the same
testing architecture: a trivially-correct host-side sort of suffixes that
every device engine is diffed against.
"""

from __future__ import annotations

import numpy as np


def naive_table(data: bytes | np.ndarray) -> np.ndarray:
    """Byte-lexicographically sorted suffix start offsets (uint32).

    Host-side oracle; O(n^2) memory for the materialized suffixes, so only
    use on small test inputs. Mirrors src/table.rs:367-376.
    """
    b = bytes(data) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8).tobytes()
    n = len(b)
    if n > 0xFFFFFFFF:
        raise ValueError("text is too large (max 2^32 - 1 bytes)")
    order = sorted(range(n), key=lambda i: b[i:])
    return np.asarray(order, dtype=np.uint32)


def naive_table_np(data: bytes | np.ndarray, max_len: int | None = None) -> np.ndarray:
    """Vectorized numpy oracle: argsort of fixed-width suffix matrices.

    Builds an (n, w) matrix of suffixes padded with -1 and lexsorts it.
    ``w`` defaults to n (exact); pass ``max_len`` to cap the comparison
    window when the maximum LCP is known to be small (e.g. random text).
    """
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    n = int(arr.shape[0])
    if n == 0:
        return np.empty((0,), dtype=np.uint32)
    w = n if max_len is None else min(max_len, n)
    ext = np.full(n + w, -1, dtype=np.int16)
    ext[:n] = arr
    windows = np.lib.stride_tricks.sliding_window_view(ext, w)[:n]
    # np.lexsort sorts by last key first; feed columns right-to-left.
    order = np.lexsort(windows.T[::-1])
    return order.astype(np.uint32)
