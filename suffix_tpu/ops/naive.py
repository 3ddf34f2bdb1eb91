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
    """Vectorized numpy oracle: lexsort of packed suffix-prefix keys.

    Compares suffixes by their first ``w`` characters (``w`` defaults to
    n = exact; pass ``max_len`` when the maximum LCP is known to be
    smaller, e.g. random text).

    Key layout is chosen for numpy's sort dispatch: stable argsort is a
    radix sort for <=16-bit integers (~0.7 ms/100k) but a merge sort for
    anything wider (~9.4 ms/100k, measured), so characters are
    dense-ranked to symbols in [1, sigma] (0 = past-the-end sentinel)
    and packed base-(sigma+1) into uint16 keys — as many characters per
    key as fit (6 for DNA). Identical order to per-character comparison;
    measured 64.7 -> 21 ms on the 100 KB fixture at w = maxLCP+1.
    """
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    n = int(arr.shape[0])
    if n == 0:
        return np.empty((0,), dtype=np.uint32)
    w = n if max_len is None else min(max_len, n)
    uniq, inv = np.unique(arr, return_inverse=True)
    base = int(uniq.shape[0]) + 1  # symbols 1..sigma, sentinel 0
    per_key = 1
    while base ** (per_key + 1) <= (1 << 16):
        per_key += 1
    n_keys = (w + per_key - 1) // per_key
    ext = np.zeros(n + per_key * n_keys, dtype=np.int32)
    ext[:n] = inv
    ext[:n] += 1
    keys = []
    for j in range(n_keys):
        key = np.zeros(n, dtype=np.int32)
        for t in range(per_key):
            off = j * per_key + t
            key *= base
            key += ext[off:off + n]
        keys.append(key.astype(np.uint16))
    # np.lexsort sorts by last key first; feed keys right-to-left.
    order = np.lexsort(keys[::-1])
    return order.astype(np.uint32)
