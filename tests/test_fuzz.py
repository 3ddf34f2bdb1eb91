"""Differential fuzzing: every engine against every oracle.

The reference's test strategy is oracle-differential (naive sort as ground
truth, quickcheck over random strings — SURVEY.md §4). This module is the
deep version: adversarial text distributions x engines x surfaces (SA,
LCP, positions bounds), each cross-checked for exact equality.

The default run keeps CI fast (a few seeds per class). Set
SUFFIX_TPU_FUZZ_SEEDS=N for a long campaign (used in development; a
500-seed sweep runs in ~10 min on CPU).
"""

import os

import numpy as np
import pytest

from suffix_tpu import SuffixTable, native
from suffix_tpu.ops.naive import naive_table
from suffix_tpu.ops.lcp import kasai_host
from suffix_tpu.ops.sais import suffix_array_sais_recursive

N_SEEDS = int(os.environ.get("SUFFIX_TPU_FUZZ_SEEDS", "3"))


def _gen_text(rng: np.random.Generator, kind: str) -> bytes:
    n = int(rng.integers(1, 400))
    if kind == "bytes":
        return rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
    if kind == "binary_alpha":
        return rng.integers(0, 2, size=n, dtype=np.uint8).tobytes()
    if kind == "dna":
        return bytes(bytearray(b"ACGT"[i] for i in rng.integers(0, 4, n)))
    if kind == "runs":
        out = bytearray()
        while len(out) < n:
            out += bytes([int(rng.integers(0, 3))]) * int(rng.integers(1, 40))
        return bytes(out[:n])
    if kind == "repeat":
        unit = rng.integers(0, 4, size=int(rng.integers(1, 8)),
                            dtype=np.uint8).tobytes()
        return (unit * (n // max(len(unit), 1) + 1))[:n]
    if kind == "palindrome":
        half = rng.integers(0, 3, size=n // 2, dtype=np.uint8).tobytes()
        return half + half[::-1]
    if kind == "unicode":
        pool = "abαβ雪雨☃🌲\x00é"
        s = "".join(pool[i] for i in rng.integers(0, len(pool), size=n // 2))
        return s.encode("utf-8")
    if kind == "extremes":
        return bytes(bytearray(
            [0, 255][i] for i in rng.integers(0, 2, size=n)))
    raise AssertionError(kind)


KINDS = ["bytes", "binary_alpha", "dna", "runs", "repeat", "palindrome",
         "unicode", "extremes"]


@pytest.mark.parametrize("kind", KINDS)
def test_fuzz_differential(kind):
    have_native = native.available()
    for seed in range(N_SEEDS):
        rng = np.random.default_rng(hash((kind, seed)) & 0xFFFFFFFF)
        data = _gen_text(rng, kind)
        ctx = f"{kind}/seed{seed}/n{len(data)}"

        expected = naive_table(data)
        st = SuffixTable.new(data)  # device engine
        assert np.array_equal(st.table(), expected), f"device SA {ctx}"
        assert np.array_equal(
            suffix_array_sais_recursive(data), expected), f"sais SA {ctx}"
        if have_native:
            assert np.array_equal(native.sais(data), expected), \
                f"native SA {ctx}"

        # LCP: device blockwise vs host Kasai.
        lcp_dev = st.lcp_lens()
        lcp_ref = kasai_host(np.frombuffer(data, np.uint8), expected)
        assert np.array_equal(lcp_dev, lcp_ref), f"LCP {ctx}"

        # Query bounds: random substrings + perturbed + misses, device
        # merge-join vs native binary search vs python scan.
        queries = []
        for _ in range(12):
            if len(data) > 1:
                m = int(rng.integers(1, min(len(data), 48) + 1))
                s = int(rng.integers(0, len(data) - m + 1))
                q = bytearray(data[s:s + m])
                if rng.random() < 0.3 and len(q):
                    q[int(rng.integers(0, len(q)))] = int(rng.integers(0, 256))
                queries.append(bytes(q))
        queries += [b"", b"\x00", b"\xff" * 3, data + b"x", data]
        got = st.positions_batch(queries)
        if have_native:
            ns, nc = native.bounds_batch(data, expected, queries)
        for qi, q in enumerate(queries):
            scan = []
            if len(q):
                i = data.find(q)
                while i != -1:
                    scan.append(i)
                    i = data.find(q, i + 1)
            assert sorted(got[qi].tolist()) == scan, f"positions {ctx} q{qi}"
            if have_native:
                assert int(nc[qi]) == len(scan), f"native count {ctx} q{qi}"
