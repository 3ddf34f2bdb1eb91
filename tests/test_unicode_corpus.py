"""North-star config: ~1MB mixed-script Unicode corpus parity.

BASELINE.json configs[2]: "Unicode mixed-script UTF-8 corpus (~1MB):
codepoint-aware indexing, contains()/positions() parity". The reference's
Unicode contract is byte-level (SURVEY.md §1: positions are byte offsets,
UTF-8 self-synchronization makes byte-suffix order == codepoint-suffix
order; pinned by tests/tests.rs:209-213). This battery builds a ~1 MiB
corpus mixing ASCII, Latin-1, Greek, Cyrillic, CJK, and emoji and checks
query results against a direct overlapping byte-scan oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from suffix_tpu import SuffixTable

FRAGMENTS = [
    "the quick brown fox was quick. ",
    "pchnąć w tę łódź jeża lub ośm skrzyń fig ",
    "съешь же ещё этих мягких французских булок ",
    "Θα πιω αμέσως καφέ ",
    "いろはにほへと ちりぬるを 色は匂へど 散りぬるを ",
    "我能吞下玻璃而不伤身体。",
    "☃ snow ☃ man ☃ ",
    "déjà vu — façade — naïve — poëzie ",
    "🦀🚀🧬🔥 emoji run 🦀🚀 ",
]


@pytest.fixture(scope="module")
def corpus() -> str:
    rng = np.random.default_rng(0xC0DE)
    parts = []
    size = 0
    letters = np.array(list("acgt xyz.\n"))
    while size < (1 << 20):
        f = FRAGMENTS[int(rng.integers(len(FRAGMENTS)))]
        if rng.random() < 0.3:
            f = "".join(letters[rng.integers(0, len(letters), 40)])
        parts.append(f)
        size += len(f.encode())
    return "".join(parts)


@pytest.fixture(scope="module")
def st(corpus) -> SuffixTable:
    # Native C++ build (bit-parity with the device engines is pinned by
    # test_golden/test_conformance); queries below run through the
    # batched device query engine.
    return SuffixTable.new(corpus, engine="native")


def _scan_positions(hay: bytes, needle: bytes) -> list[int]:
    """All (overlapping) byte offsets — the reference's match semantics."""
    out, i = [], hay.find(needle)
    while i != -1:
        out.append(i)
        i = hay.find(needle, i + 1)
    return out


def test_positions_parity_sampled(corpus, st):
    data = corpus.encode()
    rng = np.random.default_rng(7)
    queries = []
    for _ in range(150):
        a = int(rng.integers(0, len(corpus) - 24))
        qlen = int(rng.integers(1, 21))
        queries.append(corpus[a : a + qlen])
    # Misses and mixed-script edge cases.
    queries += ["zebra☃", "QUICK", "玻璃玻璃", "🦀🧬🦀", "щи", "ぬるを ",
                "x\x00y"]
    results = st.positions_batch(queries)
    for q, got in zip(queries, results):
        expect = _scan_positions(data, q.encode())
        assert sorted(got.tolist()) == expect, q


def test_contains_parity(corpus, st):
    data = corpus.encode()
    probes = ["fox", "玻璃", "☃ snow", "булок", "absent-needle", "ä",
              "naïve", "🚀🧬", "。", " "]
    flags = st.contains_batch(probes)
    for q, f in zip(probes, flags):
        assert bool(f) == (q.encode() in data), q


def test_byte_offsets_never_mid_codepoint(corpus, st):
    # UTF-8 self-synchronization: every returned offset of a valid-UTF-8
    # query decodes cleanly from that byte (never starts mid-codepoint).
    data = corpus.encode()
    for q in ["色は匂へど", "☃", "é", "🦀🚀"]:
        qb = q.encode()
        for off in st.positions(q).tolist():
            assert data[off : off + len(qb)] == qb
            assert (data[off] & 0xC0) != 0x80  # not a continuation byte


def test_device_engine_agrees_on_slice(corpus):
    # End-to-end device construction on a 64 KiB slice of the same corpus
    # (full-size device builds are exercised on TPU; this pins engine
    # equality on mixed-script data inside the CPU suite).
    piece = corpus.encode()[: 1 << 16].decode("utf-8", errors="ignore")
    a = SuffixTable.new(piece, engine="device")
    b = SuffixTable.new(piece, engine="native")
    np.testing.assert_array_equal(a.table(), b.table())
