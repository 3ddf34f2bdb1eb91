"""Golden conformance: SA/LCP digests of the reference's FASTA fixtures.

The digests were produced by the native linear-time oracle and are
cross-checked here against the device engines — any engine or semantics
regression on the reference corpus (tests/AP009048_*.fasta) flips a hash.
Also pins run-to-run determinism (SURVEY.md §5: same input => identical
SA across runs/engines).
"""

import hashlib
import pathlib

import numpy as np
import pytest

from suffix_tpu import SuffixTable
from suffix_tpu.ops.sais import suffix_array_sais

GOLDEN = {
    "AP009048_10000": {
        "sa": "335641df720e6a760955d891723fa48fc1554248ac89a44b1a3f4a36eaa0fdc3",
        "lcp": "427e0d914a5e7c62d4b06e9b360ced03da1889f4c3fc488169e3faf83d29be57",
    },
    "AP009048_100000": {
        "sa": "d674074d481d76d7ac4e4ae4fe5df93a458a3b6fcb483ac92190babc52029694",
        "lcp": "10992fb21e4db240c0024acd3661b1a3af997c0fb7a1591352a89e3e1aba373d",
    },
}


def _digest(a: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(a, dtype=np.uint32).tobytes()).hexdigest()


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_device(name, request):
    data = open(pathlib.Path(__file__).parent / "fixtures" / f"{name}.fasta", "rb").read()
    st = SuffixTable.new(data)
    assert _digest(st.table()) == GOLDEN[name]["sa"]
    assert _digest(st.lcp_lens()) == GOLDEN[name]["lcp"]


def test_golden_sais_engine(dna_10k):
    assert _digest(suffix_array_sais(dna_10k)) == GOLDEN["AP009048_10000"]["sa"]


def test_determinism(dna_10k):
    # Same input => bit-identical output across runs and engines.
    a = SuffixTable.new(dna_10k).table()
    b = SuffixTable.new(dna_10k).table()
    c = SuffixTable.new(dna_10k, engine="native").table()
    d = SuffixTable.new(dna_10k, engine="sais").table()
    assert np.array_equal(a, b)
    assert np.array_equal(a, c)
    assert np.array_equal(a, d)
