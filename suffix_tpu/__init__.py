"""tpu-suffix: a TPU-native suffix-array / string-index framework.

A brand-new framework built from scratch in JAX/XLA/Pallas with the same
capabilities as the Rust crate BurntSushi/suffix (reference: /root/reference):

- Suffix-array construction with exact byte-lexicographic semantics
  (reference contract: src/table.rs:78-85). On TPU the construction is a
  batched prefix-doubling sort pipeline (the suffix array of a text is unique,
  so the output is bit-identical to the reference's SA-IS), with an SA-IS
  style pipeline as an alternative engine.
- LCP arrays matching the reference definition (src/table.rs:348-361):
  ``lcp[i] = lcp_len(suffix[i-1], suffix[i])``, ``lcp[0] == 0``.
- Batched substring queries: ``positions`` / ``contains`` / ``any_position``
  with semantics identical to src/table.rs:197-293, vectorized over
  thousands of patterns at once.
- Unicode support with byte-index semantics (positions are byte offsets,
  reference contract src/table.rs:66 and tests/tests.rs:209-213).
- Multi-document (generalized) suffix arrays via the NUL-concatenation
  scheme documented in the reference README (README.md:60-74), promoted to
  a first-class API.
- Suffix trees derived from SA + LCP (reference crate suffix_tree).
- Multi-device sharded construction over a ``jax.sharding.Mesh``.
"""

from suffix_tpu.table import SuffixTable
from suffix_tpu.multidoc import MultiDocIndex
from suffix_tpu.tree.stree import SuffixTree
from suffix_tpu.tree.atree import ArraySuffixTree

__version__ = "0.1.0"

__all__ = ["SuffixTable", "MultiDocIndex", "SuffixTree",
           "ArraySuffixTree", "__version__"]
