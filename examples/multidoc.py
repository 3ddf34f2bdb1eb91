"""Generalized (multi-document) index — first-class version of the
reference README's NUL-concatenation scheme."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var at registration;
# honor it explicitly so `JAX_PLATFORMS=cpu python examples/...` (and the
# Makefile's examples target) never claims a shared TPU.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
from suffix_tpu import MultiDocIndex

idx = MultiDocIndex(["the quick fox", "a lazy dog", "quick quick"])
print("'quick' occurs at (doc, offset):", sorted(idx.positions("quick")))
print("docs containing 'quick':", idx.docs_containing("quick"))
