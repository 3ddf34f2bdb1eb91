"""Basic usage — the reference's examples/basic.rs as Python."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var at registration;
# honor it explicitly so `JAX_PLATFORMS=cpu python examples/...` (and the
# Makefile's examples target) never claims a shared TPU.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
from suffix_tpu import SuffixTable

st = SuffixTable.new("the quick brown fox was quick.")
assert st.positions("quick").tolist() == [4, 24]
print("positions of 'quick':", st.positions("quick").tolist())
