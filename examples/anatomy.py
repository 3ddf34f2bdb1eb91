"""Anatomy of a suffix table — the reference's examples/anatomy.rs."""
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
print(st)  # full rank/sufstart/suffix dump, like the reference Debug impl

result = st.positions("quick")
print("search result:", result.tolist())
assert sorted(result.tolist()) == [4, 24]
for i in result:
    print(f"quick found! Starts at index: {i}")
