"""TPU-native addition: thousands of patterns in one device dispatch."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var at registration;
# honor it explicitly so `JAX_PLATFORMS=cpu python examples/...` (and the
# Makefile's examples target) never claims a shared TPU.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import numpy as np
from suffix_tpu import SuffixTable

rng = np.random.default_rng(0)
text = rng.integers(0, 4, size=1 << 16, dtype=np.uint8) + ord("a")
st = SuffixTable.new(text.tobytes())

patterns = [text[i : i + 8].tobytes() for i in range(0, 4096, 16)]
counts = st.count_batch(patterns)
print(f"{len(patterns)} patterns, total occurrences: {int(counts.sum())}")
