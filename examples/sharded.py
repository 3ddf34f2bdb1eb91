"""Multi-device sharded build + sharded query serving.

Run on any mesh: real chips, or a virtual CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (set before jax
imports, as below).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", os.environ.get("SUFFIX_TPU_PLATFORM", "cpu"))

from suffix_tpu.parallel.dist_build import suffix_array_sharded
from suffix_tpu.parallel.dist_query import ShardedQueryIndex
from suffix_tpu.parallel.mesh import make_mesh

mesh = make_mesh()  # all devices
text = b"the quick brown fox was quick. " * 40

# Collective construction: sequence-sharded text, block-bitonic SPMD sort.
sa = suffix_array_sharded(text, mesh)
print(f"built a {len(sa)}-suffix array over {mesh.devices.size} devices")

# Sharded serving: the table + rank keys live sharded by rank block.
idx = ShardedQueryIndex(text, mesh, sa=sa)
print("positions of 'quick':", sorted(idx.positions("quick").tolist())[:6], "...")
print("count('fox was') =", int(idx.count_batch(["fox was"])[0]))
