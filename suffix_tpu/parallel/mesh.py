"""Device-mesh helpers.

One named axis ("d") covers the sequence-sharding dimension; on a multi-host
pod slice the same axis spans all chips so collectives ride ICI within a
slice. The reference has no distributed layer (SURVEY.md §2.3) — this is new
architecture.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "d"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices, host-major order.

    Host-major ordering matters on multi-host pods: the bitonic
    merge-split network (parallel/dist_build.py) exchanges with partners
    at stride s, and strides smaller than the per-host device count occur
    log-many more times than larger ones — with host-major order those
    frequent exchanges ride ICI and only the rare large-stride stages
    cross DCN.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def shard_spec() -> P:
    return P(AXIS)


def sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
