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
    devs = jax.devices()
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
