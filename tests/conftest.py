"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtualized device mesh
(xla_force_host_platform_device_count), per the multi-host test strategy in
SURVEY.md §4. Must run before jax is imported anywhere.
"""

import os
import pathlib

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may carry a TPU plugin that overrides JAX_PLATFORMS at
# registration time; pin the platform explicitly so tests never claim a
# real accelerator.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def dna_10k() -> bytes:
    with open(FIXTURES / "AP009048_10000.fasta", "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def dna_100k() -> bytes:
    with open(FIXTURES / "AP009048_100000.fasta", "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0xC0FFEE)
