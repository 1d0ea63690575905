"""Test config: force JAX onto a virtual 8-device CPU mesh.

Must set flags before jax is imported anywhere; pytest imports conftest
first, so doing it here is sufficient.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

VECTORS = pathlib.Path(__file__).parent / "vectors"


@pytest.fixture(scope="session")
def vectors_dir():
    return VECTORS
