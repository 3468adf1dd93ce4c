"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is not required for the test suite; sharding/pjit paths are
exercised on XLA:CPU with 8 virtual devices (the driver separately dry-runs the
multi-chip path, see __graft_entry__.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the hosted TPU platform plugin ignores JAX_PLATFORMS from the environment;
# force the CPU backend explicitly
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: every test draws the same stream regardless of which
    # other tests ran before it
    return np.random.default_rng(0)
