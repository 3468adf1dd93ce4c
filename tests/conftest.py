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

import sys

import numpy as np
import pytest

# Namespaces the parity tests inject into sys.modules (stubbed third-party
# deps like timm/torchvision and reference oracles loaded from
# /root/reference).  Leaked stubs break later tests in the same run — e.g. a
# fake `timm` without __spec__ makes transformers' importlib.util.find_spec
# probe raise ValueError when test_bert_parity imports BertModel.
_ORACLE_ROOTS = frozenset({
    "timm", "groundingdino", "torchvision", "refsam", "refdav2", "refgd",
    "segment_anything", "InkLayer", "supervision", "addict", "skimage",
})


@pytest.fixture(autouse=True, scope="module")
def _isolate_oracle_modules():
    """Restore sys.modules' oracle/stub namespaces after each test module so
    one module's fakes can never poison another's imports (ordering bug:
    round-1 suite had 3 cross-test ERRORs from exactly this)."""
    before = {k: v for k, v in sys.modules.items()
              if k.split(".", 1)[0] in _ORACLE_ROOTS}
    yield
    for k in [k for k in list(sys.modules)
              if k.split(".", 1)[0] in _ORACLE_ROOTS]:
        if k in before:
            sys.modules[k] = before[k]
        else:
            del sys.modules[k]


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: everything not explicitly marked `slow` is `quick`.
    `pytest -m quick` is the <5 min development gate; the full suite (no
    -m) stays the round gate."""
    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.quick)


@pytest.fixture()
def rng():
    # function-scoped: every test draws the same stream regardless of which
    # other tests ran before it
    return np.random.default_rng(0)
