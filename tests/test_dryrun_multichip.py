"""Regression guard for the driver's multi-chip certification.

Rounds 1-2 both lost the MULTICHIP artifact to non-hermeticity: the dryrun
preferred real accelerators, so a TPU-tunnel/libtpu outage failed a check
whose contract is an 8-device VIRTUAL CPU mesh.  This test runs the
driver's EXACT invocation in a fresh subprocess and additionally asserts
the TPU plugin was never initialized (JAX_PLATFORMS=cpu is forced inside
dryrun_multichip before jax import).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_invocation_is_hermetic():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    code = (
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "import jax\n"
        # the CPU platform must be the ONLY initialized backend
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "print('BACKEND_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout, out.stdout
    assert "BACKEND_OK" in out.stdout, out.stdout
