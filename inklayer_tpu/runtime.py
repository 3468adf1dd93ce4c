"""Kernel-dispatch switch.

Model code gates its Pallas TPU kernels (flash/window attention, fused
MLP, one-pass LayerNorm, deformable sampling) on :func:`pallas_enabled`
instead of testing the backend directly.  The Pallas forward kernels have
no VJPs — differentiating through them fails with "Linearization failed
to produce known values for all output primals" — so the training paths
(``parallel.train.Trainer``) trace their step inside
:func:`disable_pallas`, which routes every model through the equivalent
(differentiable, slower) XLA formulations while inference keeps the
kernels.  The flag is read at trace time; a jitted step traced inside the
context stays kernel-free for its lifetime.
"""

from __future__ import annotations

import contextlib

import jax

_disable_depth = 0


def _backend_is_tpu() -> bool:  # patchable seam for tests
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def pallas_enabled() -> bool:
    """True when model code may dispatch Pallas TPU kernels."""
    return _disable_depth == 0 and _backend_is_tpu()


@contextlib.contextmanager
def disable_pallas():
    """Route model forwards through the differentiable XLA paths.

    Wrap the FIRST (tracing) call of any jitted/grad-transformed function
    that runs a model forward — e.g. a train step."""
    global _disable_depth
    _disable_depth += 1
    try:
        yield
    finally:
        _disable_depth -= 1
