"""Device-mesh construction for multi-chip serving / fine-tuning.

The reference has no parallelism of any kind (SURVEY.md §2.9); its
distributed helpers are dormant.  This framework scales through
jax.sharding: a (dp, fsdp, tp) mesh where
  dp   — data parallel over images/requests (DCN or ICI),
  fsdp — parameter sharding (ZeRO-style, ICI),
  tp   — tensor parallel over attention heads / MLP hidden (ICI).
XLA inserts all collectives (psum/all-gather/reduce-scatter) from the
sharding annotations — no explicit NCCL-style calls anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "fsdp", "tp")


def make_mesh(dp: int = 1, fsdp: int = 1, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = dp * fsdp * tp
    if need > len(devices):
        raise ValueError(f"mesh {dp}x{fsdp}x{tp} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(dp, fsdp, tp)
    return Mesh(grid, AXES)


def auto_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Default layout: favor tp within a chip-pair/host (ICI-adjacent), dp
    across the rest."""
    n = n_devices if n_devices is not None else jax.device_count()
    tp = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand <= n:
            tp = cand
            break
    return make_mesh(dp=n // tp, fsdp=1, tp=tp)
