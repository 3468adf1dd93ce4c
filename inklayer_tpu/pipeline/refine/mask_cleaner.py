"""Mask cleaning stage, batched on device.

Parity target: refinement/mask_cleaner.py clean_up_mask (:11-36) —
threshold 127 -> MORPH_CLOSE with a rect kernel ~2.5% of min dim (odd) ->
keep 8-connected components with area > 500 OR bbox aspect > 1.1.

The reference round-trips every mask through PNG files; here all N masks are
cleaned in one jitted call on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.config import RefineConfig
from inklayer_tpu.ops import morphology as M
from inklayer_tpu.ops.components import clean_components_batch


def kernel_size(image_hw, factor: float = 0.025) -> int:
    k = int(min(image_hw) * factor)
    return k if k % 2 != 0 else k + 1


@functools.partial(jax.jit, static_argnames=("k", "min_area", "min_aspect",
                                             "with_stats"))
def clean_masks(
    masks: jax.Array,  # (N, H, W) bool or uint8
    k: int,
    min_area: int = 500,
    min_aspect: float = 1.1,
    with_stats: bool = False,
):
    """Returns (N, H, W) bool cleaned masks; with_stats=True additionally
    returns (N,) bool CC-iteration-cap-hit flags (observability: a capped
    mask's components may be split, so the keep decision can differ from
    the reference's exact connectedComponentsWithStats)."""
    binary = masks > (127 if masks.dtype == jnp.uint8 else 0)
    se = M.rect_kernel(max(k, 1))
    closed = M.morph_close(binary, se)
    return clean_components_batch(closed, min_area, min_aspect,
                                  with_stats=with_stats)


def run_clean_masks(masks, cfg: RefineConfig = RefineConfig()) -> np.ndarray:
    """masks: (N, H, W) uint8/bool host array -> (N, H, W) bool host array."""
    return np.asarray(clean_masks_device(masks, cfg))


def clean_masks_device(masks, cfg: RefineConfig = RefineConfig(),
                       with_stats: bool = False):
    """Device-resident variant: accepts/returns device arrays (no
    transfer).  with_stats=True also returns the (N,) cap-hit flags."""
    masks = jnp.asarray(masks)
    if masks.shape[0] == 0:
        empty = masks.astype(bool)
        return (empty, jnp.zeros((0,), bool)) if with_stats else empty
    k = kernel_size(masks.shape[1:], cfg.clean_kernel_frac)
    return clean_masks(masks, k, cfg.min_cc_area, cfg.min_cc_aspect,
                       with_stats=with_stats)
