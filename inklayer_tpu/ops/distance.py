"""Distance transforms and geodesic label floods, on device.

Replaces scipy.ndimage.distance_transform_edt (refiner.py:173) and
skimage.segmentation.watershed (refiner.py:189) with bounded-iteration
chamfer relaxation and a cost-ordered label flood.  Chamfer 3-4 weights
approximate euclidean distance within ~6%; the refinement stage only uses
distances comparatively (nearest mask / elevation ordering), which keeps the
result inside the mask-IoU tolerance budget.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e9)

_SHIFTS8 = ((0, 1, 1.0), (0, -1, 1.0), (1, 0, 1.0), (-1, 0, 1.0),
            (1, 1, 1.41421356), (1, -1, 1.41421356),
            (-1, 1, 1.41421356), (-1, -1, 1.41421356))


def _shift(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    out = jnp.roll(x, (dy, dx), axis=(0, 1))
    if dy == 1:
        out = out.at[0, :].set(fill)
    elif dy == -1:
        out = out.at[-1, :].set(fill)
    if dx == 1:
        out = out.at[:, 0].set(fill)
    elif dx == -1:
        out = out.at[:, -1].set(fill)
    return out


@functools.partial(jax.jit, static_argnames=("iters",))
def chamfer_distance(seeds: jax.Array, iters: int = 64) -> jax.Array:
    """Approximate euclidean distance to the nearest True pixel in `seeds`.
    (H, W) bool -> (H, W) float32.  Accurate up to `iters` pixels; farther
    pixels saturate (relative ordering beyond that range rarely matters)."""
    dist = jnp.where(seeds, 0.0, _INF)

    def body(_, d):
        for dy, dx, wgt in _SHIFTS8:
            d = jnp.minimum(d, _shift(d, dy, dx, _INF) + wgt)
        return d

    return jax.lax.fori_loop(0, iters, body, dist)


@functools.partial(jax.jit, static_argnames=("iters",))
def label_flood(
    markers: jax.Array,  # (H, W) int32; 0 = unlabeled, >0 = seed labels
    cost: jax.Array,  # (H, W) float32 per-pixel entry cost (elevation)
    region: jax.Array,  # (H, W) bool — flood only inside this region
    iters: int = 256,
) -> jax.Array:
    """Cost-ordered label flood — watershed-style expansion of `markers`
    across `region`, where a pixel adopts the label of the neighbor on the
    cheapest accumulated path (path cost = sum of step length + entry cost).

    Jacobi relaxation of multi-source Dijkstra; converges to the exact
    cheapest-path labelling when iters >= longest geodesic path.
    """
    dist = jnp.where(markers > 0, 0.0, _INF)
    lbl = markers

    def body(_, state):
        dist, lbl = state
        best_d, best_l = dist, lbl
        for dy, dx, wgt in _SHIFTS8:
            nd = _shift(dist, dy, dx, _INF) + wgt + jnp.maximum(cost, 0.0)
            nl = _shift(lbl, dy, dx, 0)
            better = (nd < best_d) & region & (nl > 0)
            best_d = jnp.where(better, nd, best_d)
            best_l = jnp.where(better, nl, best_l)
        # seeds never change
        best_d = jnp.where(markers > 0, 0.0, best_d)
        best_l = jnp.where(markers > 0, markers, best_l)
        return best_d, best_l

    dist, lbl = jax.lax.fori_loop(0, iters, body, (dist, lbl))
    return jnp.where(region, lbl, 0)


@functools.partial(jax.jit, static_argnames=("iters",))
def masked_nearest_distance(
    masks: jax.Array,  # (N, H, W) bool seed sets
    iters: int = 96,
) -> jax.Array:
    """Per-mask chamfer distance fields, vmapped: (N, H, W) float32."""
    return jax.vmap(lambda m: chamfer_distance(m, iters=iters))(masks)
