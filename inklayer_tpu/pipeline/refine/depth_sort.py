"""Depth-based mask ordering.

Parity target: refinement/depth_sort.py — sparse stroke sampling (:48-67),
per-mask binned-mode depth score (:71-86, utils.py get_binned_frequent),
strict bbox containment graph (:110-172), ink-restricted major-overlap
matrix (:174-236), and the argsort + 3 bubble-pass ordering (:240-288).

TPU redesign: the KDTree Poisson-disk sampling becomes grid-stratified
sampling (one stroke pixel per radius-sized cell, raster-first within the
cell — same first-available-point bias, same ~1/radius^2 density, fully
parallel); depth scores are a one-hot histogram matmul; both graphs are
vectorised; only the tiny O(N^2) bubble ordering stays on host.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.config import RefineConfig
from inklayer_tpu.ops import morphology as M

_N_BINS = 512


@functools.partial(jax.jit, static_argnames=("cell",))
def sample_stroke_points(ink: jax.Array, cell: int):
    """ink: (H, W) bool -> (S, 2) int32 yx coords + (S,) bool validity,
    S = num cells; one stroke pixel per cell (first in raster order)."""
    h, w = ink.shape
    ph = (cell - h % cell) % cell
    pw = (cell - w % cell) % cell
    x = jnp.pad(ink, ((0, ph), (0, pw)))
    hh, ww = x.shape
    ncy, ncx = hh // cell, ww // cell
    cells = x.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(ncy * ncx, cell * cell)
    first = jnp.argmax(cells, axis=1)  # first True (0 if none)
    valid = cells.any(axis=1)
    cy = jnp.arange(ncy * ncx, dtype=jnp.int32) // ncx
    cx = jnp.arange(ncy * ncx, dtype=jnp.int32) % ncx
    yy = cy * cell + (first // cell).astype(jnp.int32)
    xx = cx * cell + (first % cell).astype(jnp.int32)
    yy = jnp.clip(yy, 0, h - 1)
    xx = jnp.clip(xx, 0, w - 1)
    return jnp.stack([yy, xx], axis=1), valid


@jax.jit
def mask_depth_scores(masks: jax.Array, points: jax.Array, valid: jax.Array,
                      depth: jax.Array, bin_width: float = 0.1) -> jax.Array:
    """Mode of bin-rounded depths at sampled stroke points inside each mask
    (get_binned_frequent).  Masks with no sampled points score +inf."""
    d = depth[points[:, 0], points[:, 1]]  # (S,)
    bins = jnp.round(d / bin_width).astype(jnp.int32)
    bmin = jnp.min(jnp.where(valid, bins, 0))
    bins = jnp.clip(bins - bmin, 0, _N_BINS - 1)
    onehot = jax.nn.one_hot(bins, _N_BINS) * valid[:, None]  # (S, B)
    member = masks[:, points[:, 0], points[:, 1]].astype(jnp.float32)  # (N, S)
    counts = member @ onehot  # (N, B)
    mode_bin = jnp.argmax(counts, axis=1)
    score = (mode_bin + bmin).astype(jnp.float32) * bin_width
    has_points = counts.sum(axis=1) > 0
    return jnp.where(has_points, score, jnp.inf)


def containment_graph(boxes: np.ndarray, image_hw: Tuple[int, int],
                      cfg: RefineConfig = RefineConfig()) -> np.ndarray:
    """graph[i, j] = True iff box_i strictly contains box_j
    (build_containment_graph_fast :110-172)."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0, 0), bool)
    h, w = image_hw
    b = np.asarray(boxes, float).copy()
    if b.max() <= 1.0 + 1e-6:
        b[:, [0, 2]] *= w
        b[:, [1, 3]] *= h
    x1 = np.minimum(b[:, 0], b[:, 2])
    x2 = np.maximum(b[:, 0], b[:, 2])
    y1 = np.minimum(b[:, 1], b[:, 3])
    y2 = np.maximum(b[:, 1], b[:, 3])
    b = np.stack([x1, y1, x2, y2], 1)
    eps = float(max(1.0, cfg.containment_eps_frac * max(h, w)))
    areas = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    cx = (b[:, 0] + b[:, 2]) * 0.5
    cy = (b[:, 1] + b[:, 3]) * 0.5
    b1, b2 = b[:, None], b[None, :]
    contained = ((b1[..., 0] - eps <= b2[..., 0])
                 & (b1[..., 1] - eps <= b2[..., 1])
                 & (b1[..., 2] + eps >= b2[..., 2])
                 & (b1[..., 3] + eps >= b2[..., 3]))
    contained &= (areas[:, None] * (1.0 - cfg.containment_area_gap)) > areas[None, :]
    cx_in = (b1[..., 0] - eps <= cx[None, :]) & (cx[None, :] <= b1[..., 2] + eps)
    cy_in = (b1[..., 1] - eps <= cy[None, :]) & (cy[None, :] <= b1[..., 3] + eps)
    contained &= cx_in & cy_in
    np.fill_diagonal(contained, False)
    return contained


@functools.partial(jax.jit, static_argnames=("thr",))
def major_overlap_matrix(masks: jax.Array, thr: float = 0.6) -> jax.Array:
    """major[i, j] = inter / min(area_i, area_j) >= thr on 1px-dilated masks
    (compute_major_overlap_matrix :174-236)."""
    m = M.binary_dilate(masks, M.ellipse_kernel(3))
    n = m.shape[0]
    flat = m.astype(jnp.float32).reshape(n, -1)
    inter = flat @ flat.T
    areas = flat.sum(axis=1)
    denom = jnp.minimum(areas[:, None], areas[None, :])
    major = jnp.where(denom > 0, inter / denom, 0.0) >= thr
    return major & (inter > 0) & ~jnp.eye(n, dtype=bool)


def sort_order(depth_scores: np.ndarray, containment: np.ndarray,
               overlap: np.ndarray) -> List[int]:
    """Descending depth, then 3 bubble passes moving containers earlier when
    they overlap (sort_sketch_masks :271-288)."""
    order = list(np.argsort(depth_scores)[::-1])
    for _ in range(3):
        for i in range(len(order)):
            for j in range(i + 1, len(order)):
                a, b = order[i], order[j]
                if not overlap[a, b]:
                    continue
                if containment[a, b]:
                    order[i], order[j] = order[j], order[i]
    return order


def depth_stats_dispatch(
    masks_dev,  # (N, H, W) bool device array
    sketch_gray: np.ndarray,  # (H, W) uint8
    depth,  # (H, W) float (device or host)
    cfg: RefineConfig = RefineConfig(),
):
    """Device half of sort_sketch_masks: per-mask depth score + pairwise
    major-overlap matrix, both independent per mask — dispatched with NO
    readback so the caller can batch them into one jax.device_get (the
    runner folds these into the NMS keep readback)."""
    h, w = sketch_gray.shape
    # sketch_to_01binary: threshold at max/2 (refinement/utils.py:3-9)
    ink = sketch_gray <= sketch_gray.max() / 2
    cell = max(1, int(round(h * cfg.sample_radius_frac)))
    ink_dev = jnp.asarray(ink)
    masks_dev = jnp.asarray(masks_dev)
    pts, valid = sample_stroke_points(ink_dev, cell)
    scores_dev = mask_depth_scores(
        masks_dev, pts, valid, jnp.asarray(depth, jnp.float32), cfg.depth_bin)
    overlap_dev = major_overlap_matrix(
        masks_dev & ink_dev[None], thr=cfg.overlap_major_frac)
    return scores_dev, overlap_dev


def sort_sketch_masks(
    masks: np.ndarray,  # (N, H, W) bool
    boxes: np.ndarray,  # (N, 4) px xyxy
    sketch_gray: np.ndarray,  # (H, W) uint8
    depth: np.ndarray,  # (H, W) float
    cfg: RefineConfig = RefineConfig(),
):
    """Returns (order list, depth_scores, containment graph)."""
    n = len(masks)
    if n == 0:
        return [], np.zeros((0,)), np.zeros((0, 0), bool)
    h, w = sketch_gray.shape
    scores_dev, overlap_dev = depth_stats_dispatch(
        jnp.asarray(masks), sketch_gray, depth, cfg)
    cont = containment_graph(boxes, (h, w), cfg)
    # ONE batched readback (each np.asarray costs a full tunnel RTT)
    scores, overlap = jax.device_get((scores_dev, overlap_dev))
    order = sort_order(scores, cont, overlap)
    return order, scores, cont
