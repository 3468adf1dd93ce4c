"""Sketch-aware NMS.

Parity target: refinement/nms_sketch.py — greedy score-ordered NMS where the
overlap metric is the IoU of masks restricted to stroke pixels (<250), gated
by bbox containment within a dynamic epsilon (8px * diag/1000) AND a shared
corner within the same epsilon; plain bbox IoU > 0.7 also suppresses; the
lower-scored box of an overlapping pair is removed.  Pre-filter drops boxes
covering >=90% of the image, without sketch content, or containing more than
5 other boxes (:129-174).

The reference is O(N^2) with per-pair PNG re-reads (the acknowledged
bottleneck, README.md:155).  Here: ONE jitted device call computes the full
ink-restricted mask-IoU matrix (two einsums); the greedy loop runs on host
over the tiny (N, N) matrices.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.config import RefineConfig


@jax.jit
def ink_mask_iou_matrix(masks: jax.Array, ink: jax.Array) -> jax.Array:
    """masks: (N, H, W) bool, ink: (H, W) bool -> (N, N) IoU of
    ink-restricted masks (content_iou :226-234)."""
    m = (masks & ink[None]).astype(jnp.float32)
    n = m.shape[0]
    flat = m.reshape(n, -1)
    inter = flat @ flat.T
    areas = flat.sum(axis=1)
    union = areas[:, None] + areas[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def bbox_iou_matrix(boxes: np.ndarray) -> np.ndarray:
    """(N, 4) xyxy -> (N, N) IoU (refinement/utils.py compute_bbox_iou)."""
    x1 = np.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = np.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = np.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = np.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = np.where((x2 >= x1) & (y2 >= y1), (x2 - x1) * (y2 - y1), 0.0)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = areas[:, None] + areas[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def _is_contained(small: np.ndarray, big: np.ndarray, eps: float) -> np.ndarray:
    """contained[i, j] = small_j inside big_i with slack (nms_sketch :177-183)."""
    return ((big[:, None, 0] - eps <= small[None, :, 0])
            & (big[:, None, 1] - eps <= small[None, :, 1])
            & (big[:, None, 2] + eps >= small[None, :, 2])
            & (big[:, None, 3] + eps >= small[None, :, 3]))


def _share_corner(boxes: np.ndarray, eps: float) -> np.ndarray:
    """share[i, j] = boxes i and j have a pair of corners within eps
    (nms_sketch :23-59)."""
    corners = np.stack([
        boxes[:, [0, 1]], boxes[:, [0, 3]], boxes[:, [2, 1]], boxes[:, [2, 3]],
    ], axis=1)  # (N, 4, 2)
    d = np.linalg.norm(
        corners[:, None, :, None, :] - corners[None, :, None, :, :], axis=-1)
    return (d <= eps).any(axis=(2, 3))


def _strict_contains(boxes: np.ndarray) -> np.ndarray:
    """contains[i, j] = box_i strictly contains box_j (nms_sketch :109-127,
    no epsilon)."""
    return ((boxes[:, None, 0] <= boxes[None, :, 0])
            & (boxes[:, None, 1] <= boxes[None, :, 1])
            & (boxes[:, None, 2] >= boxes[None, :, 2])
            & (boxes[:, None, 3] >= boxes[None, :, 3])
            & ~np.eye(len(boxes), dtype=bool))


@jax.jit
def _greedy_nms_device(sketch_iou: jax.Array, gate: jax.Array,
                       bbox_ov: jax.Array, order: jax.Array,
                       thr_s: float, thr_b: float) -> jax.Array:
    """Greedy score-ordered suppression on device.

    Equivalent to the reference's double loop (nms_sketch :186-251) because
    iteration follows non-increasing score order: the 'suppress the higher
    scored a' branch requires fs[b] > fs[a] with b AFTER a in that order,
    which cannot happen — so each surviving a simply kills every later
    overlapping b, a per-row vector op.  Returns keep flags in `order`
    space."""
    k = order.shape[0]
    s_ov = jnp.where(gate, sketch_iou, 0.0)[order][:, order]
    b_ov = bbox_ov[order][:, order]
    sup = (s_ov > thr_s) | (b_ov > thr_b)
    idx = jnp.arange(k)

    def body(keep, pi):
        kill = sup[pi] & (idx > pi) & keep[pi]
        return keep & ~kill, None

    keep, _ = jax.lax.scan(body, jnp.ones((k,), bool), idx)
    return keep


def sketch_nms_dispatch(
    boxes: np.ndarray,  # (N, 4) xyxy pixels
    scores: np.ndarray,  # (N,)
    masks,  # (N, H, W) bool device array (cleaned masks)
    sketch_gray: np.ndarray,  # (H, W) uint8 HOST array (integral image)
    cfg: RefineConfig = RefineConfig(),
    gray_dev=None,  # optional device (H, W) uint8: skips the per-image
    # ink-plane upload (~0.55MB/image through the tunnel; the runner
    # uploads the gray plane once and every refine stage thresholds it
    # on device)
):
    """Async half of sketch_nms: host pre-filter + pairwise gates (boxes
    only), then the expensive ink-IoU matrix AND the greedy loop on device.
    Returns (kept0 prefilter indices, order, keep_dev) with NO device
    readback — the caller batches keep_dev into its next jax.device_get.
    Final kept indices = kept0[order[keep]]."""
    kept0, order, gate, iou_bbox = nms_host_prefilter(
        boxes, scores, sketch_gray, cfg)
    if len(kept0) == 0:
        return kept0, np.zeros((0,), int), jnp.zeros((0,), bool)

    fm = masks[np.asarray(kept0)]
    ink = (gray_dev < cfg.ink_threshold) if gray_dev is not None \
        else jnp.asarray(sketch_gray < cfg.ink_threshold)
    iou_sketch = ink_mask_iou_matrix(jnp.asarray(fm), ink)
    keep_dev = _greedy_nms_device(
        iou_sketch, jnp.asarray(gate),
        jnp.asarray(np.where(gate, iou_bbox, 0.0)), jnp.asarray(order),
        cfg.nms_iou, cfg.nms_bbox_iou_kill)
    return kept0, order, keep_dev


def nms_host_prefilter(
    boxes: np.ndarray,  # (N, 4) xyxy pixels
    scores: np.ndarray,  # (N,)
    sketch_gray: np.ndarray,  # (H, W) uint8 HOST array
    cfg: RefineConfig = RefineConfig(),
):
    """Host half of sketch NMS: the filter_full_or_empty_bbox pre-filter
    plus the box-only pairwise gates.  Returns (kept0, order, gate,
    iou_bbox); gate/iou_bbox are (K, K) over the kept0 rows."""
    n = len(boxes)
    h, w = sketch_gray.shape
    img_area = h * w
    boxes = boxes.astype(np.float64)

    # ---- pre-filter (filter_full_or_empty_bbox) --------------------------
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    valid_area = areas / img_area < cfg.nms_max_area_frac
    # native single-pass int32 integral (the int64 double-cumsum was the
    # prefilter's largest host-CPU item, analyze_sweep_stalls4 round 5)
    from inklayer_tpu.native import integral_nonzero

    integral = integral_nonzero(sketch_gray)
    xs1 = np.clip(boxes[:, 0], 0, w - 1).astype(int)
    ys1 = np.clip(boxes[:, 1], 0, h - 1).astype(int)
    xs2 = np.clip(boxes[:, 2], 0, w - 1).astype(int) + 1
    ys2 = np.clip(boxes[:, 3], 0, h - 1).astype(int) + 1
    nz = (integral[ys2, xs2] - integral[ys1, xs2]
          - integral[ys2, xs1] + integral[ys1, xs1])
    has_content = nz > 0
    contains = _strict_contains(boxes)
    few_contained = contains.sum(axis=1) <= cfg.nms_max_contained
    kept0 = np.nonzero(valid_area & has_content & few_contained)[0]
    if len(kept0) == 0:
        z = np.zeros((0, 0))
        return kept0, np.zeros((0,), int), z.astype(bool), z

    fb = boxes[kept0]
    fs = scores[kept0]
    order = np.argsort(-fs)

    iou_bbox = bbox_iou_matrix(fb)
    eps = cfg.nms_eps_px_per_kdiag * (np.hypot(h, w) / 1000.0)
    areas_f = (fb[:, 2] - fb[:, 0]) * (fb[:, 3] - fb[:, 1])
    larger_is_i = areas_f[:, None] > areas_f[None, :]
    cont = _is_contained(fb, fb, eps)
    gate = np.where(larger_is_i, cont, cont.T) & _share_corner(fb, eps)
    return kept0, order, gate, iou_bbox


def sketch_nms(
    boxes: np.ndarray,  # (N, 4) xyxy pixels
    scores: np.ndarray,  # (N,)
    masks: np.ndarray,  # (N, H, W) bool (cleaned masks)
    sketch_gray: np.ndarray,  # (H, W) uint8
    cfg: RefineConfig = RefineConfig(),
) -> np.ndarray:
    """Returns kept indices into the input arrays, score-ordered like the
    reference's return (original_indices[keep])."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0,), np.int64)
    kept0, order, keep_dev = sketch_nms_dispatch(
        boxes, scores, jnp.asarray(masks), sketch_gray, cfg)
    if len(kept0) == 0:
        return np.zeros((0,), np.int64)
    return kept0[order[np.asarray(keep_dev)]]


def _sketch_nms_host_reference(
    boxes: np.ndarray,  # (N, 4) xyxy pixels
    scores: np.ndarray,  # (N,)
    masks: np.ndarray,  # (N, H, W) bool (cleaned masks)
    sketch_gray: np.ndarray,  # (H, W) uint8
    cfg: RefineConfig = RefineConfig(),
) -> np.ndarray:
    """Host implementation with the reference's literal greedy double loop
    (kept as a test oracle for _greedy_nms_device)."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0,), np.int64)
    h, w = sketch_gray.shape
    img_area = h * w
    boxes = boxes.astype(np.float64)

    # ---- pre-filter (filter_full_or_empty_bbox) --------------------------
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    valid_area = areas / img_area < cfg.nms_max_area_frac
    # "has content": count_nonzero of the grayscale region > 0
    # native single-pass int32 integral (the int64 double-cumsum was the
    # prefilter's largest host-CPU item, analyze_sweep_stalls4 round 5)
    from inklayer_tpu.native import integral_nonzero

    integral = integral_nonzero(sketch_gray)
    xs1 = np.clip(boxes[:, 0], 0, w - 1).astype(int)
    ys1 = np.clip(boxes[:, 1], 0, h - 1).astype(int)
    xs2 = np.clip(boxes[:, 2], 0, w - 1).astype(int) + 1
    ys2 = np.clip(boxes[:, 3], 0, h - 1).astype(int) + 1
    nz = (integral[ys2, xs2] - integral[ys1, xs2]
          - integral[ys2, xs1] + integral[ys1, xs1])
    has_content = nz > 0
    contains = _strict_contains(boxes)
    few_contained = contains.sum(axis=1) <= cfg.nms_max_contained
    kept0 = np.nonzero(valid_area & has_content & few_contained)[0]
    if len(kept0) == 0:
        return np.zeros((0,), np.int64)

    fb = boxes[kept0]
    fs = scores[kept0]
    fm = masks[kept0]
    order = np.argsort(-fs)

    # ---- pairwise matrices (one device call for the expensive part) ------
    ink = jnp.asarray(sketch_gray < cfg.ink_threshold)
    iou_sketch = np.asarray(ink_mask_iou_matrix(jnp.asarray(fm), ink))
    iou_bbox = bbox_iou_matrix(fb)
    eps = cfg.nms_eps_px_per_kdiag * (np.hypot(h, w) / 1000.0)
    areas_f = (fb[:, 2] - fb[:, 0]) * (fb[:, 3] - fb[:, 1])
    # larger-by-area box per pair; gate = smaller contained in larger AND
    # corners shared
    larger_is_i = areas_f[:, None] > areas_f[None, :]
    cont = _is_contained(fb, fb, eps)  # cont[big, small] = small inside big
    # for pair (i, j): smaller box contained in larger box
    gate = np.where(larger_is_i, cont, cont.T) & _share_corner(fb, eps)
    # the reference zeroes BOTH metrics when the gate fails (content_iou
    # :245-247 returns 0.0, 0.0)
    sketch_ov = np.where(gate, iou_sketch, 0.0)
    iou_bbox = np.where(gate, iou_bbox, 0.0)

    # ---- greedy suppression (exact reference order semantics) ------------
    keep = np.ones(len(order), bool)  # indexed by position in `order`
    pos_of = np.empty(len(order), int)
    pos_of[order] = np.arange(len(order))
    for pi in range(len(order)):
        if not keep[pi]:
            continue
        a = order[pi]
        for pj in range(pi + 1, len(order)):
            if not keep[pj]:
                continue
            bidx = order[pj]
            if not (sketch_ov[a, bidx] > cfg.nms_iou
                    or iou_bbox[a, bidx] > cfg.nms_bbox_iou_kill):
                continue
            # suppress the lower-scored of the pair (content_iou better_idx)
            if fs[bidx] > fs[a]:
                keep[pi] = False
                break
            keep[pj] = False

    return kept0[order[keep]]
