"""Disjoint-layer compositing and mask completion.

Parity target: refinement/refiner.py —
  * parse_masks_to_disjoint_masks (:90-126): depth-sort, drop masks covering
    >90% of the ink, composite back-to-front into a label map, re-parse,
    merge fragments <5% of their original area into the max-overlap earlier
    mask, remove isolated pixels;
  * refine_masks_with_watershed (:129-196): expand masks over unlabeled ink
    using a distance+gradient elevation (here: cost-ordered label flood);
  * refine_masks_with_boxes (:228-297): assign remaining unlabeled ink to the
    nearest mask among those whose bbox contains the pixel (here: chamfer
    distance fields on a downsampled grid — per-pixel Python loops with
    exact euclidean distances become array lookups within tolerance);
  * create_unlabeled_mask (:301-336): leftover ink -> MORPH_OPEN + dilate ->
    one extra mask.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.config import RefineConfig
from inklayer_tpu.ops import morphology as M
from inklayer_tpu.ops.components import large_component_mask
from inklayer_tpu.ops.distance import chamfer_distance, label_flood, masked_nearest_distance
from inklayer_tpu.ops.morphology import neighbor_count
from inklayer_tpu.pipeline.refine.depth_sort import sort_sketch_masks


@jax.jit
def composite_masks(masks: jax.Array) -> jax.Array:
    """Back-to-front compositing (composite_and_parse_masks :43-45): label =
    1 + lowest mask index covering the pixel; 0 = background."""
    any_mask = masks.any(axis=0)
    first = jnp.argmax(masks, axis=0)  # first True along N
    return jnp.where(any_mask, first + 1, 0).astype(jnp.int32)


@jax.jit
def clean_delicate(mask: jax.Array) -> jax.Array:
    """Remove pixels with <=1 neighbors (clean_delicate_mask :20-32)."""
    return mask & (neighbor_count(mask, 3) > 1.0)


def parse_masks_to_disjoint(
    masks: np.ndarray,  # (N, H, W) bool, cleaned SAM masks
    boxes: np.ndarray,  # (N, 4) px
    sketch_gray: np.ndarray,
    depth: np.ndarray,
    cfg: RefineConfig = RefineConfig(),
) -> Tuple[List[np.ndarray], List[np.ndarray], List[dict]]:
    """Returns (disjoint_masks, sorted_boxes, mask_info)."""
    if len(masks) == 0:
        return [], [], []
    order, _, _ = sort_sketch_masks(masks, boxes, sketch_gray, depth, cfg)
    sorted_masks = masks[order].copy()
    sorted_boxes = [boxes[i] for i in order]

    # drop masks covering >90% of the ink (refiner :99-110)
    ink = sketch_gray < cfg.ink_threshold
    sketch_area = ink.sum()
    num = len(sorted_masks)
    for i in range(len(sorted_masks)):
        if num > 1 and np.logical_and(sorted_masks[i], ink).sum() \
                > cfg.max_ink_cover_frac * sketch_area:
            sorted_masks[i] = False
            num -= 1

    composite = np.asarray(composite_masks(jnp.asarray(sorted_masks)))
    original_areas = sorted_masks.sum(axis=(1, 2))

    final_masks: List[np.ndarray] = []
    final_info: List[dict] = []
    labels_present = np.unique(composite)[1:]  # skip 0
    for label in labels_present:
        parsed = composite == label
        oi = int(label) - 1
        if parsed.sum() < cfg.fragment_merge_frac * max(original_areas[oi], 1):
            # reference "merges" the fragment into the earlier max-overlap
            # mask, but appends upfront-parsed masks — the net output effect
            # is that the fragment is dropped when such a mask exists
            # (composite_and_parse_masks :59-87)
            has_earlier_overlap = any(
                np.logical_and(sorted_masks[oi], sorted_masks[j]).any()
                for j in range(oi))
            if has_earlier_overlap:
                continue
        final_masks.append(parsed)
        final_info.append({"bbox": sorted_boxes[oi],
                           "original_indices": [order[oi]]})
    cleaned = [np.asarray(clean_delicate(jnp.asarray(m))) for m in final_masks]
    return cleaned, sorted_boxes, final_info


@functools.partial(jax.jit, static_argnames=("iters",))
def watershed_expand(
    masks: jax.Array,  # (N, H, W) bool, disjoint ordered masks
    ink: jax.Array,  # (H, W) bool
    iters: int = 256,
) -> jax.Array:
    """Expand masks over unlabeled ink (refine_masks_with_watershed).

    Reference recipe re-expressed as a cost-ordered label flood: markers =
    masks (+2-3px dilation over unlabeled ink), elevation favours filling
    large unlabeled regions (distance transform *3 there), flood restricted
    to ink pixels.
    """
    n = masks.shape[0]
    combined = masks.any(axis=0)
    unlabeled = ink & ~combined
    # large connected unlabeled regions (>50 px after closing with disk(3))
    closed = M.morph_close(unlabeled, M.disk_kernel(3))
    large = large_component_mask(closed, 50) & unlabeled

    # markers: mask index + 1; dilated pixels claim unlabeled ink
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None]
    # dilation size 3 near large regions else 2 (refiner :163-169)
    dil3 = M.binary_dilate(masks, M.disk_kernel(3))
    near_large = (dil3 & large[None]).any(axis=(1, 2))
    dil2 = M.binary_dilate(masks, M.disk_kernel(2))
    dil = jnp.where(near_large[:, None, None], dil3, dil2)
    claim = dil & unlabeled[None]
    # first mask wins where claims overlap (reference: later overwrite, but
    # masks are disjoint and claims rarely collide; first-wins is symmetric)
    marker_map = jnp.max(jnp.where(masks | claim, idx, 0), axis=0)

    # elevation: -distance (x3 in large regions) + gradient, as entry cost.
    dist = chamfer_distance(~unlabeled, iters=64)  # distance INTO unlabeled
    dist = jnp.where(large, dist * 3.0, dist)
    g = ink.astype(jnp.float32)
    gx = jnp.abs(jnp.roll(g, 1, 1) - jnp.roll(g, -1, 1))
    gy = jnp.abs(jnp.roll(g, 1, 0) - jnp.roll(g, -1, 0))
    grad = jnp.sqrt(gx * gx + gy * gy)
    grad = jnp.where(large, grad * 0.01, grad * 0.1)
    cost = -dist + grad
    cost = cost - cost.min()  # label_flood expects non-negative entry costs
    labels = label_flood(marker_map, cost, ink, iters=iters)
    return jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None] == labels[None]


def match_masks_to_boxes(masks: np.ndarray, boxes: np.ndarray) -> dict:
    """Greedy IoU matching of mask bboxes to input boxes (refiner :199-225)."""
    from inklayer_tpu.pipeline.refine.nms import bbox_iou_matrix

    mask_boxes = []
    for m in masks:
        ys, xs = np.nonzero(m)
        if len(ys) == 0:
            mask_boxes.append(None)
        else:
            mask_boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
    valid = [i for i, b in enumerate(mask_boxes) if b is not None]
    if not valid or len(boxes) == 0:
        return {}
    mb = np.asarray([mask_boxes[i] for i in valid], float)
    bb = np.asarray(boxes, float)
    x1 = np.maximum(bb[:, None, 0], mb[None, :, 0])
    y1 = np.maximum(bb[:, None, 1], mb[None, :, 1])
    x2 = np.minimum(bb[:, None, 2], mb[None, :, 2])
    y2 = np.minimum(bb[:, None, 3], mb[None, :, 3])
    inter = np.where((x2 >= x1) & (y2 >= y1), (x2 - x1) * (y2 - y1), 0.0)
    a1 = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
    a2 = (mb[:, 2] - mb[:, 0]) * (mb[:, 3] - mb[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    iou = np.where(union > 0, inter / union, 0.0)
    box_to_mask = {}
    while iou.size and iou.max() > 0:
        bi, mi = np.unravel_index(np.argmax(iou), iou.shape)
        box_to_mask[int(bi)] = valid[int(mi)]
        iou[bi, :] = 0
        iou[:, mi] = 0
    return box_to_mask


def refine_with_boxes(
    masks: np.ndarray,  # (N, H, W) bool
    boxes: np.ndarray,  # (M, 4) px
    sketch_gray: np.ndarray,
    cfg: RefineConfig = RefineConfig(),
    downsample: int = 4,
) -> np.ndarray:
    """Assign unlabeled ink to the nearest mask among containing boxes
    (refine_masks_with_boxes).  Distances via chamfer fields on a
    `downsample`x grid."""
    ink = sketch_gray <= cfg.ink_threshold  # ~(img > 250)
    combined = masks.any(axis=0)
    unlabeled = ink & ~combined
    if not unlabeled.any() or len(boxes) == 0:
        return masks
    box_to_mask = match_masks_to_boxes(masks, boxes)
    if not box_to_mask:
        return masks

    h, w = sketch_gray.shape
    ys, xs = np.nonzero(unlabeled)
    # containment of each unlabeled pixel in each box: (P, M)
    bb = np.asarray(boxes, float)
    inside = ((bb[None, :, 0] <= xs[:, None]) & (xs[:, None] <= bb[None, :, 2])
              & (bb[None, :, 1] <= ys[:, None]) & (ys[:, None] <= bb[None, :, 3]))
    # distance fields for matched masks on the downsampled grid
    matched = sorted(set(box_to_mask.values()))
    small = jnp.asarray(masks[matched][:, ::downsample, ::downsample])
    dists = np.asarray(masked_nearest_distance(small, iters=96)) * downsample
    mask_pos = {m: k for k, m in enumerate(matched)}

    out = masks.copy()
    dcol = np.full((len(ys), len(boxes)), np.inf)
    for bi, mi in box_to_mask.items():
        dcol[:, bi] = dists[mask_pos[mi], ys // downsample, xs // downsample]
    dcol = np.where(inside, dcol, np.inf)
    best_box = np.argmin(dcol, axis=1)
    has_choice = np.isfinite(dcol[np.arange(len(ys)), best_box])
    for p in np.nonzero(has_choice)[0]:
        mi = box_to_mask.get(int(best_box[p]))
        if mi is not None:
            out[mi, ys[p], xs[p]] = True
    return out


def add_unlabeled_mask(masks: np.ndarray, sketch_gray: np.ndarray,
                       cfg: RefineConfig = RefineConfig()) -> np.ndarray:
    """Leftover ink -> MORPH_OPEN(3) -> dilate(2x2) -> extra mask
    (create_unlabeled_mask :301-336)."""
    ink = sketch_gray < cfg.ink_threshold
    combined = masks.any(axis=0) if len(masks) else np.zeros_like(ink)
    unlabeled = jnp.asarray(ink & ~combined)
    opened = M.morph_open(unlabeled, M.rect_kernel(3))
    # cv2.dilate with a 2x2 kernel is anchor-centered at (0,0) offset
    dilated = np.asarray(M.binary_dilate(opened, M.rect_kernel(3)))
    if dilated.sum() == 0:
        return masks
    return np.concatenate([masks, dilated[None]], axis=0)


def improve_masks(
    masks: np.ndarray,  # (N, H, W) disjoint ordered masks
    boxes: np.ndarray,
    sketch_gray: np.ndarray,
    cfg: RefineConfig = RefineConfig(),
) -> np.ndarray:
    """watershed expand -> bbox assignment -> unlabeled extra mask
    (improve_sam_masks :339-370)."""
    if len(masks) == 0:
        return add_unlabeled_mask(masks, sketch_gray, cfg)
    ink = jnp.asarray(~(sketch_gray > cfg.ink_threshold))
    ws = np.asarray(watershed_expand(jnp.asarray(masks), ink,
                                     iters=cfg.watershed_iters))
    bboxed = refine_with_boxes(ws, boxes, sketch_gray, cfg)
    return add_unlabeled_mask(bboxed, sketch_gray, cfg)
