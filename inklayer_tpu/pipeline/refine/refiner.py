"""Disjoint-layer compositing and mask completion — device-resident.

Parity target: refinement/refiner.py —
  * parse_masks_to_disjoint_masks (:90-126): depth-sort, drop masks covering
    >90% of the ink, composite back-to-front into a label map, re-parse,
    drop fragments <5% of their original area that overlap an earlier mask,
    remove isolated pixels;
  * refine_masks_with_watershed (:129-196): expand masks over unlabeled ink
    using a distance+gradient elevation (here: cost-ordered label flood);
  * refine_masks_with_boxes (:228-297): assign remaining unlabeled ink to the
    nearest mask among those whose bbox contains the pixel (reference:
    per-pixel Python loops with exact euclidean distances; here: chamfer
    fields on a downsampled grid, fully on device);
  * create_unlabeled_mask (:301-336): leftover ink -> MORPH_OPEN + dilate ->
    one extra mask.

Masks stay on device end to end; host readbacks are O(N) scalars/matrices
(the axon tunnel moves ~1.4MB/s — full-resolution mask transfers are the
single biggest latency cost, see ops/bits.py).
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


@jax.jit
def _disjoint_stats(masks: jax.Array, ink: jax.Array):
    """One fused device call for all the small statistics the host logic
    needs: per-mask ink coverage, pairwise overlap existence, per-mask area,
    plus the SPECULATIVE composite + per-label areas assuming no mask fails
    the >90%-ink-cover drop (the common case) — saving the second round-trip
    through the tunnel when no drop fires."""
    n = masks.shape[0]
    ink_cover = (masks & ink[None]).sum(axis=(1, 2))
    areas = masks.sum(axis=(1, 2))
    flat = masks.reshape(n, -1).astype(jnp.float32)
    overlap = (flat @ flat.T) > 0
    composite = composite_masks(masks)
    label_areas = jnp.zeros((n + 1,), jnp.int32).at[composite.reshape(-1)].add(1)
    return ink_cover, areas, overlap, composite, label_areas


@functools.partial(jax.jit, static_argnames=("n",))
def _composite_label_areas(composite: jax.Array, n: int):
    counts = jnp.zeros((n + 1,), jnp.int32)
    flat = composite.reshape(-1)
    return counts.at[flat].add(1)


def parse_masks_to_disjoint(
    masks,  # (N, H, W) bool, cleaned SAM masks (device or host)
    boxes: np.ndarray,  # (N, 4) px
    sketch_gray: np.ndarray,
    depth: np.ndarray,
    cfg: RefineConfig = RefineConfig(),
    sort_result: Optional[List[int]] = None,
) -> Tuple[jax.Array, List[np.ndarray], List[dict]]:
    """Returns (disjoint_masks (M, H, W) bool DEVICE array, sorted_boxes,
    mask_info).  `sort_result` supplies a precomputed depth-sort order (the
    runner folds the depth stats into the NMS readback)."""
    masks = jnp.asarray(masks)
    h, w = sketch_gray.shape
    if masks.shape[0] == 0:
        return jnp.zeros((0, h, w), bool), [], []
    if sort_result is not None:
        order = list(sort_result)
    else:
        order, _, _ = sort_sketch_masks(masks, boxes, sketch_gray, depth, cfg)
    order_idx = jnp.asarray(np.asarray(order, np.int32))
    sorted_masks = masks[order_idx]
    sorted_boxes = [np.asarray(boxes)[i] for i in order]

    ink = jnp.asarray(sketch_gray < cfg.ink_threshold)
    (ink_cover_d, areas_d, overlap_d, composite_spec,
     label_areas_spec) = _disjoint_stats(sorted_masks, ink)
    # ONE batched readback (each np.asarray costs a full tunnel RTT);
    # the composite/label areas ride along speculatively (no-drop case)
    ink_cover, areas, overlap_np, label_areas, sketch_area = jax.device_get(
        (ink_cover_d, areas_d, overlap_d, label_areas_spec, ink.sum()))
    sketch_area = int(sketch_area)

    # drop masks covering >90% of the ink, sequentially (refiner :99-110)
    n = sorted_masks.shape[0]
    keep_cover = np.ones(n, bool)
    remaining = n
    for i in range(n):
        if remaining > 1 and ink_cover[i] > cfg.max_ink_cover_frac * sketch_area:
            keep_cover[i] = False
            remaining -= 1
    if keep_cover.all():
        composite = composite_spec  # speculation held: no second round-trip
    else:
        sorted_masks = sorted_masks * jnp.asarray(keep_cover)[:, None, None]
        areas = np.where(keep_cover, areas, 0)
        composite = composite_masks(sorted_masks)
        label_areas = np.asarray(_composite_label_areas(composite, n))

    keep_labels = []
    final_info = []
    for oi in range(n):
        parsed_area = label_areas[oi + 1]
        if parsed_area == 0:
            continue
        if parsed_area < cfg.fragment_merge_frac * max(areas[oi], 1):
            # reference "merges" the fragment into the earlier max-overlap
            # mask but appends upfront-parsed masks — the net output effect
            # is the fragment is dropped when such a mask exists
            # (composite_and_parse_masks :59-87)
            if any(overlap_np[oi, j] and keep_cover[j] for j in range(oi)):
                continue
        keep_labels.append(oi + 1)
        final_info.append({"bbox": sorted_boxes[oi],
                           "original_indices": [order[oi]]})
    if not keep_labels:
        return jnp.zeros((0, h, w), bool), sorted_boxes, []
    labels_arr = jnp.asarray(np.asarray(keep_labels, np.int32))
    parsed = labels_arr[:, None, None] == composite[None]
    cleaned = jax.vmap(clean_delicate)(parsed)
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
    closed = M.morph_close(unlabeled, M.disk_kernel(3))
    large = large_component_mask(closed, 50) & unlabeled

    idx = jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None]
    dil3 = M.binary_dilate(masks, M.disk_kernel(3))
    near_large = (dil3 & large[None]).any(axis=(1, 2))
    dil2 = M.binary_dilate(masks, M.disk_kernel(2))
    dil = jnp.where(near_large[:, None, None], dil3, dil2)
    claim = dil & unlabeled[None]
    marker_map = jnp.max(jnp.where(masks | claim, idx, 0), axis=0)

    dist = chamfer_distance(~unlabeled, iters=64)
    dist = jnp.where(large, dist * 3.0, dist)
    g = ink.astype(jnp.float32)
    gx = jnp.abs(jnp.roll(g, 1, 1) - jnp.roll(g, -1, 1))
    gy = jnp.abs(jnp.roll(g, 1, 0) - jnp.roll(g, -1, 0))
    grad = jnp.sqrt(gx * gx + gy * gy)
    grad = jnp.where(large, grad * 0.01, grad * 0.1)
    cost = -dist + grad
    cost = cost - cost.min()
    labels = label_flood(marker_map, cost, ink, iters=iters)
    return jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None] == labels[None]


@jax.jit
def _mask_bboxes_and_iou(masks: jax.Array, boxes: jax.Array):
    """Mask bounding boxes + IoU matrix vs input boxes, on device."""
    n, h, w = masks.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    big = jnp.int32(1 << 30)
    x1 = jnp.min(jnp.where(masks, xs, big), axis=(1, 2))
    y1 = jnp.min(jnp.where(masks, ys, big), axis=(1, 2))
    x2 = jnp.max(jnp.where(masks, xs, -1), axis=(1, 2))
    y2 = jnp.max(jnp.where(masks, ys, -1), axis=(1, 2))
    valid = masks.any(axis=(1, 2))
    mb = jnp.stack([x1, y1, x2, y2], -1).astype(jnp.float32)
    bb = boxes.astype(jnp.float32)
    ix1 = jnp.maximum(bb[:, None, 0], mb[None, :, 0])
    iy1 = jnp.maximum(bb[:, None, 1], mb[None, :, 1])
    ix2 = jnp.minimum(bb[:, None, 2], mb[None, :, 2])
    iy2 = jnp.minimum(bb[:, None, 3], mb[None, :, 3])
    inter = jnp.where((ix2 >= ix1) & (iy2 >= iy1),
                      (ix2 - ix1) * (iy2 - iy1), 0.0)
    a1 = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
    a2 = (mb[:, 2] - mb[:, 0]) * (mb[:, 3] - mb[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    return jnp.where(valid[None, :], iou, 0.0)


def match_masks_to_boxes_iou(iou: np.ndarray) -> dict:
    """Greedy IoU matching (refiner :199-225), host-side on the tiny matrix."""
    box_to_mask = {}
    iou = iou.copy()
    while iou.size and iou.max() > 0:
        bi, mi = np.unravel_index(np.argmax(iou), iou.shape)
        box_to_mask[int(bi)] = int(mi)
        iou[bi, :] = 0
        iou[:, mi] = 0
    return box_to_mask


@jax.jit
def _greedy_match_device(iou: jax.Array) -> jax.Array:
    """Device greedy IoU matching: same semantics as
    match_masks_to_boxes_iou (global argmax, clear row+col, stop at 0) but
    with no host round-trip — the tiny sequential loop is far cheaper than
    the ~35ms tunnel RTT the readback costs.  Returns (M,) int32
    mask-of-box, -1 where unmatched."""
    m, n = iou.shape
    iou = iou.astype(jnp.float32)

    def body(_, state):
        cur, mob = state
        flat = jnp.argmax(cur)
        bi = (flat // n).astype(jnp.int32)
        mi = (flat % n).astype(jnp.int32)
        do = cur.reshape(-1)[flat] > 0
        mob = jnp.where(do, mob.at[bi].set(mi), mob)
        cleared = jnp.where(
            (jnp.arange(m)[:, None] == bi) | (jnp.arange(n)[None, :] == mi),
            0.0, cur)
        return jnp.where(do, cleared, cur), mob

    _, mob = jax.lax.fori_loop(
        0, min(m, n), body, (iou, jnp.full((m,), -1, jnp.int32)))
    return mob


@functools.partial(jax.jit, static_argnames=("downsample", "iters"))
def _bbox_assign(masks: jax.Array, boxes: jax.Array, mask_of_box: jax.Array,
                 ink: jax.Array, downsample: int = 4, iters: int = 96):
    """Assign unlabeled ink pixels to the nearest matched mask among the
    boxes containing them (refine_masks_with_boxes), fully on device.

    mask_of_box: (M,) int32, index of the mask matched to each box (-1 if
    unmatched)."""
    n, h, w = masks.shape
    m = boxes.shape[0]
    combined = masks.any(axis=0)
    unlabeled = ink & ~combined

    small = masks[:, ::downsample, ::downsample]
    dists = masked_nearest_distance(small, iters=iters)  # (N, h/d, w/d)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    dist_full = dists[:, ys // downsample, xs // downsample]  # (N, H, W)

    bb = boxes.astype(jnp.float32)
    inside = ((bb[:, None, None, 0] <= xs[None]) & (xs[None] <= bb[:, None, None, 2])
              & (bb[:, None, None, 1] <= ys[None]) & (ys[None] <= bb[:, None, None, 3]))
    matched = mask_of_box >= 0
    safe_idx = jnp.maximum(mask_of_box, 0)
    box_dist = dist_full[safe_idx]  # (M, H, W)
    box_dist = jnp.where(inside & matched[:, None, None], box_dist, jnp.inf)
    best_box = jnp.argmin(box_dist, axis=0)  # (H, W)
    has = jnp.isfinite(jnp.min(box_dist, axis=0)) & unlabeled
    assign_mask_idx = safe_idx[best_box]  # (H, W)
    add = (jnp.arange(n)[:, None, None] == assign_mask_idx[None]) & has[None]
    return masks | add


def refine_with_boxes(masks, boxes, sketch_gray: np.ndarray,
                      cfg: RefineConfig = RefineConfig(),
                      downsample: int = 4):
    """Device orchestration of refine_masks_with_boxes — fully on device
    (greedy matching included), zero host round-trips."""
    masks = jnp.asarray(masks)
    if masks.shape[0] == 0 or len(boxes) == 0:
        return masks
    ink = jnp.asarray(sketch_gray <= cfg.ink_threshold)
    boxes_d = jnp.asarray(np.asarray(boxes, np.float32))
    iou = _mask_bboxes_and_iou(masks, boxes_d)
    mask_of_box = _greedy_match_device(iou)  # -1 rows no-op in the assign
    return _bbox_assign(masks, boxes_d, mask_of_box, ink,
                        downsample=downsample)


def _unlabeled_extra(masks, sketch_gray: np.ndarray,
                     cfg: RefineConfig = RefineConfig()):
    """Leftover ink -> MORPH_OPEN(3) -> dilate (create_unlabeled_mask
    :301-336).  Returns ((H, W) bool device mask, device scalar
    has-any-pixels flag) — no host sync."""
    masks = jnp.asarray(masks)
    ink = jnp.asarray(sketch_gray < cfg.ink_threshold)
    combined = masks.any(axis=0) if masks.shape[0] else jnp.zeros_like(ink)
    unlabeled = ink & ~combined
    opened = M.morph_open(unlabeled, M.rect_kernel(3))
    dilated = M.binary_dilate(opened, M.rect_kernel(3))
    return dilated, dilated.any()


def add_unlabeled_mask(masks, sketch_gray: np.ndarray,
                       cfg: RefineConfig = RefineConfig()):
    """Leftover ink extra mask appended when non-empty. Returns a device
    array (syncs on the emptiness flag; the pipeline uses the deferred
    variant below instead)."""
    masks = jnp.asarray(masks)
    dilated, has = _unlabeled_extra(masks, sketch_gray, cfg)
    if not bool(has):
        return masks
    return jnp.concatenate([masks, dilated[None]], axis=0)


def improve_masks(masks, boxes, sketch_gray: np.ndarray,
                  cfg: RefineConfig = RefineConfig()):
    """watershed expand -> bbox assignment -> unlabeled extra mask
    (improve_sam_masks :339-370).  Device in/out."""
    stack, has_extra = improve_masks_deferred(masks, boxes, sketch_gray, cfg)
    if not bool(has_extra):
        return stack[:-1]
    return stack


def improve_masks_deferred(masks, boxes, sketch_gray: np.ndarray,
                           cfg: RefineConfig = RefineConfig()):
    """improve_masks with the unlabeled-extra-mask emptiness check DEFERRED:
    returns (stack WITH the candidate extra mask appended, device scalar
    flag).  The caller folds the flag into its next batched readback and
    drops the trailing mask when False — removing a dedicated ~35ms tunnel
    round-trip from the critical path."""
    masks = jnp.asarray(masks)
    if masks.shape[0] == 0:
        dilated, has = _unlabeled_extra(masks, sketch_gray, cfg)
        return dilated[None], has
    ink = jnp.asarray(~(sketch_gray > cfg.ink_threshold))
    ws = watershed_expand(masks, ink, iters=cfg.watershed_iters)
    bboxed = refine_with_boxes(ws, boxes, sketch_gray, cfg)
    dilated, has = _unlabeled_extra(bboxed, sketch_gray, cfg)
    return jnp.concatenate([bboxed, dilated[None]], axis=0), has
