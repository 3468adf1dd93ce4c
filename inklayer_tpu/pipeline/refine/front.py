"""Fused NMS + depth-stat device front.

One jit for everything the runner dispatches between mask cleaning and the
single keep/stats readback: kept-mask gather, ink thresholds, ink-IoU
matrix, greedy NMS, stroke sampling, per-mask depth scores and the
major-overlap matrix.  Composing the (already individually jitted) pieces
into one program removes ~6-8 separate eager dispatches per image — each
costs real latency through remote-device transports (the axon tunnel), and
on any backend it lets XLA share the ink planes and fuse the gathers.

Padding contract (capacity C = total cleaned-mask count N, so shapes add
no new compile keys): `sel` carries the NMS-prefilter survivors padded
with zeros, `valid` marks real rows.  Padded rows become all-False masks:
their ink-IoU/overlap rows are zero (never suppress anything), their
depth score is +inf, and the caller slices everything back to the real
count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.config import RefineConfig
from inklayer_tpu.pipeline.refine.depth_sort import (mask_depth_scores,
                                                     major_overlap_matrix,
                                                     sample_stroke_points)
from inklayer_tpu.pipeline.refine.nms import (_greedy_nms_device,
                                              ink_mask_iou_matrix)


@functools.partial(jax.jit, static_argnames=(
    "ink_thr", "cell", "thr_s", "thr_b", "thr_overlap", "bin_width"))
def _front(masks, gray, depth, sel, valid, gate, bbox_ov, order, *,
           ink_thr: int, cell: int, thr_s: float, thr_b: float,
           thr_overlap: float, bin_width: float):
    fm = masks[sel] & valid[:, None, None]
    ink = gray < ink_thr
    iou_s = ink_mask_iou_matrix(fm, ink)
    keep = _greedy_nms_device(iou_s, gate, bbox_ov, order, thr_s, thr_b)
    # sketch_to_01binary threshold (refinement/utils.py:3-9): max/2, float
    ink2 = gray.astype(jnp.float32) <= gray.max().astype(jnp.float32) / 2
    pts, pvalid = sample_stroke_points(ink2, cell)
    dscores = mask_depth_scores(fm, pts, pvalid, depth.astype(jnp.float32),
                                bin_width)
    overlap = major_overlap_matrix(fm & ink2[None], thr=thr_overlap)
    return keep, dscores, overlap


@functools.partial(jax.jit, static_argnames=(
    "hw", "max_area_frac", "max_contained", "eps_per_kdiag", "thresh"))
def _device_prefilter_gates(boxes_cxcywh, scores, gray, *, hw,
                            max_area_frac: float, max_contained: int,
                            eps_per_kdiag: float, thresh: float):
    """Device port of nms_host_prefilter over the FIXED top-K capacity:
    score thresholding (the surviving detections are a score-sorted prefix
    of top-K), filter_full_or_empty_bbox, and the box-only pairwise gates.
    Returns (valid (K,), gate (K,K), gated bbox-IoU (K,K), order (K,)) —
    all device, so the fused NMS front can dispatch WITHOUT waiting for
    the detect readback.  f32 where the host path used f64: the
    cxcywh->xyxy product can round to a different integer part than the
    host's f64 near an exact pixel boundary, flipping a 1-px truncation
    (rare; parity/self-golden tested but not guaranteed byte-identical),
    and the corner-distance eps comparison can differ by ~1e-4 px."""
    h, w = hw
    bx = boxes_cxcywh.astype(jnp.float32)
    half = bx[:, 2:4] / 2
    xyxy = jnp.concatenate(
        [(bx[:, 0:2] - half) * jnp.asarray([w, h], jnp.float32),
         (bx[:, 0:2] + half) * jnp.asarray([w, h], jnp.float32)], axis=1)
    b = jnp.trunc(xyxy)  # host parity: astype(int) truncates
    k = b.shape[0]
    valid_t = scores > thresh

    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    valid_area = areas / (h * w) < max_area_frac
    ii = jnp.pad((gray > 0).astype(jnp.int32), ((1, 0), (1, 0))
                 ).cumsum(0).cumsum(1)
    xs1 = jnp.clip(b[:, 0], 0, w - 1).astype(jnp.int32)
    ys1 = jnp.clip(b[:, 1], 0, h - 1).astype(jnp.int32)
    xs2 = jnp.clip(b[:, 2], 0, w - 1).astype(jnp.int32) + 1
    ys2 = jnp.clip(b[:, 3], 0, h - 1).astype(jnp.int32) + 1
    nz = (ii[ys2, xs2] - ii[ys1, xs2] - ii[ys2, xs1] + ii[ys1, xs1])
    has_content = nz > 0

    # strict containment count — only real (thresholded) boxes count as
    # containment targets, matching the host path's n-box universe
    contains = ((b[:, None, 0] <= b[None, :, 0])
                & (b[:, None, 1] <= b[None, :, 1])
                & (b[:, None, 2] >= b[None, :, 2])
                & (b[:, None, 3] >= b[None, :, 3])
                & ~jnp.eye(k, dtype=bool)) & valid_t[None, :]
    few_contained = contains.sum(axis=1) <= max_contained
    valid = valid_t & valid_area & has_content & few_contained

    # pairwise gates (nms_host_prefilter math)
    x1 = jnp.maximum(b[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(b[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(b[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(b[:, None, 3], b[None, :, 3])
    inter = jnp.where((x2 >= x1) & (y2 >= y1), (x2 - x1) * (y2 - y1), 0.0)
    union = areas[:, None] + areas[None, :] - inter
    iou_bbox = jnp.where(union > 0, inter / union, 0.0)
    eps = jnp.float32(eps_per_kdiag) * (
        jnp.sqrt(jnp.float32(h) ** 2 + jnp.float32(w) ** 2) / 1000.0)
    larger_is_i = areas[:, None] > areas[None, :]
    cont = ((b[:, None, 0] - eps <= b[None, :, 0])
            & (b[:, None, 1] - eps <= b[None, :, 1])
            & (b[:, None, 2] + eps >= b[None, :, 2])
            & (b[:, None, 3] + eps >= b[None, :, 3]))
    corners = jnp.stack([b[:, jnp.asarray([0, 1])], b[:, jnp.asarray([0, 3])],
                         b[:, jnp.asarray([2, 1])], b[:, jnp.asarray([2, 3])]],
                        axis=1)  # (K, 4, 2)
    d = jnp.linalg.norm(
        corners[:, None, :, None, :] - corners[None, :, None, :, :], axis=-1)
    share = (d <= eps).any(axis=(2, 3))
    gate = jnp.where(larger_is_i, cont, cont.T) & share
    gate = gate & valid[:, None] & valid[None, :]
    key = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    order = jnp.argsort(-key).astype(jnp.int32)
    return valid, gate, jnp.where(gate, iou_bbox, 0.0), order


def nms_depth_front_device(boxes_dev, scores_dev, cleaned_dev, gray_dev,
                           depth_dev, hw,
                           cfg: RefineConfig = RefineConfig(),
                           box_threshold: float = 0.2):
    """Detect-readback-free front: prefilter, gates, NMS and depth stats
    all dispatched from device-resident detect outputs (top-K cxcywh boxes
    + scores).  Returns (valid, order, keep, dscores, overlap) device
    arrays over the K capacity — the caller folds them into one
    device_get.  Host kept indices = order[keep & valid[order]]."""
    h = gray_dev.shape[0]
    k = cleaned_dev.shape[0]
    valid, gate, bb_gated, order = _device_prefilter_gates(
        boxes_dev, scores_dev, gray_dev, hw=hw,
        max_area_frac=cfg.nms_max_area_frac,
        max_contained=cfg.nms_max_contained,
        eps_per_kdiag=cfg.nms_eps_px_per_kdiag, thresh=box_threshold)
    cell = max(1, int(round(h * cfg.sample_radius_frac)))
    keep, dscores, overlap = _front(
        cleaned_dev, gray_dev, depth_dev,
        jnp.arange(k, dtype=jnp.int32), valid, gate, bb_gated, order,
        ink_thr=cfg.ink_threshold, cell=cell, thr_s=cfg.nms_iou,
        thr_b=cfg.nms_bbox_iou_kill, thr_overlap=cfg.overlap_major_frac,
        bin_width=cfg.depth_bin)
    return valid, order, keep, dscores, overlap


def nms_depth_front(kept0, gate, iou_bbox, order, masks_dev, gray_dev,
                    depth_dev, cfg: RefineConfig = RefineConfig()):
    """Dispatch the fused front; returns (keep_dev, dscores_dev,
    doverlap_dev) for the C=N padded space with NO readback — the caller
    batches them into one jax.device_get and slices rows [:len(kept0)]."""
    n = masks_dev.shape[0]
    h = gray_dev.shape[0]
    k = len(kept0)
    sel = np.zeros((n,), np.int32)
    sel[:k] = kept0
    valid = np.zeros((n,), bool)
    valid[:k] = True
    gate_p = np.zeros((n, n), bool)
    gate_p[:k, :k] = gate
    bb_p = np.zeros((n, n), np.float32)
    bb_p[:k, :k] = np.where(gate, iou_bbox, 0.0)
    order_p = np.concatenate([np.asarray(order), np.arange(k, n)]
                             ).astype(np.int32)
    cell = max(1, int(round(h * cfg.sample_radius_frac)))
    return _front(
        masks_dev, gray_dev, depth_dev, jnp.asarray(sel),
        jnp.asarray(valid), jnp.asarray(gate_p), jnp.asarray(bb_p),
        jnp.asarray(order_p), ink_thr=cfg.ink_threshold, cell=cell,
        thr_s=cfg.nms_iou, thr_b=cfg.nms_bbox_iou_kill,
        thr_overlap=cfg.overlap_major_frac, bin_width=cfg.depth_bin)
