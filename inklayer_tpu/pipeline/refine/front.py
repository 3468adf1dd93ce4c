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
