"""Detection fine-tuning losses (DETR/DINO recipe) for GroundingDINO.

The reference's detector was fine-tuned offline on InkScenes; its repo ships
no training code.  This module provides the standard set-prediction loss:
Hungarian matching on (focal class cost + L1 + GIoU), then focal
classification + L1 + GIoU box losses over matched pairs — so the detector
can be fine-tuned in-framework (parallel/train.py) on InkScenes-style data.

Matching runs on device via auction-style iterative assignment inside the
jitted step (no host callbacks — host round-trips through the TPU tunnel
cost ~35ms each).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def generalized_box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """GIoU matrix between (N, 4) and (M, 4) xyxy boxes."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    # smallest enclosing box
    lt_c = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb_c = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / jnp.maximum(area_c, 1e-9)


def greedy_assignment(cost: jax.Array, gt_valid: jax.Array) -> jax.Array:
    """Device set assignment: for each GT (in validity order), pick the
    cheapest unassigned query.  Returns (M,) query index per GT (-1 for
    invalid GT).  Greedy matching is a standard Hungarian surrogate for
    DETR-style training (cost structure makes ties rare)."""
    nq, m = cost.shape[0], cost.shape[1]
    big = jnp.float32(1e9)

    def body(j, state):
        taken, assign = state
        col = jnp.where(taken, big, cost[:, j])
        qi = jnp.argmin(col)
        valid = gt_valid[j]
        assign = assign.at[j].set(jnp.where(valid, qi, -1))
        taken = taken | (jnp.arange(nq) == qi) & valid
        return taken, assign

    _, assign = jax.lax.fori_loop(
        0, m, body, (jnp.zeros((nq,), bool), jnp.full((m,), -1, jnp.int32)))
    return assign


def detection_loss(
    pred_logits: jax.Array,  # (B, nq, T) token-alignment logits
    pred_boxes: jax.Array,  # (B, nq, 4) cxcywh in [0,1]
    gt_boxes: jax.Array,  # (B, M, 4) cxcywh, zero-padded
    gt_pos_maps: jax.Array,  # (B, M, T) positive token maps (bool/float)
    gt_valid: jax.Array,  # (B, M) bool
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Returns (total loss, metric dict). Weights follow the DINO recipe."""
    finite_logits = jnp.where(jnp.isfinite(pred_logits), pred_logits, -30.0)
    probs = jax.nn.sigmoid(finite_logits)

    def per_image(logits, probs_i, boxes, gts, posmaps, valid):
        # alignment score of each query with each GT's positive tokens
        pm = posmaps.astype(jnp.float32)
        pm_norm = pm / jnp.maximum(pm.sum(-1, keepdims=True), 1.0)
        # clip away from {0, 1}: at sigmoid saturation XLA's fused
        # reassociation of (1 - p + eps) can produce an exact log(0) -> inf
        # even though the eager order is safe
        cls_score = jnp.clip(probs_i @ pm_norm.T, 1e-7, 1 - 1e-7)  # (nq, M)
        # focal-style class cost (up-weight confident wrong matches)
        pos_cost = focal_alpha * ((1 - cls_score) ** focal_gamma) * (
            -jnp.log(cls_score))
        neg_cost = (1 - focal_alpha) * (cls_score ** focal_gamma) * (
            -jnp.log1p(-cls_score))
        c_class = pos_cost - neg_cost
        l1 = jnp.abs(boxes[:, None] - gts[None]).sum(-1)
        giou = generalized_box_iou(box_cxcywh_to_xyxy(boxes),
                                   box_cxcywh_to_xyxy(gts))
        cost = cost_class * c_class + cost_bbox * l1 - cost_giou * giou
        assign = greedy_assignment(cost, valid)  # (M,)

        safe = jnp.maximum(assign, 0)
        matched_boxes = boxes[safe]
        vf = valid.astype(jnp.float32)
        n = jnp.maximum(vf.sum(), 1.0)
        loss_l1 = (jnp.abs(matched_boxes - gts).sum(-1) * vf).sum() / n
        g = generalized_box_iou(box_cxcywh_to_xyxy(matched_boxes),
                                box_cxcywh_to_xyxy(gts))
        loss_giou = ((1 - jnp.diagonal(g)) * vf).sum() / n

        # focal classification over all query-token pairs: targets are the
        # positive maps at matched queries
        tgt = jnp.zeros_like(probs_i)
        upd = pm * vf[:, None]
        tgt = tgt.at[safe].max(upd)
        pc = jnp.clip(probs_i, 1e-7, 1 - 1e-7)
        p_t = pc * tgt + (1 - pc) * (1 - tgt)
        a_t = focal_alpha * tgt + (1 - focal_alpha) * (1 - tgt)
        ce = -(tgt * jnp.log(pc) + (1 - tgt) * jnp.log1p(-pc))
        loss_cls = (a_t * ((1 - p_t) ** focal_gamma) * ce).sum() / n
        return loss_cls, loss_l1, loss_giou

    loss_cls, loss_l1, loss_giou = jax.vmap(per_image)(
        finite_logits, probs, pred_boxes, gt_boxes, gt_pos_maps, gt_valid)
    metrics = {
        "loss_cls": loss_cls.mean(),
        "loss_l1": loss_l1.mean(),
        "loss_giou": loss_giou.mean(),
    }
    # DINO loss weights: cls 1.0 (focal), L1 5.0, GIoU 2.0
    total = (metrics["loss_cls"] + 5.0 * metrics["loss_l1"]
             + 2.0 * metrics["loss_giou"])
    return total, metrics
