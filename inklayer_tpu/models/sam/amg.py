"""Automatic mask generation (point-grid SAM), TPU-native.

Parity target: segment-anything ``automatic_mask_generator.py:35-372`` +
``utils/amg.py``: regular point grid -> batched multimask decoding ->
pred-IoU filter -> stability-score filter (IoU between +/- offset
thresholdings of the logits) -> box NMS dedup -> optional small-region
removal; outputs the same record schema (segmentation, area, bbox,
predicted_iou, point_coords, stability_score).

TPU redesign: all points decode in fixed-size batches through the jitted
mask decoder; stability scores and box extraction are computed on device
from the low-res logits; only the final NMS over the small surviving set is
host-side.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.config import SamConfig
from inklayer_tpu.models.sam.sam import Sam, SamPredictor


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) normalized xy points at cell centers (utils/amg.py)."""
    offset = 1.0 / (2 * n_per_side)
    coords = np.linspace(offset, 1.0 - offset, n_per_side)
    gx, gy = np.meshgrid(coords, coords)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


@jax.jit
def stability_score(logits: jax.Array, mask_threshold: float = 0.0,
                    offset: float = 1.0) -> jax.Array:
    """(..., H, W) logits -> stability = |logits > t+o| / |logits > t-o|."""
    hi = (logits > mask_threshold + offset).sum(axis=(-2, -1))
    lo = (logits > mask_threshold - offset).sum(axis=(-2, -1))
    return hi / jnp.maximum(lo, 1)


@jax.jit
def mask_boxes(masks: jax.Array) -> jax.Array:
    """(N, H, W) bool -> (N, 4) xyxy boxes (0-size for empty masks)."""
    n, h, w = masks.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    big = jnp.int32(1 << 30)
    x1 = jnp.min(jnp.where(masks, xs, big), axis=(1, 2))
    y1 = jnp.min(jnp.where(masks, ys, big), axis=(1, 2))
    x2 = jnp.max(jnp.where(masks, xs, -1), axis=(1, 2))
    y2 = jnp.max(jnp.where(masks, ys, -1), axis=(1, 2))
    empty = ~masks.any(axis=(1, 2))
    zeros = jnp.zeros_like(x1)
    return jnp.stack([jnp.where(empty, zeros, x1), jnp.where(empty, zeros, y1),
                      jnp.where(empty, zeros, x2 + 1),
                      jnp.where(empty, zeros, y2 + 1)], axis=-1)


def box_nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float
            ) -> np.ndarray:
    """Greedy box NMS, returns kept indices."""
    order = np.argsort(-scores)
    keep = []
    areas = (boxes[:, 2] - boxes[:, 0]).clip(0) * (boxes[:, 3] - boxes[:, 1]).clip(0)
    while len(order):
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = (x2 - x1).clip(0) * (y2 - y1).clip(0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep)


def mask_to_rle(mask: np.ndarray) -> Dict:
    """Uncompressed column-major RLE (utils/amg.py mask_to_rle_pytorch)."""
    h, w = mask.shape
    flat = mask.T.reshape(-1)
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [len(flat)]])
    counts = np.diff(idx).tolist()
    if flat[0]:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def rle_to_mask(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in rle["counts"]:
        flat[pos: pos + c] = val
        pos += c
        val = not val
    return flat.reshape(w, h).T


class SamAutomaticMaskGenerator:
    def __init__(self, predictor: SamPredictor, points_per_side: int = 32,
                 points_per_batch: int = 64, pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7, min_mask_region_area: int = 0):
        self.predictor = predictor
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_region_area = min_mask_region_area
        model = predictor.model

        @jax.jit
        def decode_points(params, embedding, points):
            """points: (B, 2) model-space xy -> multimask logits + iou +
            stability, all at low res."""
            bp = points.shape[0]
            # reference predict_torch appends a (0,0)/-1 "not a point" pad
            # token when no box prompt is given (prompt_encoder.py:81-85)
            pts = jnp.concatenate(
                [points[:, None, :], jnp.zeros((bp, 1, 2), points.dtype)], 1)
            labels = jnp.concatenate(
                [jnp.ones((bp, 1), jnp.int32),
                 jnp.full((bp, 1), -1, jnp.int32)], 1)
            sparse, dense = model.apply(
                params, points=(pts, labels),
                method=lambda m, **kw: m.prompt_encoder(**kw))
            image_pe = model.apply(
                params, method=lambda m: m.prompt_encoder.get_dense_pe())
            emb = jnp.broadcast_to(embedding,
                                   (points.shape[0],) + embedding.shape[1:])
            logits, iou = model.apply(
                params, emb.astype(sparse.dtype), image_pe, sparse, dense,
                True, method=lambda m, *a: m.mask_decoder(*a))
            stab = stability_score(logits.astype(jnp.float32),
                                   offset=self.stability_score_offset)
            return logits, iou, stab

        self._decode_points = decode_points

    def generate(self, image: np.ndarray) -> List[Dict]:
        pred = self.predictor
        pred.set_image(image)
        h, w = image.shape[:2]
        grid = build_point_grid(self.points_per_side)
        pts_model = grid * np.asarray([[w, h]]) * pred._scale  # model space

        records = []
        for start in range(0, len(pts_model), self.points_per_batch):
            batch = pts_model[start: start + self.points_per_batch]
            pad = self.points_per_batch - len(batch)
            pts = np.pad(batch, ((0, pad), (0, 0)))
            logits, iou, stab = self._decode_points(
                pred.params, pred._embedding, jnp.asarray(pts, jnp.float32))
            logits = np.asarray(logits.astype(jnp.float32))[: len(batch)]
            iou = np.asarray(iou)[: len(batch)]
            stab = np.asarray(stab)[: len(batch)]
            for pi in range(len(batch)):
                for mi in range(logits.shape[1]):
                    if iou[pi, mi] < self.pred_iou_thresh:
                        continue
                    if stab[pi, mi] < self.stability_score_thresh:
                        continue
                    records.append({
                        "low_res_logits": logits[pi, mi],
                        "predicted_iou": float(iou[pi, mi]),
                        "stability_score": float(stab[pi, mi]),
                        "point_coords": [
                            (grid[start + pi] * [w, h]).tolist()],
                    })
        if not records:
            return []

        # upsample surviving masks to full res and dedup with box NMS
        masks = np.stack([
            np.asarray(pred._postprocess(
                jnp.asarray(r.pop("low_res_logits"))[None]))[0] > 0
            for r in records])
        boxes = np.asarray(mask_boxes(jnp.asarray(masks)))
        scores = np.asarray([r["predicted_iou"] for r in records])
        keep = box_nms(boxes.astype(np.float64), scores, self.box_nms_thresh)
        out = []
        for i in keep:
            m = masks[i]
            if self.min_mask_region_area and m.sum() < self.min_mask_region_area:
                continue
            rec = records[i]
            out.append({
                "segmentation": m,
                "rle": mask_to_rle(m),
                "area": int(m.sum()),
                "bbox": boxes[i].tolist(),
                "predicted_iou": rec["predicted_iou"],
                "stability_score": rec["stability_score"],
                "point_coords": rec["point_coords"],
            })
        return out
