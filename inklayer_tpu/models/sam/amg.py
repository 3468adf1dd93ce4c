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


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    """Per-crop-layer point grids (utils/amg.py build_all_layer_point_grids:
    layer i uses n_per_side / scale^i points per side)."""
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size, n_layers: int, overlap_ratio: float):
    """Crop pyramid: layer 0 = whole image, layer i has (2^i)^2 overlapping
    xyxy crops (utils/amg.py generate_crop_boxes:200-234, same arithmetic)."""
    import math
    from itertools import product

    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes, layer_idxs = [[0, 0, im_w, im_h]], [0]

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_side))
        cw = crop_len(im_w, n_side, overlap)
        ch = crop_len(im_h, n_side, overlap)
        xs = [int((cw - overlap) * i) for i in range(n_side)]
        ys = [int((ch - overlap) * i) for i in range(n_side)]
        for x0, y0 in product(xs, ys):
            crop_boxes.append([x0, y0, min(x0 + cw, im_w),
                               min(y0 + ch, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def is_box_near_crop_edge(boxes: np.ndarray, crop_box, orig_box,
                          atol: float = 20.0) -> np.ndarray:
    """True for boxes near their crop's edge but not the image edge
    (utils/amg.py:78-88); boxes are in the CROP frame."""
    crop = np.asarray(crop_box, np.float64)
    orig = np.asarray(orig_box, np.float64)
    b = boxes.astype(np.float64) + np.asarray(
        [crop_box[0], crop_box[1], crop_box[0], crop_box[1]], np.float64)
    near_crop = np.isclose(b, crop[None, :], atol=atol, rtol=0)
    near_image = np.isclose(b, orig[None, :], atol=atol, rtol=0)
    return np.any(near_crop & ~near_image, axis=1)


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
                 box_nms_thresh: float = 0.7, min_mask_region_area: int = 0,
                 crop_n_layers: int = 0, crop_nms_thresh: float = 0.7,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_n_points_downscale_factor: int = 1):
        self.predictor = predictor
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_region_area = min_mask_region_area
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.crop_n_points_downscale_factor = crop_n_points_downscale_factor
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

    def _process_crop(self, image: np.ndarray, crop_box, grid: np.ndarray,
                      orig_size) -> Dict[str, np.ndarray]:
        """One crop: decode its point grid at low res, filter, upsample the
        survivors on device, box/edge-filter, per-crop NMS, uncrop.
        Mask readbacks ride the bit-packed transfer (ops/bits.py)."""
        from inklayer_tpu.ops.bits import masks_to_host

        pred = self.predictor
        oh, ow = orig_size
        x0, y0, x1, y1 = crop_box
        cropped = image[y0:y1, x0:x1]
        pred.set_image(cropped)
        ch, cw = cropped.shape[:2]
        pts_model = grid * np.asarray([[cw, ch]]) * pred._scale  # model space

        survivors: List[Dict] = []
        lowres: List[np.ndarray] = []
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
                    lowres.append(logits[pi, mi])
                    survivors.append({
                        "predicted_iou": float(iou[pi, mi]),
                        "stability_score": float(stab[pi, mi]),
                        # points reported in the ORIGINAL frame (uncropped,
                        # automatic_mask_generator.py:262 uncrop_points)
                        "point_coords": [
                            (grid[start + pi] * [cw, ch]
                             + [x0, y0]).tolist()],
                    })
        empty = dict(masks=np.zeros((0, oh, ow), bool),
                     boxes=np.zeros((0, 4), np.float64),
                     iou=np.zeros((0,)), recs=[])
        if not survivors:
            return empty

        # device upsample to crop res + threshold + boxes; packed readback
        masks_c, boxes_l = [], []
        for start in range(0, len(lowres), self.points_per_batch):
            chunk = jnp.asarray(
                np.stack(lowres[start: start + self.points_per_batch]))
            full = pred._postprocess_device(chunk) > 0  # (n, ch, cw) bool
            boxes_l.append(np.asarray(mask_boxes(full)))
            masks_c.append(masks_to_host(full))
        masks_c = np.concatenate(masks_c)
        boxes = np.concatenate(boxes_l).astype(np.float64)

        # drop masks touching the crop edge (but not the image edge)
        keep = ~is_box_near_crop_edge(boxes, crop_box, [0, 0, ow, oh])
        if not keep.all():
            masks_c = masks_c[keep]
            boxes = boxes[keep]
            survivors = [r for r, k in zip(survivors, keep) if k]
        if not len(survivors):
            return empty

        # per-crop dedup (automatic_mask_generator.py:270-276)
        iou_preds = np.asarray([r["predicted_iou"] for r in survivors])
        keep_idx = box_nms(boxes, iou_preds, self.box_nms_thresh)
        masks_c = masks_c[keep_idx]
        boxes = boxes[keep_idx]
        survivors = [survivors[i] for i in keep_idx]

        # return to the original frame
        if (x0, y0, x1, y1) != (0, 0, ow, oh):
            full = np.zeros((len(masks_c), oh, ow), bool)
            full[:, y0:y1, x0:x1] = masks_c
            masks_c = full
            boxes = boxes + np.asarray([x0, y0, x0, y0], np.float64)
        return dict(masks=masks_c, boxes=boxes,
                    iou=np.asarray([r["predicted_iou"] for r in survivors]),
                    recs=survivors)

    def generate(self, image: np.ndarray) -> List[Dict]:
        h, w = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            (h, w), self.crop_n_layers, self.crop_overlap_ratio)
        grids = build_all_layer_point_grids(
            self.points_per_side, self.crop_n_layers,
            self.crop_n_points_downscale_factor)

        parts = [self._process_crop(image, cb, grids[li], (h, w))
                 for cb, li in zip(crop_boxes, layer_idxs)]
        masks = np.concatenate([p["masks"] for p in parts])
        boxes = np.concatenate([p["boxes"] for p in parts])
        recs = [r for p in parts for r in p["recs"]]
        crop_of = np.concatenate([
            np.repeat([cb], len(p["recs"]), axis=0)
            for cb, p in zip(crop_boxes, parts)]) if recs else \
            np.zeros((0, 4))
        if not recs:
            return []

        if len(crop_boxes) > 1:
            # cross-crop dedup preferring masks from smaller crops
            # (automatic_mask_generator.py:210-220: scores = 1/crop_area)
            areas = ((crop_of[:, 2] - crop_of[:, 0])
                     * (crop_of[:, 3] - crop_of[:, 1])).astype(np.float64)
            keep = box_nms(boxes, 1.0 / areas, self.crop_nms_thresh)
            masks, boxes = masks[keep], boxes[keep]
            recs = [recs[i] for i in keep]
            crop_of = crop_of[keep]

        out = []
        for i, rec in enumerate(recs):
            m = masks[i]
            if self.min_mask_region_area and m.sum() < self.min_mask_region_area:
                continue
            cb = crop_of[i]
            out.append({
                "segmentation": m,
                "rle": mask_to_rle(m),
                "area": int(m.sum()),
                # XYWH like the reference records (utils/amg.py
                # box_xyxy_to_xywh); xyxy under "bbox_xyxy" for convenience
                "bbox": [boxes[i][0], boxes[i][1],
                         boxes[i][2] - boxes[i][0],
                         boxes[i][3] - boxes[i][1]],
                "bbox_xyxy": boxes[i].tolist(),
                "crop_box": [float(cb[0]), float(cb[1]),
                             float(cb[2] - cb[0]), float(cb[3] - cb[1])],
                "predicted_iou": rec["predicted_iou"],
                "stability_score": rec["stability_score"],
                "point_coords": rec["point_coords"],
            })
        return out
