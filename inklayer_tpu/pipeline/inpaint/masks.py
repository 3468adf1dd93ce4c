"""Object/background silhouette masks and RGBA layer creation.

Parity target: inpainting/fill_object_bg_mask.py —
  * get_mask (:50-114): Otsu strokes -> dilate; if strokes touch a border
    band: strokes + fill fully-enclosed holes (>=50px); else: flood from the
    corner -> silhouette -> largest component -> distance-transform shrink so
    every stroke stays covered -> fill enclosed holes;
  * create_rgba_with_background_mask{_on_dir} (:117-214): RGBA layers where
    ink keeps its grayscale value, the silhouette is white, rest transparent.

Implemented with scipy.ndimage (host-side; these run per-layer a handful of
times per image) — contour hierarchies become connected-component reasoning:
a "hole" is a background component not touching the border.
"""

from __future__ import annotations

import glob
import os
from typing import Tuple

import numpy as np
from PIL import Image
from scipy import ndimage

from inklayer_tpu.ops.morphology import ellipse_kernel


def _otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's method on a uint8 image (cv2.THRESH_OTSU equivalent)."""
    hist = np.bincount(gray.reshape(-1), minlength=256).astype(np.float64)
    total = gray.size
    sum_all = (np.arange(256) * hist).sum()
    sum_b = 0.0
    w_b = 0.0
    best, best_t = -1.0, 0
    for t in range(256):
        w_b += hist[t]
        if w_b == 0:
            continue
        w_f = total - w_b
        if w_f == 0:
            break
        sum_b += t * hist[t]
        m_b = sum_b / w_b
        m_f = (sum_all - sum_b) / w_f
        between = w_b * w_f * (m_b - m_f) ** 2
        if between > best:
            best, best_t = between, t
    return best_t


def _dilate(mask: np.ndarray, k: int, iterations: int = 1) -> np.ndarray:
    se = ellipse_kernel(k).astype(bool)
    out = mask
    for _ in range(iterations):
        out = ndimage.binary_dilation(out, structure=se)
    return out


def _fill_holes(mask: np.ndarray, min_area: int = 0,
                skip_border_touching: bool = False) -> np.ndarray:
    """Fill background components fully enclosed by the mask."""
    bg = ~mask
    labels, n = ndimage.label(bg)
    if n == 0:
        return mask
    h, w = mask.shape
    border_labels = set(np.unique(
        np.concatenate([labels[0], labels[-1], labels[:, 0], labels[:, -1]])))
    areas = np.bincount(labels.reshape(-1))
    out = mask.copy()
    for lbl in range(1, n + 1):
        if lbl in border_labels:
            continue
        if skip_border_touching:
            # cv2 variant checks the hole's bbox against the border too;
            # non-border components by construction don't touch it
            pass
        if areas[lbl] >= min_area:
            out[labels == lbl] = True
    return out


def get_mask(
    sketch_gray: np.ndarray,  # (H, W) uint8, black strokes on white
    dilate_iter: int = 5,
    kernel_size: int = 3,
    safety_margin: int = 0,
    stroke_thick: int = 1,
    border_band: int = 2,
) -> Tuple[np.ndarray, str]:
    """Returns (bool silhouette mask, mask_type string)."""
    inv = 255 - sketch_gray
    t = _otsu_threshold(inv)
    strokes = inv > t

    thick = _dilate(strokes, kernel_size, dilate_iter)
    touches = (thick[:border_band].any() or thick[-border_band:].any()
               or thick[:, :border_band].any() or thick[:, -border_band:].any())
    if touches:
        mask = _dilate(strokes, kernel_size, stroke_thick)
        mask = _fill_holes(mask, min_area=50)
        return mask, "open-curve"

    # flood from corner: outside = background component containing (0, 0)
    labels, _ = ndimage.label(~thick)
    outside = labels == labels[0, 0]
    silhouette = ~outside  # flood-invert | strokes

    # largest connected component of the silhouette
    sl, n = ndimage.label(silhouette)
    if n > 1:
        areas = np.bincount(sl.reshape(-1))
        areas[0] = 0
        silhouette = sl == int(np.argmax(areas))

    # shrink so every stroke pixel stays covered
    dist = ndimage.distance_transform_edt(silhouette)
    stroke_dists = dist[strokes]
    if stroke_dists.size:
        min_pad = int(np.floor(stroke_dists.min()))
        shrink_by = max(0, min_pad - safety_margin)
        if shrink_by > 0:
            silhouette = dist >= shrink_by
    else:
        shrink_by = 0
    silhouette = _fill_holes(silhouette)
    return silhouette, f"closed-silhouette (shrunk by {shrink_by}px)"


def create_rgba_layer(layer_rgb: np.ndarray, **mask_params) -> Tuple[np.ndarray, str]:
    """One complete_layers image -> RGBA: ink keeps grayscale value,
    silhouette white, rest transparent (create_rgba_with_background_mask)."""
    gray = np.asarray(Image.fromarray(layer_rgb).convert("L"))
    h, w = gray.shape
    sketch_pixels = gray < 240
    bg_mask, mask_type = get_mask(gray, **mask_params)
    rgba = np.zeros((h, w, 4), np.uint8)
    alpha = sketch_pixels | bg_mask
    rgba[..., 3] = alpha.astype(np.uint8) * 255
    rgba[bg_mask, :3] = 255
    rgba[sketch_pixels, :3] = gray[sketch_pixels, None]
    return rgba, mask_type


def create_rgba_layers_on_dir(input_dir: str, output_dir: str) -> str:
    os.makedirs(output_dir, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(input_dir, "*.png"))):
        rgb = np.asarray(Image.open(path).convert("RGB"))
        rgba, _ = create_rgba_layer(rgb)
        Image.fromarray(rgba).save(
            os.path.join(output_dir, os.path.basename(path)))
    return output_dir
