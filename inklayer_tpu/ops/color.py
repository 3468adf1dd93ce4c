"""Sketch colorization + pastel palette.

Vectorised re-implementation of utils/visualization.py: the reference's
``color_sketch_by_masks`` runs per-pixel Python loops (:139-165, its slowest
CPU hotspot); here the identical math is pure array ops (device or numpy).
"""

from __future__ import annotations

import colorsys
from typing import List, Optional, Sequence, Tuple

import numpy as np


def generate_pastel_colors(n_colors: int) -> List[Tuple[int, int, int]]:
    """Evenly spaced hues, interleaved for contrast, S=0.7 V=0.88
    (visualization.py:30-60)."""
    hues = [x / n_colors for x in range(n_colors)]
    result: List[float] = []
    queue = [hues]
    while queue:
        current = queue.pop(0)
        if len(current) <= 1:
            result += current
        else:
            queue.append(current[::2])
            queue.append(current[1::2])
    colors = [colorsys.hsv_to_rgb(h, 0.7, 0.88) for h in result]
    return [(int(r * 255), int(g * 255), int(b * 255)) for r, g, b in colors]


def color_sketch_by_masks(
    sketch_rgb: np.ndarray,  # (H, W, 3) uint8
    masks: Sequence[np.ndarray],  # list of (H, W) bool
    colors: Optional[Sequence[Tuple[int, int, int]]] = None,
    enhance_factor: float = 1.5,
    min_opacity: float = 0.2,
) -> np.ndarray:
    """Stroke pixels take their mask's pastel color weighted by enhanced
    stroke opacity; unmasked strokes stay black-on-white.  Exact math of
    visualization.py:63-167, vectorised."""
    if colors is None:
        colors = generate_pastel_colors(len(masks))
    gray = np.asarray(
        0.299 * sketch_rgb[..., 0] + 0.587 * sketch_rgb[..., 1]
        + 0.114 * sketch_rgb[..., 2]).round().astype(np.uint8) \
        if sketch_rgb.ndim == 3 else sketch_rgb
    h, w = gray.shape
    out = np.full((h, w, 3), 255.0, np.float32)
    stroke = gray < 250
    raw_opacity = (255.0 - gray) / 255.0

    stroke_vals = raw_opacity[stroke]
    if stroke_vals.size > 0 and stroke_vals.max() > 0.1:
        enhanced = np.power(raw_opacity, 1.0 / enhance_factor)
        enhanced = np.where(stroke & (raw_opacity > 0.02),
                            np.maximum(enhanced, min_opacity), enhanced)
    elif stroke_vals.size > 0:
        enhanced = np.where(stroke, np.maximum(raw_opacity * 3, min_opacity),
                            raw_opacity)
    else:
        enhanced = raw_opacity

    covered = np.zeros((h, w), bool)
    for i, mask in enumerate(masks):
        m = stroke & np.asarray(mask, bool)
        covered |= np.asarray(mask, bool)
        a = enhanced[m][:, None]
        out[m] = np.asarray(colors[i], np.float32) * a + 255.0 * (1 - a)
    # background strokes (not in any mask): black blended on white
    bg = stroke & ~covered
    a = enhanced[bg][:, None]
    out[bg] = 255.0 * (1 - a)
    return out.astype(np.uint8)
