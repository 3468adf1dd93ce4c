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


def color_sketch_by_label_map(
    sketch_rgb: np.ndarray,  # (H, W, 3) uint8 (or (H, W) gray)
    label_map: np.ndarray,  # (H, W) integer; 0 = no mask, i+1 = masks[i]
    n_masks: int,
    colors: Optional[Sequence[Tuple[int, int, int]]] = None,
    enhance_factor: float = 1.5,
    min_opacity: float = 0.2,
) -> np.ndarray:
    """color_sketch_by_masks for DISJOINT masks given as a label map.

    Bit-identical output (tests/test_classic_ops.py), ~10x less host CPU:
    every per-pixel quantity (stroke test, opacity enhancement, blend)
    depends only on the 8-bit gray value and the mask label, so the whole
    computation collapses into one (n_masks+1, 256, 3) table indexed by
    (label, gray) — replacing the full-image pow/where/maximum passes that
    made colorize the sweep's second-largest host-CPU item
    (scripts/analyze_sweep_stalls4.py: 36.6 ms/img of 223)."""
    if colors is None:
        colors = generate_pastel_colors(n_masks)
    if sketch_rgb.ndim != 3:
        gray = sketch_rgb
    elif (np.array_equal(sketch_rgb[..., 0], sketch_rgb[..., 1])
          and np.array_equal(sketch_rgb[..., 0], sketch_rgb[..., 2])):
        # grayscale-in-RGB (typical sketches): round(.299v+.587v+.114v) == v
        # for all uint8 v, so the float64 luminance pass is skippable
        gray = sketch_rgb[..., 0]
    else:
        gray = np.asarray(
            0.299 * sketch_rgb[..., 0] + 0.587 * sketch_rgb[..., 1]
            + 0.114 * sketch_rgb[..., 2]).round().astype(np.uint8)
    g = np.arange(256, dtype=np.float64)
    raw = (255.0 - g) / 255.0
    stroke_g = g < 250

    # the global enhancement branch looks at the image's stroke pixels:
    # max stroke opacity > 0.1  <=>  min stroke gray value < 229.5
    smask = gray < 250
    if smask.any():
        if (255.0 - float(gray[smask].min())) / 255.0 > 0.1:
            enh = np.power(raw, 1.0 / enhance_factor)
            enh = np.where(stroke_g & (raw > 0.02),
                           np.maximum(enh, min_opacity), enh)
        else:
            enh = np.where(stroke_g, np.maximum(raw * 3, min_opacity), raw)
    else:
        enh = raw

    pal = np.zeros((n_masks + 1, 3), np.float32)  # label 0: bg stroke, black
    for i in range(n_masks):
        pal[i + 1] = np.asarray(colors[i], np.float32)
    a = enh[None, :, None]  # (1, 256, 1) float64
    # float64 blend -> float32 store -> uint8 truncation, matching
    # color_sketch_by_masks' out[m] = ... / out.astype(uint8) exactly
    table = (pal[:, None, :] * a + 255.0 * (1 - a)).astype(np.float32)
    tab_u8 = table.astype(np.uint8)
    tab_u8[:, ~stroke_g, :] = 255  # non-stroke pixels stay white
    lab = np.asarray(label_map)
    if lab.max(initial=0) > n_masks:  # defensively drop out-of-range labels
        lab = np.where(lab > n_masks, 0, lab)
    return tab_u8[lab, gray]
