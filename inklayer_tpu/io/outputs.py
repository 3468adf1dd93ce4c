"""Output-directory writers reproducing the reference's per-image layout.

Canonical layout (runner.py:21-103, SURVEY.md §1): input.png, bboxes.json,
bboxes.png, masks/, segmented_sketch.png, masks_cleaned/, bboxes_final.json,
bboxes_final.png, masks_disjoint/, depth_map.png, masks_final/,
segmented_sketch_final.png (+ inpainting dirs with --inpaint).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from inklayer_tpu.ops.color import generate_pastel_colors

KEEP_LIST = [
    "masks_final", "complete_layers", "complete_layers_rgba",
    "bboxes_final.json", "bboxes_final.png", "segmented_sketch_final.png",
    "depth_map.png", "input.png",
]


def save_input_png(dst: str, src_path: str, image: np.ndarray) -> None:
    """Write the out-dir input.png.  When the source already IS a PNG the
    bytes are copied verbatim (the image is passed through unmodified, so
    a byte copy is strictly more faithful than decode+re-encode and costs
    ~0 host CPU — PNG re-encode of a 750² sketch was ~8 ms of the
    host-CPU-bound sweep budget).  Non-PNG sources fall back to encoding
    the decoded pixels."""
    if src_path.lower().endswith(".png") and os.path.isfile(src_path):
        shutil.copyfile(src_path, dst)
        return
    save_png(dst, image)


def save_png(path: str, arr, level: int = 1) -> None:
    """PNG write through the native filter-None encoder (native.png_encode,
    ~2.3x less host CPU than PIL's adaptive-filter path on 750^2 RGB,
    decodes to bit-identical pixels); PIL fallback when the lib is absent.

    The sweep throughput is host-CPU-bound on 1-core boxes and PNG encode
    was its single largest item (scripts/analyze_sweep_stalls4.py:
    95 ms/img of 223 ms/img host CPU)."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint8 and (arr.ndim == 2 or
                                  (arr.ndim == 3 and arr.shape[2] == 3)):
        from inklayer_tpu.native import png_encode

        data = png_encode(arr, level=level)
        if data is not None:
            with open(path, "wb") as f:
                f.write(data)
            return
    Image.fromarray(arr).save(path, compress_level=level)


def prepare_out_dir(out_base_dir: str, input_name: str) -> str:
    out_dir = os.path.join(out_base_dir, input_name)
    if os.path.exists(out_dir) and len(os.listdir(out_dir)) > 0:
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    return out_dir


def save_norm_bboxes(bboxes_abs: Sequence[Sequence[float]],
                     scores: Sequence[float], image_size, out_path: str,
                     labels: Optional[Sequence[str]] = None) -> None:
    """bboxes_abs: xyxy pixel boxes; stored normalized (utils/processing.py
    save_norm_bboxes)."""
    w, h = image_size
    norm = [[b[0] / w, b[1] / h, b[2] / w, b[3] / h] for b in bboxes_abs]
    obj = {"bboxes": norm, "scores": [float(s) for s in scores]}
    if labels is not None:
        obj["labels"] = list(labels)
    with open(out_path, "w") as f:
        json.dump(obj, f, indent=4)


def save_masks_dir(masks: np.ndarray, out_dir: str,
                   indices: Optional[Sequence[int]] = None) -> None:
    """masks: (N, H, W) bool -> out_dir/mask_{i}.png.

    Native path writes 1-bit grayscale PNGs (decoders expand to 0/255 —
    every consumer normalizes via convert("L") > 127): 8x less data through
    the filter+deflate stages than the 8-bit form, and the mask writes are
    the largest host-side cost of the output contract on 1-core hosts
    (scripts/analyze_sweep_stalls4.py).  PIL fallback stays 8-bit/zlib-1."""
    os.makedirs(out_dir, exist_ok=True)
    from inklayer_tpu.native import png_encode

    for i, mask in enumerate(masks):
        idx = indices[i] if indices is not None else i
        path = os.path.join(out_dir, f"mask_{idx}.png")
        m8 = np.asarray(mask, np.uint8)
        data = png_encode(m8, bilevel=True, level=1)
        if data is not None:
            with open(path, "wb") as f:
                f.write(data)
        else:
            save_png(path, m8 * 255)


def draw_boxes_image(image: Image.Image, norm_boxes, scores=None,
                     labels=None, line_width: int = 3) -> Image.Image:
    """Pastel-colored normalized-box overlay (visualization.py draw_boxes)."""
    img = image.copy()
    draw = ImageDraw.Draw(img)
    w, h = img.size
    colors = generate_pastel_colors(max(len(norm_boxes), 1))
    for i, box in enumerate(norm_boxes):
        x1, y1, x2, y2 = box
        if max(box) <= 1.0:
            x1, y1, x2, y2 = x1 * w, y1 * h, x2 * w, y2 * h
        draw.rectangle([x1, y1, x2, y2], outline=colors[i], width=line_width)
        parts = []
        if labels is not None and i < len(labels):
            parts.append(str(labels[i]))
        if scores is not None and i < len(scores):
            parts.append(f"{scores[i]:.2f}")
        if parts:
            draw.text((x1, max(0, y1 - 12)), " : ".join(parts), fill=colors[i])
    return img


def save_depth_map(depth: np.ndarray, out_path: str) -> None:
    """Normalize to 0-255 grayscale RGB (refiner.py:419-423)."""
    d = depth.astype(np.float64)
    rng = d.max() - d.min()
    norm = (d - d.min()) / rng * 255.0 if rng > 0 else np.zeros_like(d)
    Image.fromarray(norm.astype(np.uint8)).convert("RGB").save(out_path)


def cleanup_intermediate(out_dir: str) -> None:
    """--no_intermediate keep-list deletion (runner.py:91-101)."""
    for item in os.listdir(out_dir):
        if item in KEEP_LIST:
            continue
        path = os.path.join(out_dir, item)
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)
