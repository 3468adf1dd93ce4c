"""Parity of the classical refinement stage against the REFERENCE's own
cv2 implementation (read-only oracle import): mask cleaning
(refinement/mask_cleaner.py:6-36) and sketch NMS
(refinement/nms_sketch.py:129-351), which the reference runs through PNG
files on disk — reproduced here with temp dirs so the oracle executes its
real path.
"""

import importlib.util
import os
import sys
import types

import cv2
import numpy as np
import pytest

REF = "/root/reference/InkLayer/refinement"


def _load_ref():
    if "InkLayer.refinement.nms_sketch" in sys.modules:
        return (sys.modules["InkLayer.refinement.mask_cleaner"],
                sys.modules["InkLayer.refinement.nms_sketch"])
    for name in ("InkLayer", "InkLayer.refinement"):
        pkg = types.ModuleType(name)
        pkg.__path__ = [os.path.dirname(REF) if name == "InkLayer" else REF]
        sys.modules.setdefault(name, pkg)

    def load(name, fname):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF, fname))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("InkLayer.refinement.utils", "utils.py")
    mc = load("InkLayer.refinement.mask_cleaner", "mask_cleaner.py")
    nms = load("InkLayer.refinement.nms_sketch", "nms_sketch.py")
    return mc, nms


@pytest.fixture(scope="module")
def ref_mods():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    return _load_ref()


def _blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r)


@pytest.mark.slow
def test_clean_up_mask_parity(ref_mods, rng):
    mc, _ = ref_mods
    from inklayer_tpu.pipeline.refine.mask_cleaner import run_clean_masks

    h, w = 120, 160
    masks = []
    for i in range(4):
        m = np.zeros((h, w), np.uint8)
        # big blob (kept by area), speckles (dropped), a thin long bar
        # (kept by aspect ratio), a small square (dropped)
        m[_blob(h, w, 30 + 10 * i, 40, 18)] = 255
        for _ in range(15):
            y, x = rng.integers(0, h - 2), rng.integers(0, w - 2)
            m[y:y + 2, x:x + 2] = 255
        m[100:103, 10 + i:120] = 255
        m[60:70, 130:140] = 255
        # soft values exercise the 127 threshold
        m[m == 0] = (rng.random((m == 0).sum()) * 100).astype(np.uint8)
        masks.append(m)
    masks = np.stack(masks)

    ref_out = np.stack([mc.clean_up_mask(m.copy()) for m in masks]) > 0
    ours = run_clean_masks(masks)
    mismatch = np.mean(ref_out != ours)
    assert mismatch == 0.0, f"clean mask mismatch fraction {mismatch}"


def test_sketch_nms_parity(ref_mods, tmp_path, rng):
    _, ref_nms = ref_mods
    from inklayer_tpu.config import RefineConfig
    from inklayer_tpu.pipeline.refine.nms import sketch_nms

    h, w = 200, 240
    # sketch: white page with dark strokes; one pure-black dead region
    sketch = np.full((h, w), 255, np.uint8)

    def stroke_rect(y1, x1, y2, x2):
        sketch[y1:y2, x1:x1 + 2] = 30
        sketch[y1:y2, x2 - 2:x2] = 30
        sketch[y1:y1 + 2, x1:x2] = 30
        sketch[y2 - 2:y2, x1:x2] = 30

    stroke_rect(20, 20, 100, 110)     # object A
    stroke_rect(24, 24, 60, 64)       # sub-object inside A sharing corner-ish
    stroke_rect(120, 130, 190, 220)   # object B
    sketch[150:170, 10:40] = 0        # pure-black region (zero pixels)

    # boxes given as xyxy in pixels (x1, y1, x2, y2)
    boxes = np.array([
        [20, 20, 110, 100],    # 0: A
        [24, 24, 64, 60],      # 1: contained in A, shares corner region
        [130, 120, 220, 190],  # 2: B
        [131, 121, 221, 191],  # 3: near-duplicate of B (bbox IoU > 0.7)
        [2, 2, 238, 198],      # 4: covers ~96% of image -> area-filtered
        [10, 150, 40, 170],    # 5: mostly-black region (border pixels keep
                               #    it "non-empty" in BOTH implementations)
    ], np.float64)
    scores = np.array([0.9, 0.6, 0.8, 0.5, 0.95, 0.7])

    # masks = filled interiors (mask pixels restricted to strokes are what
    # the ink-IoU compares)
    masks = np.zeros((len(boxes), h, w), bool)
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        masks[i, max(y1, 0):y2, max(x1, 0):x2] = True

    sketch_path = str(tmp_path / "sketch.png")
    cv2.imwrite(sketch_path, sketch)
    masks_dir = str(tmp_path / "masks")
    os.makedirs(masks_dir)
    for i, m in enumerate(masks):
        cv2.imwrite(os.path.join(masks_dir, f"mask_{i}.png"),
                    m.astype(np.uint8) * 255)

    cfg = RefineConfig()
    ref_keep = np.sort(np.asarray(ref_nms.sketch_nms(
        sketch_path, boxes.copy(), scores.copy(), masks_dir,
        sketch_iou_threshold=cfg.nms_iou)))
    ours_keep = np.sort(sketch_nms(boxes, scores, masks, sketch, cfg))
    np.testing.assert_array_equal(ours_keep, ref_keep)
    # sanity: the full-image box was area-filtered and the near-duplicate
    # of B was suppressed (so the test exercised both mechanisms)
    assert 4 not in ours_keep
    assert 3 not in ours_keep
