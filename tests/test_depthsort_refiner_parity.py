"""Parity of depth-sort and refiner stages against the REFERENCE's own
implementation (read-only oracle import of refinement/depth_sort.py:240-288
and refinement/refiner.py:34-126,339-370).

The reference module loads the Depth-Anything checkpoint at import time
(depth_sort.py:36-40); no checkpoints exist here, so the DPT class and
torch.load are stubbed for the import — sort_sketch_masks takes the depth
map explicitly, so the model is never used.

Our sampling is grid-stratified vs the reference's KDTree Poisson-disk, so
fixtures give each mask a well-separated depth plateau: the binned-mode
scores are then sampling-independent and the ORDER must match exactly.
Mask outputs are compared at IoU >= 0.95 (BASELINE tolerance)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/InkLayer"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _install_skimage_stub():
    """skimage is not installed in this env; the oracle needs
    binary_dilation/binary_closing/disk (scipy.ndimage equivalents) and
    watershed (our exact C++ priority-flood reimplementation,
    native/host_ops.cpp — separately fidelity-tested)."""
    from scipy import ndimage as ndi

    from inklayer_tpu import native

    if native.get_lib() is None:
        pytest.skip("native host_ops unavailable")

    sk = types.ModuleType("skimage")
    sk.__path__ = []
    morph = types.ModuleType("skimage.morphology")
    seg = types.ModuleType("skimage.segmentation")

    def disk(r):
        yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
        return (yy * yy + xx * xx) <= r * r

    morph.disk = disk
    morph.binary_dilation = lambda m, fp=None: ndi.binary_dilation(
        m, structure=fp)
    morph.binary_closing = lambda m, fp=None: ndi.binary_closing(
        m, structure=fp)

    def watershed(image, markers, connectivity=1, offset=None, mask=None,
                  compactness=0.0):
        region = (np.ones(image.shape, np.uint8) if mask is None
                  else np.asarray(mask, np.uint8))
        return native.watershed(np.asarray(markers, np.int32),
                                np.asarray(image, np.float32), region,
                                compactness=float(compactness))

    seg.watershed = watershed
    sk.morphology = morph
    sk.segmentation = seg
    sys.modules.setdefault("skimage", sk)
    sys.modules.setdefault("skimage.morphology", morph)
    sys.modules.setdefault("skimage.segmentation", seg)


def _load_ref_refiner():
    import torch

    _install_skimage_stub()

    for name, p in (("InkLayer", REF),
                    ("InkLayer.utils", os.path.join(REF, "utils")),
                    ("InkLayer.refinement", os.path.join(REF, "refinement")),
                    ("InkLayer.third_party", os.path.join(REF, "third_party"))):
        pkg = types.ModuleType(name)
        pkg.__path__ = [p]
        pkg.__file__ = os.path.join(p, "__init__.py")
        sys.modules.setdefault(name, pkg)

    # stub the Depth-Anything import chain; the checkpoint load at
    # depth_sort.py:36-40 runs against a no-op model + patched torch.load
    class _DummyDAV2:
        def __init__(self, **kw):
            pass

        def load_state_dict(self, sd, **kw):
            pass

        def to(self, device):
            return self

        def eval(self):
            return self

        def infer_image(self, img):
            raise AssertionError("oracle depth model must not be called")

    for name in ("InkLayer.third_party.Depth_Anything_V2",
                 "InkLayer.third_party.Depth_Anything_V2.depth_anything_v2"):
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules.setdefault(name, m)
    dpt = types.ModuleType(
        "InkLayer.third_party.Depth_Anything_V2.depth_anything_v2.dpt")
    dpt.DepthAnythingV2 = _DummyDAV2
    sys.modules[dpt.__name__] = dpt

    _load("InkLayer.utils.visualization",
          os.path.join(REF, "utils", "visualization.py"))
    _load("InkLayer.refinement.utils",
          os.path.join(REF, "refinement", "utils.py"))
    orig_load = torch.load
    torch.load = lambda *a, **k: {}
    try:
        ds = _load("InkLayer.refinement.depth_sort",
                   os.path.join(REF, "refinement", "depth_sort.py"))
    finally:
        torch.load = orig_load
    rf = _load("InkLayer.refinement.refiner",
               os.path.join(REF, "refinement", "refiner.py"))
    return ds, rf


@pytest.fixture(scope="module")
def ref_mods():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    return _load_ref_refiner()


# --------------------------------------------------------------------------
# fixtures: synthetic sketch with nested/overlapping outlined shapes
# --------------------------------------------------------------------------


def _rect_outline(h, w, y1, x1, y2, x2, t=2):
    m = np.zeros((h, w), bool)
    m[y1:y2, x1:x1 + t] = True
    m[y1:y2, x2 - t:x2] = True
    m[y1:y1 + t, x1:x2] = True
    m[y2 - t:y2, x1:x2] = True
    return m


def _scene(h=160, w=160):
    """3 overlapping outlined rectangles + containment pair."""
    shapes = [
        _rect_outline(h, w, 10, 10, 90, 90),     # big back square
        _rect_outline(h, w, 60, 60, 140, 140),   # overlapping front square
        _rect_outline(h, w, 20, 20, 50, 50),     # contained in the first
    ]
    ink = np.logical_or.reduce(shapes)
    sketch_gray = np.where(ink, 0, 255).astype(np.uint8)
    # masks = filled boxes around each outline (like SAM box masks)
    masks, boxes = [], []
    for ys, xs in [np.nonzero(s) for s in shapes]:
        m = np.zeros((h, w), bool)
        y1, y2, x1, x2 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
        m[y1:y2, x1:x2] = True
        masks.append(m)
        boxes.append([x1, y1, x2, y2])
    # depth plateaus: distinct values inside each mask region
    depth = np.zeros((h, w), np.float32) + 0.05
    depth[masks[0]] = 0.3
    depth[masks[1]] = 0.9   # front-most (largest depth score first in sort)
    depth[masks[2]] = 0.6
    return sketch_gray, np.stack(masks), np.asarray(boxes, float), depth


def _save_sketch(tmp_path, sketch_gray):
    from PIL import Image

    p = str(tmp_path / "sketch.png")
    Image.fromarray(sketch_gray).convert("RGB").save(p)
    return p


def _iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / union if union else 1.0


def _best_iou_match(ours, refs):
    """Greedy best-IoU matching score for two mask lists."""
    scores = []
    used = set()
    for m in ours:
        best, bi = 0.0, None
        for j, r in enumerate(refs):
            if j in used:
                continue
            v = _iou(m, r)
            if v > best:
                best, bi = v, j
        if bi is not None:
            used.add(bi)
        scores.append(best)
    return scores


# --------------------------------------------------------------------------


def test_sort_sketch_masks_order_parity(ref_mods, tmp_path):
    ds, _ = ref_mods
    from inklayer_tpu.config import RefineConfig
    from inklayer_tpu.pipeline.refine.depth_sort import sort_sketch_masks

    sketch_gray, masks, boxes, depth = _scene()
    sketch_path = _save_sketch(tmp_path, sketch_gray)

    ref_order, ref_scores, ref_cont = ds.sort_sketch_masks(
        [m for m in masks], [b for b in boxes], sketch_path,
        depth_sketch=depth)
    our_order, our_scores, our_cont = sort_sketch_masks(
        masks, boxes, sketch_gray, depth, RefineConfig())

    np.testing.assert_array_equal(np.asarray(our_cont), np.asarray(ref_cont))
    assert list(our_order) == list(ref_order), (our_order, ref_order,
                                                our_scores, ref_scores)
    # plateau depths are sampling-independent at the 0.1 binning
    np.testing.assert_allclose(np.asarray(our_scores),
                               np.asarray(ref_scores), atol=0.05)


def test_parse_masks_to_disjoint_parity(ref_mods, tmp_path):
    _, rf = ref_mods
    from inklayer_tpu.config import RefineConfig
    from inklayer_tpu.pipeline.refine.refiner import parse_masks_to_disjoint

    sketch_gray, masks, boxes, depth = _scene()
    sketch_path = _save_sketch(tmp_path, sketch_gray)

    ref_masks, ref_boxes, _info = rf.parse_masks_to_disjoint_masks(
        [m for m in masks], [b for b in boxes], sketch_path, depth_map=depth)
    our_dev, our_boxes, _ = parse_masks_to_disjoint(
        masks, boxes, sketch_gray, depth, RefineConfig())
    ours = [np.asarray(m) for m in np.asarray(our_dev)]

    ref_masks = [np.asarray(m, bool) for m in ref_masks]
    assert len(ours) == len(ref_masks)
    scores = _best_iou_match(ours, ref_masks)
    assert min(scores) >= 0.95, scores


def test_fragment_merge_chain_parity(ref_mods, tmp_path):
    """Chained fragment merges: a front mask slices a back mask into a big
    piece and a tiny (<5%) fragment; the fragment must merge into the
    max-overlap earlier mask exactly as the reference does
    (refiner.py:48-85 via precomputed parsed_masks)."""
    _, rf = ref_mods
    from inklayer_tpu.config import RefineConfig
    from inklayer_tpu.pipeline.refine.refiner import parse_masks_to_disjoint

    h = w = 160
    ink = np.zeros((h, w), bool)
    # back rectangle outline spanning widely
    ink |= _rect_outline(h, w, 40, 6, 80, 154)
    # front tall rectangle occluding the back one near its right end,
    # leaving a tiny right-side fragment of the back mask
    ink |= _rect_outline(h, w, 10, 120, 150, 148)
    sketch_gray = np.where(ink, 0, 255).astype(np.uint8)
    m_back = np.zeros((h, w), bool)
    m_back[40:80, 6:154] = True
    m_front = np.zeros((h, w), bool)
    m_front[10:150, 120:148] = True
    masks = np.stack([m_back, m_front])
    boxes = np.asarray([[6, 40, 154, 80], [120, 10, 148, 150]], float)
    depth = np.full((h, w), 0.05, np.float32)
    depth[m_back] = 0.3
    depth[m_front] = 0.9  # front-most
    sketch_path = _save_sketch(tmp_path, sketch_gray)

    ref_masks, _, _ = rf.parse_masks_to_disjoint_masks(
        [m for m in masks], [b for b in boxes], sketch_path, depth_map=depth)
    our_dev, _, _ = parse_masks_to_disjoint(
        masks, boxes, sketch_gray, depth, RefineConfig())
    ours = [np.asarray(m) for m in np.asarray(our_dev)]
    ref_masks = [np.asarray(m, bool) for m in ref_masks]
    assert len(ours) == len(ref_masks)
    scores = _best_iou_match(ours, ref_masks)
    assert min(scores) >= 0.95, scores


@pytest.mark.slow
def test_improve_sam_masks_parity(ref_mods, tmp_path):
    """Full refinement (watershed + bbox-assign + unlabeled residual) at
    mask-IoU >= 0.95 on the synthetic scene."""
    _, rf = ref_mods
    from inklayer_tpu.config import RefineConfig
    from inklayer_tpu.pipeline.refine.refiner import (improve_masks,
                                                      parse_masks_to_disjoint)

    sketch_gray, masks, boxes, depth = _scene()
    sketch_path = _save_sketch(tmp_path, sketch_gray)

    ref_disjoint, ref_boxes, _ = rf.parse_masks_to_disjoint_masks(
        [m for m in masks], [b for b in boxes], sketch_path, depth_map=depth)
    ref_out = rf.improve_sam_masks(sketch_path,
                                   [np.asarray(m) for m in ref_disjoint],
                                   [np.asarray(b) for b in ref_boxes])
    ref_final = [np.asarray(m, bool) for m in ref_out["final_masks"]]

    cfg = RefineConfig()
    our_disjoint, our_boxes, _ = parse_masks_to_disjoint(
        masks, boxes, sketch_gray, depth, cfg)
    our_final_dev = improve_masks(
        our_disjoint, np.asarray(our_boxes), sketch_gray, cfg)
    ours = [np.asarray(m) for m in np.asarray(our_final_dev)]

    # compare only the ink-restricted content (the layers' meaning)
    ink = sketch_gray < 250
    ours_ink = [m & ink for m in ours]
    ref_ink = [m & ink for m in ref_final]
    ours_ink = [m for m in ours_ink if m.sum()]
    ref_ink = [m for m in ref_ink if m.sum()]
    assert len(ours_ink) == len(ref_ink), (len(ours_ink), len(ref_ink))
    scores = _best_iou_match(ours_ink, ref_ink)
    assert min(scores) >= 0.95, scores
