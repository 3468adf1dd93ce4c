"""FULL-CHAIN parity against the reference's OWN stage functions chained
end-to-end (VERDICT r03 next #4): process_dino_output -> run_SAM ->
run_clean_masks_on_sketch_dir -> run_postprocess_boxes_on_sketch_dir ->
run_refinement_on_sketch_dir (reference runner.py:21-103 order), with
random-but-shared tiny SAM weights through our checkpoint converter, vs
inklayer_tpu.pipeline.runner.InkLayerPipeline.run on the same sketch.

Per-stage parity tests already pin each stage's numerics; what nothing else
covers is the CROSS-STAGE interfaces: box coordinate conventions crossing
detect -> SAM (normalized cxcywh -> abs xyxy int truncation vs the float
tensor SAM actually receives), mask indexing crossing SAM -> clean -> NMS
(masks_cleaned/mask_{i}.png keyed by detection index), kept_indices plumbing
crossing NMS -> refine, and the bboxes_final.json normalization convention.

The chain starts from a shared detection dict (the dino_out_dict contract at
reference runner.py:34) rather than a live GDINO forward: the reference's
`predict` needs the bert-base-uncased AutoTokenizer, which requires network
access absent here; the detector internals are parity-tested separately
(test_gdino_parity, test_full_transformer_parity, test_tokenizer_parity).
The depth model is stubbed to one shared deterministic map on BOTH sides
(reference depth_sort.py:36-45 module-load needs a checkpoint; DAv2 parity
is covered by test_depth_parity).
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest
import torch
from PIL import Image

import jax.numpy as jnp

from inklayer_tpu.config import GDinoConfig, PipelineConfig, RefineConfig
from inklayer_tpu.io import weights as W
from inklayer_tpu.models.sam import Sam, SamPredictor
from inklayer_tpu.pipeline.runner import InkLayerPipeline
from tests.test_amg_parity import _load_sa_pkg, _stub_torchvision, _tiny_torch_sam
from tests.test_depthsort_refiner_parity import _load_ref_refiner
from tests.test_refine_parity import _load_ref as _load_ref_clean_nms
from tests.test_sam_parity import TINY

pytestmark = pytest.mark.slow  # heavyweight module: excluded from -m quick

REF = "/root/reference/InkLayer"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def oracle_env():
    """Load every reference stage module the chain needs, in an order that
    satisfies their cross-imports."""
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    # package scaffolding first (with __file__ so utils/paths.py works)
    for name, p in (("InkLayer", REF),
                    ("InkLayer.utils", os.path.join(REF, "utils")),
                    ("InkLayer.refinement", os.path.join(REF, "refinement")),
                    ("InkLayer.segmentor", os.path.join(REF, "segmentor"))):
        pkg = types.ModuleType(name)
        pkg.__path__ = [p]
        pkg.__file__ = os.path.join(p, "__init__.py")
        sys.modules.setdefault(name, pkg)

    _stub_torchvision()
    _load_sa_pkg()                      # segment_anything.* (real package)
    # segmentor/sam.py does `from segment_anything import build_sam,
    # SamPredictor`: surface those names on the package (and the modeling
    # classes build_sam.py re-imports) like the real __init__.py does
    sa = sys.modules["segment_anything"]
    smod = sys.modules["segment_anything.modeling"]
    for cls, mod in (("ImageEncoderViT", "image_encoder"),
                     ("MaskDecoder", "mask_decoder"),
                     ("PromptEncoder", "prompt_encoder"),
                     ("TwoWayTransformer", "transformer"),
                     ("Sam", "sam")):
        setattr(smod, cls,
                getattr(sys.modules[f"segment_anything.modeling.{mod}"], cls))
    sa_dir = ("/root/reference/InkLayer/third_party/segment-anything/"
              "segment_anything")
    bs = _load("segment_anything.build_sam",
               os.path.join(sa_dir, "build_sam.py"))
    sa.build_sam = bs.build_sam
    sa.SamPredictor = sys.modules["segment_anything.predictor"].SamPredictor

    mc, nms = _load_ref_clean_nms()     # mask_cleaner + nms_sketch
    ds, rf = _load_ref_refiner()        # depth_sort (stubbed DAv2) + refiner

    processing = _load("InkLayer.utils.processing",
                       os.path.join(REF, "utils", "processing.py"))
    _load("InkLayer.utils.paths", os.path.join(REF, "utils", "paths.py"))
    bbox_filter = _load("InkLayer.refinement.bbox_filter",
                        os.path.join(REF, "refinement", "bbox_filter.py"))
    segmentor = _load("InkLayer.segmentor.sam",
                      os.path.join(REF, "segmentor", "sam.py"))
    return {"processing": processing, "segmentor": segmentor,
            "mask_cleaner": mc, "bbox_filter": bbox_filter,
            "refiner": rf, "depth_sort": ds}


# ---------------------------------------------------------------------------
# shared scene: 256x256 (power-of-two so norm<->abs coordinate products are
# exact dyadics in BOTH f32 and f64 — the conventions, not float rounding,
# are under test), outlined shapes with clear containment/overlap structure
# ---------------------------------------------------------------------------
H = W_IMG = 256


def _scene():
    g = np.full((H, W_IMG), 255, np.uint8)

    def rect(y1, x1, y2, x2, t=3, v=20):
        g[y1:y2, x1:x1 + t] = v
        g[y1:y2, x2 - t:x2] = v
        g[y1:y1 + t, x1:x2] = v
        g[y2 - t:y2, x1:x2] = v

    rect(24, 24, 128, 140)        # A: big outlined box
    rect(40, 40, 100, 100)        # B: nested inside A
    rect(150, 60, 230, 200)       # C: separate box
    rect(160, 170, 220, 240)      # D: overlaps C's right side
    # some free strokes
    g[200:240, 20:24] = 30
    g[236:240, 20:60] = 30
    return np.dstack([g, g, g])


# detections in normalized cxcywh over the 256-canvas (dyadic values);
# roughly covering A-D plus the free strokes, scores descending
DETS_CXCYWH = np.asarray([
    [82 / 256, 76 / 256, 120 / 256, 108 / 256],    # around A
    [70 / 256, 70 / 256, 64 / 256, 64 / 256],      # around B (nested in A)
    [130 / 256, 190 / 256, 148 / 256, 84 / 256],   # around C
    [205 / 256, 190 / 256, 74 / 256, 64 / 256],    # around D
    [40 / 256, 220 / 256, 48 / 256, 44 / 256],     # free strokes
], np.float64)
SCORES = [0.92, 0.81, 0.77, 0.66, 0.55]


def _shared_depth():
    """Region-constant depth: each shape's stroke neighbourhood sits on its
    own plateau with a large margin, so the binned-mode depth score
    (depth_sort.py:71-86) is robust to the two sides sampling different
    Poisson stroke points."""
    d = np.full((H, W_IMG), 0.05, np.float32)
    d[20:145, 20:145] = 1.0      # A's area
    d[36:104, 36:104] = 2.0      # B's area (nested, deeper)
    d[145:235, 55:205] = 3.0     # C
    d[155:225, 168:245] = 4.0    # D (overlap region reads as D)
    d[195:245, 15:65] = 5.0      # free strokes
    return d


class StubDetector:
    """detect_dispatch_device-compatible stub returning the fixed shared
    detections (runner.py consumes: finalize() -> det dict with normalized
    cxcywh 'boxes'; device top-K scores/boxes for the SAM chaining)."""

    def __init__(self):
        self.cfg = GDinoConfig()

    def detect_dispatch_device(self, image_dev, caption=None,
                               box_threshold=None):
        boxes_dev = jnp.asarray(DETS_CXCYWH, jnp.float32)
        scores_dev = jnp.asarray(SCORES, jnp.float32)

        def finalize():
            return {"boxes": DETS_CXCYWH.copy(),
                    "scores": np.asarray(SCORES, np.float64),
                    "labels": ["object"] * len(SCORES)}

        return finalize, scores_dev, boxes_dev

    def detect_dispatch(self, image, caption=None, box_threshold=None):
        return self.detect_dispatch_device(image, caption, box_threshold)[0]


class StubDepth:
    def __init__(self, depth):
        self._d = jnp.asarray(depth, jnp.float32)

    def infer_image_device(self, image):
        return self._d

    def infer_image(self, image):
        return np.asarray(self._d)


def _train_localized(torch_sam, scene_rgb, steps=800):
    """A purely-random tiny SAM emits near-identical global blobs for every
    prompt (~95% pairwise overlap measured), which makes the depth-sort /
    disjoint-composite stage a tie-break lottery.  A few hundred CPU Adam
    steps teaching it 'mask = prompt-box rectangle' give prompt-LOCALIZED
    masks, so every downstream decision (ink coverage, NMS gates, depth
    modes, containment) has a wide margin on both sides of the chain."""
    tr_mod = sys.modules["segment_anything.utils.transforms"]
    img = tr_mod.ResizeLongestSide(TINY.image_size).apply_image(scene_rgb)
    x = torch.as_tensor(img).permute(2, 0, 1).float()[None]
    x = (x - torch_sam.pixel_mean) / torch_sam.pixel_std
    opt = torch.optim.Adam(torch_sam.parameters(), lr=2e-3)
    g = torch.Generator().manual_seed(0)
    low_hw = TINY.image_size // 4
    loss_fn = torch.nn.BCEWithLogitsLoss()
    torch_sam.train()
    for _ in range(steps):
        emb = torch_sam.image_encoder(x)
        xy1 = torch.rand((4, 2), generator=g) * (TINY.image_size * 0.7)
        wh = 8 + torch.rand((4, 2), generator=g) * (TINY.image_size * 0.5)
        boxes = torch.cat([xy1, (xy1 + wh).clamp(max=TINY.image_size)], dim=1)
        sparse, dense = torch_sam.prompt_encoder(
            points=None, boxes=boxes, masks=None)
        low, _iou = torch_sam.mask_decoder(
            image_embeddings=emb,
            image_pe=torch_sam.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=False)
        yy, xx = torch.meshgrid(torch.arange(low_hw), torch.arange(low_hw),
                                indexing="ij")
        b4 = boxes / 4.0
        target = ((xx[None] >= b4[:, 0, None, None])
                  & (yy[None] >= b4[:, 1, None, None])
                  & (xx[None] <= b4[:, 2, None, None])
                  & (yy[None] <= b4[:, 3, None, None])).float()
        loss = loss_fn(low[:, 0], target)
        opt.zero_grad()
        loss.backward()
        opt.step()
    torch_sam.eval()
    return float(loss.detach())


@pytest.fixture(scope="module")
def shared_sam(oracle_env, tmp_path_factory):
    """One tiny torch SAM, briefly trained to localize masks at the prompt
    box; the torch side uses it directly, ours through the checkpoint
    converter."""
    torch_sam = _tiny_torch_sam(None)
    final_loss = _train_localized(torch_sam, _scene())
    assert final_loss < 0.15, f"localization training failed ({final_loss})"
    path = str(tmp_path_factory.mktemp("fullchain") / "tiny_sam.pth")
    torch.save(torch_sam.state_dict(), path)

    model = Sam(TINY)
    example = (jnp.zeros((1, TINY.image_size, TINY.image_size, 3)),
               jnp.zeros((2, 4)))
    params = W.load_sam_params(path, TINY, model, example)
    return torch_sam, path, params


def _run_reference_chain(env, torch_sam, ckpt_path, sketch_path, ref_dir,
                         depth_map, dino_out=None):
    """The reference runner.py:21-103 sequence, through the reference's own
    stage functions.  dino_out: detection dict in the run_ft_dino_on_sketch
    format; defaults to the module's fixed shared detections (the live-GDINO
    chain in test_fullchain_live_gdino.py passes the reference predict's
    real output instead)."""
    proc = env["processing"]
    os.makedirs(ref_dir, exist_ok=True)
    input_pil = Image.open(sketch_path).convert("RGB")
    input_pil.save(os.path.join(ref_dir, "input.png"))

    # detector output dict exactly as run_ft_dino_on_sketch builds it
    # (gdino.py:23-30): normalized cxcywh -> xyxy via the reference's own
    # converter
    if dino_out is None:
        dino_out = {
            "bboxes": proc.cxcywh_to_xyxy(DETS_CXCYWH.tolist()).tolist(),
            "scores": list(SCORES),
            "labels": ["object"] * len(SCORES),
        }
    boxes_t, _phrases = proc.process_dino_output(dino_out, input_pil)
    bboxes_list = [[int(x) for x in bbox] for bbox in boxes_t.tolist()]
    proc.save_norm_bboxes(bboxes_list, dino_out["scores"], input_pil,
                          os.path.join(ref_dir, "bboxes.json"))

    # run_SAM with build_sam patched to the tiny shared model (same body:
    # SamPredictor, BGR<->RGB quirk, apply_boxes_torch, predict_torch)
    seg = env["segmentor"]

    def tiny_build_sam(checkpoint):
        torch_sam.load_state_dict(torch.load(checkpoint))
        return torch_sam

    orig = seg.build_sam
    seg.build_sam = tiny_build_sam
    try:
        masks_np = seg.run_SAM(image_pil=input_pil, boxes_filt=boxes_t,
                               sam_checkpoint=ckpt_path)
    finally:
        seg.build_sam = orig
    masks_dir = os.path.join(ref_dir, "masks")
    os.makedirs(masks_dir, exist_ok=True)
    for i, mask in enumerate(masks_np):
        Image.fromarray(mask).save(os.path.join(masks_dir, f"mask_{i}.png"))

    env["mask_cleaner"].run_clean_masks_on_sketch_dir(ref_dir)
    bbox_out = env["bbox_filter"].run_postprocess_boxes_on_sketch_dir(
        ref_dir, sketch_iou_thresh=0.2)
    # shared deterministic depth on the refiner's namespace binding
    env["refiner"].get_depth_map = lambda path: depth_map.copy()
    env["refiner"].run_refinement_on_sketch_dir(ref_dir, bbox_out)
    return ref_dir


def _load_masks(d):
    out = []
    i = 0
    while os.path.exists(os.path.join(d, f"mask_{i}.png")):
        out.append(np.asarray(Image.open(
            os.path.join(d, f"mask_{i}.png")).convert("L")) > 127)
        i += 1
    return out


def _iou(a, b):
    u = (a | b).sum()
    return (a & b).sum() / u if u else 1.0


def test_full_chain_parity(oracle_env, shared_sam, tmp_path):
    torch_sam, ckpt_path, params = shared_sam
    depth_map = _shared_depth()
    sketch_path = str(tmp_path / "scene.png")
    Image.fromarray(_scene()).save(sketch_path)

    ref_dir = _run_reference_chain(oracle_env, torch_sam, ckpt_path,
                                   sketch_path, str(tmp_path / "ref_out"),
                                   depth_map)

    pipe = InkLayerPipeline(
        StubDetector(),
        SamPredictor(params, TINY, box_capacity=8),
        StubDepth(depth_map),
        cfg=PipelineConfig(sam=TINY, refine=RefineConfig()))
    our_dir = pipe.run(sketch_path, str(tmp_path / "our_out"),
                       no_intermediate=False, inpaint=False)
    pipe.drain()

    # ---- bboxes_final.json: NMS keep decisions + normalization ----------
    with open(os.path.join(ref_dir, "bboxes_final.json")) as f:
        ref_final = json.load(f)
    with open(os.path.join(our_dir, "bboxes_final.json")) as f:
        our_final = json.load(f)
    assert ref_final["kept_indices"], "vacuous scene: reference kept nothing"
    assert our_final["kept_indices"] == ref_final["kept_indices"]
    assert our_final["threshold"] == ref_final["threshold"]
    np.testing.assert_allclose(our_final["scores"], ref_final["scores"],
                               atol=1e-6)
    # ours stores exact normalized xyxy; the reference int-truncates abs
    # coords before re-normalizing (runner.py:36-45) -> <=1px difference
    np.testing.assert_allclose(
        np.asarray(our_final["bboxes"], np.float64),
        np.asarray(ref_final["bboxes"], np.float64),
        atol=1.01 / min(H, W_IMG))

    # ---- masks_final: the end-of-chain artifact -------------------------
    ref_masks = _load_masks(os.path.join(ref_dir, "masks_final"))
    our_masks = _load_masks(os.path.join(our_dir, "masks_final"))
    assert ref_masks, "vacuous scene: no final masks"
    assert len(our_masks) == len(ref_masks)
    for i, (a, b) in enumerate(zip(our_masks, ref_masks)):
        assert _iou(a, b) >= 0.95, f"masks_final/mask_{i}: IoU {_iou(a, b)}"

    # ---- intermediate interface artifacts (cheap extra guards) ----------
    ref_cleaned = _load_masks(os.path.join(ref_dir, "masks_cleaned"))
    our_cleaned = _load_masks(os.path.join(our_dir, "masks_cleaned"))
    assert len(our_cleaned) == len(ref_cleaned)
    for i, (a, b) in enumerate(zip(our_cleaned, ref_cleaned)):
        assert _iou(a, b) >= 0.98, f"masks_cleaned/mask_{i}: IoU {_iou(a, b)}"
