"""End-to-end parity of SamAutomaticMaskGenerator against the REFERENCE's
torch implementation (segment-anything automatic_mask_generator.py:35-372 +
utils/amg.py), loaded read-only as an oracle with torchvision stubbed
(batched_nms/box_area/resize implemented with plain torch/PIL semantics).

Same tiny SAM weights (through the checkpoint converter), same image, same
point grid/thresholds -> the surviving mask set must match.  Stability
scores differ slightly by construction (ours is computed on the low-res
logits, the reference's on the upsampled full-res logits), so thresholds
are chosen away from the observed score distribution boundaries.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax

from inklayer_tpu.io import weights as W
from inklayer_tpu.models.sam import Sam, SamPredictor
from inklayer_tpu.models.sam.amg import SamAutomaticMaskGenerator
from tests.test_sam_parity import TINY

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier

SA = "/root/reference/InkLayer/third_party/segment-anything/segment_anything"


def _stub_torchvision():
    if "torchvision.ops.boxes" in sys.modules:
        return
    import importlib.machinery as _mach

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    tfs = types.ModuleType("torchvision.transforms")
    tfs_f = types.ModuleType("torchvision.transforms.functional")
    # transformers probes find_spec("torchvision"); a stub without __spec__
    # makes that raise instead of returning
    for _m in (tv, ops, boxes_mod, tfs, tfs_f):
        _m.__spec__ = _mach.ModuleSpec(_m.__name__, loader=None)
    # reference util/misc.py:27 parses this for a <0.7 compat flag
    tv.__version__ = "0.15.0"

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def _nms(b, scores, thresh):
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            x1 = torch.maximum(b[i, 0], b[rest, 0])
            y1 = torch.maximum(b[i, 1], b[rest, 1])
            x2 = torch.minimum(b[i, 2], b[rest, 2])
            y2 = torch.minimum(b[i, 3], b[rest, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            iou = inter / (box_area(b[i:i + 1]) + box_area(b[rest]) - inter)
            order = rest[iou <= thresh]
        return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.long)

    def batched_nms(b, scores, idxs, iou_threshold):
        # torchvision's coordinate-offset trick
        if b.numel() == 0:
            return torch.zeros(0, dtype=torch.long)
        offset = idxs.to(b) * (b.max() + torch.tensor(1.0))
        return _nms(b + offset[:, None], scores, iou_threshold)

    boxes_mod.box_area = box_area
    boxes_mod.batched_nms = batched_nms

    from PIL import Image

    tfs_f.to_pil_image = lambda x: Image.fromarray(x)
    tfs_f.resize = lambda img, size: img.resize(
        (size[1], size[0]), Image.BILINEAR)
    # other parity tests (depth, swin) share this stub via sys.modules
    tfs.Compose = lambda fns: fns
    tv.ops = ops
    ops.boxes = boxes_mod
    tv.transforms = tfs
    tfs.functional = tfs_f
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
    sys.modules["torchvision.transforms"] = tfs
    sys.modules["torchvision.transforms.functional"] = tfs_f


def _load_sa_pkg():
    """Load the reference segment_anything as a real package namespace
    (predictor.py does `from segment_anything.modeling import Sam`)."""
    if "segment_anything" in sys.modules:
        return sys.modules["segment_anything"]
    for name, path in [
        ("segment_anything", SA),
        ("segment_anything.modeling", os.path.join(SA, "modeling")),
        ("segment_anything.utils", os.path.join(SA, "utils")),
    ]:
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        sys.modules[name] = pkg

    def load(name, relpath):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(SA, relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    for m in ("common", "image_encoder", "prompt_encoder", "transformer",
              "mask_decoder", "sam"):
        load(f"segment_anything.modeling.{m}", f"modeling/{m}.py")
    smod = sys.modules["segment_anything.modeling"]
    smod.Sam = sys.modules["segment_anything.modeling.sam"].Sam
    load("segment_anything.utils.transforms", "utils/transforms.py")
    load("segment_anything.utils.amg", "utils/amg.py")
    load("segment_anything.predictor", "predictor.py")
    amg = load("segment_anything.automatic_mask_generator",
               "automatic_mask_generator.py")
    sys.modules["segment_anything"].SamAutomaticMaskGenerator = \
        amg.SamAutomaticMaskGenerator
    return sys.modules["segment_anything"]


@pytest.fixture(scope="module")
def ref_pkg():
    if not os.path.isdir(SA):
        pytest.skip("reference not mounted")
    _stub_torchvision()
    return _load_sa_pkg()


def _tiny_torch_sam(ref_pkg):
    m = sys.modules
    torch.manual_seed(0)
    enc = m["segment_anything.modeling.image_encoder"].ImageEncoderViT(
        img_size=TINY.image_size, patch_size=TINY.patch_size,
        embed_dim=TINY.encoder_embed_dim, depth=TINY.encoder_depth,
        num_heads=TINY.encoder_num_heads, mlp_ratio=4.0,
        out_chans=TINY.prompt_embed_dim, qkv_bias=True, use_rel_pos=True,
        window_size=TINY.encoder_window_size,
        global_attn_indexes=TINY.encoder_global_attn_indexes,
        norm_layer=torch.nn.LayerNorm)
    grid = TINY.image_size // TINY.patch_size
    pe = m["segment_anything.modeling.prompt_encoder"].PromptEncoder(
        embed_dim=TINY.prompt_embed_dim,
        image_embedding_size=(grid, grid),
        input_image_size=(TINY.image_size, TINY.image_size),
        mask_in_chans=16)
    dec = m["segment_anything.modeling.mask_decoder"].MaskDecoder(
        num_multimask_outputs=3,
        transformer=m["segment_anything.modeling.transformer"].TwoWayTransformer(
            depth=2, embedding_dim=TINY.prompt_embed_dim,
            mlp_dim=TINY.prompt_embed_dim * 8, num_heads=8),
        transformer_dim=TINY.prompt_embed_dim,
        iou_head_depth=3, iou_head_hidden_dim=TINY.prompt_embed_dim)
    sam = m["segment_anything.modeling.sam"].Sam(
        image_encoder=enc, prompt_encoder=pe, mask_decoder=dec,
        pixel_mean=list(TINY.pixel_mean), pixel_std=list(TINY.pixel_std))
    sam.eval()
    return sam


@pytest.fixture(scope="module")
def converted_amg(ref_pkg, tmp_path_factory):
    torch_sam = _tiny_torch_sam(ref_pkg)
    # break the near-constant random-init decoder output so masks vary
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in torch_sam.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.15)
    path = str(tmp_path_factory.mktemp("amg") / "tiny_sam.pth")
    torch.save(torch_sam.state_dict(), path)

    model = Sam(TINY)
    import jax.numpy as jnp

    example = (jnp.zeros((1, TINY.image_size, TINY.image_size, 3)),
               jnp.zeros((2, 4)))
    params = W.load_sam_params(path, TINY, model, example)
    predictor = SamPredictor(params, TINY, box_capacity=4)
    return torch_sam, predictor


def _match_sets(ours, ref_out, min_iou=0.98):
    from scipy.optimize import linear_sum_assignment

    assert len(ours) == len(ref_out), (
        f"mask count {len(ours)} vs reference {len(ref_out)}")
    n = len(ours)
    iou_mat = np.zeros((n, n))
    for i, rec in enumerate(ours):
        m = rec["segmentation"]
        for j, r in enumerate(ref_out):
            rm = r["segmentation"]
            iou_mat[i, j] = (m & rm).sum() / max((m | rm).sum(), 1)
    rows, cols = linear_sum_assignment(-iou_mat)
    matched = iou_mat[rows, cols]
    assert matched.mean() > 0.97, f"mean matched IoU {matched.mean()}"
    assert matched.min() > min_iou, f"worst matched IoU {matched.min()}"
    for i, j in zip(rows, cols):
        # the reference's apply_image quantizes the resized image back to
        # uint8 before normalizing (transforms.py:30-34); we keep the resize
        # in float (strictly higher fidelity), worth ~1 uint8 level of pixel
        # difference -> small predicted-iou / boundary-pixel deltas
        np.testing.assert_allclose(ours[i]["predicted_iou"],
                                   ref_out[j]["predicted_iou"], atol=8e-3)


def test_amg_crop_pyramid_parity(ref_pkg, converted_amg, rng):
    """Crop pyramid at crop_n_layers=1 (5 crops: full image + 2x2 overlap
    grid), per-layer downscaled point grids, edge-box filtering and the
    cross-crop smaller-crop-wins NMS must all match the reference generator
    (automatic_mask_generator.py:196-276, utils/amg.py:78-88,189-234)."""
    torch_sam, predictor = converted_amg
    image = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    common = dict(points_per_side=4, stability_score_offset=1.0,
                  min_mask_region_area=0, pred_iou_thresh=0.5,
                  stability_score_thresh=0.0, box_nms_thresh=0.7,
                  crop_n_layers=1, crop_nms_thresh=0.7,
                  crop_n_points_downscale_factor=2)
    ours = SamAutomaticMaskGenerator(
        predictor, points_per_batch=16, **common).generate(image)
    ref_gen = ref_pkg.SamAutomaticMaskGenerator(
        model=torch_sam, points_per_batch=16, output_mode="binary_mask",
        **common)
    with torch.no_grad():
        ref_out = ref_gen.generate(image)
    assert len(ours) >= 1, "degenerate: no masks survived the crop pipeline"
    _match_sets(ours, ref_out, min_iou=0.9)
    # crop bookkeeping parity: which crop each surviving mask came from
    crops_ours = sorted(tuple(r["crop_box"]) for r in ours)
    crops_ref = sorted(tuple(r["crop_box"]) for r in ref_out)
    assert crops_ours == crops_ref


@pytest.mark.parametrize("kw,min_count,min_iou", [
    # accept-all + NMS off: every grid point x 3 multimask outputs survives
    # -> full 48-mask multiset comparison (filters, upsampling, RLE path).
    # Small/degenerate masks in this set lose a couple boundary pixels to
    # the reference's uint8 re-quantization after resize -> 0.9 floor
    # (mean still must exceed 0.97).
    (dict(pred_iou_thresh=-100.0, stability_score_thresh=0.0,
          box_nms_thresh=1.5), 48, 0.90),
    # active filters + NMS: the deduped surviving set must agree
    (dict(pred_iou_thresh=0.5, stability_score_thresh=0.0,
          box_nms_thresh=0.7), 1, 0.98),
])
def test_amg_parity(ref_pkg, converted_amg, rng, kw, min_count, min_iou):
    torch_sam, predictor = converted_amg
    image = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    common = dict(points_per_side=4, stability_score_offset=1.0,
                  min_mask_region_area=0, **kw)

    ours = SamAutomaticMaskGenerator(
        predictor, points_per_batch=16, **common).generate(image)
    ref_gen = ref_pkg.SamAutomaticMaskGenerator(
        model=torch_sam, points_per_batch=16, crop_n_layers=0,
        output_mode="binary_mask", **common)
    with torch.no_grad():
        ref_out = ref_gen.generate(image)

    assert len(ours) >= min_count, f"degenerate: only {len(ours)} masks"
    _match_sets(ours, ref_out, min_iou=min_iou)
