"""Full chain FROM PIXELS through the reference's LIVE GroundingDINO forward
(VERDICT r04 next #3): tokenize -> GDINO predict -> run_SAM -> clean -> NMS ->
refine, entirely through reference code, vs InkLayerPipeline.run on the same
sketch with the SAME weights through our checkpoint converter.

What only this test covers (test_fullchain_oracle_parity starts from a shared
detection dict): the detect -> downstream crossing through the reference's
own `predict` (util/inference.py:53-95) — sigmoid + max-over-tokens >
box_threshold in QUERY order, posmap phrase extraction via tokenizer.decode,
and the normalized-cxcywh convention leaving the detector — against our
GDinoDetector's fused device path (score-sorted, fixed-capacity frontier).

The reference model is the REAL groundingdino.py top module (Swin backbone +
BertModelWarper + full transformer) built tiny-but-d256 (the decoder's
gen_sineembed hardcodes 128 sine feats/coord, utils.py:204-216).  Its HF
AutoTokenizer dependency (network) is replaced by injecting our offline
WordPiece tokenizer (models/gdino/tokenizer.py) through the documented
get_tokenlizer seam — ids are exact bert-base-uncased ids for the pipeline
caption "object." (test_tokenizer_parity).  BertModel constructs offline
(test_bert_parity).  Environment-absent third-party libs (torchvision,
supervision, pycocotools, timm, addict) are shimmed; all GroundingDINO logic
is the reference's own.
"""

import importlib
import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

from inklayer_tpu.config import (BertConfig, GDinoConfig, PipelineConfig,
                                 RefineConfig, SwinConfig)
from inklayer_tpu.io import weights as W
from inklayer_tpu.models.gdino.gdino import GDinoDetector
from inklayer_tpu.models.gdino import GroundingDINO
from inklayer_tpu.models.gdino.tokenizer import WordPieceTokenizer
from inklayer_tpu.models.sam import SamPredictor
from inklayer_tpu.pipeline.runner import InkLayerPipeline
from tests.test_amg_parity import _stub_torchvision
from tests.test_fullchain_oracle_parity import (  # noqa: F401 (fixtures
    StubDepth, _iou, _load_masks, _run_reference_chain, _scene,  # re-register
    _shared_depth, oracle_env, shared_sam)  # in this module's namespace)
from tests.test_sam_parity import TINY as SAM_TINY

pytestmark = pytest.mark.slow

GD_ROOT = ("/root/reference/InkLayer/third_party/GroundingDINO/"
           "groundingdino")

# tiny-but-faithful config: d_model MUST be 256 (decoder sine embed),
# everything else shrunk.  num_queries == max_boxes so the fixed-capacity
# frontier never truncates what the reference keeps.
IMG = 256
TINY_GD = GDinoConfig(
    hidden_dim=256, num_queries=16, enc_layers=2, dec_layers=2,
    dim_feedforward=128, nheads=8, enc_n_points=4, dec_n_points=4,
    max_text_len=256, text_enhancer_nheads=4, text_enhancer_ffn=64,
    # reference derives these: embed_dim = dim_feedforward//2 = 64,
    # num_heads = nhead//2 = 4 (transformer.py:99-103)
    fusion_embed_dim=64, fusion_nheads=4,
    swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                    num_heads=(1, 2, 4, 8), window_size=4),
    bert=BertConfig(vocab_size=30522, hidden_size=32, num_layers=2,
                    num_heads=2, intermediate_size=64),
    max_boxes=16,
    shape_buckets=((IMG, IMG),),
    resize_short=IMG, resize_max=IMG,
)


class ShimTokenizer:
    """bert-base-uncased-shaped tokenizer over the offline WordPiece
    implementation — duck-types the slice of the HF AutoTokenizer API the
    reference model + predict actually use."""

    def __init__(self):
        self.t = WordPieceTokenizer()

    def convert_tokens_to_ids(self, tokens):
        return [self.t.vocab.get(tok, self.t.vocab.get("[UNK]", 100))
                for tok in tokens]

    def __call__(self, captions, padding=None, return_tensors=None):
        from transformers import BatchEncoding

        single = isinstance(captions, str)
        caps = [captions] if single else list(captions)
        ids = [self.t.encode(c) for c in caps]
        L = max(len(i) for i in ids)
        ids = [i + [0] * (L - len(i)) for i in ids]
        attn = [[1] * len(self.t.encode(c)) + [0] * (L - len(self.t.encode(c)))
                for c in caps]
        if return_tensors == "pt":
            data = {"input_ids": torch.tensor(ids),
                    "attention_mask": torch.tensor(attn),
                    "token_type_ids": torch.zeros((len(caps), L),
                                                  dtype=torch.long)}
            return BatchEncoding(data)
        if single:
            return {"input_ids": ids[0], "attention_mask": attn[0],
                    "token_type_ids": [0] * L}
        return {"input_ids": ids, "attention_mask": attn,
                "token_type_ids": [[0] * L for _ in caps]}

    def decode(self, ids):
        return self.t.decode([int(i) for i in ids])


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_gdino_env():
    """Import the reference groundingdino package FOR REAL (its own files,
    relative imports intact), with only environment-absent libs shimmed."""
    if not os.path.isdir(GD_ROOT):
        pytest.skip("reference not mounted")

    _stub_torchvision()
    tv_boxes = sys.modules["torchvision.ops.boxes"]
    if not hasattr(tv_boxes, "nms"):
        def nms(b, scores, thresh):  # groundingdino.py top-level import only
            return torch.arange(len(scores))
        tv_boxes.nms = nms
    tv_ops = sys.modules.get("torchvision.ops") or _stub("torchvision.ops")

    def box_convert(boxes, in_fmt, out_fmt):
        if in_fmt == "cxcywh" and out_fmt == "xyxy":
            cx, cy, w, h = boxes.unbind(-1)
            return torch.stack(
                [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], dim=-1)
        raise NotImplementedError((in_fmt, out_fmt))

    tv_ops.box_convert = box_convert
    sys.modules.setdefault("torchvision.ops", tv_ops)

    # backbone.py:25 imports IntermediateLayerGetter at module top (used
    # only by the ResNet path; the Swin path we exercise never calls it)
    tv_models = sys.modules.get("torchvision.models") or _stub(
        "torchvision.models")
    tv_mu = _stub("torchvision.models._utils",
                  IntermediateLayerGetter=object)
    tv_models._utils = tv_mu
    tv = sys.modules["torchvision"]
    tv.models = tv_models
    # util/misc.py:477 nested_tensor_from_tensor_list probes ONNX tracing
    tv._is_tracing = lambda: False

    if "supervision" not in sys.modules:
        _stub("supervision", Detections=object, BoxAnnotator=object)
    if "pycocotools" not in sys.modules:
        _stub("pycocotools")
        _stub("pycocotools.mask")
    if "timm" not in sys.modules or not hasattr(
            sys.modules.get("timm", None), "models"):
        from tests.test_full_transformer_parity import _stub_deps
        # registers timm.models.layers (DropPath etc.); also registers a
        # MINIMAL groundingdino.util.misc stub which we replace below
        _stub_deps()

    # wipe any minimal groundingdino stubs earlier tests registered, then
    # register the real package hierarchy rooted at the reference tree
    for key in [k for k in sys.modules if k.split(".")[0] == "groundingdino"]:
        del sys.modules[key]
    pkg = types.ModuleType("groundingdino")
    pkg.__path__ = [GD_ROOT]
    sys.modules["groundingdino"] = pkg
    # SLConfig pulls `addict` (absent) — nothing on the predict path needs
    # it, so shim the module before groundingdino.util.utils imports it
    _stub("groundingdino.util.slconfig", SLConfig=object)
    # datasets.transforms pulls torchvision.transforms.functional internals;
    # only load_image uses it (we feed predict the tensor directly)
    _stub("groundingdino.datasets")
    _stub("groundingdino.datasets.transforms")

    gd_mod = importlib.import_module(
        "groundingdino.models.GroundingDINO.groundingdino")
    bb_mod = importlib.import_module(
        "groundingdino.models.GroundingDINO.backbone.backbone")
    swin_mod = importlib.import_module(
        "groundingdino.models.GroundingDINO.backbone.swin_transformer")
    pos_mod = importlib.import_module(
        "groundingdino.models.GroundingDINO.backbone.position_encoding")
    tr_mod = importlib.import_module(
        "groundingdino.models.GroundingDINO.transformer")
    inference = importlib.import_module("groundingdino.util.inference")
    return {"gd": gd_mod, "backbone": bb_mod, "swin": swin_mod,
            "pos": pos_mod, "transformer": tr_mod, "inference": inference}


@pytest.fixture(scope="module")
def shared_gdino(ref_gdino_env, tmp_path_factory):
    """One tiny reference GroundingDINO (random weights, perturbed away from
    the zero deformable inits), saved; our detector loads it through the
    production converter."""
    env = ref_gdino_env
    c = TINY_GD
    torch.manual_seed(0)

    swin = env["swin"].SwinTransformer(
        pretrain_img_size=224, embed_dim=c.swin.embed_dim,
        depths=tuple(c.swin.depths), num_heads=tuple(c.swin.num_heads),
        window_size=c.swin.window_size, ape=False, patch_norm=True,
        out_indices=(1, 2, 3), use_checkpoint=False)
    pos = env["pos"].PositionEmbeddingSineHW(
        c.hidden_dim // 2, temperatureH=20, temperatureW=20, normalize=True)
    backbone = env["backbone"].Joiner(swin, pos)
    backbone.num_channels = [c.swin.embed_dim * 2 ** i for i in (1, 2, 3)]

    transformer = env["transformer"].Transformer(
        d_model=c.hidden_dim, nhead=c.nheads, num_queries=c.num_queries,
        num_encoder_layers=c.enc_layers, num_decoder_layers=c.dec_layers,
        dim_feedforward=c.dim_feedforward, dropout=0.0,
        return_intermediate_dec=True, num_feature_levels=4,
        enc_n_points=c.enc_n_points, dec_n_points=c.dec_n_points,
        learnable_tgt_init=True, two_stage_type="standard",
        embed_init_tgt=True, use_text_enhancer=True, use_fusion_layer=True,
        use_text_cross_attention=True, text_dropout=0.0, fusion_dropout=0.0,
        fusion_droppath=0.0)

    # inject the offline pieces through the documented get_tokenlizer seam
    gt = sys.modules["groundingdino.util.get_tokenlizer"]
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    shim = ShimTokenizer()
    hf_bert = BertModel(HFBertConfig(
        vocab_size=c.bert.vocab_size, hidden_size=c.bert.hidden_size,
        num_hidden_layers=c.bert.num_layers,
        num_attention_heads=c.bert.num_heads,
        intermediate_size=c.bert.intermediate_size))
    orig_tok, orig_lm = gt.get_tokenlizer, gt.get_pretrained_language_model
    gt.get_tokenlizer = lambda t: shim
    gt.get_pretrained_language_model = lambda t: hf_bert
    try:
        model = env["gd"].GroundingDINO(
            backbone, transformer, num_queries=c.num_queries, aux_loss=False,
            iter_update=True, query_dim=4, num_feature_levels=4,
            nheads=c.nheads, dec_pred_bbox_embed_share=True,
            two_stage_type="standard", two_stage_class_embed_share=False,
            two_stage_bbox_embed_share=False,
            text_encoder_type="bert-base-uncased", sub_sentence_present=True,
            max_text_len=c.max_text_len)
    finally:
        gt.get_tokenlizer, gt.get_pretrained_language_model = orig_tok, orig_lm
    # break the zero/constant deformable inits so every path carries signal
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    model.eval()

    path = str(tmp_path_factory.mktemp("live_gdino") / "tiny_gdino.pth")
    torch.save(model.state_dict(), path)

    ours = GroundingDINO(TINY_GD)
    from inklayer_tpu.models.gdino.bert import subsentence_masks

    ids = np.asarray([shim.t.encode("object.")], np.int32)
    attn, pos_ids = subsentence_masks(ids)
    example = (jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1, IMG, IMG), bool),
               jnp.asarray(ids), jnp.asarray(attn),
               jnp.asarray(pos_ids.astype(np.int32)))
    params = W.load_gdino_params(path, TINY_GD, ours, example)

    # random weights give arbitrary sigmoid scores; the stock 0.2 threshold
    # can keep nothing (vacuous test).  Pick the threshold adaptively from
    # THIS model's score distribution on the test scene: run predict at
    # threshold 0, then place the cut in the widest gap among the top
    # scores so a handful survive and no score sits within test tolerance
    # of the cut (membership robust to 2e-4 numeric drift).
    env_all = {"inference": ref_gdino_env["inference"]}
    _, scores_all, _ = _ref_predict(env_all, model, _scene_rgb(),
                                    box_threshold=0.0)
    s = np.sort(scores_all.numpy())[::-1]
    assert len(s) >= 4, "tiny model produced too few queries"
    hi = min(10, len(s) - 1)
    gaps = s[1:hi] - s[2:hi + 1]  # keep at least 2 boxes
    gi = int(np.argmax(gaps)) + 1
    thr = float((s[gi] + s[gi + 1]) / 2)
    return model, params, thr


def _scene_rgb():
    return _scene()


def _ref_predict(env, model, rgb, box_threshold=0.2, text_threshold=0.0):
    """reference predict() on the normalized image tensor (load_image's
    RandomResize is identity at the 256-bucket both sides use)."""
    x = torch.tensor(rgb.astype(np.float32) / 255.0).permute(2, 0, 1)
    mean = torch.tensor([0.485, 0.456, 0.406])[:, None, None]
    std = torch.tensor([0.229, 0.224, 0.225])[:, None, None]
    x = (x - mean) / std
    return env["inference"].predict(
        model=model, image=x, caption="object", box_threshold=box_threshold,
        text_threshold=text_threshold, device="cpu")


def test_detect_interface_parity(ref_gdino_env, shared_gdino):
    """The detect crossing itself: reference predict vs our detector on the
    same pixels + weights — threshold decisions, scores, cxcywh boxes and
    posmap phrases must agree (ours is score-sorted; predict keeps query
    order)."""
    import dataclasses

    model, params, thr = shared_gdino
    rgb = _scene_rgb()
    boxes_t, scores_t, phrases = _ref_predict(ref_gdino_env, model, rgb,
                                              box_threshold=thr)
    cfg = dataclasses.replace(TINY_GD, box_threshold=thr)
    det = GDinoDetector(params, cfg).detect(rgb)

    ref_scores = scores_t.numpy()
    ref_boxes = boxes_t.numpy()
    assert len(ref_scores) > 0, "vacuous: reference kept nothing"
    assert len(det["scores"]) == len(ref_scores)
    order = np.argsort(-ref_scores, kind="stable")
    np.testing.assert_allclose(det["scores"], ref_scores[order], atol=2e-4)
    # box coords accumulate fp drift through the full random-weight stack
    # (Swin + BERT + 2-enc/2-dec + iterative sigmoid box refinement):
    # measured ~3e-3 normalized (~0.9 px at 256²) with IDENTICAL weights.
    # Threshold membership above is gap-protected, so 6e-3 stays a real
    # interface assertion (cxcywh convention + scaling), not a free pass.
    np.testing.assert_allclose(det["boxes"], ref_boxes[order], atol=6e-3)
    assert det["labels"] == [phrases[i] for i in order]
    # the constant caption produces 'object' phrases through the posmap path
    assert all(lbl == "object" for lbl in det["labels"])


def test_full_chain_from_pixels(ref_gdino_env, shared_gdino, oracle_env,
                                shared_sam, tmp_path):
    """Pixels -> live reference GDINO -> reference SAM/clean/NMS/refine vs
    our full pipeline, asserting the end-of-chain artifacts."""
    import dataclasses

    oe = oracle_env
    tsam, sam_ckpt, sam_params = shared_sam

    env = ref_gdino_env
    model, params, thr = shared_gdino
    cfg = dataclasses.replace(TINY_GD, box_threshold=thr)
    rgb = _scene()
    depth_map = _shared_depth()
    sketch_path = str(tmp_path / "scene.png")
    Image.fromarray(rgb).save(sketch_path)

    # ---- reference side: live predict -> dino_out dict -> chain ---------
    boxes_t, scores_t, phrases = _ref_predict(env, model, rgb,
                                              box_threshold=thr)
    proc = oe["processing"]
    dino_out = {
        "bboxes": proc.cxcywh_to_xyxy(boxes_t.numpy().tolist()).tolist(),
        "scores": scores_t.numpy().tolist(),
        "labels": phrases,
    }
    ref_dir = _run_reference_chain(
        oe, tsam, sam_ckpt, sketch_path, str(tmp_path / "ref_out"),
        depth_map, dino_out=dino_out)

    # ---- our side: the real pipeline with the converted detector ---------
    pipe = InkLayerPipeline(
        GDinoDetector(params, cfg),
        SamPredictor(sam_params, SAM_TINY, box_capacity=16),
        StubDepth(depth_map),
        cfg=PipelineConfig(sam=SAM_TINY, refine=RefineConfig()))
    our_dir = pipe.run(sketch_path, str(tmp_path / "our_out"),
                       no_intermediate=False, inpaint=False)
    pipe.drain()

    # our bboxes.json is score-sorted, the reference's is query-ordered —
    # same SET of detections (asserted exactly in the interface test);
    # the final artifacts below are order-canonical (NMS sorts by score,
    # refine orders by depth) so they must agree
    with open(os.path.join(ref_dir, "bboxes_final.json")) as f:
        ref_final = json.load(f)
    with open(os.path.join(our_dir, "bboxes_final.json")) as f:
        our_final = json.load(f)
    assert ref_final["kept_indices"], "vacuous scene: reference kept nothing"
    assert len(our_final["kept_indices"]) == len(ref_final["kept_indices"])
    ref_kept = sorted(
        tuple(np.round(b, 4)) for b in ref_final["bboxes"])
    our_kept = sorted(
        tuple(np.round(b, 4)) for b in our_final["bboxes"])
    for a, b in zip(our_kept, ref_kept):
        # 2 px: ~0.9 px of detector fp drift (see interface test) plus the
        # int-floor pixel quantization both sides apply to box corners
        np.testing.assert_allclose(a, b, atol=2.01 / IMG)

    ref_masks = _load_masks(os.path.join(ref_dir, "masks_final"))
    our_masks = _load_masks(os.path.join(our_dir, "masks_final"))
    assert ref_masks, "vacuous scene: no final masks"
    assert len(our_masks) == len(ref_masks)
    # the detectors' boxes differ by ~1 px (fp drift, asserted ≤2 px above),
    # which legitimately shifts watershed catchments downstream — exact-mask
    # parity GIVEN identical boxes is test_fullchain_oracle_parity's job
    # (0.95 there).  Here: strong overall agreement + no mask degenerates.
    ious = [_iou(a, b) for a, b in zip(our_masks, ref_masks)]
    assert min(ious) >= 0.75, f"mask IoUs {ious}"
    assert float(np.mean(ious)) >= 0.90, f"mask IoUs {ious}"
