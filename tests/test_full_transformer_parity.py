"""End-to-end parity of the FULL GDINO transformer (encoder + two-stage
proposal selection + decoder with iterative box refinement) against the
REFERENCE torch ``Transformer`` module (transformer.py), loaded read-only as
an oracle with its checkpoint-absent deps stubbed.

This exercises, in one numerical check: level flattening + level embeds,
valid ratios, encoder fusion/text-enhancer/deformable stack (with image
padding), gen_encoder_output_proposals, enc_output head + top-k selection,
learned tgt queries, decoder self/text-cross/deformable-cross layers,
ref_point_head sine query positions, shared bbox head anchor updates, and the
per-layer decoder norm — through the real weight-conversion rules.

d_model must be 256: the reference hardcodes 128 sine features per coord in
gen_sineembed_for_position (utils.py:204-216), which only matches
ref_point_head's input width (2*d_model) at d_model=256.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from inklayer_tpu.config import GDinoConfig
from inklayer_tpu.io import weights as W
from inklayer_tpu.models.gdino.transformer import GDinoTransformer, sine_pos_embed_hw

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier

GD = ("/root/reference/InkLayer/third_party/GroundingDINO/groundingdino/"
      "models/GroundingDINO")


def _stub_deps():
    # timm (fuse_modules)
    if "timm.models.layers" not in sys.modules:
        import importlib.machinery as _mach

        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        # a real ModuleSpec so transformers' find_spec("timm") availability
        # probe doesn't raise "timm.__spec__ is None" (import_utils.py:227)
        for _m in (timm, timm_models, timm_layers):
            _m.__spec__ = _mach.ModuleSpec(_m.__name__, loader=None)

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()

            def forward(self, x):
                return x

        timm_layers.DropPath = DropPath
        timm_layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = timm_models
        timm_models.layers = timm_layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers
    # groundingdino.util.misc.inverse_sigmoid (transformer.py top import);
    # body mirrors the reference util/misc.py:704-708
    if "groundingdino.util.misc" not in sys.modules:
        g = types.ModuleType("groundingdino")
        gu = types.ModuleType("groundingdino.util")
        gm = types.ModuleType("groundingdino.util.misc")

        def inverse_sigmoid(x, eps=1e-3):
            x = x.clamp(min=0, max=1)
            x1 = x.clamp(min=eps)
            x2 = (1 - x).clamp(min=eps)
            return torch.log(x1 / x2)

        gm.inverse_sigmoid = inverse_sigmoid
        g.util = gu
        gu.misc = gm
        sys.modules["groundingdino"] = g
        sys.modules["groundingdino.util"] = gu
        sys.modules["groundingdino.util.misc"] = gm


def _load(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(GD, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_transformer_mod():
    if not os.path.isdir(GD):
        pytest.skip("reference not mounted")
    _stub_deps()
    pkg = types.ModuleType("refgd")
    pkg.__path__ = [GD]
    sys.modules["refgd"] = pkg
    utils = _load("refgd.utils", "utils.py")
    _load("refgd.fuse_modules", "fuse_modules.py")
    _load("refgd.transformer_vanilla", "transformer_vanilla.py")
    _load("refgd.ms_deform_attn", "ms_deform_attn.py")
    tr = _load("refgd.transformer", "transformer.py")
    return tr, utils


def test_full_transformer_parity(ref_transformer_mod, tmp_path, rng):
    tr_mod, utils = ref_transformer_mod
    d, nq, ndec = 256, 24, 2
    shapes = ((12, 12), (6, 6), (3, 3), (2, 2))
    valid = ((10, 9), (5, 5), (3, 2), (2, 2))
    nt = 9

    torch.manual_seed(0)
    ref = tr_mod.Transformer(
        d_model=d, nhead=8, num_queries=nq, num_encoder_layers=2,
        num_decoder_layers=ndec, dim_feedforward=512, dropout=0.0,
        return_intermediate_dec=True,
        num_feature_levels=len(shapes), enc_n_points=4, dec_n_points=4,
        learnable_tgt_init=True, two_stage_type="standard",
        embed_init_tgt=True, use_text_enhancer=True, use_fusion_layer=True,
        use_text_cross_attention=True, text_dropout=0.0, fusion_dropout=0.0,
        fusion_droppath=0.0)
    # heads GroundingDINO attaches externally (groundingdino.py:141-180)
    ref.enc_out_class_embed = utils.ContrastiveEmbed(max_text_len=16)
    ref.enc_out_bbox_embed = utils.MLP(d, d, 4, 3)
    shared_bbox = utils.MLP(d, d, 4, 3)
    ref.decoder.bbox_embed = torch.nn.ModuleList([shared_bbox] * ndec)
    # break the zero/constant inits (deformable offsets & weights) so every
    # path carries signal
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    ref.eval()

    sd = {f"transformer.{k}": v for k, v in ref.state_dict().items()}
    for k, v in shared_bbox.state_dict().items():
        sd[f"bbox_embed.0.{k}"] = v
    path = str(tmp_path / "full_tr.pth")
    torch.save(sd, path)
    raw = W.load_torch_state_dict(path)
    flat, unmatched = W.convert_state_dict(
        raw, W.GDINO_RULES, strict=True, ignore=W.GDINO_IGNORE)
    assert not unmatched
    flat = W._split_in_proj(flat, ndec)
    tree = W.tree_from_paths(flat)["transformer"]

    cfg = GDinoConfig(
        hidden_dim=d, num_queries=nq, enc_layers=2, dec_layers=ndec,
        dim_feedforward=512, nheads=8, num_feature_levels=len(shapes),
        enc_n_points=4, dec_n_points=4, max_text_len=16,
        text_enhancer_nheads=4, text_enhancer_ffn=256,
        fusion_embed_dim=256, fusion_nheads=4)
    ours = GDinoTransformer(cfg)

    # ---- shared random inputs -------------------------------------------
    srcs, masks, poses = [], [], []
    for (h, w), (vh, vw) in zip(shapes, valid):
        srcs.append(rng.standard_normal((1, h, w, d)).astype(np.float32))
        m = np.ones((1, h, w), bool)
        m[:, :vh, :vw] = False
        masks.append(m)
        poses.append(np.asarray(
            sine_pos_embed_hw(jnp.asarray(m), d // 2, 20.0, 20.0), np.float32))
    text = rng.standard_normal((1, nt, d)).astype(np.float32)
    tok_mask = np.ones((1, nt), bool)
    tok_mask[:, 7:] = False
    attn = np.zeros((1, nt, nt), bool)  # True = attend (our convention)
    attn[0, :4, :4] = True
    attn[0, 4:7, 4:7] = True
    attn[0, np.arange(nt), np.arange(nt)] = True
    pos_ids = np.asarray([[0, 1, 2, 3, 0, 1, 2, 0, 0]], np.int64)

    template = jax.eval_shape(
        lambda k: ours.init(
            k, [jnp.asarray(s) for s in srcs], [jnp.asarray(m) for m in masks],
            [jnp.asarray(p) for p in poses], jnp.asarray(text),
            jnp.asarray(tok_mask), jnp.asarray(attn),
            jnp.asarray(pos_ids.astype(np.int32))), jax.random.key(0))
    params = W.fill_params(template, {"params": tree})
    hs_list, ref_list, memory_text = ours.apply(
        params, [jnp.asarray(s) for s in srcs], [jnp.asarray(m) for m in masks],
        [jnp.asarray(p) for p in poses], jnp.asarray(text),
        jnp.asarray(tok_mask), jnp.asarray(attn),
        jnp.asarray(pos_ids.astype(np.int32)))

    text_dict = {
        "encoded_text": torch.tensor(text),
        "text_token_mask": torch.tensor(tok_mask),
        "position_ids": torch.tensor(pos_ids),
        "text_self_attention_masks": torch.tensor(attn),
    }
    with torch.no_grad():
        hs, references, hs_enc, ref_enc, init_prop = ref(
            [torch.tensor(s.transpose(0, 3, 1, 2)) for s in srcs],
            [torch.tensor(m) for m in masks],
            None,
            [torch.tensor(p.transpose(0, 3, 1, 2)) for p in poses],
            None, attn_mask=None, text_dict=text_dict)

    np.testing.assert_allclose(
        np.asarray(memory_text), text_dict["encoded_text"].numpy(),
        atol=2e-4, rtol=1e-3)
    # initial (selected-proposal) reference points and final outputs
    np.testing.assert_allclose(
        np.asarray(ref_list[0]), references[0].numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(hs_list[-1]), hs[-1].numpy(), atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(ref_list[-1]), references[-1].numpy(), atol=5e-4, rtol=2e-3)
