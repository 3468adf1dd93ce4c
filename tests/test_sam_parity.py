"""Numerical parity of the SAM stack against the REFERENCE's own torch
implementation (imported from /root/reference as a read-only test oracle;
its modeling files depend only on torch, which is available on CPU).

Weights flow through our checkpoint converter, inputs through both
frameworks, outputs compared at tight tolerance — end-to-end evidence that
encoder, prompt encoder, and mask decoder match the reference bit-for-bit
up to fp32 accumulation order.
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

from inklayer_tpu.config import SamConfig
from inklayer_tpu.io import weights as W
from inklayer_tpu.models.sam import Sam

REF = ("/root/reference/InkLayer/third_party/segment-anything/"
       "segment_anything/modeling")


@pytest.fixture(scope="module")
def refsam():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    pkg = types.ModuleType("refsam")
    pkg.__path__ = [REF]
    sys.modules["refsam"] = pkg
    mods = {}
    for name in ("common", "image_encoder", "prompt_encoder", "transformer",
                 "mask_decoder"):
        spec = importlib.util.spec_from_file_location(
            f"refsam.{name}", os.path.join(REF, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refsam.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


TINY = SamConfig(
    encoder_embed_dim=32, encoder_depth=3, encoder_num_heads=2,
    encoder_global_attn_indexes=(1,), encoder_window_size=2,
    image_size=64, patch_size=16, prompt_embed_dim=32)


@pytest.fixture(scope="module")
def torch_modules(refsam):
    torch.manual_seed(0)
    enc = refsam["image_encoder"].ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4.0, out_chans=32, qkv_bias=True, use_rel_pos=True,
        window_size=2, global_attn_indexes=(1,),
        norm_layer=torch.nn.LayerNorm, act_layer=torch.nn.GELU)
    pe = refsam["prompt_encoder"].PromptEncoder(
        embed_dim=32, image_embedding_size=(4, 4), input_image_size=(64, 64),
        mask_in_chans=16)
    dec = refsam["mask_decoder"].MaskDecoder(
        transformer_dim=32,
        transformer=refsam["transformer"].TwoWayTransformer(
            depth=2, embedding_dim=32, mlp_dim=256, num_heads=8),
        num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=32)
    for m in (enc, pe, dec):
        m.eval()
    return enc, pe, dec


@pytest.fixture(scope="module")
def converted(torch_modules, tmp_path_factory):
    enc, pe, dec = torch_modules
    sd = {}
    for prefix, m in (("image_encoder", enc), ("prompt_encoder", pe),
                      ("mask_decoder", dec)):
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    path = str(tmp_path_factory.mktemp("ckpt") / "sam_ref.pth")
    torch.save(sd, path)
    model = Sam(TINY)
    args = (jnp.zeros((1, 64, 64, 3)), jnp.zeros((2, 4)))
    params = W.load_sam_params(path, TINY, model, args)
    return model, params


def test_image_encoder_parity(torch_modules, converted, rng):
    enc, _, _ = torch_modules
    model, params = converted
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = model.apply(params, jnp.asarray(x), method=Sam.encode)
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_nchw, ref, atol=2e-4, rtol=1e-3)


def test_image_encoder_parity_padded_windows(refsam, rng, tmp_path):
    """window_size=3 with a 4x4 patch grid forces bottom/right padding in
    every windowed block — validates the shared-partition stream's pad-row
    zeroing (the reference re-pads zeros after norm1 in each block)."""
    torch.manual_seed(1)
    enc = refsam["image_encoder"].ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4.0, out_chans=32, qkv_bias=True, use_rel_pos=True,
        window_size=3, global_attn_indexes=(1,),
        norm_layer=torch.nn.LayerNorm, act_layer=torch.nn.GELU)
    enc.eval()
    pe = refsam["prompt_encoder"].PromptEncoder(
        embed_dim=32, image_embedding_size=(4, 4), input_image_size=(64, 64),
        mask_in_chans=16)
    dec = refsam["mask_decoder"].MaskDecoder(
        transformer_dim=32,
        transformer=refsam["transformer"].TwoWayTransformer(
            depth=2, embedding_dim=32, mlp_dim=256, num_heads=8),
        num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=32)
    sd = {}
    for prefix, m in (("image_encoder", enc), ("prompt_encoder", pe),
                      ("mask_decoder", dec)):
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    path = str(tmp_path / "sam_ref_w3.pth")
    torch.save(sd, path)
    cfg = SamConfig(
        encoder_embed_dim=32, encoder_depth=3, encoder_num_heads=2,
        encoder_global_attn_indexes=(1,), encoder_window_size=3,
        image_size=64, patch_size=16, prompt_embed_dim=32)
    model = Sam(cfg)
    args = (jnp.zeros((1, 64, 64, 3)), jnp.zeros((2, 4)))
    params = W.load_sam_params(path, cfg, model, args)

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = model.apply(params, jnp.asarray(x), method=Sam.encode)
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_nchw, ref, atol=2e-4, rtol=1e-3)


def test_box_prompt_mask_parity(torch_modules, converted, rng):
    enc, pe, dec = torch_modules
    model, params = converted
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    boxes = np.asarray([[8.0, 12.0, 40.0, 52.0], [4.0, 4.0, 60.0, 60.0]],
                       np.float32)
    with torch.no_grad():
        emb = enc(torch.tensor(x.transpose(0, 3, 1, 2)))
        tb = torch.tensor(boxes)
        sparse, dense = pe(points=None, boxes=tb, masks=None)
        low_res, iou = dec(
            image_embeddings=emb,
            image_pe=pe.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=False)
        ref_logits = low_res.numpy()
        ref_iou = iou.numpy()
    ours_logits, ours_iou = model.apply(
        params, jnp.asarray(x), jnp.asarray(boxes))
    ours_l = np.asarray(ours_logits)  # (N, 1, 16, 16)
    np.testing.assert_allclose(ours_l, ref_logits, atol=5e-4, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(ours_iou), ref_iou, atol=5e-4,
                               rtol=1e-2)
