"""Pipeline factory: build models + params (converted checkpoints or
deterministic placeholder init) and assemble the InkLayerPipeline."""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.config import PipelineConfig
from inklayer_tpu.models.depth import DepthAnythingV2, DepthEstimator
from inklayer_tpu.models.gdino import GDinoDetector, GroundingDINO
from inklayer_tpu.models.gdino.bert import subsentence_masks
from inklayer_tpu.models.sam import Sam, SamPredictor
from inklayer_tpu.pipeline.runner import InkLayerPipeline


def _placeholder_params(model, *example_args, seed: int = 0):
    """Structure-only params created ON DEVICE without running the real
    initialisers: zeros + tiny per-leaf deterministic offsets.  Used when no
    checkpoint is available (this env ships none) — outputs are numerically
    meaningless but every compile/execute path and FLOP is real."""
    shapes = jax.eval_shape(
        lambda k: model.init(k, *example_args), jax.random.key(seed))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    filled = [jnp.full(l.shape, 0.01 + 0.001 * (i % 7), l.dtype)
              for i, l in enumerate(leaves)]
    return jax.tree_util.tree_unflatten(treedef, filled)


def build_pipeline(cfg: PipelineConfig = PipelineConfig(),
                   models_dir: Optional[str] = None,
                   dtype: Optional[jnp.dtype] = None,
                   vocab_path: Optional[str] = None) -> InkLayerPipeline:
    """models_dir: directory with reference .pth checkpoints to convert
    (inklayer_gdino.pth, sam_vit_h_4b8939.pth, depth_anything_v2_vitb.pth);
    absent files fall back to placeholder params."""
    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def ckpt(name):
        if models_dir:
            p = os.path.join(models_dir, name)
            if os.path.exists(p):
                return p
        return None

    # ---- GroundingDINO -------------------------------------------------
    gmodel = GroundingDINO(cfg.gdino, dtype=dtype)
    bucket = cfg.gdino.shape_buckets[0]
    ids = np.asarray([[101, 4874, 1012, 102]], np.int32)
    attn, pos = subsentence_masks(ids)
    g_args = (jnp.zeros((1,) + bucket + (3,)), jnp.zeros((1,) + bucket, bool),
              jnp.asarray(ids), jnp.asarray(attn),
              jnp.asarray(pos.astype(np.int32)))
    gd_ckpt = ckpt("inklayer_gdino.pth")
    if gd_ckpt:
        from inklayer_tpu.io.weights import load_gdino_params
        gparams = load_gdino_params(gd_ckpt, cfg.gdino, gmodel, g_args)
    else:
        gparams = _placeholder_params(gmodel, *g_args)
    detector = GDinoDetector(gparams, cfg.gdino, dtype=dtype,
                             vocab_path=vocab_path)

    # ---- SAM ------------------------------------------------------------
    smodel = Sam(cfg.sam, dtype=dtype)
    s_args = (jnp.zeros((1, cfg.sam.image_size, cfg.sam.image_size, 3)),
              jnp.zeros((8, 4)))
    sam_ckpt = ckpt("sam_vit_h_4b8939.pth")
    if sam_ckpt:
        from inklayer_tpu.io.weights import load_sam_params
        sparams = load_sam_params(sam_ckpt, cfg.sam, smodel, s_args)
    else:
        sparams = _placeholder_params(smodel, *s_args)
    sam_predictor = SamPredictor(sparams, cfg.sam, dtype=dtype)

    # ---- Depth ----------------------------------------------------------
    dmodel = DepthAnythingV2(cfg.depth, dtype=dtype)
    d_args = (jnp.zeros((1, cfg.depth.input_size, cfg.depth.input_size, 3)),)
    d_ckpt = ckpt(f"depth_anything_v2_{cfg.depth.encoder}.pth")
    if d_ckpt:
        from inklayer_tpu.io.weights import load_depth_params
        dparams = load_depth_params(d_ckpt, cfg.depth, dmodel, d_args)
    else:
        dparams = _placeholder_params(dmodel, *d_args)
    depth_est = DepthEstimator(dparams, cfg.depth, dtype=dtype)

    inpainter = build_inpainter(cfg, dtype=dtype)
    return InkLayerPipeline(detector, sam_predictor, depth_est,
                            inpainter=inpainter, cfg=cfg)


def build_inpainter(cfg: PipelineConfig, dtype: jnp.dtype = jnp.float32):
    """ControlNet-inpaint stage.  Mirrors the reference's lazy global
    singleton (inpaint_ControlNet.py:14-47): the diffusion models are built
    on first use."""
    from inklayer_tpu.pipeline.inpaint.orchestrate import Inpainter

    state = {}

    def make_pipe():
        from inklayer_tpu.models.diffusion import (
            AutoencoderKL, CLIPTextEncoder, ControlNet,
            ControlNetInpaintPipeline, UNet2DCondition)
        d = cfg.diffusion
        text = CLIPTextEncoder(hidden=d.cross_attention_dim,
                               heads=max(1, d.cross_attention_dim // 64),
                               max_len=d.text_maxlen, dtype=dtype)
        unet = UNet2DCondition(block_channels=d.unet_block_channels,
                               context_dim=d.cross_attention_dim, dtype=dtype)
        cnet = ControlNet(block_channels=d.unet_block_channels,
                          context_dim=d.cross_attention_dim, dtype=dtype)
        vae = AutoencoderKL(d.vae_channels, d.latent_channels, dtype=dtype)
        s8 = d.resolution // 8
        params = {
            "text": _placeholder_params(
                text, jnp.zeros((2, d.text_maxlen), jnp.int32)),
            "unet": _placeholder_params(
                unet, jnp.zeros((2, s8, s8, 9)), jnp.zeros((2,), jnp.int32),
                jnp.zeros((2, d.text_maxlen, d.cross_attention_dim))),
            "controlnet": _placeholder_params(
                cnet, jnp.zeros((2, s8, s8, 4)), jnp.zeros((2,), jnp.int32),
                jnp.zeros((2, d.text_maxlen, d.cross_attention_dim)),
                jnp.zeros((2, d.resolution, d.resolution, 3))),
            "vae": _placeholder_params(
                vae, jnp.zeros((1, d.resolution, d.resolution, 3))),
        }
        return ControlNetInpaintPipeline(params, d, dtype=dtype)

    def inpaint_func(image, mask):
        if "pipe" not in state:
            state["pipe"] = make_pipe()
            state["fn"] = state["pipe"].inpaint_fn()
        return state["fn"](image, mask)

    return Inpainter(inpaint_func)
