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


def cast_params(params, dtype):
    """Cast floating-point param leaves to the compute dtype (bf16 on TPU).

    Weights otherwise live in HBM as fp32 and XLA fuses a convert into every
    consumer matmul — for SAM ViT-H that is ~2.5GB of fp32 param reads per
    forward vs ~1.27GB in bf16 (measured ~3ms/fwd on v5e, /tmp/sam_hlo.txt
    fused_computation.507: f32[1280,5120] converted inside the fc1 fusion).
    All norm/softmax statistics are computed in fp32 regardless (LayerNorm
    kernels upcast internally), so bf16 storage costs no stability."""
    if dtype == jnp.float32:
        return params
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)


def _placeholder_params(model, *example_args, seed: int = 0, dtype=None):
    """Structure-only params created ON DEVICE without running the real
    initialisers: zeros + tiny per-leaf deterministic offsets.  Used when no
    checkpoint is available (this env ships none) — outputs are numerically
    meaningless but every compile/execute path and FLOP is real."""
    shapes = jax.eval_shape(
        lambda k: model.init(k, *example_args), jax.random.key(seed))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    filled = [jnp.full(l.shape, 0.01 + 0.001 * (i % 7),
                       dtype if (dtype is not None
                                 and jnp.issubdtype(l.dtype, jnp.floating))
                       else l.dtype)
              for i, l in enumerate(leaves)]
    return jax.tree_util.tree_unflatten(treedef, filled)


def build_detector(cfg: PipelineConfig = PipelineConfig(),
                   models_dir: Optional[str] = None,
                   dtype: Optional[jnp.dtype] = None,
                   vocab_path: Optional[str] = None) -> GDinoDetector:
    """Standalone GDINO detector (used by the mmdet-contract alt route and
    tooling that needs detection without the full pipeline)."""
    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    gmodel = GroundingDINO(cfg.gdino, dtype=dtype)
    bucket = cfg.gdino.shape_buckets[0]
    ids = np.asarray([[101, 4874, 1012, 102]], np.int32)
    attn, pos = subsentence_masks(ids)
    g_args = (jnp.zeros((1,) + bucket + (3,)), jnp.zeros((1,) + bucket, bool),
              jnp.asarray(ids), jnp.asarray(attn),
              jnp.asarray(pos.astype(np.int32)))
    gd_ckpt = None
    if models_dir:
        p = os.path.join(models_dir, "inklayer_gdino.pth")
        gd_ckpt = p if os.path.exists(p) else None
    if gd_ckpt:
        from inklayer_tpu.io.weights import load_gdino_params
        gparams = cast_params(
            load_gdino_params(gd_ckpt, cfg.gdino, gmodel, g_args), dtype)
    else:
        gparams = _placeholder_params(gmodel, *g_args, dtype=dtype)
    if vocab_path is None and models_dir:
        # bert-base-uncased vocab.txt for exact caption tokenization
        # (reference: groundingdino/util/get_tokenlizer.py AutoTokenizer)
        vocab_path = _first_existing(
            os.path.join(models_dir, "bert-base-uncased", "vocab.txt"),
            os.path.join(models_dir, "vocab.txt"))
    return GDinoDetector(gparams, cfg.gdino, dtype=dtype,
                         vocab_path=vocab_path)


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

    detector = build_detector(cfg, models_dir=models_dir, dtype=dtype,
                              vocab_path=vocab_path)

    # ---- SAM ------------------------------------------------------------
    smodel = Sam(cfg.sam, dtype=dtype)
    s_args = (jnp.zeros((1, cfg.sam.image_size, cfg.sam.image_size, 3)),
              jnp.zeros((8, 4)))
    sam_ckpt = ckpt("sam_vit_h_4b8939.pth")
    if sam_ckpt:
        from inklayer_tpu.io.weights import load_sam_params
        sparams = cast_params(
            load_sam_params(sam_ckpt, cfg.sam, smodel, s_args), dtype)
    else:
        sparams = _placeholder_params(smodel, *s_args, dtype=dtype)
    sam_predictor = SamPredictor(sparams, cfg.sam, dtype=dtype)

    # ---- Depth ----------------------------------------------------------
    dmodel = DepthAnythingV2(cfg.depth, dtype=dtype)
    d_args = (jnp.zeros((1, cfg.depth.input_size, cfg.depth.input_size, 3)),)
    d_ckpt = ckpt(f"depth_anything_v2_{cfg.depth.encoder}.pth")
    if d_ckpt:
        from inklayer_tpu.io.weights import load_depth_params
        dparams = cast_params(
            load_depth_params(d_ckpt, cfg.depth, dmodel, d_args), dtype)
    else:
        dparams = _placeholder_params(dmodel, *d_args, dtype=dtype)
    depth_est = DepthEstimator(dparams, cfg.depth, dtype=dtype)

    inpainter = build_inpainter(cfg, dtype=dtype, models_dir=models_dir)
    return InkLayerPipeline(detector, sam_predictor, depth_est,
                            inpainter=inpainter, cfg=cfg)


def _first_existing(*paths):
    for p in paths:
        if p and os.path.exists(p):
            return p
    return None


def resolve_diffusion_checkpoints(models_dir: Optional[str]) -> dict:
    """Locate the diffusers-layout component weight files under models_dir.

    Expected layout (what `huggingface-cli download` of
    runwayml/stable-diffusion-inpainting + lllyasviel/control_v11p_sd15_inpaint
    produces — the two repos the reference loads at
    inpaint_ControlNet.py:14-47):

        {models_dir}/stable-diffusion-inpainting/unet/diffusion_pytorch_model.{safetensors,bin}
        {models_dir}/stable-diffusion-inpainting/vae/diffusion_pytorch_model.{safetensors,bin}
        {models_dir}/stable-diffusion-inpainting/text_encoder/{model.safetensors,pytorch_model.bin}
        {models_dir}/control_v11p_sd15_inpaint/diffusion_pytorch_model.{safetensors,bin}
        {models_dir}/clip-vit-large-patch14/{vocab.json,merges.txt}   (tokenizer)

    Returns {component: path-or-None}.
    """
    out = {"unet": None, "vae": None, "text": None, "controlnet": None,
           "clip_vocab": None, "clip_merges": None}
    if not models_dir:
        return out
    sd = os.path.join(models_dir, "stable-diffusion-inpainting")
    cn = os.path.join(models_dir, "control_v11p_sd15_inpaint")
    tok = os.path.join(models_dir, "clip-vit-large-patch14")
    weight_names = ("diffusion_pytorch_model.safetensors",
                    "diffusion_pytorch_model.bin")
    out["unet"] = _first_existing(
        *[os.path.join(sd, "unet", n) for n in weight_names])
    out["vae"] = _first_existing(
        *[os.path.join(sd, "vae", n) for n in weight_names])
    out["text"] = _first_existing(
        os.path.join(sd, "text_encoder", "model.safetensors"),
        os.path.join(sd, "text_encoder", "pytorch_model.bin"))
    out["controlnet"] = _first_existing(
        *[os.path.join(cn, n) for n in weight_names])
    out["clip_vocab"] = _first_existing(
        os.path.join(tok, "vocab.json"), os.path.join(models_dir, "vocab.json"))
    out["clip_merges"] = _first_existing(
        os.path.join(tok, "merges.txt"), os.path.join(models_dir, "merges.txt"))
    return out


def build_inpainter(cfg: PipelineConfig, dtype: jnp.dtype = jnp.float32,
                    models_dir: Optional[str] = None):
    """ControlNet-inpaint stage.  Mirrors the reference's lazy global
    singleton (inpaint_ControlNet.py:14-47): the diffusion models are built
    on first use.  When `models_dir` holds diffusers-layout checkpoints
    (see resolve_diffusion_checkpoints) they are converted per component;
    missing components fall back to placeholder params with a warning."""
    from inklayer_tpu.pipeline.inpaint.orchestrate import Inpainter

    state = {}

    def make_pipe():
        from inklayer_tpu.models.diffusion import (
            AutoencoderKL, CLIPTextEncoder, ControlNet,
            ControlNetInpaintPipeline, UNet2DCondition)
        from inklayer_tpu.models.diffusion.clip_text import CLIPTokenizer
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
        example_args = {
            "text": (jnp.zeros((2, d.text_maxlen), jnp.int32),),
            "unet": (jnp.zeros((2, s8, s8, 9)), jnp.zeros((2,), jnp.int32),
                     jnp.zeros((2, d.text_maxlen, d.cross_attention_dim))),
            "controlnet": (
                jnp.zeros((2, s8, s8, 4)), jnp.zeros((2,), jnp.int32),
                jnp.zeros((2, d.text_maxlen, d.cross_attention_dim)),
                jnp.zeros((2, d.resolution, d.resolution, 3))),
            "vae": (jnp.zeros((1, d.resolution, d.resolution, 3)),),
        }
        models = {"text": text, "unet": unet, "controlnet": cnet, "vae": vae}
        ckpts = resolve_diffusion_checkpoints(models_dir)

        def loaders():
            from inklayer_tpu.io.weights import (
                load_clip_text_params, load_controlnet_params,
                load_unet_params, load_vae_params)
            return {"text": load_clip_text_params, "unet": load_unet_params,
                    "controlnet": load_controlnet_params,
                    "vae": load_vae_params}

        params = {}
        load = loaders() if any(ckpts[c] for c in models) else None
        for name, model in models.items():
            path = ckpts[name]
            if path:
                t0 = time.time()
                params[name] = cast_params(
                    load[name](path, model, example_args[name]), dtype)
                print(f"[inpaint] converted {name} from {path} "
                      f"({time.time() - t0:.1f}s)")
            else:
                if models_dir:
                    print(f"[inpaint] WARNING: no {name} checkpoint under "
                          f"{models_dir} — using placeholder params "
                          "(outputs will be noise)")
                params[name] = _placeholder_params(
                    model, *example_args[name], dtype=dtype)
        tokenizer = CLIPTokenizer(vocab_path=ckpts["clip_vocab"],
                                  merges_path=ckpts["clip_merges"])
        return ControlNetInpaintPipeline(params, d, dtype=dtype,
                                         tokenizer=tokenizer)

    def pipe():
        if "pipe" not in state:
            state["pipe"] = make_pipe()
            state["fn"] = state["pipe"].inpaint_fn()
            state["batch_fn"] = state["pipe"].inpaint_batch_fn()
        return state["pipe"]

    def inpaint_func(image, mask):
        pipe()
        return state["fn"](image, mask)

    def inpaint_batch_func(pairs):
        pipe()
        return state["batch_fn"](pairs)

    def single_layer_func(image, mask, prompt):
        """Text-guided single-layer edit: reference
        inpaint_single_layer.py:10-85 — user prompt, fixed negative, cfg 7.0,
        cond 0.6, 30 steps, seed 3, ONE pass, no sketch postprocess; result
        resized back to the input size."""
        from PIL import Image as PILImage

        from inklayer_tpu.pipeline.inpaint.prepost import (
            preprocess_image, preprocess_mask)
        p = pipe()
        img = preprocess_image(image, enhance_contrast=True, denoise=True)
        msk = preprocess_mask(mask, dilate_iterations=1, blur_radius=1)
        out = p.generate(
            img, msk, prompt=prompt,
            negative_prompt=cfg.diffusion.single_layer_negative_prompt,
            guidance_scale=cfg.diffusion.single_layer_guidance_scale,
            cond_scale=cfg.diffusion.single_layer_controlnet_scale,
            num_passes=1)
        return out.resize(image.size, PILImage.LANCZOS)

    ink = Inpainter(inpaint_func, single_layer_func=single_layer_func,
                    inpaint_batch_func=inpaint_batch_func)
    # bench/profiling access to the raw diffusion pipeline (lazily built)
    ink.get_pipeline = pipe
    return ink
