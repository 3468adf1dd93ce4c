"""SDXL inpainting variant.

Parity target: inpainting/inpaint_SDXL.py (:13-35) — the reference's
alternative backend (diffusers/stable-diffusion-xl-1.0-inpainting-0.1 at
1024², 20 steps, strength 0.99, same prompt template).

SDXL architecture (published): UNet block channels (320, 640, 1280) with
transformer depths (0, 2, 10), linear projections, head_dim 64, context
2048 = concat(CLIP-L penultimate 768, OpenCLIP-bigG penultimate 1280),
"text_time" additional conditioning (pooled bigG embed 1280 + 6 time-ids
sinusoidal 256 -> 2816 -> MLP into the time embedding).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from PIL import Image

from inklayer_tpu.models.diffusion.clip_text import CLIPTextLayer, CLIPTokenizer
from inklayer_tpu.models.diffusion.scheduler import DPMSolverMultistepScheduler
from inklayer_tpu.models.diffusion.unet import UNet2DCondition
from inklayer_tpu.models.diffusion.vae import AutoencoderKL
from inklayer_tpu.nn.layers import LayerNorm


@dataclass(frozen=True)
class SDXLConfig:
    resolution: int = 1024
    num_steps: int = 20
    strength: float = 0.99
    guidance_scale: float = 7.5
    seed: int = 3
    block_channels: Tuple[int, ...] = (320, 640, 1280)
    transformer_layers: Tuple[int, ...] = (0, 2, 10)
    context_dim: int = 2048
    pooled_dim: int = 1280
    latent_channels: int = 4
    vae_channels: Tuple[int, ...] = (128, 256, 512, 512)
    text_l_hidden: int = 768
    text_g_hidden: int = 1280
    text_l_layers: int = 12
    text_g_layers: int = 32
    prompt: str = (
        "A complete clean black and white 2D line sketch drawing, "
        "high quality details, completed shapes")
    negative_prompt: str = (
        "photorealistic, color, shading, gradient, blurry, incomplete")


class CLIPTextTower(nn.Module):
    """CLIP text transformer returning the penultimate hidden state (SDXL
    convention) and a pooled projection (bigG tower only)."""

    vocab_size: int = 49408
    hidden: int = 1280
    layers: int = 32
    heads: int = 20
    max_len: int = 77
    pooled_proj: int = 0  # >0: return projected EOS embedding too
    act: str = "quick_gelu"  # bigG tower: "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        b, n = input_ids.shape
        x = nn.Embed(self.vocab_size, self.hidden, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (self.max_len, self.hidden))
        x = x + pos[None, :n].astype(self.dtype)
        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
        penultimate = None
        for i in range(self.layers):
            if i == self.layers - 1:
                penultimate = x
            x = CLIPTextLayer(self.hidden, self.heads, act=self.act,
                              dtype=self.dtype, name=f"layers_{i}")(x, causal)
        final = LayerNorm(eps=1e-5, dtype=self.dtype,
                          name="final_layer_norm")(x)
        pooled = None
        if self.pooled_proj:
            eos_idx = jnp.argmax(
                (input_ids == CLIPTokenizer.EOS).astype(jnp.int32), axis=1)
            eos = final[jnp.arange(b), eos_idx]
            pooled = nn.Dense(self.pooled_proj, use_bias=False,
                              dtype=self.dtype, name="text_projection")(eos)
        return penultimate, pooled


def build_sdxl_models(cfg: SDXLConfig, dtype=jnp.float32):
    unet = UNet2DCondition(
        in_channels=9, block_channels=cfg.block_channels,
        transformer_layers=cfg.transformer_layers, linear_proj=True,
        head_dim=64, context_dim=cfg.context_dim,
        addition_embed_dim=256, addition_proj_dim=cfg.pooled_dim + 6 * 256,
        dtype=dtype)
    vae = AutoencoderKL(cfg.vae_channels, cfg.latent_channels, dtype=dtype)
    text_l = CLIPTextTower(hidden=cfg.text_l_hidden, layers=cfg.text_l_layers,
                           heads=max(1, cfg.text_l_hidden // 64),
                           dtype=dtype)
    text_g = CLIPTextTower(hidden=cfg.text_g_hidden, layers=cfg.text_g_layers,
                           heads=max(1, cfg.text_g_hidden // 64),
                           pooled_proj=cfg.pooled_dim, act="gelu", dtype=dtype)
    return unet, vae, text_l, text_g


class SDXLInpaintPipeline:
    """params: {'unet', 'vae', 'text_l', 'text_g'} trees."""

    def __init__(self, params, cfg: SDXLConfig = SDXLConfig(),
                 dtype=jnp.float32, tokenizer: Optional[CLIPTokenizer] = None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer or CLIPTokenizer()
        self.scheduler = DPMSolverMultistepScheduler()
        self.unet, self.vae, self.text_l, self.text_g = build_sdxl_models(
            cfg, dtype)
        self._sample_jit = jax.jit(
            self._sample, static_argnames=("steps", "guidance", "t_start"))

    def _encode_prompt(self, prompt, negative):
        ids = np.concatenate([self.tokenizer.encode(negative),
                              self.tokenizer.encode(prompt)])
        ids = jnp.asarray(ids)
        pen_l, _ = self.text_l.apply(self.params["text_l"], ids)
        pen_g, pooled = self.text_g.apply(self.params["text_g"], ids)
        context = jnp.concatenate([pen_l, pen_g], axis=-1)  # (2, 77, 2048)
        return context, pooled

    def _sample(self, params, context, pooled, image01, mask01, noise,
                tables, time_ids, steps: int, guidance: float, t_start: int):
        ts, a_t, s_t, c_sample, c_x0, c_d = tables
        img = image01 * 2.0 - 1.0
        masked = img * (mask01 < 0.5)
        masked_lat = self.vae.apply(params["vae"], masked[None],
                                    method=AutoencoderKL.encode)
        image_lat = self.vae.apply(params["vae"], img[None],
                                   method=AutoencoderKL.encode)
        lh, lw = masked_lat.shape[1:3]
        mask_lat = jax.image.resize(mask01[None, :, :, :1], (1, lh, lw, 1),
                                    "nearest")
        # strength < 1: start from noised image latents at t_start
        t0 = ts[t_start]
        latents = a_t[t_start] * image_lat + s_t[t_start] * noise

        def body(i, carry):
            latents, x0_prev = carry
            idx = t_start + i
            t = ts[idx]
            lat_in = jnp.concatenate([latents, latents], axis=0)
            t_in = jnp.full((2,), t, jnp.int32)
            nine = jnp.concatenate([
                lat_in,
                jnp.concatenate([mask_lat, mask_lat], axis=0),
                jnp.concatenate([masked_lat, masked_lat], axis=0),
            ], axis=-1)
            eps = self.unet.apply(
                params["unet"], nine, t_in, context,
                pooled_text=pooled, time_ids=time_ids)
            eps_u, eps_c = eps[0:1], eps[1:2]
            eps = (eps_u + guidance * (eps_c - eps_u)).astype(jnp.float32)
            x0 = (latents - s_t[idx] * eps) / a_t[idx]
            new = (c_sample[idx] * latents + c_x0[idx] * x0
                   + c_d[idx] * (x0 - x0_prev))
            return new, x0

        latents, _ = jax.lax.fori_loop(
            0, steps - t_start, body, (latents, jnp.zeros_like(latents)))
        out = self.vae.apply(params["vae"], latents,
                             method=AutoencoderKL.decode)
        return jnp.clip(out[0] * 0.5 + 0.5, 0.0, 1.0)

    def generate(self, image: Image.Image, mask: Image.Image,
                 prompt: Optional[str] = None,
                 negative_prompt: Optional[str] = None) -> Image.Image:
        from inklayer_tpu.models.diffusion.pipeline import _solver_tables

        cfg = self.cfg
        size = cfg.resolution
        prompt = prompt if prompt is not None else cfg.prompt
        negative = (negative_prompt if negative_prompt is not None
                    else cfg.negative_prompt)
        context, pooled = self._encode_prompt(prompt, negative)
        tables = tuple(jnp.asarray(t) for t in
                       _solver_tables(self.scheduler, cfg.num_steps))
        t_start = max(0, int(round(cfg.num_steps * (1 - cfg.strength))))
        img_r = image.resize((size, size), Image.LANCZOS)
        mask_r = mask.resize((size, size), Image.LANCZOS)
        img01 = np.asarray(img_r.convert("RGB"), np.float32) / 255.0
        mask01 = np.asarray(mask_r.convert("L"), np.float32)[..., None] / 255.0
        noise = jax.random.normal(jax.random.key(cfg.seed),
                                  (1, size // 8, size // 8,
                                   cfg.latent_channels))
        # SDXL time_ids: (orig_h, orig_w, crop_y, crop_x, target_h, target_w)
        time_ids = jnp.asarray(
            [[size, size, 0, 0, size, size]] * 2, jnp.float32)
        out = self._sample_jit(self.params, context, pooled,
                               jnp.asarray(img01), jnp.asarray(mask01), noise,
                               tables, time_ids, steps=cfg.num_steps,
                               guidance=float(cfg.guidance_scale),
                               t_start=t_start)
        arr = (np.asarray(out) * 255).astype(np.uint8)
        return Image.fromarray(arr).resize(image.size, Image.LANCZOS)
