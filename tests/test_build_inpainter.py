"""build_inpainter: diffusers-layout checkpoint wiring + prompted
single-layer inpainting.

Parity targets:
- inpaint_ControlNet.py:14-47 — the reference loads real
  lllyasviel/control_v11p_sd15_inpaint + runwayml/stable-diffusion-inpainting
  weights; build_inpainter must convert a diffusers-layout models_dir.
- inpaint_single_layer.py:10-85 — the web edit path passes the USER prompt
  with cfg 7.0 / cond 0.6 / one pass (vs the pipeline's 9.0 / 1.2 / two).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from PIL import Image

from inklayer_tpu.build import build_inpainter, resolve_diffusion_checkpoints
from inklayer_tpu.config import DiffusionConfig, PipelineConfig
from inklayer_tpu.io import weights as W

from tests.test_weights_diffusion import _synthesize

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier


def _tiny_cfg() -> PipelineConfig:
    d = dataclasses.replace(
        DiffusionConfig(), resolution=64, num_steps=2, num_passes=1,
        unet_block_channels=(8, 16, 16, 16), cross_attention_dim=16,
        vae_channels=(8, 8, 8, 8), text_maxlen=16)
    return dataclasses.replace(PipelineConfig(), diffusion=d)


def _write_diffusers_dir(tmp_path, cfg: PipelineConfig,
                         use_safetensors: bool = False) -> str:
    """Synthesize a complete diffusers-layout checkpoint dir for the tiny
    config, using the inverted rule tables (every flax leaf covered)."""
    from inklayer_tpu.models.diffusion import (
        AutoencoderKL, CLIPTextEncoder, ControlNet, UNet2DCondition)

    d = cfg.diffusion
    rng = np.random.default_rng(0)
    s8 = d.resolution // 8
    comps = {
        "text": (CLIPTextEncoder(hidden=d.cross_attention_dim, heads=1,
                                 max_len=d.text_maxlen),
                 (jnp.zeros((2, d.text_maxlen), jnp.int32),),
                 W.CLIP_TEXT_RULES,
                 "stable-diffusion-inpainting/text_encoder/pytorch_model.bin"),
        "unet": (UNet2DCondition(block_channels=d.unet_block_channels,
                                 context_dim=d.cross_attention_dim),
                 (jnp.zeros((2, s8, s8, 9)), jnp.zeros((2,), jnp.int32),
                  jnp.zeros((2, d.text_maxlen, d.cross_attention_dim))),
                 W.UNET_RULES,
                 "stable-diffusion-inpainting/unet/diffusion_pytorch_model.bin"),
        "controlnet": (ControlNet(block_channels=d.unet_block_channels,
                                  context_dim=d.cross_attention_dim),
                       (jnp.zeros((2, s8, s8, 4)), jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, d.text_maxlen, d.cross_attention_dim)),
                        jnp.zeros((2, d.resolution, d.resolution, 3))),
                       W.CONTROLNET_RULES,
                       "control_v11p_sd15_inpaint/diffusion_pytorch_model.bin"),
        "vae": (AutoencoderKL(d.vae_channels, d.latent_channels),
                (jnp.zeros((1, d.resolution, d.resolution, 3)),),
                W.VAE_RULES,
                "stable-diffusion-inpainting/vae/diffusion_pytorch_model.bin"),
    }
    for name, (model, args, rules, rel) in comps.items():
        template = jax.eval_shape(lambda k, m=model, a=args: m.init(k, *a),
                                  jax.random.key(0))
        sd = _synthesize(rules, template, rng)
        path = tmp_path / rel
        os.makedirs(path.parent, exist_ok=True)
        if use_safetensors and name == "unet":
            from safetensors.torch import save_file
            path = path.parent / "diffusion_pytorch_model.safetensors"
            save_file({k: torch.tensor(v).contiguous()
                       for k, v in sd.items()}, str(path))
        else:
            torch.save({k: torch.tensor(v) for k, v in sd.items()}, str(path))
    return str(tmp_path)


@pytest.mark.parametrize("use_safetensors", [False, True])
def test_inpainter_converts_diffusers_dir(tmp_path, capsys, use_safetensors):
    cfg = _tiny_cfg()
    models_dir = _write_diffusers_dir(tmp_path, cfg,
                                      use_safetensors=use_safetensors)
    ckpts = resolve_diffusion_checkpoints(models_dir)
    assert all(ckpts[c] for c in ("unet", "vae", "text", "controlnet"))

    inp = build_inpainter(cfg, models_dir=models_dir)
    img = Image.fromarray(np.full((48, 48, 3), 255, np.uint8))
    mask = Image.fromarray(np.zeros((48, 48), np.uint8))
    mask.paste(255, (10, 10, 30, 30))
    out = inp.inpaint_func(img, mask)
    assert out.size == img.size
    logged = capsys.readouterr().out
    for comp in ("unet", "vae", "text", "controlnet"):
        assert f"converted {comp}" in logged, logged
    assert "placeholder params" not in logged


def test_inpainter_partial_dir_falls_back(tmp_path, capsys):
    """Missing components use placeholder params with a warning instead of
    crashing (graceful per-component fallback)."""
    cfg = _tiny_cfg()
    models_dir = _write_diffusers_dir(tmp_path, cfg)
    os.remove(os.path.join(
        models_dir, "stable-diffusion-inpainting", "vae",
        "diffusion_pytorch_model.bin"))
    inp = build_inpainter(cfg, models_dir=models_dir)
    img = Image.fromarray(np.full((32, 32, 3), 255, np.uint8))
    mask = Image.fromarray(np.zeros((32, 32), np.uint8))
    inp.inpaint_func(img, mask)
    logged = capsys.readouterr().out
    assert "WARNING: no vae checkpoint" in logged
    assert "converted unet" in logged


def test_single_layer_prompt_and_params(monkeypatch):
    """The user prompt reaches generate()/_encode_prompt with the
    single-layer params (cfg 7.0, cond 0.6, ONE pass), which differ from the
    pipeline defaults (9.0, 1.2, two passes)."""
    import inklayer_tpu.models.diffusion.pipeline as P

    cfg = _tiny_cfg()
    seen = {}
    orig_encode = P.ControlNetInpaintPipeline._encode_prompt

    def spy_encode(self, prompt, negative):
        seen["prompt"] = prompt
        seen["negative"] = negative
        return orig_encode(self, prompt, negative)

    orig_generate = P.ControlNetInpaintPipeline.generate

    def spy_generate(self, image, mask, **kw):
        seen.update(kw)
        return orig_generate(self, image, mask, **kw)

    monkeypatch.setattr(P.ControlNetInpaintPipeline, "_encode_prompt",
                        spy_encode)
    monkeypatch.setattr(P.ControlNetInpaintPipeline, "generate", spy_generate)

    inp = build_inpainter(cfg)
    img = Image.fromarray(np.full((40, 40, 3), 255, np.uint8))
    mask = Image.fromarray(np.zeros((40, 40), np.uint8))
    mask.paste(255, (5, 5, 20, 20))
    out = inp.inpaint_single_layer(img, mask, "a red bunny")
    assert out.size == img.size
    assert seen["prompt"] == "a red bunny"
    assert seen["negative"] == cfg.diffusion.single_layer_negative_prompt
    assert seen["guidance_scale"] == 7.0
    assert seen["cond_scale"] == 0.6
    assert seen["num_passes"] == 1
    # differs from the full-pipeline defaults (inpaint_ControlNet.py:144-157)
    d = DiffusionConfig()
    assert (d.guidance_scale, d.controlnet_scale, d.num_passes) == (9.0, 1.2, 2)


def test_resolve_empty_dir():
    assert all(v is None
               for v in resolve_diffusion_checkpoints(None).values())
