"""Roofline + per-op accounting for the diffusion stage (VERDICT r03 #3).

The 768² 30-step SD1.5+ControlNet fused loop is the largest-FLOP program in
the repo.  This script measures, on the real chip:
  * warm wall time per 30-step sample (loop-amortized, scalar-readback
    forced completion — bench protocol)
  * the XLA-reported FLOP count of the compiled program -> measured MFU vs
    the bf16 peak
  * a per-op device-track decomposition (attention / conv / controlnet /
    vae / solver glue) from one profiler-traced call

Usage: python scripts/profile_diffusion.py [--steps 30] [--res 768]
Results are summarised in BASELINE.md ("Diffusion stage roofline").
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/inklayer_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import collections
import glob
import gzip
import json
import tempfile
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # TFLOP/s per chip (public v5e spec: 197 bf16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--res", type=int, default=768)
    ap.add_argument("--batch", type=int, default=1,
                    help="latent batch (layers batched per launch)")
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from inklayer_tpu.build import _placeholder_params
    from inklayer_tpu.config import DiffusionConfig, PipelineConfig
    from inklayer_tpu.models.diffusion import ControlNetInpaintPipeline
    from inklayer_tpu.models.diffusion.pipeline import _solver_tables

    from inklayer_tpu.models.diffusion import (AutoencoderKL,
                                               CLIPTextEncoder, ControlNet,
                                               UNet2DCondition)
    from inklayer_tpu.models.diffusion.clip_text import CLIPTokenizer

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    dcfg = DiffusionConfig(resolution=args.res, num_steps=args.steps)
    d = dcfg
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
    params = {name: _placeholder_params(m, *example_args[name], dtype=dtype)
              for name, m in models.items()}
    pipe = ControlNetInpaintPipeline(params, dcfg, dtype=dtype,
                                     tokenizer=CLIPTokenizer())

    size = dcfg.resolution
    b = args.batch
    text_emb = pipe._encode_prompt(dcfg.prompt, dcfg.negative_prompt)
    tables = tuple(jnp.asarray(t) for t in
                   _solver_tables(pipe.scheduler, args.steps))
    img01 = jnp.asarray(np.random.default_rng(0).random(
        (size, size, 3), np.float32))
    mask01 = jnp.asarray((np.random.default_rng(1).random(
        (size, size, 1)) > 0.5).astype(np.float32))
    control = jnp.asarray(np.random.default_rng(2).random(
        (size, size, 3), np.float32) * 2 - 1)
    noise = jax.random.normal(jax.random.key(3), (1, size // 8, size // 8, 4))

    call = None
    if b == 1:
        def call():
            return pipe._sample_jit(
                pipe.params, text_emb, img01, mask01, control, noise,
                tables, steps=args.steps, guidance=9.0, cond_scale=1.2)
    else:
        imgs = jnp.stack([img01] * b)
        masks = jnp.stack([mask01] * b)
        controls = jnp.stack([control] * b)
        noise_b = jnp.stack([noise[0]] * b)

        def call():
            return pipe._sample_batch_jit(
                pipe.params, text_emb, imgs, masks, controls, noise_b,
                tables, steps=args.steps, guidance=9.0, cond_scale=1.2)

    t0 = time.perf_counter()
    out = call()
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"first call (incl compile): {time.perf_counter() - t0:.1f} s")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = call()
        float(jnp.sum(out.astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))
    print(f"warm: {wall:.3f} s / {args.steps}-step sample (batch {b}) "
          f"= {wall / args.steps * 1e3:.1f} ms/step "
          f"({[round(t, 3) for t in times]})")

    # ---- XLA cost analysis ------------------------------------------------
    if b == 1:
        lowered = jax.jit(
            pipe._sample, static_argnames=("steps", "guidance", "cond_scale")
        ).lower(pipe.params, text_emb, img01, mask01, control, noise, tables,
                steps=args.steps, guidance=9.0, cond_scale=1.2)
    else:
        lowered = jax.jit(
            pipe._sample_batch,
            static_argnames=("steps", "guidance", "cond_scale")
        ).lower(pipe.params, text_emb, imgs, masks, controls, noise_b, tables,
                steps=args.steps, guidance=9.0, cond_scale=1.2)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    print(f"XLA cost-analysis flops: {flops / 1e12:.2f} TFLOP "
          f"({flops / args.steps / 1e9:.1f} GFLOP/step/sample-batch)")
    mfu = flops / wall / V5E_BF16_PEAK
    print(f"MFU vs v5e bf16 peak ({V5E_BF16_PEAK / 1e12:.0f} TF/s): "
          f"{mfu * 100:.1f}%")

    # ---- per-op trace -----------------------------------------------------
    if args.trace:
        from inklayer_tpu.profiling import device_busy_ms

        tdir = tempfile.mkdtemp(prefix="diff_trace_")
        with jax.profiler.trace(tdir):
            out = call()
            float(jnp.sum(out.astype(jnp.float32)))
        busy, top = device_busy_ms(tdir)
        print(f"device busy {busy:.0f} ms "
              f"(wall {wall * 1e3:.0f}; {busy / args.steps:.1f} ms/step)")
        print("top device ops:")
        for name, dur in top:
            print(f"  {name:44s} {dur / 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
