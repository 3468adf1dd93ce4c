"""SAM ViT-H encoder ablation on the real TPU chip.

Isolates where the encoder time (vs ~31ms MXU roofline at ~6.2 TFLOP/image)
goes: rel-pos bias construction, windowed-vs-global structure, attention
path.  Timing protocol per the axon-tunnel rules: args passed through jit,
completion forced with a jitted scalar readback, p50 over N iters.

State 2026-08-20 (row-pad-free window path): THE unified MFU number is
**62.5%** — 50.3 ms/img by the loop-amortized protocol
(ablate_sam_batch.py LOOP=20, batch 1).  The r02 "64%" (49.2 ms) came
from this script's single-dispatch protocol whose ~1 ms smaller figure is
dispatch-alignment jitter, and the r02 "54.9%" (57.4 ms) came from a
4-deep loop that still carried ~7 ms of tunnel RTT per image; both are
superseded.  Device budget per fwd (profile_sam.py --depth 32):
  mlp_gelu 19.8 (Pallas fused, 89% of its 17.4 roofline)
  qkv+rel fusions 7.3 (row-padded 4480-token map; was 8.1 on the 4900 pad)
  window kernel 6.95 (0.25/block; small-matmul issue floor ~0.15)
  global kernel 5.0 (1.25/block; aug-matmul 0.53 + fp32 softmax tail)
  LN pairs 2.1 | conv patch+neck 2.3 | copy/reshape/pad glue ~5.0
Nulls (measured, do not retry): Wp 70->72 sublane alignment; prebuilt-aug
global kernel v2 (kept: simpler); bf16/exp2 softmax in window kernel AND
in the global kernel (~5% of the kernel — see ablate_global_softmax.py);
take_along_axis rel gather; per-head flash fold (layout copies).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT

N_WARM, N_ITER = 3, 10


def bench(name, make_model):
    model = make_model()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1024, 1024, 3),
                    jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    @jax.jit
    def fwd(p, xx):
        return jnp.sum(model.apply(p, xx).astype(jnp.float32))

    t0 = time.perf_counter()
    float(fwd(params, x))
    compile_s = time.perf_counter() - t0
    for _ in range(N_WARM):
        float(fwd(params, x))
    ts = []
    for _ in range(N_ITER):
        t = time.perf_counter()
        float(fwd(params, x))
        ts.append((time.perf_counter() - t) * 1e3)
    p50 = float(np.percentile(ts, 50))
    print(f"{name:34s} p50 {p50:8.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return p50


H = dict(img_size=1024, patch_size=16, embed_dim=1280, depth=32,
         num_heads=16, out_chans=256, window_size=14,
         global_attn_indexes=(7, 15, 23, 31), dtype=jnp.bfloat16)

results = {}
results["baseline"] = bench(
    "baseline (4 global + 28 win)", lambda: ImageEncoderViT(**H))
results["no_relpos"] = bench(
    "no rel-pos bias", lambda: ImageEncoderViT(**{**H, "use_rel_pos": False}))
results["all_global"] = bench(
    "all 32 global (flash)",
    lambda: ImageEncoderViT(**{**H, "global_attn_indexes": tuple(range(32))}))
results["all_win"] = bench(
    "all 32 windowed",
    lambda: ImageEncoderViT(**{**H, "global_attn_indexes": ()}))
results["all_win_norel"] = bench(
    "all 32 windowed, no rel-pos",
    lambda: ImageEncoderViT(**{**H, "global_attn_indexes": (),
                               "use_rel_pos": False}))
results["all_global_norel"] = bench(
    "all 32 global, no rel-pos",
    lambda: ImageEncoderViT(**{**H, "global_attn_indexes": tuple(range(32)),
                               "use_rel_pos": False}))

print("\nsummary:", {k: round(v, 1) for k, v in results.items()})
