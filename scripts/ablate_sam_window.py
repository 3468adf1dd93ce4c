"""Quick A/B for the SAM windowed-attention kernel: depth-8 all-windowed
ViT (fast compile), chained 4x per dispatch to dominate the tunnel RTT."""

import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT

H = dict(img_size=1024, patch_size=16, embed_dim=1280, depth=8,
         num_heads=16, out_chans=256, window_size=14,
         global_attn_indexes=(), dtype=jnp.bfloat16)

model = ImageEncoderViT(**H)
x = jnp.asarray(np.random.RandomState(0).randn(1, 1024, 1024, 3),
                jnp.bfloat16)
shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

REPS = 4


@jax.jit
def fwd(p, xx):
    acc = jnp.float32(0)
    for i in range(REPS):
        out = model.apply(p, xx)
        acc = acc + jnp.sum(out.astype(jnp.float32))
        xx = xx + 0.0 * acc.astype(xx.dtype)  # serialize reps
    return acc


t0 = time.perf_counter()
float(fwd(params, x))
print(f"compile {time.perf_counter() - t0:.0f}s", flush=True)
for _ in range(3):
    float(fwd(params, x))
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    float(fwd(params, x))
    ts.append((time.perf_counter() - t0) * 1e3)
print(f"d8 all-windowed p50/fwd: {np.percentile(ts, 50) / REPS:.2f} ms")
