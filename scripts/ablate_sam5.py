"""Round-2 SAM deep-dive #4: fixed-cost and MLP-activation ablations.

Trace (scripts/profile_sam.py depth-8, 2026-08-18) shows per-fwd:
  patch_embed conv 2.55 ms + input layout copy 0.85 ms  (fixed)
  mlp fc1 fusion 0.47 ms/block (57% MFU; fc2 is 0.28 = ~96%)  -> GELU epilogue?
Variants here isolate: (a) patch embed as space-to-depth + matmul,
(b) gelu exact vs tanh vs identity, to size each fix before implementing.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import inklayer_tpu.nn.layers as L
from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT

N_WARM, N_ITER = 3, 10


def bench(name, model_kw=None, act=None):
    if act is not None:
        L.MLP.__dataclass_fields__["act"].default = act
    try:
        H = dict(img_size=1024, patch_size=16, embed_dim=1280, depth=8,
                 num_heads=16, out_chans=256, window_size=14,
                 global_attn_indexes=(3,), dtype=jnp.bfloat16)
        model = ImageEncoderViT(**{**H, **(model_kw or {})})
        x = jnp.asarray(np.random.RandomState(0).randn(1, 1024, 1024, 3),
                        jnp.bfloat16)
        shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
        params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype),
                              shapes)

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
        print(f"{name:44s} p50 {p50:8.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return p50
    finally:
        L.MLP.__dataclass_fields__["act"].default = L.gelu_exact


print("depth=8, 7 win + 1 global; ~27ms tunnel dispatch incl.", flush=True)
bench("baseline (gelu exact)")
bench("gelu tanh", act=lambda x: nn.gelu(x, approximate=True))
bench("act identity", act=lambda x: x)
bench("act relu", act=nn.relu)
