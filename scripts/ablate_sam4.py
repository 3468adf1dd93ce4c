"""Round-2 SAM deep-dive #3: is the mixed-model global-block blowup the
Pallas kernel (layout forced at its boundary) or the attention math?
Compare flash vs aug-matmul sdpa for the global blocks inside the same
mixed model, plus a no-window-pad control."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT

N_WARM, N_ITER = 3, 8


def bench(name, **kw):
    H = dict(img_size=1024, patch_size=16, embed_dim=1280, depth=8,
             num_heads=16, out_chans=256, window_size=14,
             global_attn_indexes=(3,), dtype=jnp.bfloat16)
    model = ImageEncoderViT(**{**H, **kw})
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
    print(f"{name:48s} p50 {p50:8.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return p50


print("depth=8, 7 windowed + 1 global @3; ~27ms dispatch overhead incl.",
      flush=True)
bench("mixed, global via flash (status quo)")
bench("mixed, global via sdpa aug-matmul", use_flash=False)
bench("mixed flash, no rel-pos", use_rel_pos=False)
bench("mixed sdpa, no rel-pos", use_flash=False, use_rel_pos=False)
bench("all windowed (control)", global_attn_indexes=())
bench("depth=32 full, global via sdpa", depth=32,
      global_attn_indexes=(7, 15, 23, 31), use_flash=False)
