"""Round-2 SAM deep-dive #2: resolve the non-additivity (isolated global
blocks ~4.3ms marginal, but baseline-mixed implies ~16ms/global), measure
window-padding cost (14 -> pads 64 to 70; 16 divides evenly), and get an
honest dense-MFU probe (relu between matmuls so XLA cannot reassociate)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT

N_WARM, N_ITER = 3, 10
OVERHEAD_NOTE = "all numbers include ~27ms tunnel dispatch overhead"


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(N_WARM):
        float(fn(*args))
    ts = []
    for _ in range(N_ITER):
        t = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t) * 1e3)
    p50 = float(np.percentile(ts, 50))
    print(f"{name:46s} p50 {p50:8.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return p50


def bench_encoder(name, **kw):
    model = ImageEncoderViT(**{**H, **kw})
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1024, 1024, 3),
                    jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    @jax.jit
    def fwd(p, xx):
        return jnp.sum(model.apply(p, xx).astype(jnp.float32))

    return timeit(name, fwd, params, x)


H = dict(img_size=1024, patch_size=16, embed_dim=1280, depth=32,
         num_heads=16, out_chans=256, window_size=14,
         global_attn_indexes=(7, 15, 23, 31), dtype=jnp.bfloat16)

print(OVERHEAD_NOTE, flush=True)

# re-measure baseline (stability check) + mixed scaling
bench_encoder("baseline re-run (28w + 4g)")
bench_encoder("depth=8 mixed (1 global @3)", depth=8, global_attn_indexes=(3,))
bench_encoder("depth=16 mixed (2 global @3,11)", depth=16,
              global_attn_indexes=(3, 11))
bench_encoder("depth=8 all windowed", depth=8, global_attn_indexes=())

# window padding cost: 16 divides 64 (no pad), 14 pads to 70
bench_encoder("win=16 all windowed (no padding)", window_size=16,
              global_attn_indexes=())
bench_encoder("win=16 mixed (28w + 4g)", window_size=16)

# honest dense probe: relu blocks reassociation
a = jnp.asarray(np.random.RandomState(0).randn(4096, 1280), jnp.bfloat16)
w1 = jnp.asarray(np.random.RandomState(1).randn(1280, 5120), jnp.bfloat16)
w2 = jnp.asarray(np.random.RandomState(2).randn(5120, 1280), jnp.bfloat16)


@jax.jit
def mlp_chain(a, w1, w2):
    x = a
    for _ in range(32):
        x = jax.nn.relu(jnp.dot(x, w1))
        x = jax.nn.relu(jnp.dot(x, w2))
    return x.astype(jnp.float32).sum()


flops = 32 * 2 * (4096 * 1280 * 5120 * 2)
t = timeit("32x dense MLP chain +relu (5.5 TF)", mlp_chain, a, w1, w2)
print(f"    -> {flops / ((t - 27) * 1e-3) / 1e12:.0f} TFLOP/s device-only",
      flush=True)
