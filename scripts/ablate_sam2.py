"""Round-2 SAM encoder deep-dive: isolate the fixed (non-block) cost, the
per-block dense MFU, and flash-kernel variants for the 4096-token global
blocks.  Protocol: jitted scalar readback, p50 of N iters (axon tunnel adds
~35ms/dispatch — measure it with an empty jit and subtract mentally)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT
from inklayer_tpu.ops.attention import flash_attention

N_WARM, N_ITER = 3, 10


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
    print(f"{name:42s} p50 {p50:8.2f} ms  (compile {compile_s:.0f}s)",
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

# --- dispatch overhead -----------------------------------------------------
z = jnp.zeros((8, 128), jnp.float32)
timeit("empty dispatch (tunnel overhead)", jax.jit(lambda t: t.sum()), z)

# --- fixed cost: patch embed + pos + neck only ------------------------------
bench_encoder("depth=0 (patch+pos+neck only)", depth=0)
bench_encoder("depth=1 windowed", depth=1, global_attn_indexes=())
bench_encoder("depth=2 windowed", depth=2, global_attn_indexes=())
bench_encoder("depth=1 global", depth=1, global_attn_indexes=(0,))
bench_encoder("depth=2 global", depth=2, global_attn_indexes=(0, 1))

# --- pure dense MFU probe: the MLP-equivalent matmul chain ------------------
a = jnp.asarray(np.random.RandomState(0).randn(4096, 1280), jnp.bfloat16)
w1 = jnp.asarray(np.random.RandomState(1).randn(1280, 5120), jnp.bfloat16)
w2 = jnp.asarray(np.random.RandomState(2).randn(5120, 1280), jnp.bfloat16)


@jax.jit
def mlp_chain(a, w1, w2):
    x = a
    for _ in range(32):
        x = jnp.dot(jnp.dot(x, w1), w2)
    return x.astype(jnp.float32).sum()


flops = 32 * 2 * (4096 * 1280 * 5120 * 2)
t = timeit("32x dense MLP chain (5.5 TF)", mlp_chain, a, w1, w2)
print(f"    -> {flops / (t * 1e-3) / 1e12:.0f} TFLOP/s effective "
      f"(incl ~35ms dispatch)", flush=True)

# --- flash kernel variants on the global-block shape -------------------------
B, NQ, D = 16, 4096, 80  # 16 heads folded
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(B, NQ, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, NQ, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, NQ, D), jnp.bfloat16)
rh = jnp.asarray(rs.randn(B, NQ, 64), jnp.bfloat16)
rw = jnp.asarray(rs.randn(B, NQ, 64), jnp.bfloat16)

for bq in (128, 256, 512, 1024):
    fn = jax.jit(lambda q, k, v, bq=bq: flash_attention(
        q, k, v, scale=D ** -0.5, block_q=bq).astype(jnp.float32).sum())
    t = timeit(f"flash norel block_q={bq}", fn, q, k, v)
    att_flops = 2 * B * NQ * NQ * 128 * 2  # padded d=128
    print(f"    -> {att_flops / (t * 1e-3) / 1e12:.0f} TFLOP/s", flush=True)

for bq in (256, 512):
    fn = jax.jit(lambda q, k, v, rh, rw, bq=bq: flash_attention(
        q, k, v, rel_h=rh, rel_w=rw, kh=64, kw=64, scale=D ** -0.5,
        block_q=bq).astype(jnp.float32).sum())
    timeit(f"flash rel block_q={bq}", fn, q, k, v, rh, rw)
