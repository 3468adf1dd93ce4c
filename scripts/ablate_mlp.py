"""Microbench: fused Pallas MLP kernel vs XLA two-dense path on the real
chip, SAM ViT-H block shapes (T=4096, C=1280, H=5120).  Also checks
numerics vs the jnp reference."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.ops.mlp import mlp_gelu

T, C, H = 4096, 1280, 5120
r = np.random.RandomState(0)
x = jnp.asarray(r.randn(T, C) * 0.5, jnp.bfloat16)
w1 = jnp.asarray(r.randn(C, H) * 0.02, jnp.bfloat16)
b1 = jnp.asarray(r.randn(H) * 0.1, jnp.bfloat16)
w2 = jnp.asarray(r.randn(H, C) * 0.02, jnp.bfloat16)
b2 = jnp.asarray(r.randn(C) * 0.1, jnp.bfloat16)


@jax.jit
def xla_mlp(x, w1, b1, w2, b2):
    # mirror flax Dense(dtype=bf16): bf16 dot output, bf16 gelu
    h = jnp.dot(x, w1) + b1
    h = jax.nn.gelu(h, approximate=False)
    return jnp.dot(h, w2) + b2


def timeit(name, fn, n=30):
    out = fn(x, w1, b1, w2, b2)
    s = float(jnp.sum(out.astype(jnp.float32)))  # force
    ts = []
    # batch 10 dispatches per timing to amortize the ~30ms tunnel RTT
    @jax.jit
    def many(x, w1, b1, w2, b2):
        # thread the carry through the MLP so XLA can't hoist the
        # loop-invariant computation out of the fori_loop
        def body(i, carry):
            return fn_inner(carry, w1, b1, w2, b2) * jnp.bfloat16(0.1)
        fn_inner = fn
        return jnp.sum(jax.lax.fori_loop(0, 100, body, x)
                       .astype(jnp.float32))
    float(many(x, w1, b1, w2, b2))
    for _ in range(8):
        t0 = time.perf_counter()
        float(many(x, w1, b1, w2, b2))
        ts.append((time.perf_counter() - t0) * 1e3 / 100)
    print(f"{name:24s} p50 {np.percentile(ts, 50):7.3f} ms/call  (sum {s:.1f})",
          flush=True)
    return out


o_ref = timeit("xla two-dense", xla_mlp)
o_ker = timeit("pallas fused", lambda *a: mlp_gelu(*a))
d = jnp.max(jnp.abs(o_ref.astype(jnp.float32) - o_ker.astype(jnp.float32)))
rel = d / (jnp.max(jnp.abs(o_ref.astype(jnp.float32))) + 1e-9)
print("max abs diff", float(d), "rel", float(rel))

for bt, bh in []:
    timeit(f"pallas bt={bt} bh={bh}", lambda *a, bt=bt, bh=bh: mlp_gelu(*a, block_t=bt, block_h=bh))
for ap in []:
    timeit(f"pallas approx={ap}", lambda *a, ap=ap: mlp_gelu(*a, approx=ap))
for bt, bh in [(1024, 512), (2048, 512), (4096, 512), (2048, 1024), (4096, 1024), (1024, 2560)]:
    timeit(f"pallas bt={bt} bh={bh}", lambda *a, bt=bt, bh=bh: mlp_gelu(*a, block_t=bt, block_h=bh))
