"""Deformable-attention kernel ablation at GDINO encoder shapes on TPU.

Compares the per-point fused kernel (v2-in-fused) vs the point-concat
variant (v3) at the encoder's real shapes (800x800 bucket: levels
100/50/25/13, 8 heads x 32, 13294 queries, 4 points).
"""

import functools
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.ops.deformable import _ms_deform_attn_pallas_fused

SHAPES = ((100, 100), (50, 50), (25, 25), (13, 13))
N = sum(h * w for h, w in SHAPES)
B, H, D, P = 1, 8, 32, 4
Q = N

rng = np.random.RandomState(0)
value = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
locs = jnp.asarray(rng.rand(B, Q, H, len(SHAPES), P, 2), jnp.float32)
wts = jnp.asarray(rng.rand(B, Q, H, len(SHAPES), P), jnp.float32)


REPS = 5


def bench(name, kv, bq):
    fn = functools.partial(
        _ms_deform_attn_pallas_fused, spatial_shapes=SHAPES,
        block_q=bq, kernel_version=kv)

    @jax.jit
    def run(v, l, w):
        # chain REPS ops (output feeds the next value) so the device time
        # dominates the ~35ms tunnel RTT
        for _ in range(REPS):
            out = fn(v, sampling_locations=l, attention_weights=w)
            v = out.reshape(B, N, H, D).astype(v.dtype)
        return jnp.sum(out.astype(jnp.float32))

    try:
        t0 = time.perf_counter()
        float(run(value, locs, wts))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    for _ in range(3):
        float(run(value, locs, wts))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(run(value, locs, wts))
        ts.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(ts, 50))
    print(f"{name:28s} p50/op {p50/REPS:7.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return p50


VARIANTS = {
    "v2": ("v2 per-point bq=256", 2, 256),
    "v3": ("v3 point-concat bq=256", 3, 256),
    "v3b128": ("v3 point-concat bq=128", 3, 128),
    "v3b512": ("v3 point-concat bq=512", 3, 512),
    "v3b1024": ("v3 point-concat bq=1024", 3, 1024),
}

if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    names = sys.argv[1:] or list(VARIANTS)
    for nm in names:
        bench(*VARIANTS[nm])
