"""Tiled-window deformable kernel (v5) vs the fused dense kernel (v3) at
GDINO bucket-800 shapes on the real chip, plus numeric agreement."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from inklayer_tpu.ops.deformable import (
    _ms_deform_attn_pallas_fused, _ms_deform_attn_pallas_tiled)

SHAPES = ((100, 100), (50, 50), (25, 25), (13, 13))
B, H, D, P = 1, 8, 32, 4
N = sum(h * w for h, w in SHAPES)
r = np.random.RandomState(0)
refs = []
for hh, ww in SHAPES:
    yy, xx = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
    refs.append(np.stack([(xx.ravel() + 0.5) / ww, (yy.ravel() + 0.5) / hh], -1))
ref = np.concatenate(refs, 0)
offs = r.uniform(-0.02, 0.02, (B, N, H, len(SHAPES), P, 2))
locs = jnp.asarray((ref[None, :, None, None, None, :] + offs), jnp.float32)
wts = r.random((B, N, H, len(SHAPES), P)).astype(np.float32)
wts = jnp.asarray(wts / wts.sum(axis=(-1, -2), keepdims=True))
value = jnp.asarray(r.randn(B, N, H, D) * 0.5, jnp.bfloat16)

def bench(name, fn):
    f = jax.jit(fn)
    out = f(value, locs, wts)
    @jax.jit
    def many(value, locs, wts):
        def body(i, s):
            return s + jnp.sum(f(value, locs + s * 0, wts))
        return jax.lax.fori_loop(0, 20, body, 0.0)
    float(many(value, locs, wts))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter(); float(many(value, locs, wts))
        ts.append((time.perf_counter() - t0) * 1e3 / 20)
    print(f"{name:10s} p50 {np.percentile(ts, 50):7.3f} ms/layer (incl ~1.5ms RTT/20)", flush=True)
    return out

o3 = bench("v3", lambda v, l, w: _ms_deform_attn_pallas_fused(v, SHAPES, l, w))
o5 = bench("tiled", lambda v, l, w: _ms_deform_attn_pallas_tiled(v, SHAPES, l, w))
d = float(jnp.max(jnp.abs(o3.astype(jnp.float32) - o5.astype(jnp.float32))))
m = float(jnp.max(jnp.abs(o3.astype(jnp.float32))))
print(f"max abs diff {d:.5f} (max |v3| {m:.3f})")

f3 = jax.jit(lambda v, l, w: jnp.sum(_ms_deform_attn_pallas_fused(v, SHAPES, l, w).astype(jnp.float32)))
f5 = jax.jit(lambda v, l, w: jnp.sum(_ms_deform_attn_pallas_tiled(v, SHAPES, l, w).astype(jnp.float32)))
float(f3(value, locs, wts)); float(f5(value, locs, wts))
with jax.profiler.trace("/tmp/deform_trace"):
    for _ in range(5):
        o = f3(value, locs, wts)
    float(o)
    for _ in range(5):
        o = f5(value, locs, wts)
    float(o)
print("traced")
