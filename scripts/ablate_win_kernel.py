"""Kernel-only microbench for the spatial SAM window attention: times the
Pallas kernel (with its wrapper rel einsums) in isolation, chained REPS per
dispatch.  Compares against the windowed-attention arithmetic roofline."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.models.sam.image_encoder import _gather_rel_pos
from inklayer_tpu.ops.attention import sam_window_block_attention

win, heads, hd = 14, 16, 80
c = heads * hd
hp = wp = 70
rng = np.random.RandomState(0)
qkv = jnp.asarray(rng.randn(1, hp, wp, 3 * c), jnp.bfloat16)
rel_pos = jnp.asarray(rng.randn(2 * win - 1, hd), jnp.float32) * 0.1
tab = _gather_rel_pos(rel_pos, win, win).astype(jnp.bfloat16)
scale = hd ** -0.5

REPS = 20


@jax.jit
def run(x):
    acc = jnp.float32(0)
    for _ in range(REPS):
        o = sam_window_block_attention(x, tab, tab, scale=scale, win=win,
                                       heads=heads, head_dim=hd)
        acc = acc + jnp.sum(o.astype(jnp.float32))
        x = x + 0.0 * acc.astype(x.dtype)
    return acc


t0 = time.perf_counter()
float(run(qkv))
print(f"compile {time.perf_counter() - t0:.0f}s", flush=True)
for _ in range(3):
    float(run(qkv))
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    float(run(qkv))
    ts.append((time.perf_counter() - t0) * 1e3)
p50 = float(np.percentile(ts, 50)) / REPS
# matmul FLOPs: 25 windows * 16 heads * (qk + av + 2 rel expands)
mf = 25 * heads * (2 * 196 * 196 * hd * 2 + 2 * 196 * win * 196 * 2) / 1e6
print(f"window attention op: {p50 * 1e3:.0f} us  "
      f"(matmul roofline ~{mf / 197e3 * 1e3:.0f} us)")
