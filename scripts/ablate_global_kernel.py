"""sam_global_attention block_q sweep in isolation.

Full-encoder trace (scripts/profile_sam.py --depth 32, 2026-08-19) shows the
global kernel at 1.28 ms/block vs a ~0.85 ms bound (aug-QK 70 GFLOP + PV
35 GFLOP at peak, plus ~0.3 ms of fp32 exp on 268M logits).  grid is
(heads=16, q-blocks) — larger q blocks cut per-program overhead without
changing K/V residency (the index map over k/v depends only on the head, so
consecutive q-steps reuse the same VMEM block).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.ops.attention import sam_global_attention

heads, hd, kh, kw = 16, 80, 64, 64
n = kh * kw
scale = hd ** -0.5
rng = np.random.RandomState(0)
q2 = jnp.asarray(rng.randn(n, heads * 128) * 0.1, jnp.bfloat16)
k2 = jnp.asarray(rng.randn(n, heads * 128) * 0.1, jnp.bfloat16)
v2 = jnp.asarray(rng.randn(n, heads * 128) * 0.1, jnp.bfloat16)
rel_h = jnp.asarray(rng.randn(heads, n, kh) * 0.1, jnp.bfloat16)
rel_w = jnp.asarray(rng.randn(heads, n, kw) * 0.1, jnp.bfloat16)

REPS = 20


def bench(block_q):
    @jax.jit
    def run(q2, k2, v2):
        acc = jnp.float32(0)
        x = q2
        for _ in range(REPS):
            o = sam_global_attention(x, k2, v2, rel_h, rel_w, scale=scale,
                                     kh=kh, kw=kw, heads=heads,
                                     block_q=block_q)
            acc = acc + jnp.sum(o.astype(jnp.float32))
            x = q2 + 0.0 * acc.astype(x.dtype)
        return acc

    float(run(q2, k2, v2))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(run(q2, k2, v2))
        ts.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(ts, 50))
    print(f"block_q={block_q:5d}: {p50 / REPS:7.3f} ms/call "
          f"(chain p50 {p50:.1f} ms)", flush=True)


for bq in (256, 512, 1024, 2048, 4096):
    try:
        bench(bq)
    except Exception as e:
        print(f"block_q={bq}: FAILED {type(e).__name__}: {e}", flush=True)
