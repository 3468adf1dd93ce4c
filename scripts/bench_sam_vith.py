"""Full SAM ViT-H encoder forward p50 on the current backend (the real
pipeline config: 4 global + 28 windowed blocks, rel-pos, bf16)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT

model = ImageEncoderViT(dtype=jnp.bfloat16)
x = jnp.asarray(np.random.RandomState(0).randn(1, 1024, 1024, 3),
                jnp.bfloat16)
shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
params = jax.tree.map(
    lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16
                       if s.dtype == jnp.float32 else s.dtype), shapes)


@jax.jit
def fwd(p, xx):
    return jnp.sum(model.apply(p, xx).astype(jnp.float32))


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
p50 = float(np.percentile(ts, 50))
# ~6.2 TFLOP/image, v5e bf16 peak ~197 TFLOP/s.  Wall here includes the
# axon tunnel's ~25-35ms dispatch+readback RTT; the DEVICE-side total is
# what MFU should be judged on — scripts/profile_sam.py --depth 32 sums the
# device trace: 50.4 ms/fwd on 2026-08-19 (= 62% device MFU at 77 ms wall).
print(f"ViT-H fwd p50: {p50:.1f} ms wall "
      f"(~{6200 / 197 / p50 * 100:.0f}% MFU if device-only; "
      f"subtract ~25-35ms tunnel RTT -> see profile_sam.py for device ms)")
