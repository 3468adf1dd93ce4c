"""Mask-clean stage ablation at pipeline shapes on the real chip.

Times the three pieces of clean_masks (morph_close, connected components,
component_keep) and the fused whole at N=64 masks, 750^2 — the pipeline's
static mask-batch shape for the bunny sketch bucket.
"""

import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/inklayer_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.ops import morphology as M
from inklayer_tpu.ops.components import (component_keep,
                                         connected_components_batch)

N, H, W = 64, 736, 736
K = 19

rng = np.random.RandomState(0)
# blob-like masks: a few random rectangles + noise speckle per mask
masks = np.zeros((N, H, W), bool)
for i in range(N):
    for _ in range(rng.randint(1, 5)):
        y, x = rng.randint(0, H - 80), rng.randint(0, W - 80)
        hh, ww = rng.randint(30, 200), rng.randint(30, 200)
        masks[i, y:y + hh, x:x + ww] = True
    sp = rng.rand(H, W) < 0.001
    masks[i] |= sp
masks_d = jnp.asarray(masks)


@jax.jit
def _sink(x):
    return x.astype(jnp.float32).sum() if x.dtype != jnp.float32 else x.sum()


def timed(name, fn, *args):
    # tunnel: block_until_ready can return early; force completion with a
    # jitted scalar readback (verify-skill recipe)
    out = fn(*args)
    float(_sink(out))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        float(_sink(out))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:22s} {dt:8.1f} ms")
    return out


se = M.rect_kernel(K)
closed = timed("morph_close", jax.jit(lambda m: M.morph_close(m, se)), masks_d)
labels = timed("cc_batch", lambda m: connected_components_batch(m), closed)
keep = timed("component_keep x N", jax.jit(jax.vmap(
    lambda l: component_keep(l, 500, 1.1))), labels)

from inklayer_tpu.pipeline.refine.mask_cleaner import clean_masks
timed("clean_masks fused", lambda m: clean_masks(m, K), masks_d)
