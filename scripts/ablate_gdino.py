"""GDINO detect-path component timing on the real TPU chip.

Times the full detector and its three heavy submodules separately at the
(800, 800) bucket to locate the cost: Swin-T backbone, BERT text encoder,
and the 6-enc/6-dec deformable transformer (with Pallas ms-deform kernels).
Protocol per the axon-tunnel rules: jitted scalar readback, p50 of N.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.config import GDinoConfig
from inklayer_tpu.models.gdino.bert import BertEncoder, subsentence_masks
from inklayer_tpu.models.gdino.swin import SwinTransformer
from inklayer_tpu.models.gdino.transformer import GDinoTransformer, sine_pos_embed_hw
from inklayer_tpu.models.gdino.gdino import GroundingDINO

N_WARM, N_ITER = 3, 10
CFG = GDinoConfig()
DT = jnp.bfloat16


def bench(name, model, *args):
    shapes = jax.eval_shape(lambda k: model.init(k, *args), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    @jax.jit
    def fwd(p, *a):
        out = model.apply(p, *a)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    t0 = time.perf_counter()
    float(fwd(params, *args))
    comp = time.perf_counter() - t0
    for _ in range(N_WARM):
        float(fwd(params, *args))
    ts = []
    for _ in range(N_ITER):
        t = time.perf_counter()
        float(fwd(params, *args))
        ts.append((time.perf_counter() - t) * 1e3)
    print(f"{name:28s} p50 {float(np.percentile(ts, 50)):8.1f} ms  "
          f"(compile {comp:.0f}s)", flush=True)


rs = np.random.RandomState(0)
# inputs generated ON DEVICE: a host ndarray of this size rides the
# ~1.4 MB/s tunnel for minutes before anything compiles
img = jax.jit(lambda k: jax.random.normal(k, (1, 800, 800, 3), DT))(
    jax.random.key(0))
pad = jnp.zeros((1, 800, 800), bool)

ids = np.full((1, 6), 0, np.int32)
ids[0] = [101, 4874, 1012, 102, 0, 0]
attn, pos = subsentence_masks(ids)
ids_j, attn_j = jnp.asarray(ids), jnp.asarray(attn)
pos_j = jnp.asarray(pos.astype(np.int32))

# 1. full detector
bench("full GroundingDINO", GroundingDINO(CFG, dtype=DT),
      img, pad, ids_j, attn_j, pos_j)

# 2. Swin backbone alone
bench("Swin-T backbone", SwinTransformer(CFG.swin, dtype=DT), img, pad)

# 3. BERT alone
bench("BERT text encoder", BertEncoder(CFG.bert, dtype=DT),
      ids_j, attn_j, pos_j)

# 4. transformer alone on synthetic multi-level features
shapes_hw = [(100, 100), (50, 50), (25, 25), (13, 13)]
srcs = [jax.jit(lambda k, h=h, w=w: jax.random.normal(k, (1, h, w, 256), DT))(
    jax.random.key(i)) for i, (h, w) in enumerate(shapes_hw)]
masks = [jnp.zeros((1, h, w), bool) for h, w in shapes_hw]
poses = [sine_pos_embed_hw(m, 128, 20.0, 20.0).astype(DT) for m in masks]
text = jax.jit(lambda k: jax.random.normal(k, (1, 6, 256), DT))(
    jax.random.key(9))
tok_mask = jnp.asarray(ids != 0)
bench("enc/dec transformer", GDinoTransformer(CFG, dtype=DT),
      srcs, masks, poses, text, tok_mask, attn_j, pos_j)
