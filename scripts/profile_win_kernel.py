"""Device trace of the spatial window-attention op in isolation."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_sam import summarize
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

REPS = 10


@jax.jit
def run(x):
    acc = jnp.float32(0)
    for _ in range(REPS):
        o = sam_window_block_attention(x, tab, tab, scale=scale, win=win,
                                       heads=heads, head_dim=hd)
        acc = acc + jnp.sum(o.astype(jnp.float32))
        x = x + 0.0 * acc.astype(x.dtype)
    return acc


float(run(qkv))
out = "/tmp/win_kernel_trace"
with jax.profiler.trace(out):
    float(run(qkv))
summarize(out)
