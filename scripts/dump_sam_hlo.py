"""Compile the depth-8 SAM encoder and dump the optimized HLO so trace
fusion names (fusion.464, bitcast_add_fusion, copy.42, ...) can be
correlated with actual ops.  Writes /tmp/sam_hlo.txt and prints summary
lines for the interesting fusions."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 8
model = ImageEncoderViT(
    img_size=1024, patch_size=16, embed_dim=1280, depth=depth,
    num_heads=16, out_chans=256, window_size=14,
    global_attn_indexes=(3,), dtype=jnp.bfloat16)
x = jnp.asarray(np.random.RandomState(0).randn(1, 1024, 1024, 3), jnp.bfloat16)
shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)


def fwd(p, xx):
    return jnp.sum(model.apply(p, xx).astype(jnp.float32))


lowered = jax.jit(fwd).lower(params, x)
compiled = lowered.compile()
txt = compiled.as_text()
with open("/tmp/sam_hlo.txt", "w") as f:
    f.write(txt)
print(f"wrote /tmp/sam_hlo.txt ({len(txt.splitlines())} lines)")

pats = ["fusion.464", "fusion.465", "fusion.580", "fusion.583",
        "fusion.607", "fusion.667", "bitcast_add_fusion", "copy.42 ",
        "convolution_add_fusion.8", "fusion.472", "fusion.533"]
for line in txt.splitlines():
    stripped = line.strip()
    for p in pats:
        if stripped.startswith("%" + p.strip()) or stripped.startswith(p.strip()) \
           or (" = " in stripped and stripped.split(" = ")[0].lstrip("%").strip() in
               [q.strip() for q in pats]):
            print(stripped[:400])
            break
