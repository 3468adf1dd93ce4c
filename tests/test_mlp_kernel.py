"""Parity tests for the fused Pallas MLP kernel (ops/mlp.py) in interpret
mode, vs the plain two-dense exact-GELU reference.

Functional parity target: segment-anything modeling/common.py MLPBlock
(Linear -> GELU(exact) -> Linear).
"""

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.ops.mlp import mlp_gelu


def _ref(x, w1, b1, w2, b2):
    h = jnp.dot(x.astype(jnp.float32), w1.astype(jnp.float32)) + b1
    h = jax.nn.gelu(h, approximate=False)
    return jnp.dot(h, w2.astype(jnp.float32)) + b2


def test_mlp_gelu_matches_reference():
    r = np.random.RandomState(0)
    t, c, hid = 1024, 256, 512
    x = jnp.asarray(r.randn(t, c) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(r.randn(c, hid) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(r.randn(hid) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(r.randn(hid, c) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(r.randn(c) * 0.1, jnp.bfloat16)
    out = mlp_gelu(x, w1, b1, w2, b2, block_t=512, block_h=256,
                   interpret=True)
    ref = _ref(x, w1.astype(jnp.float32), b1.astype(jnp.float32),
               w2.astype(jnp.float32), b2.astype(jnp.float32))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.05)


def test_mlp_gelu_single_h_block():
    # nj == 1 exercises the j==0 / j==nj-1 overlap in the accumulator logic
    r = np.random.RandomState(1)
    t, c, hid = 512, 128, 512
    x = jnp.asarray(r.randn(t, c) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(r.randn(c, hid) * 0.05, jnp.bfloat16)
    b1 = jnp.zeros((hid,), jnp.bfloat16)
    w2 = jnp.asarray(r.randn(hid, c) * 0.05, jnp.bfloat16)
    b2 = jnp.zeros((c,), jnp.bfloat16)
    out = mlp_gelu(x, w1, b1, w2, b2, block_t=512, block_h=512,
                   interpret=True)
    ref = _ref(x.astype(jnp.float32), w1.astype(jnp.float32), 0.0,
               w2.astype(jnp.float32), 0.0)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.05)
