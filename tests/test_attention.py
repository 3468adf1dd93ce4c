import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inklayer_tpu.ops.attention import attention, flash_attention, sdpa


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_sdpa_matches_numpy(rng):
    q = rng.standard_normal((2, 3, 5, 8)).astype(np.float32)
    k = rng.standard_normal((2, 3, 7, 8)).astype(np.float32)
    v = rng.standard_normal((2, 3, 7, 8)).astype(np.float32)
    out = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    # numpy oracle
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sdpa_mask(rng):
    q = _rand(rng, 1, 1, 4, 8)
    k = _rand(rng, 1, 1, 6, 8)
    v = _rand(rng, 1, 1, 6, 8)
    mask = jnp.ones((1, 1, 4, 6), bool).at[..., 4:].set(False)
    out = sdpa(q, k, v, mask=mask)
    ref = sdpa(q[..., :, :], k[..., :4, :], v[..., :4, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("nq,nk,d", [(196, 196, 80), (300, 1370, 64), (64, 256, 128)])
def test_flash_matches_sdpa(rng, nq, nk, d):
    q = _rand(rng, 2, nq, d)
    k = _rand(rng, 2, nk, d)
    v = _rand(rng, 2, nk, d)
    out = flash_attention(q, k, v, block_q=128, interpret=True)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_relpos_matches_sdpa_bias(rng):
    kh, kw = 8, 8
    nq, nk, d = 64, kh * kw, 32
    q = _rand(rng, 1, nq, d)
    k = _rand(rng, 1, nk, d)
    v = _rand(rng, 1, nk, d)
    rel_h = _rand(rng, 1, nq, kh)
    rel_w = _rand(rng, 1, nq, kw)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(1, nq, nk)
    out = flash_attention(q, k, v, rel_h=rel_h, rel_w=rel_w, kh=kh, kw=kw,
                          block_q=64, interpret=True)
    ref = sdpa(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_attention_dispatch_small(rng):
    q = _rand(rng, 1, 2, 10, 16)
    k = _rand(rng, 1, 2, 12, 16)
    v = _rand(rng, 1, 2, 12, 16)
    out = attention(q, k, v)
    ref = sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
