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


def test_sam_global_attention_matches_sdpa(rng):
    """Token-major fused kernel (interpret mode) vs the explicit-bias sdpa
    oracle: bias[q,(i,j)] = rel_h[q,i] + rel_w[q,j], scale on q@k only."""
    from inklayer_tpu.ops.attention import sam_global_attention

    heads, kh, kw, hd = 2, 8, 8, 80
    n = kh * kw
    scale = hd ** -0.5
    q = _rand(rng, heads, n, hd)
    k = _rand(rng, heads, n, hd)
    v = _rand(rng, heads, n, hd)
    rh = _rand(rng, heads, n, kh)
    rw = _rand(rng, heads, n, kw)

    bias = rh[:, :, :, None] + rw[:, :, None, :]  # (h, n, kh, kw)
    bias = bias.reshape(heads, n, n)
    ref = sdpa(q[None], k[None], v[None], bias=bias[None], scale=scale)[0]

    pad = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, 128 - hd)))
    pack = lambda t: pad(t).transpose(1, 0, 2).reshape(n, heads * 128)
    out2 = sam_global_attention(
        pack(q), pack(k), pack(v), rh, rw, scale=scale, kh=kh, kw=kw,
        heads=heads, block_q=32, interpret=True)
    out = out2.reshape(n, heads, 128)[..., :hd].transpose(1, 0, 2)
    # kernel expands the bias via bf16 MXU matmuls -> ~1e-3 tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2)


def test_sam_global_attention2_matches_sdpa(rng):
    """Prebuilt-aug kernel (interpret mode) vs the explicit-bias sdpa oracle;
    rel terms in the (N, heads, kh) lane-interleaved layout."""
    from inklayer_tpu.ops.attention import sam_global_attention2

    heads, kh, kw, hd = 2, 8, 8, 80
    n = kh * kw
    scale = hd ** -0.5
    q = _rand(rng, heads, n, hd)
    k = _rand(rng, heads, n, hd)
    v = _rand(rng, heads, n, hd)
    rh = _rand(rng, heads, n, kh)
    rw = _rand(rng, heads, n, kw)

    bias = rh[:, :, :, None] + rw[:, :, None, :]  # (h, n, kh, kw)
    bias = bias.reshape(heads, n, n)
    ref = sdpa(q[None], k[None], v[None], bias=bias[None], scale=scale)[0]

    pad = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, 128 - hd)))
    pack = lambda t: pad(t).transpose(1, 0, 2).reshape(n, heads * 128)
    out2 = sam_global_attention2(
        pack(q), pack(k), pack(v), rh.transpose(1, 0, 2), rw.transpose(1, 0, 2),
        scale=scale, kh=kh, kw=kw, heads=heads, block_q=32, interpret=True)
    out = out2.reshape(n, heads, 128)[..., :hd].transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2)


@pytest.mark.slow
def test_sam_encoder_fused_path_matches_fallback(rng, monkeypatch):
    """The fused TPU path and the aug-matmul fallback compute the same
    attention: fake the backend check, run the kernel in interpret mode."""
    import sys

    import inklayer_tpu.ops.attention  # noqa: F401 (ensure loaded)
    from inklayer_tpu.models.sam import image_encoder as ie
    A = sys.modules["inklayer_tpu.ops.attention"]

    attn = ie.Attention(dim=32, num_heads=2, input_size=(8, 8),
                        use_rel_pos=True, use_flash=True)
    x = _rand(rng, 1, 8, 8, 32)
    params = attn.init(jax.random.key(0), x)
    # nonzero rel tables so the bias actually matters
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        params)
    ref = attn.apply(params, x)  # CPU: sdpa aug-matmul path (n=64 < 1024)

    real = A.sam_global_attention
    monkeypatch.setattr(
        A, "sam_global_attention",
        lambda *a, **k: real(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(ie.jax, "default_backend", lambda: "tpu")
    # n_tokens >= 1024 gate: drop it to 1 for the test via a tiny shim
    orig_call = ie.Attention._fused_global
    out = None
    try:
        # force the fused branch by re-evaluating with a lowered gate:
        # monkeypatch the threshold comparison via the module constant is
        # not possible (inline literal), so call through a 32x32 input
        attn_big = ie.Attention(dim=32, num_heads=2, input_size=(32, 32),
                                use_rel_pos=True, use_flash=True)
        xb = _rand(rng, 1, 32, 32, 32)
        pb = attn_big.init(jax.random.key(0), xb)
        pb = jax.tree.map(
            lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
            pb)
        out = attn_big.apply(pb, xb)  # fused (1024 tokens, backend faked)
        monkeypatch.setattr(ie.jax, "default_backend", lambda: "cpu")
        ref_big = attn_big.apply(pb, xb)  # aug-matmul fallback
    finally:
        del orig_call
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_big),
                               atol=5e-3, rtol=1e-2)


def test_sam_window_attention_interpret_matches_sdpa(rng, monkeypatch):
    """The all-heads-per-window fused kernel (interpret mode) vs the CPU
    aug-matmul sdpa path on the same windowed Attention module."""
    import sys

    import inklayer_tpu.ops.attention  # noqa: F401 (ensure loaded)
    from inklayer_tpu.models.sam import image_encoder as ie
    A = sys.modules["inklayer_tpu.ops.attention"]

    attn = ie.Attention(dim=32, num_heads=2, input_size=(14, 14),
                        use_rel_pos=True, use_flash=True)
    x = _rand(rng, 4, 14, 14, 32)  # 4 windows, 196 tokens, head_dim 16
    params = attn.init(jax.random.key(0), x)
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        params)
    ref = attn.apply(params, x)  # CPU backend: sdpa aug-matmul path

    real = A.sam_window_attention
    monkeypatch.setattr(
        A, "sam_window_attention",
        lambda *a, **k: real(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(ie.jax, "default_backend", lambda: "tpu")
    out = attn.apply(params, x)  # fused windowed branch (backend faked)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_sam_window_block_attention_matches_partitioned_kernel(rng):
    """The partition-free spatial window kernel (BlockSpec-addressed windows,
    interpret mode) vs the parity-tested per-window kernel on the same qkv."""
    from inklayer_tpu.models.sam.image_encoder import _gather_rel_pos
    from inklayer_tpu.ops.attention import (sam_window_attention,
                                            sam_window_block_attention)

    win, heads, hd = 14, 2, 32
    c = heads * hd
    b, gh, gw = 1, 2, 2
    hp, wp = gh * win, gw * win
    n = win * win
    qkv_sp = _rand(rng, b, hp, wp, 3 * c)
    rel_pos_h = _rand(rng, 2 * win - 1, hd) * 0.1
    rel_pos_w = _rand(rng, 2 * win - 1, hd) * 0.1
    tab_h = _gather_rel_pos(rel_pos_h, win, win)
    tab_w = _gather_rel_pos(rel_pos_w, win, win)
    scale = hd ** -0.5

    qkv_win = qkv_sp.reshape(b, gh, win, gw, win, 3 * c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b * gh * gw, n, 3 * c)
    qg = qkv_win[..., :c].reshape(-1, win, win, heads, hd)
    rel_h = jnp.einsum("bijhc,ikc->bijhk", qg, tab_h).reshape(
        -1, n, heads * win)
    rel_w = jnp.einsum("bijhc,jkc->bijhk", qg, tab_w).reshape(
        -1, n, heads * win)
    want = sam_window_attention(qkv_win, rel_h, rel_w, scale=scale, kh=win,
                                kw=win, heads=heads, head_dim=hd,
                                interpret=True)
    got_sp = sam_window_block_attention(qkv_sp, tab_h, tab_w, scale=scale,
                                        win=win, heads=heads, head_dim=hd,
                                        interpret=True)
    got = got_sp.reshape(b, gh, win, gw, win, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b * gh * gw, n, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-3, rtol=1e-2)

    # sublane-aligned buffer: extra columns past the last window (the
    # production path pads Wp 70 -> 72) must not change any window's output
    qkv_pad = jnp.pad(qkv_sp, ((0, 0), (0, 0), (0, 4), (0, 0)),
                      constant_values=7.0)  # garbage past the windows
    got_pad = sam_window_block_attention(
        qkv_pad, tab_h, tab_w, scale=scale, win=win, heads=heads,
        head_dim=hd, gw=gw, interpret=True)
    np.testing.assert_allclose(np.asarray(got_pad[:, :, :wp]),
                               np.asarray(got_sp), atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fused_window_spatial_matches_partitioned_fallback(rng, monkeypatch):
    """The production spatial window path (unpadded-token qkv, bias-filled
    pad scatter, rel terms folded into the q projection, BlockSpec-addressed
    kernel in interpret mode) vs window_partition + the CPU aug-matmul
    Attention on the SAME parameter tree, on a non-multiple spatial grid."""
    import sys

    import inklayer_tpu.ops.attention  # noqa: F401 (ensure loaded)
    from inklayer_tpu.models.sam import image_encoder as ie
    from inklayer_tpu.nn.layers import window_partition, window_unpartition
    A = sys.modules["inklayer_tpu.ops.attention"]

    win, heads, c = 14, 2, 32
    real = A.sam_window_block_attention
    monkeypatch.setattr(
        A, "sam_window_block_attention",
        lambda *a, **k: real(*a, **{**k, "interpret": True}))
    attn_fused = ie.Attention(dim=c, num_heads=heads, input_size=(win, win),
                              use_rel_pos=True, use_flash=True,
                              fused_window=True)
    x = _rand(rng, 1, 20, 30, c)  # pads to (28, 42), buffer width 48
    params = attn_fused.init(jax.random.key(0), x)
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        params)

    # reference on the same params: zero-pad + partition + plain Attention
    # (CPU sdpa aug-matmul path) + unpartition + crop
    attn_ref = ie.Attention(dim=c, num_heads=heads, input_size=(win, win),
                            use_rel_pos=True, use_flash=True)
    xw, padded_hw = window_partition(x, win)
    ref = attn_ref.apply(params, xw)
    ref = window_unpartition(ref, win, padded_hw, (20, 30))

    monkeypatch.setattr(ie.jax, "default_backend", lambda: "tpu")
    out = attn_fused.apply(params, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)
