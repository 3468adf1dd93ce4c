"""Swin Transformer backbone (Swin-T for GroundingDINO), TPU-native.

Parity target: GroundingDINO ``backbone/swin_transformer.py`` — 4-stage
hierarchical ViT, W-MSA/SW-MSA with relative-position-bias table, cyclic
shift with precomputed window attention masks (:409-452), PatchMerging
(:301), returning stages out_indices with per-output LayerNorm (:712-757).

TPU notes: NHWC layout; the cyclic shift is ``jnp.roll`` (lowered to a pair
of slices+concat by XLA — cheap); window attention at 49 tokens stays on the
fused-XLA sdpa path with the (heads, 49, 49) bias table added; the shifted
window mask is built at trace time from static padded sizes.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inklayer_tpu.config import SwinConfig
from inklayer_tpu.nn.layers import LayerNorm, MLP, resize_pad_mask
from inklayer_tpu.ops.attention import sdpa


@functools.lru_cache(maxsize=64)
def _relative_position_index(window: int) -> np.ndarray:
    """(win^2, win^2) index into the (2w-1)^2 bias table (reference :77-135)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, n, n)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=64)
def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Additive attention mask for SW-MSA (reference BasicLayer :409-452):
    0 where both tokens come from the same original region, -100 otherwise.
    Returns (num_windows, win^2, win^2)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hsl in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for wsl in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hsl, wsl] = cnt
            cnt += 1
    wins = img.reshape(hp // window, window, wp // window, window)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = (wins[:, :, None] != wins[:, None, :]) * -100.0
    return mask.astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        """x: (num_windows*B, win^2, C); mask: (num_windows, win^2, win^2)."""
        bw, n, c = x.shape
        head_dim = self.dim // self.num_heads
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        idx = jnp.asarray(_relative_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)[None]  # (1, heads, n, n)

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        full_bias = bias
        if mask is not None:
            nw = mask.shape[0]
            b0 = bw // nw
            m = mask[None, :, None]  # (1, nw, 1, n, n)
            fb = bias[:, None] + m  # (1, nw, heads, n, n)
            fb = jnp.broadcast_to(fb, (b0, nw, self.num_heads, n, n))
            full_bias = fb.reshape(bw, self.num_heads, n, n)
        out = sdpa(q, k, v, bias=full_bias, scale=head_dim ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw: Tuple[int, int]):
        """x: (B, H*W, C) with static (H, W)."""
        h, w = hw
        b, n, c = x.shape
        shortcut = x
        x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, w, c)
        pad_b = (self.window - h % self.window) % self.window
        pad_r = (self.window - w % self.window) % self.window
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, self.window, self.shift))
        else:
            mask = None
        # partition
        x = x.reshape(b, hp // self.window, self.window, wp // self.window,
                      self.window, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, self.window * self.window, c)
        x = WindowAttention(self.dim, self.window, self.num_heads,
                            self.qkv_bias, dtype=self.dtype, name="attn")(x, mask)
        # un-partition
        x = x.reshape(b, hp // self.window, wp // self.window, self.window,
                      self.window, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, n, c)
        x = shortcut + x
        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = MLP(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw: Tuple[int, int]):
        h, w = hw
        b, n, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(b, hh * ww, 4 * c)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)
        return x, (hh, ww)


class SwinTransformer(nn.Module):
    cfg: SwinConfig = SwinConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        """x: (B, H, W, 3); mask: (B, H, W) bool, True = padding.

        Returns list of (feature (B, Hs, Ws, C_s), pad_mask (B, Hs, Ws)) for
        each out_index stage (C = 192/384/768 for Swin-T indices 1,2,3).
        """
        c = self.cfg
        b, h0, w0, _ = x.shape
        if mask is None:
            mask = jnp.zeros((b, h0, w0), bool)
        # patch embed: 4x4 conv (pad input to multiple of 4 like reference)
        pad_b = (c.patch_size - h0 % c.patch_size) % c.patch_size
        pad_r = (c.patch_size - w0 % c.patch_size) % c.patch_size
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        # conv params applied as space-to-depth + matmul (same param tree as
        # nn.Conv; the strided C_in=3 conv lowers to a slow T(2,128)-tiled
        # convolution — ~1.1ms/fwd at 800^2 on v5e, trace fusion.4444)
        from inklayer_tpu.nn.layers import _PatchProj
        p = c.patch_size
        h, w = x.shape[1] // p, x.shape[2] // p
        xp = x.reshape(b, h, p, w, p, x.shape[3])
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * w, p * p * x.shape[3])
        x = _PatchProj(p, c.embed_dim, 3, dtype=self.dtype,
                       name="patch_embed_proj")(xp.astype(self.dtype))
        x = LayerNorm(dtype=self.dtype, name="patch_embed_norm")(x)

        outs = []
        dim = c.embed_dim
        hw = (h, w)
        for stage, depth in enumerate(c.depths):
            heads = c.num_heads[stage]
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else c.window_size // 2
                x = SwinBlock(dim, heads, c.window_size, shift, c.mlp_ratio,
                              c.qkv_bias, dtype=self.dtype,
                              name=f"layers_{stage}_blocks_{blk}")(x, hw)
            if stage in c.out_indices:
                feat = LayerNorm(dtype=self.dtype, name=f"out_norm_{stage}")(x)
                feat = feat.reshape(b, hw[0], hw[1], dim)
                outs.append((feat, resize_pad_mask(mask, hw)))
            if stage < len(c.depths) - 1:
                x, hw = PatchMerging(dim, dtype=self.dtype,
                                     name=f"layers_{stage}_downsample")(x, hw)
                dim *= 2
        return outs
