"""DINOv2 ViT encoder for Depth-Anything-V2, TPU-native.

Parity target: Depth_Anything_V2 ``depth_anything_v2/dinov2.py:44-415``
(DinoVisionTransformer: patch 14, cls token, LayerScale init 1.0,
interpolate_offset=0.1 pos-embed interpolation, 0 register tokens,
get_intermediate_layers with final-norm applied) and ``dinov2_layers/*``
(Block, MemEffAttention, Mlp).

The xformers memory-efficient attention becomes the Pallas flash kernel on
TPU (1370 tokens at 518px).  Input sizes are static per shape bucket, so
pos-embed interpolation happens at trace time.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from inklayer_tpu.config import DepthConfig
from inklayer_tpu.nn.layers import LayerNorm, MLP
from inklayer_tpu.ops.attention import attention


class DinoBlock(nn.Module):
    dim: int
    num_heads: int
    layerscale_init: float = 1.0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="attn_qkv")(y)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        out = attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(self.dim, dtype=self.dtype, name="attn_proj")(out)
        ls1 = self.param("ls1_gamma",
                         nn.initializers.constant(self.layerscale_init),
                         (self.dim,))
        x = x + ls1 * out
        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = MLP(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(y)
        ls2 = self.param("ls2_gamma",
                         nn.initializers.constant(self.layerscale_init),
                         (self.dim,))
        return x + ls2 * y


class DinoVisionTransformer(nn.Module):
    cfg: DepthConfig = DepthConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, taps: Sequence[int]):
        """x: (B, H, W, 3) with H, W multiples of patch_size.
        Returns list of ((B, N, C) patch tokens, (B, C) cls token) for each
        requested block index, with the final LayerNorm applied."""
        c = self.cfg
        b, h, w, _ = x.shape
        ph, pw = h // c.patch_size, w // c.patch_size
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), dtype=self.dtype,
                    name="patch_embed_proj")(x)
        x = x.reshape(b, ph * pw, c.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, c.embed_dim))
        base_grid = c.input_size // c.patch_size
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + base_grid * base_grid, c.embed_dim))
        pos = self._interpolate_pos(pos_embed, (ph, pw))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, c.embed_dim)).astype(self.dtype), x],
            axis=1)
        x = x + pos.astype(self.dtype)

        final_norm = LayerNorm(dtype=self.dtype, name="norm")
        outs = []
        for i in range(c.depth):
            x = DinoBlock(c.embed_dim, c.num_heads, c.layerscale_init,
                          dtype=self.dtype, name=f"blocks_{i}")(x)
            if i in taps:
                y = final_norm(x)
                outs.append((y[:, 1:], y[:, 0]))
        return outs

    def _interpolate_pos(self, pos_embed: jax.Array, grid_hw: Tuple[int, int]):
        """DINOv2 interpolate_pos_encoding (:179-211): bicubic resample of
        the patch grid with the interpolate_offset fudge; cls pos unchanged."""
        c = self.cfg
        ph, pw = grid_hw
        n = pos_embed.shape[1] - 1
        gs = int(round(math.sqrt(n)))
        if (ph, pw) == (gs, gs):
            return pos_embed
        cls_pos = pos_embed[:, :1]
        grid = pos_embed[:, 1:].reshape(1, gs, gs, -1).astype(jnp.float32)
        # reference computes scale_factor=(ph+offset)/gs to avoid rounding
        # artifacts; with static output shapes a direct bicubic resize to
        # (ph, pw) is equivalent up to the fudge term
        grid = jax.image.resize(grid, (1, ph, pw, grid.shape[-1]),
                                method="bicubic")
        grid = grid.reshape(1, ph * pw, -1).astype(pos_embed.dtype)
        return jnp.concatenate([cls_pos, grid], axis=1)
