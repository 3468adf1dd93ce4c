"""Vision-language fusion blocks for GroundingDINO.

Parity targets: ``fuse_modules.py`` BiMultiHeadAttention (:146-248) /
BiAttentionBlock (:252-295) — GLIP-style bi-directional cross-attention with
shared logits, +/-50k clamps and max-subtraction for low-precision stability,
LayerScale gammas — and ``transformer_vanilla.py:33-123`` (text enhancer:
post-norm encoder layer, 4 heads, ffn 1024).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from inklayer_tpu.nn.layers import LayerNorm
from inklayer_tpu.ops.attention import sdpa

_CLAMP = 50000.0


class BiMultiHeadAttention(nn.Module):
    v_dim: int = 256
    l_dim: int = 256
    embed_dim: int = 1024
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, attention_mask_l: Optional[jax.Array] = None,
                 vision_pad_mask: Optional[jax.Array] = None):
        """v: (B, Nv, v_dim) vision; l: (B, Nl, l_dim) text;
        attention_mask_l: (B, Nl) bool, True = real token;
        vision_pad_mask: (B, Nv) bool, True = padded image position (masked
        out of the text->vision direction, fuse_modules.py:204-209).
        Returns (delta_v, delta_l)."""
        b, nv, _ = v.shape
        nl = l.shape[1]
        head_dim = self.embed_dim // self.num_heads
        scale = head_dim ** -0.5

        def heads(x, n):
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(v) * scale, nv)
        k = heads(nn.Dense(self.embed_dim, dtype=self.dtype, name="l_proj")(l), nl)
        value_v = heads(nn.Dense(self.embed_dim, dtype=self.dtype, name="values_v_proj")(v), nv)
        value_l = heads(nn.Dense(self.embed_dim, dtype=self.dtype, name="values_l_proj")(l), nl)

        logits = jnp.einsum("bhvd,bhld->bhvl", q, k,
                            preferred_element_type=jnp.float32)
        # fp16/bf16 stabilisation (fuse_modules.py:180-196): subtract global
        # max, clamp both tails
        logits = logits - jax.lax.stop_gradient(jnp.max(logits))
        logits = jnp.clip(logits, -_CLAMP, _CLAMP)

        # text->vision direction: softmax over vision axis
        logits_t = logits.transpose(0, 1, 3, 2)  # (b,h,l,v)
        logits_t = logits_t - jax.lax.stop_gradient(
            jnp.max(logits_t, axis=-1, keepdims=True))
        logits_t = jnp.clip(logits_t, -_CLAMP, _CLAMP)
        if vision_pad_mask is not None:
            logits_t = jnp.where(vision_pad_mask[:, None, None, :], -jnp.inf,
                                 logits_t)
        attn_l = jax.nn.softmax(logits_t, axis=-1)

        # vision->text direction: mask padded text then softmax over text axis
        if attention_mask_l is not None:
            neg = jnp.where(attention_mask_l[:, None, None, :], 0.0, -jnp.inf)
            logits = logits + neg
        attn_v = jax.nn.softmax(logits, axis=-1)

        out_v = jnp.einsum("bhvl,bhld->bhvd", attn_v.astype(value_l.dtype), value_l)
        out_l = jnp.einsum("bhlv,bhvd->bhld", attn_l.astype(value_v.dtype), value_v)
        out_v = out_v.transpose(0, 2, 1, 3).reshape(b, nv, self.embed_dim)
        out_l = out_l.transpose(0, 2, 1, 3).reshape(b, nl, self.embed_dim)
        dv = nn.Dense(self.v_dim, dtype=self.dtype, name="out_v_proj")(out_v)
        dl = nn.Dense(self.l_dim, dtype=self.dtype, name="out_l_proj")(out_l)
        return dv, dl


class BiAttentionBlock(nn.Module):
    v_dim: int = 256
    l_dim: int = 256
    embed_dim: int = 1024
    num_heads: int = 4
    init_values: float = 1e-4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, attention_mask_l: Optional[jax.Array] = None,
                 vision_pad_mask: Optional[jax.Array] = None):
        vn = LayerNorm(dtype=self.dtype, name="layer_norm_v")(v)
        ln = LayerNorm(dtype=self.dtype, name="layer_norm_l")(l)
        dv, dl = BiMultiHeadAttention(
            self.v_dim, self.l_dim, self.embed_dim, self.num_heads,
            dtype=self.dtype, name="attn")(vn, ln, attention_mask_l,
                                           vision_pad_mask)
        gamma_v = self.param("gamma_v",
                             nn.initializers.constant(self.init_values),
                             (self.v_dim,))
        gamma_l = self.param("gamma_l",
                             nn.initializers.constant(self.init_values),
                             (self.l_dim,))
        # NOTE: the reference's residual base is the NORMALIZED input
        # (fuse_modules.py:287-293: v = layer_norm_v(v); v = v + gamma*dv) —
        # not the raw input. droppath is identity at inference.
        return vn + gamma_v * dv, ln + gamma_l * dl


class TextEnhancerLayer(nn.Module):
    """Vanilla post-norm encoder layer over text (transformer_vanilla.py)."""

    d_model: int = 256
    num_heads: int = 4
    ffn_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, self_attn_mask: Optional[jax.Array] = None):
        """x: (B, N, C); pos: (B, N, C) sine embed of position ids;
        self_attn_mask: (B, N, N) bool, True = attend."""
        b, n, _ = x.shape
        head_dim = self.d_model // self.num_heads
        qk = x + pos

        def heads(y):
            return y.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(qk))
        k = heads(nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(qk))
        v = heads(nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(x))
        mask = None if self_attn_mask is None else self_attn_mask[:, None]
        attn = sdpa(q, k, v, mask=mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, self.d_model)
        attn = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(attn)
        x = LayerNorm(dtype=self.dtype, name="norm1")(x + attn)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        return LayerNorm(dtype=self.dtype, name="norm2")(x + h)
