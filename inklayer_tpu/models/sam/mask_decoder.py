"""SAM mask decoder: TwoWayTransformer + hypernetwork mask heads.

Parity target: segment-anything ``modeling/mask_decoder.py:16-176`` and
``modeling/transformer.py:16-240``.  Short token sequences (<= ~10 tokens vs
4096 image tokens) — everything stays on the fused-XLA sdpa path; the 2x
ConvTranspose upscaling and hypernetwork matmul are MXU-dense ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from inklayer_tpu.nn.layers import LayerNorm, MLPBlock
from inklayer_tpu.ops.attention import sdpa


class AttentionDS(nn.Module):
    """Attention with optional internal downsampling of the embedding dim
    (transformer.py:153-197: downsample_rate=2 -> internal dim 128)."""

    embed_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embed_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        out = sdpa(split(qp), split(kp), split(vp))
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        # token self-attention
        if self.skip_first_layer_pe:
            queries = AttentionDS(self.embed_dim, self.num_heads, dtype=self.dtype,
                                  name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            attn = AttentionDS(self.embed_dim, self.num_heads, dtype=self.dtype,
                               name="self_attn")(q, q, queries)
            queries = queries + attn
        queries = LayerNorm(dtype=self.dtype, name="norm1")(queries)
        # token -> image cross-attention (downsampled)
        q = queries + query_pe
        k = keys + key_pe
        attn = AttentionDS(self.embed_dim, self.num_heads, downsample_rate=2,
                           dtype=self.dtype, name="cross_attn_token_to_image")(q, k, keys)
        queries = queries + attn
        queries = LayerNorm(dtype=self.dtype, name="norm2")(queries)
        # mlp
        mlp = MLPBlock(self.mlp_dim, self.embed_dim, num_layers=2,
                       dtype=self.dtype, name="mlp")(queries)
        queries = queries + mlp
        queries = LayerNorm(dtype=self.dtype, name="norm3")(queries)
        # image -> token cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn = AttentionDS(self.embed_dim, self.num_heads, downsample_rate=2,
                           dtype=self.dtype, name="cross_attn_image_to_token")(k, q, queries)
        keys = keys + attn
        keys = LayerNorm(dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/(pe): (B, H, W, C); point_embedding: (B, N, C)."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(image_pe.shape[0], h * w, c)
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embed_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(queries, keys, point_embedding, key_pe)
        # final token -> image attention
        q = queries + point_embedding
        k = keys + key_pe
        attn = AttentionDS(self.embed_dim, self.num_heads, downsample_rate=2,
                           dtype=self.dtype, name="final_attn_token_to_image")(q, k, keys)
        queries = queries + attn
        queries = LayerNorm(dtype=self.dtype, name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 0  # 0 -> transformer_dim (256 for ViT-H)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embeddings: jax.Array,  # (B, H, W, C)
        image_pe: jax.Array,  # (1, H, W, C)
        sparse_prompt_embeddings: jax.Array,  # (B, N, C)
        dense_prompt_embeddings: jax.Array,  # (B, H, W, C)
        multimask_output: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (masks (B, M, 4H, 4W) logits, iou_pred (B, M))."""
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.transformer_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_mask_tokens, self.transformer_dim))
        b = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (b,) + output_tokens.shape).astype(self.dtype)
        tokens = jnp.concatenate(
            [output_tokens, sparse_prompt_embeddings.astype(self.dtype)], axis=1)

        src = image_embeddings + dense_prompt_embeddings
        hs, src = TwoWayTransformer(
            embed_dim=self.transformer_dim,
            mlp_dim=8 * self.transformer_dim,
            dtype=self.dtype, name="transformer")(
            src.astype(self.dtype), image_pe.astype(self.dtype), tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1: 1 + num_mask_tokens]

        # upscale image features 4x (mask_decoder.py:45-52)
        h, w = image_embeddings.shape[1:3]
        x = src.reshape(b, h, w, self.transformer_dim)
        x = nn.ConvTranspose(self.transformer_dim // 4, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv1")(x)
        x = LayerNorm(dtype=self.dtype, name="upscale_ln")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.ConvTranspose(self.transformer_dim // 8, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv2")(x)
        upscaled = nn.gelu(x, approximate=False)  # (b, 4h, 4w, C/8)

        hyper_in = jnp.stack(
            [
                MLPBlock(self.transformer_dim, self.transformer_dim // 8,
                         num_layers=3, dtype=self.dtype,
                         name=f"output_hypernetworks_mlps_{i}")(mask_tokens_out[:, i])
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # (b, num_mask_tokens, C/8)
        uh, uw = upscaled.shape[1:3]
        masks = jnp.einsum(
            "bmc,bhwc->bmhw", hyper_in, upscaled,
            preferred_element_type=jnp.float32)

        iou_pred = MLPBlock(self.iou_head_hidden_dim or self.transformer_dim,
                            num_mask_tokens,
                            num_layers=self.iou_head_depth, dtype=self.dtype,
                            name="iou_prediction_head")(iou_token_out)
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, 0:1], iou_pred[:, 0:1]
