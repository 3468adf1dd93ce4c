"""GroundingDINO deformable enc/dec transformer, TPU-native.

Parity target: GroundingDINO ``transformer.py`` — encoder loop
(fusion -> text enhancer -> deformable self-attn, :482-595), two-stage
proposal generation + top-900 selection (:284-327), decoder
(self-attn -> text cross-attn -> deformable cross-attn -> FFN with
iterative anchor refinement, :633-927) — and ``ms_deform_attn.py:232-359``
for the deformable attention module (sampling offsets / weights math).

All spatial shapes are static (bucketed inputs), so level loops unroll at
trace time; the top-900 proposal selection uses jax.lax.top_k (static k);
box counts stay fixed-capacity throughout.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inklayer_tpu.config import GDinoConfig
from inklayer_tpu.nn.layers import LayerNorm, MLPBlock
from inklayer_tpu.models.gdino.fusion import BiAttentionBlock, TextEnhancerLayer
from inklayer_tpu.ops.attention import sdpa
from inklayer_tpu.ops.deformable import ms_deform_attn


# ---------------------------------------------------------------------------
# Positional encodings
# ---------------------------------------------------------------------------


def sine_pos_embed_hw(mask: jax.Array, num_pos_feats: int = 128,
                      temperature_h: float = 20.0, temperature_w: float = 20.0
                      ) -> jax.Array:
    """PositionEmbeddingSineHW (backbone/position_encoding.py:78-179).

    mask: (B, H, W) bool, True = padding. Returns (B, H, W, 2*num_pos_feats)
    ordered (pos_y, pos_x) like the reference's channel concat."""
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps, scale = 1e-6, 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    def enc(e, temp):
        i = jnp.arange(num_pos_feats, dtype=jnp.float32)
        dim_t = temp ** (2 * jnp.floor(i / 2) / num_pos_feats)
        p = e[..., None] / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                         axis=-1).reshape(*e.shape, num_pos_feats)

    pos_y = enc(y_embed, temperature_h)
    pos_x = enc(x_embed, temperature_w)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def sine_embed_coords(coords: jax.Array, num_pos_feats: int = 128,
                      temperature: float = 10000.0) -> jax.Array:
    """get_sine_pos_embed with exchange_xy=True semantics for box coords:
    coords (..., K) in [0,1] -> (..., K*num_pos_feats), with the first two
    coordinate embeddings swapped (x<->y, matching gen_sineembed_for_position).
    """
    scale = 2 * math.pi
    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(i / 2) / num_pos_feats)
    p = coords[..., None] * scale / dim_t  # (..., K, F)
    emb = jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                    axis=-1).reshape(*coords.shape, num_pos_feats)
    if coords.shape[-1] >= 2:
        parts = [emb[..., 1, :], emb[..., 0, :]] + [
            emb[..., k, :] for k in range(2, coords.shape[-1])]
        emb = jnp.concatenate(parts, axis=-1)
    else:
        emb = emb.reshape(*coords.shape[:-1], -1)
    return emb


def inverse_sigmoid(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


# ---------------------------------------------------------------------------
# Deformable attention module
# ---------------------------------------------------------------------------


def _offset_grid_init(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Directional bias init for sampling offsets (ms_deform_attn.py:180-197):
    head h points at angle 2*pi*h/n_heads, scaled by (point index + 1)."""
    thetas = np.arange(n_heads) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for p in range(n_points):
        grid[:, :, p, :] *= p + 1
    return grid.reshape(-1).astype(np.float32)


class MSDeformAttnModule(nn.Module):
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    # encoder self-attn: queries ARE the flattened level rasters, enabling
    # the 2D-tiled x-windowed kernel (ops/deformable.py 'tiled')
    query_raster: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Lq, C) — pos already added
        reference_points: jax.Array,  # (B, Lq, n_levels, 2 or 4), sigmoid space
        value: jax.Array,  # (B, Lv, C)
        spatial_shapes: Tuple[Tuple[int, int], ...],
        value_mask: Optional[jax.Array] = None,  # (B, Lv) bool, True = pad
    ) -> jax.Array:
        b, lq, _ = query.shape
        lv = value.shape[1]
        h, l, p = self.n_heads, self.n_levels, self.n_points
        head_dim = self.d_model // h

        v = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(value)
        if value_mask is not None:
            v = jnp.where(value_mask[..., None], 0.0, v)
        v = v.reshape(b, lv, h, head_dim)

        offsets = nn.Dense(
            h * l * p * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _offset_grid_init(h, l, p), dtype),
            name="sampling_offsets")(query)
        offsets = offsets.reshape(b, lq, h, l, p, 2).astype(jnp.float32)
        attn = nn.Dense(h * l * p, dtype=self.dtype, name="attention_weights")(query)
        attn = jax.nn.softmax(
            attn.reshape(b, lq, h, l * p).astype(jnp.float32), axis=-1
        ).reshape(b, lq, h, l, p)

        ref = reference_points.astype(jnp.float32)
        if ref.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[w_, h_] for h_, w_ in spatial_shapes], jnp.float32)  # (L,2) xy
            loc = ref[:, :, None, :, None, :] + \
                offsets / normalizer[None, None, None, :, None, :]
        else:
            loc = ref[:, :, None, :, None, :2] + \
                offsets / p * ref[:, :, None, :, None, 2:] * 0.5
        out = ms_deform_attn(v, spatial_shapes, loc, attn,
                             query_raster=self.query_raster)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)


# ---------------------------------------------------------------------------
# Encoder / decoder layers
# ---------------------------------------------------------------------------


class DeformableEncoderLayer(nn.Module):
    cfg: GDinoConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, pad_mask):
        c = self.cfg
        attn = MSDeformAttnModule(
            c.hidden_dim, c.num_feature_levels, c.nheads, c.enc_n_points,
            query_raster=True, dtype=self.dtype, name="self_attn")(
                src + pos, reference_points, src, spatial_shapes, pad_mask)
        src = LayerNorm(dtype=self.dtype, name="norm1")(src + attn)
        h = nn.Dense(c.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        h = nn.relu(h)
        h = nn.Dense(c.hidden_dim, dtype=self.dtype, name="linear2")(h)
        return LayerNorm(dtype=self.dtype, name="norm2")(src + h)


class DecoderLayer(nn.Module):
    cfg: GDinoConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, memory, spatial_shapes, pad_mask,
                 reference_points, text, text_mask):
        c = self.cfg
        head_dim = c.hidden_dim // c.nheads
        b, nq, _ = tgt.shape

        def heads(y, n):
            return y.reshape(b, n, c.nheads, head_dim).transpose(0, 2, 1, 3)

        # 1. self-attention among queries
        q = tgt + query_pos
        sa = sdpa(heads(nn.Dense(c.hidden_dim, dtype=self.dtype, name="sa_q")(q), nq),
                  heads(nn.Dense(c.hidden_dim, dtype=self.dtype, name="sa_k")(q), nq),
                  heads(nn.Dense(c.hidden_dim, dtype=self.dtype, name="sa_v")(tgt), nq))
        sa = sa.transpose(0, 2, 1, 3).reshape(b, nq, c.hidden_dim)
        sa = nn.Dense(c.hidden_dim, dtype=self.dtype, name="sa_out")(sa)
        tgt = LayerNorm(dtype=self.dtype, name="norm2")(tgt + sa)

        # 2. text cross-attention (use_text_cross_attention=True)
        nt = text.shape[1]
        q = tgt + query_pos
        ca = sdpa(heads(nn.Dense(c.hidden_dim, dtype=self.dtype, name="ca_text_q")(q), nq),
                  heads(nn.Dense(c.hidden_dim, dtype=self.dtype, name="ca_text_k")(text), nt),
                  heads(nn.Dense(c.hidden_dim, dtype=self.dtype, name="ca_text_v")(text), nt),
                  mask=text_mask[:, None, None, :])
        ca = ca.transpose(0, 2, 1, 3).reshape(b, nq, c.hidden_dim)
        ca = nn.Dense(c.hidden_dim, dtype=self.dtype, name="ca_text_out")(ca)
        tgt = LayerNorm(dtype=self.dtype, name="catext_norm")(tgt + ca)

        # 3. deformable cross-attention to image memory
        da = MSDeformAttnModule(
            c.hidden_dim, c.num_feature_levels, c.nheads, c.dec_n_points,
            dtype=self.dtype, name="cross_attn")(
                tgt + query_pos, reference_points, memory, spatial_shapes, pad_mask)
        tgt = LayerNorm(dtype=self.dtype, name="norm1")(tgt + da)

        # 4. FFN
        h = nn.Dense(c.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        h = nn.relu(h)
        h = nn.Dense(c.hidden_dim, dtype=self.dtype, name="linear2")(h)
        return LayerNorm(dtype=self.dtype, name="norm3")(tgt + h)


# ---------------------------------------------------------------------------
# Full transformer
# ---------------------------------------------------------------------------


def encoder_reference_points(spatial_shapes, valid_ratios):
    """(B, sum HW, n_levels, 2) normalized center grids scaled by valid
    ratios (deformable encoder get_reference_points)."""
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = jnp.arange(h, dtype=jnp.float32) + 0.5
        rx = jnp.arange(w, dtype=jnp.float32) + 0.5
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        ref = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (hw, 2) xy
        # normalize by the valid (non-pad) extent of THIS level
        denom = valid_ratios[:, lvl, :] * jnp.asarray([w, h], jnp.float32)  # (B,2)
        refs.append(ref[None] / denom[:, None, :])
    ref = jnp.concatenate(refs, axis=1)  # (B, sum, 2)
    return ref[:, :, None, :] * valid_ratios[:, None, :, :]


def compute_valid_ratios(masks: Sequence[jax.Array]) -> jax.Array:
    """masks: list of (B, H, W) pad masks -> (B, n_levels, 2) [w_ratio, h_ratio]."""
    ratios = []
    for m in masks:
        not_m = (~m).astype(jnp.float32)
        # clamp to >=1 valid row/col: a fully-padded level would otherwise
        # produce division-by-zero downstream
        valid_h = jnp.maximum(jnp.sum(not_m[:, :, 0], axis=1), 1.0)
        valid_w = jnp.maximum(jnp.sum(not_m[:, 0, :], axis=1), 1.0)
        ratios.append(jnp.stack([valid_w / m.shape[2], valid_h / m.shape[1]], -1))
    return jnp.stack(ratios, axis=1)


def gen_encoder_output_proposals(memory, pad_mask, spatial_shapes):
    """Returns (masked_memory (B, L, C), output_proposals (B, L, 4) in logit
    space with +inf at invalid positions) — transformer gen_encoder_output_
    proposals semantics."""
    b = memory.shape[0]
    proposals = []
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        m = pad_mask[:, offset: offset + h * w].reshape(b, h, w)
        offset += h * w
        valid_h = jnp.sum((~m[:, :, 0]).astype(jnp.float32), axis=1)
        valid_w = jnp.sum((~m[:, 0, :]).astype(jnp.float32), axis=1)
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([gx, gy], -1)[None]  # (1, h, w, 2)
        scale = jnp.stack([valid_w, valid_h], -1).reshape(b, 1, 1, 2)
        grid = (jnp.broadcast_to(grid, (b, h, w, 2)) + 0.5) / scale
        wh = jnp.ones_like(grid) * (0.05 * 2.0 ** lvl)
        proposals.append(jnp.concatenate([grid, wh], -1).reshape(b, h * w, 4))
    props = jnp.concatenate(proposals, axis=1)
    valid = jnp.all((props > 0.01) & (props < 0.99), axis=-1, keepdims=True)
    # clamp BEFORE the log so invalid rows (overwritten with +inf below)
    # don't produce nan forward values whose 0-cotangent still poisons
    # gradients (0 * nan) during fine-tuning; valid rows are unaffected
    # (validity already requires 0.01 < p < 0.99)
    safe = jnp.clip(props, 1e-3, 1 - 1e-3)
    props_logit = jnp.log(safe / (1 - safe))
    invalid = pad_mask[..., None] | ~valid
    props_logit = jnp.where(invalid, jnp.inf, props_logit)
    mem = jnp.where(invalid, 0.0, memory)
    return mem, props_logit


class ContrastiveEmbed(nn.Module):
    """logits = queries @ encoded_text^T, -inf at padded text, padded to
    max_text_len (GroundingDINO utils.py:233-268)."""

    max_text_len: int = 256

    @nn.compact
    def __call__(self, x, text, text_token_mask):
        res = jnp.einsum("bqc,btc->bqt", x, text,
                         preferred_element_type=jnp.float32)
        res = jnp.where(text_token_mask[:, None, :], res, -jnp.inf)
        pad = self.max_text_len - res.shape[-1]
        if pad > 0:
            res = jnp.pad(res, ((0, 0), (0, 0), (0, pad)),
                          constant_values=-jnp.inf)
        return res[..., : self.max_text_len]


class GDinoTransformer(nn.Module):
    cfg: GDinoConfig = GDinoConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        srcs: Sequence[jax.Array],  # per level (B, H, W, C)
        masks: Sequence[jax.Array],  # per level (B, H, W) bool pad
        pos_embeds: Sequence[jax.Array],  # per level (B, H, W, C)
        text: jax.Array,  # (B, Nt, C) projected text features
        text_token_mask: jax.Array,  # (B, Nt) bool True=real
        text_self_attn_mask: jax.Array,  # (B, Nt, Nt) bool
        position_ids: jax.Array,  # (B, Nt) int
    ):
        c = self.cfg
        b = srcs[0].shape[0]
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)

        # flatten levels + add level embed
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (c.num_feature_levels, c.hidden_dim))
        src_flat = jnp.concatenate(
            [s.reshape(b, -1, c.hidden_dim) for s in srcs], axis=1)
        mask_flat = jnp.concatenate([m.reshape(b, -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [p.reshape(b, -1, c.hidden_dim) + level_embed[i]
             for i, p in enumerate(pos_embeds)], axis=1)

        valid_ratios = compute_valid_ratios(masks)
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)
        pos_text = sine_embed_coords(
            position_ids[..., None].astype(jnp.float32),
            num_pos_feats=c.hidden_dim, temperature=10000.0)

        # ------------------------- encoder -------------------------------
        memory, memory_text = src_flat, text
        for i in range(c.enc_layers):
            memory, memory_text = BiAttentionBlock(
                c.hidden_dim, c.hidden_dim, c.fusion_embed_dim,
                c.fusion_nheads, dtype=self.dtype,
                name=f"enc_fusion_{i}")(memory, memory_text, text_token_mask,
                                        vision_pad_mask=mask_flat)
            memory_text = TextEnhancerLayer(
                c.hidden_dim, c.text_enhancer_nheads, c.text_enhancer_ffn,
                dtype=self.dtype, name=f"enc_text_{i}")(
                    memory_text, pos_text, text_self_attn_mask)
            memory = DeformableEncoderLayer(
                c, dtype=self.dtype, name=f"enc_layer_{i}")(
                    memory, pos_flat, enc_ref, spatial_shapes, mask_flat)

        # ------------------------- two-stage -----------------------------
        out_mem, out_props = gen_encoder_output_proposals(
            memory, mask_flat, spatial_shapes)
        out_mem = nn.Dense(c.hidden_dim, dtype=self.dtype, name="enc_output")(out_mem)
        out_mem = LayerNorm(dtype=self.dtype, name="enc_output_norm")(out_mem)
        enc_logits = ContrastiveEmbed(c.max_text_len, name="enc_out_class_embed")(
            out_mem, memory_text, text_token_mask)
        enc_boxes_unsig = MLPBlock(c.hidden_dim, 4, num_layers=3,
                                   dtype=self.dtype,
                                   name="enc_out_bbox_embed")(out_mem) + out_props
        topk_scores = jnp.max(
            jnp.where(jnp.isfinite(enc_logits), enc_logits, -jnp.inf), axis=-1)
        topk_scores = jnp.where(jnp.isnan(topk_scores), -jnp.inf, topk_scores)
        _, topk_idx = jax.lax.top_k(topk_scores, c.num_queries)  # (B, nq)
        ref_unsig = jnp.take_along_axis(
            enc_boxes_unsig, topk_idx[..., None], axis=1)  # (B, nq, 4)
        ref_points = jax.nn.sigmoid(ref_unsig)
        # learned content queries (embed_init_tgt=True)
        tgt_embed = self.param("tgt_embed", nn.initializers.normal(1.0),
                               (c.num_queries, c.hidden_dim))
        tgt = jnp.broadcast_to(tgt_embed[None], (b,) + tgt_embed.shape)
        tgt = tgt.astype(self.dtype)

        # ------------------------- decoder -------------------------------
        # shared bbox head across decoder layers (dec_pred_bbox_embed_share)
        bbox_embed = MLPBlock(c.hidden_dim, 4, num_layers=3, dtype=self.dtype,
                              name="bbox_embed")
        ref_point_head = MLPBlock(c.hidden_dim, c.hidden_dim, num_layers=2,
                                  dtype=self.dtype, name="ref_point_head")
        dec_norm = LayerNorm(dtype=self.dtype, name="dec_norm")
        hs_list, ref_list = [], [ref_points]
        out = tgt
        ref = ref_points
        vr4 = jnp.concatenate([valid_ratios, valid_ratios], -1)  # (B, L, 4)
        for i in range(c.dec_layers):
            ref_input = ref[:, :, None, :] * vr4[:, None, :, :]  # (B,nq,L,4)
            query_sine = sine_embed_coords(ref_input[:, :, 0, :],
                                           num_pos_feats=c.hidden_dim // 2)
            query_pos = ref_point_head(query_sine).astype(self.dtype)
            out = DecoderLayer(c, dtype=self.dtype, name=f"dec_layer_{i}")(
                out, query_pos, memory, spatial_shapes, mask_flat, ref_input,
                memory_text, text_token_mask)
            delta = bbox_embed(out).astype(jnp.float32)
            ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
            hs_list.append(dec_norm(out))
            ref_list.append(ref)
        return hs_list, ref_list, memory_text
