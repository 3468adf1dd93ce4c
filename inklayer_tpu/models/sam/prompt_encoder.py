"""SAM prompt encoder (points / boxes / masks -> sparse + dense embeddings).

Parity target: segment-anything ``modeling/prompt_encoder.py:16-214``.
Box prompts are the only prompt type the InkLayer pipeline uses
(segmentor/sam.py:32-38), but points and masks are implemented for full API
coverage.  Everything is fixed-capacity: callers pass padded prompt tensors
plus validity masks so shapes stay static under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inklayer_tpu.nn.layers import LayerNorm


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (prompt_encoder.py:145-182)."""

    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords: jax.Array) -> jax.Array:
        """coords in [0, 1], shape (..., 2) -> (..., 2*num_pos_feats)."""
        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: self.scale * jax.random.normal(key, shape),
            (2, self.num_pos_feats),
        )
        c = 2.0 * coords - 1.0
        c = c @ gauss
        c = 2.0 * np.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid(self, size: Tuple[int, int]) -> jax.Array:
        """Dense PE over an (H, W) grid -> (H, W, C). Uses pixel centers."""
        h, w = size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h,w,2)
        return self(grid)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 4 point embeddings: neg point, pos point, box corner 1, box corner 2
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0), (1, self.embed_dim))
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        # mask downscaling convnet (prompt_encoder.py:57-66)
        self.mask_conv1 = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2),
                                  dtype=self.dtype, name="mask_conv1")
        self.mask_ln1 = LayerNorm(dtype=self.dtype, name="mask_ln1")
        self.mask_conv2 = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                                  dtype=self.dtype, name="mask_conv2")
        self.mask_ln2 = LayerNorm(dtype=self.dtype, name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="mask_conv3")

    def get_dense_pe(self) -> jax.Array:
        """(1, H, W, embed_dim) positional encoding of the embedding grid."""
        return self.pe_layer.grid(self.image_embedding_size)[None]

    def _embed_coords(self, coords: jax.Array) -> jax.Array:
        """Pixel coords (..., 2) -> PE, normalised by input image size."""
        h, w = self.input_image_size
        norm = coords / jnp.asarray([w, h], coords.dtype)
        return self.pe_layer(norm)

    def embed_points(self, points: jax.Array, labels: jax.Array) -> jax.Array:
        """points: (B, N, 2) pixel xy (+0.5 shift applied here);
        labels: (B, N) in {-1 pad, 0 neg, 1 pos}."""
        pts = points + 0.5
        pe = self._embed_coords(pts)
        pe = jnp.where((labels == -1)[..., None], 0.0, pe)
        pe = pe + jnp.where((labels == -1)[..., None], self.not_a_point_embed, 0.0)
        pe = pe + jnp.where((labels == 0)[..., None], self.point_embeddings[0], 0.0)
        pe = pe + jnp.where((labels == 1)[..., None], self.point_embeddings[1], 0.0)
        return pe

    def embed_boxes(self, boxes: jax.Array) -> jax.Array:
        """boxes: (B, 4) xyxy pixels -> (B, 2, embed_dim)."""
        corners = boxes.reshape(-1, 2, 2) + 0.5
        pe = self._embed_coords(corners)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2][0])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3][0])
        return pe

    def embed_masks(self, masks: jax.Array) -> jax.Array:
        """masks: (B, 4*H, 4*W, 1) -> (B, H, W, embed_dim)."""
        x = nn.gelu(self.mask_ln1(self.mask_conv1(masks.astype(self.dtype))), approximate=False)
        x = nn.gelu(self.mask_ln2(self.mask_conv2(x)), approximate=False)
        return self.mask_conv3(x)

    def no_mask_dense(self, batch: int) -> jax.Array:
        h, w = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1), (batch, h, w, self.embed_dim))

    def __call__(
        self,
        points: Optional[Tuple[jax.Array, jax.Array]] = None,
        boxes: Optional[jax.Array] = None,
        masks: Optional[jax.Array] = None,
    ):
        """Returns (sparse_embeddings (B, N, C), dense_embeddings (B, H, W, C)).

        The batch dim is the number of prompts (one mask per prompt), matching
        the reference's predict_torch semantics.
        """
        parts = []
        batch = 1
        if points is not None:
            pts, labels = points
            batch = pts.shape[0]
            parts.append(self.embed_points(pts, labels))
        if boxes is not None:
            batch = boxes.shape[0]
            parts.append(self.embed_boxes(boxes))
        if parts:
            sparse = jnp.concatenate(parts, axis=1)
        else:
            sparse = jnp.zeros((batch, 0, self.embed_dim))
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = self.no_mask_dense(batch)
        return sparse, dense
