"""ControlNet (lllyasviel/control_v11p_sd15_inpaint architecture): UNet
encoder copy + zero-initialised 1x1 output convs + conditioning embedder.

Produces per-skip residuals and a mid residual that are added into the
host UNet (unet.py down_residuals / mid_residual).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from inklayer_tpu.models.diffusion.unet import (
    ResnetBlockT,
    TimeEmbedding,
    TransformerBlock2D,
    timestep_embedding,
)


class ControlNetConditioningEmbedding(nn.Module):
    """control image (B, H, W, 3) -> (B, H/8, W/8, ch0) feature."""

    out_ch: int = 320
    block_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        x = nn.Conv(self.block_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(cond)
        x = nn.silu(x)
        for i in range(len(self.block_channels) - 1):
            x = nn.Conv(self.block_channels[i], (3, 3), padding=1,
                        dtype=self.dtype, name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(self.block_channels[i + 1], (3, 3), strides=(2, 2),
                        padding=1, dtype=self.dtype, name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        return nn.Conv(self.out_ch, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       name="conv_out")(x)


class ControlNet(nn.Module):
    in_channels: int = 4  # ControlNet v11p conditions the plain 4ch latents
    block_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_heads: int = 8
    context_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, context, cond_image,
                 conditioning_scale: float = 1.0):
        """Returns (down_residuals list, mid_residual)."""
        ch = self.block_channels
        temb = timestep_embedding(timesteps, ch[0])
        temb = TimeEmbedding(ch[0] * 4, dtype=self.dtype,
                             name="time_embedding")(temb.astype(self.dtype))
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(sample)
        x = x + ControlNetConditioningEmbedding(
            ch[0], dtype=self.dtype, name="cond_embedding")(cond_image)

        feats = [x]
        for i, c in enumerate(ch):
            has_attn = i < len(ch) - 1
            for j in range(self.layers_per_block):
                x = ResnetBlockT(c, dtype=self.dtype,
                                 name=f"down_{i}_resnet_{j}")(x, temb)
                if has_attn:
                    x = TransformerBlock2D(c, self.num_heads, self.context_dim,
                                           dtype=self.dtype,
                                           name=f"down_{i}_attn_{j}")(x, context)
                feats.append(x)
            if i < len(ch) - 1:
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name=f"down_{i}_downsample")(x)
                feats.append(x)
        x = ResnetBlockT(ch[-1], dtype=self.dtype, name="mid_resnet_0")(x, temb)
        x = TransformerBlock2D(ch[-1], self.num_heads, self.context_dim,
                               dtype=self.dtype, name="mid_attn")(x, context)
        x = ResnetBlockT(ch[-1], dtype=self.dtype, name="mid_resnet_1")(x, temb)

        down_res = []
        for i, f in enumerate(feats):
            z = nn.Conv(f.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name=f"zero_conv_{i}")(f)
            down_res.append(z * conditioning_scale)
        mid = nn.Conv(x.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                      dtype=self.dtype, name="zero_conv_mid")(x)
        return down_res, mid * conditioning_scale
