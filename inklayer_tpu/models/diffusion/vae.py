"""AutoencoderKL (SD1.5 VAE), TPU-native NHWC.

Standard published architecture: encoder (conv_in, 4 down stages of 2
resnets + strided-conv downsample, mid resnet-attn-resnet, GroupNorm/SiLU
head, 2*latent output), decoder (mirrored with 3 resnets per stage and
nearest-2x upsampling), latent scaling factor 0.18215.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from inklayer_tpu.ops.attention import sdpa

SCALING_FACTOR = 0.18215


def _gn(x, name_module, groups=32):
    return name_module(x)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=min(32, self.out_ch), dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=min(32, c), dtype=self.dtype,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)[:, None]
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)[:, None]
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)[:, None]
        out = sdpa(q, k, v)[:, 0]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.channels
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(2):
                x = ResnetBlock(c, dtype=self.dtype,
                                name=f"down_{i}_resnet_{j}")(x)
            if i < len(ch) - 1:
                x = nn.Conv(c, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=self.dtype,
                            name=f"down_{i}_downsample")(x)
        x = ResnetBlock(ch[-1], dtype=self.dtype, name="mid_resnet_0")(x)
        x = AttnBlock(dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(ch[-1], dtype=self.dtype, name="mid_resnet_1")(x)
        x = nn.GroupNorm(num_groups=min(32, ch[-1]), dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(x)
        return nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype,
                       name="quant_conv")(x)


class Decoder(nn.Module):
    channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = self.channels
        z = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z)
        x = nn.Conv(ch[-1], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        x = ResnetBlock(ch[-1], dtype=self.dtype, name="mid_resnet_0")(x)
        x = AttnBlock(dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(ch[-1], dtype=self.dtype, name="mid_resnet_1")(x)
        for i, c in enumerate(reversed(ch)):
            for j in range(3):
                x = ResnetBlock(c, dtype=self.dtype, name=f"up_{i}_resnet_{j}")(x)
            if i < len(ch) - 1:
                b, h, w, cc = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, cc), "nearest")
                x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=min(32, ch[0]), dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.channels, self.latent_channels, self.dtype)
        self.decoder = Decoder(self.channels, self.latent_channels, self.dtype)

    def encode(self, x):
        """x in [-1, 1], (B, H, W, 3) -> latent mode (B, H/8, W/8, C_lat),
        already scaled by 0.18215."""
        moments = self.encoder(x)
        mean = moments[..., : self.latent_channels]
        return mean * SCALING_FACTOR

    def decode(self, z):
        return self.decoder(z / SCALING_FACTOR)

    def __call__(self, x):
        return self.decode(self.encode(x))
