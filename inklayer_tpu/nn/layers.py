"""Shared neural-net building blocks (flax.linen, NHWC layout).

TPU-first conventions used throughout the model zoo:
  * images and feature maps are NHWC (XLA's preferred conv layout on TPU);
  * parameters are float32, compute dtype is configurable (bfloat16 on TPU);
  * all shapes are static — padding + validity masks instead of dynamic sizes.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def gelu_exact(x):
    """erf-based GELU (torch nn.GELU default; flax's default is the tanh
    approximation, which costs ~1e-3 parity error per layer)."""
    return nn.gelu(x, approximate=False)


class _DenseParams(nn.Module):
    """Declares ``kernel``/``bias`` with nn.Dense's initializers and param
    tree (so checkpoint converters are untouched) without applying them —
    used by fused kernels that consume the raw weights."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class MLP(nn.Module):
    """Transformer feed-forward: Linear -> act -> Linear.

    ``fused=True`` routes exact-GELU bf16 calls on TPU through the Pallas
    fc1->GELU->fc2 kernel (ops/mlp.py): the (T, hidden) activation stays in
    VMEM instead of round-tripping through HBM between two XLA fusions."""

    hidden_dim: int
    out_dim: int
    act: Callable = gelu_exact
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        tokens = x.size // x.shape[-1]
        from inklayer_tpu.runtime import pallas_enabled

        if (self.fused and self.act is gelu_exact
                and self.dtype == jnp.bfloat16
                and pallas_enabled()
                and x.shape[-1] % 128 == 0 and self.out_dim % 128 == 0
                and self.hidden_dim % 512 == 0 and tokens % 512 == 0):
            from inklayer_tpu.ops.mlp import mlp_gelu
            w1, b1 = _DenseParams(self.hidden_dim, name="fc1")(x.shape[-1])
            w2, b2 = _DenseParams(self.out_dim, name="fc2")(self.hidden_dim)
            out = mlp_gelu(
                x.reshape(tokens, x.shape[-1]).astype(self.dtype),
                w1.astype(self.dtype), b1, w2.astype(self.dtype), b2)
            return out.reshape(*x.shape[:-1], self.out_dim)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class MLPBlock(nn.Module):
    """Multi-layer perceptron with configurable depth (used by detection heads:
    reference bbox_embed is a 3-layer ReLU MLP, GroundingDINO utils MLP)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layer{i}")(x))
        return nn.Dense(self.out_dim, dtype=self.dtype, name=f"layer{self.num_layers - 1}")(x)


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis with fp32 statistics.

    Optional fused-residual form: ``sum, normed = ln(x, residual)`` computes
    ``sum = x + residual`` and ``LN(sum)`` in one Pallas pass on TPU (the
    standalone add runs ~5x off roofline next to custom calls)."""

    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        orig_dtype = x.dtype
        shape = x.shape
        if residual is not None:
            c = shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            x2 = x.reshape(-1, c)
            r2 = residual.reshape(-1, c)
            # full-C blocks are legal for any lane width (the block equals
            # the array dim); sub-128 C (Swin stages: 96/192) still beats
            # XLA's split convert+reduce fusions by ~4x
            from inklayer_tpu.runtime import pallas_enabled

            if pallas_enabled() and c % 8 == 0 and x2.shape[0] >= 512:
                from inklayer_tpu.ops.norm import layernorm_residual_2d

                s, o = layernorm_residual_2d(x2, r2, scale, bias,
                                             eps=self.eps)
                return s.reshape(shape), o.reshape(shape)
            s = (x2.astype(jnp.float32) + r2.astype(jnp.float32))
            mean = jnp.mean(s, axis=-1, keepdims=True)
            var = jnp.var(s, axis=-1, keepdims=True)
            o = (s - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
            return (s.astype(orig_dtype).reshape(shape),
                    o.astype(orig_dtype).reshape(shape))
        # canonicalize to 2D (tokens, channels): a global-attention block in
        # the same graph otherwise flips the 4D activation layout and every
        # LN reduction becomes ~4x slower and unfused (measured ~0.84ms vs
        # 0.15ms per LN on v5e, scripts/ablate_ln.py + perfetto traces)
        if x.ndim != 2:
            x = x.reshape(-1, shape[-1])
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        from inklayer_tpu.runtime import pallas_enabled

        if pallas_enabled() and c % 8 == 0 and x.shape[0] >= 512:
            # Pallas one-pass LN: XLA's convert+reduce splits run ~20x off
            # the HBM roofline when custom calls elsewhere perturb layouts
            from inklayer_tpu.ops.norm import layernorm_2d

            out = layernorm_2d(x, scale, bias, eps=self.eps)
            return out.reshape(shape)
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        out = (x * scale + bias).astype(orig_dtype)
        return out.reshape(shape)


class DropPath(nn.Module):
    """Stochastic depth. Identity at inference (deterministic=True)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class _PatchProj(nn.Module):
    """Conv-parameter-compatible patch projection as one matmul.

    Declares the same ``kernel (p, p, in, out)`` / ``bias (out,)`` params as
    the ``nn.Conv`` it replaces (checkpoint converters untouched) but applies
    them as ``(tokens, p*p*in) @ (p*p*in, out)`` — the strided conv with
    C_in=3 lowers to a T(2,128)-tiled convolution that costs ~2.5 ms/fwd on
    v5e (plus a 0.85 ms input layout copy); the space-to-depth + matmul
    formulation is pure MXU."""

    patch_size: int
    embed_dim: int
    in_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp):  # xp: (b, tokens, p*p*in_ch)
        p = self.patch_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p, p, self.in_ch, self.embed_dim))
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        w = kernel.reshape(p * p * self.in_ch, self.embed_dim)
        return (jnp.dot(xp, w.astype(self.dtype),
                        preferred_element_type=self.dtype)
                + bias.astype(self.dtype))


class PatchEmbed(nn.Module):
    """Image-to-patch embedding via strided conv. Input NHWC.

    ``as_matmul`` applies the conv weights as space-to-depth + matmul with an
    identical parameter tree (see _PatchProj)."""

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    flatten: bool = False
    as_matmul: bool = False

    @nn.compact
    def __call__(self, x):
        if self.as_matmul:
            p = self.patch_size
            b, hh, ww, c = x.shape
            h, w = hh // p, ww // p
            xp = x.reshape(b, h, p, w, p, c)
            xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * w, p * p * c)
            out = _PatchProj(p, self.embed_dim, c, dtype=self.dtype,
                             name="proj")(xp.astype(self.dtype))
            if self.flatten:
                return out
            return out.reshape(b, h, w, self.embed_dim)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="proj",
        )(x)
        if self.flatten:
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
        return x


def window_partition(x: jax.Array, window: int):
    """(B, H, W, C) -> (B*nWh*nWw, window, window, C), padding H/W up to a
    multiple of `window` (zero pad bottom-right, like SAM image_encoder.py
    window_partition semantics)."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(windows: jax.Array, window: int, padded_hw, orig_hw):
    """Inverse of window_partition, cropping back to the original H/W."""
    hp, wp = padded_hw
    h, w = orig_hw
    b = windows.shape[0] // ((hp // window) * (wp // window))
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def drop_path_identity(x):
    return x


def resize_pad_mask(mask: jax.Array, hw) -> jax.Array:
    """Downsample a top-left-anchored rectangular padding mask to a new
    resolution analytically (the reference nearest-interpolates the mask,
    util/misc NestedTensor; for rectangle masks this is equivalent but can
    never produce a fully-padded level: ceil keeps >=1 valid row/col)."""
    b, big_h, big_w = mask.shape
    h, w = hw
    vh = jnp.sum((~mask[:, :, 0]).astype(jnp.int32), axis=1)  # (B,)
    vw = jnp.sum((~mask[:, 0, :]).astype(jnp.int32), axis=1)
    vh_l = jnp.clip(jnp.ceil(vh * h / big_h).astype(jnp.int32), 1, h)
    vw_l = jnp.clip(jnp.ceil(vw * w / big_w).astype(jnp.int32), 1, w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    return (rows >= vh_l[:, None, None]) | (cols >= vw_l[:, None, None])


def interpolate_pos_embed(pos: jax.Array, new_hw, num_prefix: int = 0,
                          offset: float = 0.0):
    """Bicubic-resample a (1, N(+prefix), C) positional embedding grid to a new
    spatial size. `offset` mirrors DINOv2's interpolate_offset fudge."""
    nh, nw = new_hw
    prefix = pos[:, :num_prefix]
    grid = pos[:, num_prefix:]
    n = grid.shape[1]
    gs = int(round(n ** 0.5))
    grid = grid.reshape(1, gs, gs, -1)
    if (nh, nw) != (gs, gs):
        grid = jax.image.resize(grid, (1, nh, nw, grid.shape[-1]), method="bicubic")
    return prefix, grid.reshape(1, nh * nw, -1)
