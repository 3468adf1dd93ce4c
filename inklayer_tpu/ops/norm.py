"""Pallas LayerNorm for TPU.

XLA's layernorm on these models splits into convert+reduce fusions that run
~20x off the HBM roofline when a Pallas custom call elsewhere in the graph
perturbs layout assignment (measured 0.27 ms per (4096, 1280) bf16 LN on
v5e, scripts/profile_sam.py).  This kernel reads each row tile once into
VMEM, computes fp32 statistics in-register and writes the normalized output
— one pass at memory speed, immune to the surrounding graph's layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_res_kernel(x_ref, y_ref, scale_ref, bias_ref, s_ref, o_ref, *,
                   eps: float):
    s = x_ref[...].astype(jnp.float32) + y_ref[...].astype(jnp.float32)
    mean = jnp.mean(s, axis=-1, keepdims=True)
    sc = s - mean
    var = jnp.mean(sc * sc, axis=-1, keepdims=True)
    o = sc * jax.lax.rsqrt(var + eps)
    o = o * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    s_ref[...] = s.astype(s_ref.dtype)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_n", "interpret"))
def layernorm_residual_2d(x: jax.Array, y: jax.Array, scale: jax.Array,
                          bias: jax.Array, *, eps: float = 1e-6,
                          block_n: int = 512, interpret: bool = False):
    """Fused residual-add + LayerNorm: returns (x + y, LN(x + y)).

    One pass instead of a separate add_add fusion (which XLA runs ~5x off
    roofline next to custom calls) followed by the LN; the sum is also
    needed downstream as the next shortcut, so both outputs are written."""
    n, c = x.shape
    np_ = ((n + block_n - 1) // block_n) * block_n
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
        y = jnp.pad(y, ((0, np_ - n), (0, 0)))
    s, o = pl.pallas_call(
        functools.partial(_ln_res_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((np_, c), x.dtype),
                   jax.ShapeDtypeStruct((np_, c), x.dtype)),
        grid=(np_ // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((block_n, c), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block_n, c), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x, y, scale, bias)
    return s[:n], o[:n]


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (bn, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_n", "interpret"))
def layernorm_2d(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                 eps: float = 1e-6, block_n: int = 512,
                 interpret: bool = False) -> jax.Array:
    """x: (N, C) any float dtype; scale/bias: (C,).  Returns LN(x) in x.dtype
    with fp32 statistics (matches torch LayerNorm numerics)."""
    n, c = x.shape
    np_ = ((n + block_n - 1) // block_n) * block_n
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((np_, c), x.dtype),
        grid=(np_ // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, scale, bias)
    return out[:n]
