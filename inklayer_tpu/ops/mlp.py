"""Fused transformer MLP (fc1 -> exact GELU -> fc2) as one Pallas kernel.

XLA runs the two denses as separate fusions with the (T, hidden) GELU
activation round-tripping through HBM (40MB each way for SAM ViT-H blocks)
and the erf epilogue serialized after the first matmul; measured
0.55 + 0.28 ms per block on v5e vs a 0.545 ms combined MXU roofline
(scripts/profile_sam.py 2026-08-18).  This kernel streams hidden-dim chunks:
    h_j = gelu(x @ W1[:, j]) ;  acc += h_j @ W2[j, :]
so the activation never leaves VMEM and the VPU GELU overlaps the MXU.

Functional parity target: segment-anything modeling/common.py MLPBlock
(Linear -> GELU -> Linear), torch nn.GELU default = exact erf form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476


def _erf(x):
    """fp32 erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 —
    below bf16 resolution, so gelu(bf16) output is indistinguishable from
    the exact erf form).  Mosaic has no erf primitive; exp it has."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(h, approx):
    if approx == "erf":
        # exact (erf) GELU in fp32 — matches torch nn.GELU default
        return 0.5 * h * (1.0 + _erf(h * _INV_SQRT2))
    if approx == "tanh":
        inner = 0.7978845608028654 * (h + 0.044715 * h * h * h)
        return 0.5 * h * (1.0 + jnp.tanh(inner))
    if approx == "sigmoid":
        return h * jax.nn.sigmoid(1.702 * h)
    return h  # identity: VPU-cost ablation only


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref, h_ref,
            *, nj, approx):
    """Software-pipelined over j (hidden chunks, nj+1 steps):

        step j:  h[j%2]  = gelu(x @ W1[:, j] + b1[j])          (j < nj)
                 acc    += h[(j-1)%2] @ W2[j-1, :]             (j > 0)

    The two matmuls in a step are independent, so the VPU GELU of chunk j
    overlaps the MXU pass of chunk j-1 — without the skew the per-step chain
    MXU->VPU->MXU serializes the GELU (measured 0.92 ms vs 0.545 roofline;
    scripts/ablate_mlp.py)."""
    j = pl.program_id(1)

    @pl.when(j < nj)
    def _():
        x = x_ref[...]          # (bt, C) bf16
        w1 = w1_ref[...]        # (C, bh)
        h = jax.lax.dot_general(
            x, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = h + b1_ref[...].astype(jnp.float32)  # (1, bh) broadcast
        h_ref[j % 2] = _gelu(h, approx).astype(h_ref.dtype)

    @pl.when(j == 1)
    def _():
        acc_ref[...] = jax.lax.dot_general(
            h_ref[0], w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + b2_ref[...].astype(jnp.float32)

    @pl.when(j > 1)
    def _():
        acc_ref[...] += jax.lax.dot_general(
            h_ref[(j - 1) % 2], w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == nj)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_h",
                                             "interpret", "approx"))
def mlp_gelu(
    x: jax.Array,    # (T, C)
    w1: jax.Array,   # (C, H)
    b1: jax.Array,   # (H,)
    w2: jax.Array,   # (H, C)
    b2: jax.Array,   # (C,)
    *,
    block_t: int | None = None,
    block_h: int | None = None,
    interpret: bool = False,
    approx: str = "erf",
) -> jax.Array:
    t, c = x.shape
    h = w1.shape[1]
    # device-trace sweep at SAM ViT-H shapes (T=4096,C=1280,H=5120, v5e):
    # (1024,1024) 0.607 ms, (1024,512) 0.611, (512,512) 0.648 — vs 0.545
    # MXU roofline and 0.74 for XLA's two fusions.
    if block_t is None:
        block_t = 1024 if t % 1024 == 0 else 512
    if block_h is None:
        block_h = 1024 if h % 1024 == 0 else 512
    assert t % block_t == 0 and h % block_h == 0 and c % 128 == 0, (t, c, h)
    nj = h // block_h
    dtype = x.dtype
    kernel = functools.partial(_kernel, nj=nj, approx=approx)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, c), dtype),
        grid=(t // block_t, nj + 1),
        in_specs=[
            pl.BlockSpec((block_t, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_h), lambda i, j: (0, jnp.minimum(j, nj - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, jnp.minimum(j, nj - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, c), lambda i, j: (jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_t, c), jnp.float32),
                        pltpu.VMEM((2, block_t, block_h), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # default scoped limit is 16MB; v5e has 128MB VMEM.  Large
            # block_t cuts weight re-streaming (weights re-fetched once per
            # token block), which is what bounds this kernel.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1.astype(dtype), b1.reshape(1, -1).astype(dtype),
      w2.astype(dtype), b2.reshape(1, -1).astype(dtype))
