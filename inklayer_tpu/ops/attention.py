"""Attention ops: jnp reference path + Pallas TPU flash kernel.

Two public entry points:

  * ``sdpa(q, k, v, bias=, mask=)`` — pure-jnp scaled-dot-product attention.
    Used for short sequences (Swin 7x7=49 / SAM 14x14=196 windows, BERT 256
    tokens, decoder queries) where XLA fusion is already optimal.

  * ``flash_attention(q, k, v, ...)`` — Pallas kernel that keeps the full K/V
    for one (batch, head) in VMEM and blocks over queries, computing the
    softmax in fp32 without ever materialising the full (Nq, Nk) matrix in
    HBM.  Sequence lengths in this framework are <= ~9k (SAM global 4096,
    DINOv2 1370, SD UNet up to 9216 latent tokens), so whole-K-in-VMEM is the
    right regime — no online-softmax carry needed.  Supports SAM's decomposed
    relative position bias computed on the fly inside the kernel (reference
    semantics: segment-anything image_encoder.py add_decomposed_rel_pos,
    which materialises a (B*H, 4096, 4096) bias tensor — ~1GB/image — that we
    never form).

``attention(...)`` auto-dispatches between the two by sequence length and
backend.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    softmax_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Reference attention. q: (..., Nq, D), k/v: (..., Nk, D).

    bias: additive, broadcastable to (..., Nq, Nk).
    mask: boolean, True = attend, broadcastable to (..., Nq, Nk).
    softmax_dtype: fp32 by default; bf16 halves logit/prob HBM traffic when
    the caller's tolerance allows (jax softmax subtracts the max first, so
    bf16 is stable).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=softmax_dtype)
    logits = logits * jnp.asarray(scale, softmax_dtype)
    if bias is not None:
        logits = logits + bias.astype(softmax_dtype)
    if mask is not None:
        # -1e30 is representable in bf16 (same exponent range as fp32)
        logits = jnp.where(mask, logits, jnp.asarray(_NEG_INF, softmax_dtype))
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "...qk,...kd->...qd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, nk_valid: int):
    # scale folded onto the (bq, D) query block: (bq, Nk) would cost a
    # full-width VPU pass per program (2.4M muls at the SD UNet's 9216-token
    # blocks), (bq, D) costs 32K.  For bf16 inputs the fold re-rounds q to
    # bf16 (~0.4%/element vs exact f32 post-dot scaling) — inside the
    # parity tolerances the oracle tests assert (atol 2e-2 bf16).
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    k = k_ref[0]  # (Nk, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, Nk)
    if nk_valid < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < nk_valid, s, _NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _flash_relpos_kernel(
    q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, scale: float, kh: int, kw: int
):
    """Flash attention with SAM-style decomposed rel-pos bias:
    bias[q, (i,j)] = rel_h[q, i] + rel_w[q, j] for key grid (kh, kw)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bq = q.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, kh*kw)
    rh = rh_ref[0].astype(jnp.float32)  # (bq, kh)
    rw = rw_ref[0].astype(jnp.float32)  # (bq, kw)
    # bias[q, i*kw+j] = rh[q, i] + rw[q, j], expanded via two 0/1 matmuls
    # (Mosaic cannot reshape (bq, kh, kw) -> (bq, kh*kw); MXU does it faster
    # anyway: (bq,kh)@(kh,kh*kw) + (bq,kw)@(kw,kh*kw)).
    col = jax.lax.broadcasted_iota(jnp.int32, (kh, kh * kw), 1)
    row_h = jax.lax.broadcasted_iota(jnp.int32, (kh, kh * kw), 0)
    expand_h = (col // kw == row_h).astype(jnp.float32)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (kw, kh * kw), 1)
    row_w = jax.lax.broadcasted_iota(jnp.int32, (kw, kh * kw), 0)
    expand_w = (col_w % kw == row_w).astype(jnp.float32)
    s = s + jnp.dot(rh, expand_h, preferred_element_type=jnp.float32)
    s = s + jnp.dot(rw, expand_w, preferred_element_type=jnp.float32)
    del bq
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (multiple - size % multiple) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "kh", "kw", "interpret"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_h: Optional[jax.Array] = None,
    rel_w: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 256,
    kh: int = 0,
    kw: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Pallas flash attention.

    q: (B, Nq, D); k, v: (B, Nk, D) — fold batch*heads into B beforehand.
    rel_h: (B, Nq, kh), rel_w: (B, Nq, kw) optional decomposed rel-pos terms
    with Nk == kh*kw (SAM global/windowed attention).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, nq, d = q.shape
    nk = k.shape[1]
    # pad head dim to the 128-lane boundary (zero-padding leaves logits and
    # the value projection unchanged)
    q_p = _pad_to(q, 2, 128)
    k_p = _pad_to(k, 2, 128)
    v_p = _pad_to(v, 2, 128)
    dp = q_p.shape[-1]
    bq = min(block_q, max(8, nq))
    q_p = _pad_to(q_p, 1, bq)
    nq_p = q_p.shape[1]
    grid = (b, nq_p // bq)

    q_spec = pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    if rel_h is not None:
        assert rel_w is not None and kh * kw == nk, (kh, kw, nk)
        rh_p = _pad_to(rel_h, 1, bq)
        rw_p = _pad_to(rel_w, 1, bq)
        kernel = functools.partial(_flash_relpos_kernel, scale=scale, kh=kh, kw=kw)
        in_specs = [
            q_spec,
            pl.BlockSpec((1, nk, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, kh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, kw), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ]
        args = (q_p, k_p, v_p, rh_p, rw_p)
    else:
        # pad keys to a sublane multiple; kernel masks out padded columns
        k_p = _pad_to(k_p, 1, 128)
        v_p = _pad_to(v_p, 1, 128)
        nk_p = k_p.shape[1]
        kernel = functools.partial(_flash_kernel, scale=scale, nk_valid=nk)
        in_specs = [
            q_spec,
            pl.BlockSpec((1, nk_p, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        args = (q_p, k_p, v_p)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nq_p, dp), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        # whole-KV residency + the fp32 (bq, nk) logits block exceed the
        # 16 MB default scoped-vmem at the SD UNet's 9216-token blocks
        # (17.98 MB measured — full-config 768^2 compile, 2026-08-19)
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20)}),
    )(*args)
    return out[:, :nq, :d]


def _global_relpos_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                          scale: float, kh: int, kw: int):
    """SAM global attention for ONE (head, q-block): operands arrive in the
    natural (tokens, head-slot) layout (no transposes outside), rel bias is
    expanded on the MXU in bf16.  q/k/v refs: (bq|nk, 128) head slices."""
    q = q_ref[...]  # (bq, 128)
    k = k_ref[...]  # (nk, 128)
    v = v_ref[...]
    rh = rh_ref[0]  # (bq, kh)
    rw = rw_ref[0]  # (bq, kw)
    nk = kh * kw
    # fold the rel expansion INTO the QK contraction (one K=128+kh+kw matmul
    # instead of qk + two expand matmuls — same FLOPs, 3x fewer MXU issues):
    #   logits[t, u] = scale*q[t].k[u] + rh[t, u//kw] + rw[t, u%kw]
    #               = [scale*q[t], rh[t], rw[t]] . [k[u], 1_h(u), 1_w(u)]
    row_u = jax.lax.broadcasted_iota(jnp.int32, (nk, kh), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (nk, kh), 1)
    eh_t = (row_u // kw == col_i).astype(jnp.bfloat16)  # (nk, kh)
    row_u2 = jax.lax.broadcasted_iota(jnp.int32, (nk, kw), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (nk, kw), 1)
    ew_t = (row_u2 % kw == col_j).astype(jnp.bfloat16)  # (nk, kw)
    aug_q = jnp.concatenate(
        [(q.astype(jnp.float32) * scale).astype(jnp.bfloat16),
         rh.astype(jnp.bfloat16), rw.astype(jnp.bfloat16)], axis=1)
    aug_k = jnp.concatenate([k.astype(jnp.bfloat16), eh_t, ew_t], axis=1)
    s = jax.lax.dot_general(
        aug_q, aug_k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (bq, nk)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    l = jnp.sum(p, axis=-1, keepdims=True)  # (bq, 1)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    # deferred normalization: divide the (bq, 128) output, not the (bq, nk)
    # probability matrix — one full-width VPU pass saved per program
    o_ref[...] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kh", "kw", "heads",
                                             "block_q", "interpret"))
def sam_global_attention(
    q2: jax.Array,  # (N, heads*128) — head slices padded to 128 lanes
    k2: jax.Array,
    v2: jax.Array,
    rel_h: jax.Array,  # (heads, N, kh) decomposed rel-pos terms (q . table)
    rel_w: jax.Array,  # (heads, N, kw)
    *,
    scale: float,
    kh: int,
    kw: int,
    heads: int,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused global attention in the token-major layout.

    The fold-to-(B*H, N, D) layout of `flash_attention` forces XLA to
    materialize transposed copies at the Pallas boundary (~9ms/block on v5e
    through this model); here operands keep the (tokens, features) layout the
    surrounding denses produce, and the grid walks (head, q-block) with the
    head selected by a 128-aligned lane offset.  N == kh*kw."""
    n = q2.shape[0]
    assert n == kh * kw and q2.shape[1] == heads * 128
    nq_p = ((n + block_q - 1) // block_q) * block_q
    if nq_p != n:
        q2 = jnp.pad(q2, ((0, nq_p - n), (0, 0)))
        rel_h = jnp.pad(rel_h, ((0, 0), (0, nq_p - n), (0, 0)))
        rel_w = jnp.pad(rel_w, ((0, 0), (0, nq_p - n), (0, 0)))
    grid = (heads, nq_p // block_q)
    kernel = functools.partial(_global_relpos_kernel, scale=scale, kh=kh,
                               kw=kw)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nq_p, heads * 128), q2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, 128), lambda h, j: (j, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 128), lambda h, j: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 128), lambda h, j: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, kh), lambda h, j: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, kw), lambda h, j: (h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, 128), lambda h, j: (j, h),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q2, k2, v2, rel_h, rel_w)
    return out[:n]


def _global_aug_kernel(q_ref, k_ref, v_ref, o_ref):
    """SAM global attention, ONE (head, q-block) program — pure
    matmul/softmax/matmul.  The aug fold (rel-pos terms + 0/1 expansion
    columns) is prebuilt OUTSIDE by XLA fusions: v1 rebuilt the (nk, kh+kw)
    iota expansion and a 2MB aug_k concat in EVERY program (256 programs =
    ~0.5GB of VMEM copies per block; microbenched 2.5 ms/call vs the
    ~0.53 ms MXU bound — scripts/ablate_global_kernel.py 2026-08-19)."""
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (bq, nk)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[...],
                preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kh", "kw", "heads",
                                             "block_q", "interpret"))
def sam_global_attention2(
    q2: jax.Array,  # (N, heads*128) — head slices padded to 128 lanes
    k2: jax.Array,
    v2: jax.Array,
    rel_h: jax.Array,  # (N, heads, kh) decomposed rel-pos terms (q . table)
    rel_w: jax.Array,  # (N, heads, kw)
    *,
    scale: float,
    kh: int,
    kw: int,
    heads: int,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused SAM global attention, token-major, aug fold prebuilt.

    logits[t, u] = scale*q[t].k[u] + rel_h[t, u//kw] + rel_w[t, u%kw]
                 = aug_q[t] . aug_k[u]
    with aug_q = [scale*q | rel_h | rel_w] and aug_k = [k | 1_h | 1_w],
    interleaved per head along lanes so each program addresses one head by
    a lane offset.  N == kh*kw."""
    n, hw = q2.shape
    assert n == kh * kw and hw == heads * 128
    dt = q2.dtype
    aug = 128 + kh + kw
    # (N, heads, 128) views are lane-splits of adjacent minor dims: no copy
    q3 = (q2.astype(jnp.float32) * scale).astype(dt).reshape(n, heads, 128)
    k3 = k2.reshape(n, heads, 128)
    u = jnp.arange(n, dtype=jnp.int32)
    eh = (u[:, None] // kw == jnp.arange(kh)[None, :]).astype(dt)  # (n, kh)
    ew = (u[:, None] % kw == jnp.arange(kw)[None, :]).astype(dt)
    bcast = lambda e: jnp.broadcast_to(e[:, None, :], (n, heads, e.shape[1]))
    aug_q = jnp.concatenate(
        [q3, rel_h.astype(dt), rel_w.astype(dt)], axis=-1).reshape(
            n, heads * aug)
    aug_k = jnp.concatenate(
        [k3, bcast(eh), bcast(ew)], axis=-1).reshape(n, heads * aug)
    nq_p = ((n + block_q - 1) // block_q) * block_q
    if nq_p != n:
        aug_q = jnp.pad(aug_q, ((0, nq_p - n), (0, 0)))
    out = pl.pallas_call(
        _global_aug_kernel,
        out_shape=jax.ShapeDtypeStruct((nq_p, heads * 128), dt),
        grid=(heads, nq_p // block_q),
        in_specs=[
            pl.BlockSpec((block_q, aug), lambda h, j: (j, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, aug), lambda h, j: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 128), lambda h, j: (0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, 128), lambda h, j: (j, h),
                               memory_space=pltpu.VMEM),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(aug_q, aug_k, v2)
    return out[:n]


def _window_relpos_kernel(qkv_ref, rh_ref, rw_ref, o_ref, *, scale: float,
                          kh: int, kw: int, heads: int, head_dim: int):
    """SAM windowed attention, ONE program per window, all heads.

    qkv_ref: (n, 3*heads*head_dim) — the qkv dense output for this window's
    tokens, untouched (no pad / per-head split outside; head slices are
    taken in-kernel where they cost VMEM shuffles instead of HBM copies).
    rh_ref/rw_ref: (n, heads*kh|kw) decomposed rel-pos terms, head-blocked.
    """
    n = kh * kw
    col = jax.lax.broadcasted_iota(jnp.int32, (kh, n), 1)
    row_h = jax.lax.broadcasted_iota(jnp.int32, (kh, n), 0)
    expand_h = (col // kw == row_h).astype(jnp.bfloat16)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (kw, n), 1)
    row_w = jax.lax.broadcasted_iota(jnp.int32, (kw, n), 0)
    expand_w = (col_w % kw == row_w).astype(jnp.bfloat16)
    c = heads * head_dim
    qkv = qkv_ref[0]  # (n, 3*heads*head_dim)
    rh_all = rh_ref[0]
    rw_all = rw_ref[0]
    for h in range(heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, c + h * head_dim:c + (h + 1) * head_dim]
        v = qkv[:, 2 * c + h * head_dim:2 * c + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        rh = rh_all[:, h * kh:(h + 1) * kh].astype(jnp.bfloat16)
        rw = rw_all[:, h * kw:(h + 1) * kw].astype(jnp.bfloat16)
        s = s + jax.lax.dot_general(
            rh, expand_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(
            rw, expand_w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = \
            (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kh", "kw", "heads",
                                             "head_dim", "interpret"))
def sam_window_attention(
    qkv: jax.Array,    # (nw, n, 3*heads*head_dim) dense output per window
    rel_h: jax.Array,  # (nw, n, heads*kh) decomposed rel terms (q . table)
    rel_w: jax.Array,  # (nw, n, heads*kw)
    *,
    scale: float,
    kh: int,
    kw: int,
    heads: int,
    head_dim: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused windowed attention: one grid program per window computes all
    heads from the raw qkv dense output — no activation pad to 128 lanes, no
    q/k/v un-interleave, no head transposes outside the kernel.  Returns
    (nw, n, heads*head_dim)."""
    nw, n, w3 = qkv.shape
    assert n == kh * kw and w3 == 3 * heads * head_dim
    kernel = functools.partial(_window_relpos_kernel, scale=scale, kh=kh,
                               kw=kw, heads=heads, head_dim=head_dim)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nw, n, heads * head_dim), qkv.dtype),
        grid=(nw,),
        in_specs=[
            pl.BlockSpec((1, n, w3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, rel_h.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, rel_w.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, heads * head_dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv, rel_h, rel_w)


def _window_block_kernel(qkv_ref, rh_ref, rw_ref, b_ref, brh_ref, brw_ref,
                         o_ref, *, scale: float, win: int, gw: int,
                         heads: int, head_dim: int, valid_w: int,
                         kbands: int = 1):
    """Partition-free SAM windowed attention: one program per ROW BAND of
    `gw` windows, read straight out of the padded (Hp, Wp, 3C) qkv map via
    BlockSpec indexing — no window_partition/unpartition copies exist in the
    graph.  rh_ref/rw_ref carry the decomposed rel-pos terms (q . table) in
    the same padded spatial layout, head-blocked along lanes.

    valid_w > 0: the buffer is only valid_w columns wide (< gw*win) — the
    map is NOT column-padded, so the (64x64, win=14) SAM grid never
    materialises a padded qkv map in HBM (a 70x72x3840 pad/scatter costs
    ~2 ms/fwd however XLA expresses it, profiled 2026-08-19).  The last
    window's overhang columns are synthesised IN VMEM: their qkv is the
    dense bias b_ref (window_partition zero-pads x, then linear -> pad
    tokens carry exactly the bias; they matter as keys inside edge
    windows), and their rel terms are the bias folds brh_ref (by window
    row, constant across the overhang) / brw_ref (by window column).
    Row padding needs no fixup anywhere: zero x rows already produce
    bias qkv and bias-fold rel through the dense itself."""
    n = win * win
    c = heads * head_dim
    colx = jax.lax.broadcasted_iota(jnp.int32, (n, win), 0)
    rowx = jax.lax.broadcasted_iota(jnp.int32, (n, win), 1)
    expand_h_t = (colx // win == rowx).astype(jnp.bfloat16)  # (n, win)
    expand_w_t = (colx % win == rowx).astype(jnp.bfloat16)
    for bi in range(kbands):
        _window_band_body(
            qkv_ref[0, bi * win:(bi + 1) * win],
            rh_ref[0, bi * win:(bi + 1) * win],
            rw_ref[0, bi * win:(bi + 1) * win],
            b_ref, brh_ref, brw_ref, o_ref, bi * win,
            expand_h_t, expand_w_t, scale=scale, win=win, gw=gw,
            heads=heads, head_dim=head_dim, valid_w=valid_w)


def _window_band_body(band, rh_band, rw_band, b_ref, brh_ref, brw_ref,
                      o_ref, row0, expand_h_t, expand_w_t, *, scale: float,
                      win: int, gw: int, heads: int, head_dim: int,
                      valid_w: int):
    """One row band (`gw` windows) of the partition-free window attention;
    band/rh_band/rw_band: (win, Wc, .) VMEM slices, output rows start at
    row0 of o_ref[0]."""
    n = win * win
    c = heads * head_dim
    for j in range(gw):
        # window tokens (n, 3C): rows of the (win, win, 3C) slab stacked
        # along sublanes by concatenation (Mosaic-supported; a plain
        # (win, win, 3C) -> (n, 3C) reshape is not)
        j0 = j * win
        over = max(0, (j + 1) * win - valid_w) if valid_w > 0 else 0
        wv = win - over
        if over == 0:
            qkv = jnp.concatenate(
                [band[r, j0:j0 + win, :] for r in range(win)], axis=0)
            rh_all = jnp.concatenate(
                [rh_band[r, j0:j0 + win, :] for r in range(win)],
                axis=0)  # (n, heads*win)
            rw_all = jnp.concatenate(
                [rw_band[r, j0:j0 + win, :] for r in range(win)], axis=0)
        else:
            bias_tile = jnp.broadcast_to(b_ref[...], (over, 3 * c)
                                         ).astype(band.dtype)
            brw_tile = brw_ref[wv:win, :].astype(band.dtype)  # (over, hw)
            qkv = jnp.concatenate(
                [p for r in range(win)
                 for p in (band[r, j0:j0 + wv, :], bias_tile)], axis=0)
            rh_all = jnp.concatenate(
                [p for r in range(win)
                 for p in (rh_band[r, j0:j0 + wv, :],
                           jnp.broadcast_to(brh_ref[r:r + 1, :],
                                            (over, heads * win)
                                            ).astype(band.dtype))], axis=0)
            rw_all = jnp.concatenate(
                [p for r in range(win)
                 for p in (rw_band[r, j0:j0 + wv, :], brw_tile)], axis=0)
        outs = []
        for h in range(heads):
            q = qkv[:, h * head_dim:(h + 1) * head_dim]
            k = qkv[:, c + h * head_dim:c + (h + 1) * head_dim]
            v = qkv[:, 2 * c + h * head_dim:2 * c + (h + 1) * head_dim]
            rh = rh_all[:, h * win:(h + 1) * win].astype(jnp.bfloat16)
            rw = rw_all[:, h * win:(h + 1) * win].astype(jnp.bfloat16)
            # fold the rel expansion INTO the QK contraction: logits =
            # [q*scale, rh, rw] @ [k, 1_h, 1_w]^T — one K=hd+2*win matmul
            # replaces qk + two K=win expand matmuls (the small-matmul
            # sequencing is this kernel's wall, not FLOPs)
            aug_q = jnp.concatenate(
                [(q.astype(jnp.float32) * scale).astype(jnp.bfloat16),
                 rh, rw], axis=1)
            aug_k = jnp.concatenate([k, expand_h_t, expand_w_t], axis=1)
            s = jax.lax.dot_general(
                aug_q, aug_k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            # deferred normalization: divide the (n, hd) output, not (n, n)
            outs.append((o / l).astype(o_ref.dtype))
        o_win = jnp.concatenate(outs, axis=1)  # (n, C)
        for r in range(win):
            o_ref[0, row0 + r, j0:j0 + wv, :] = o_win[r * win:r * win + wv, :]


@functools.partial(jax.jit, static_argnames=("scale", "win", "heads",
                                             "head_dim", "gw", "interpret",
                                             "valid_w", "bands_per_program"))
def sam_window_block_attention(
    qkv_sp: jax.Array,  # (B, Hp, Wp, 3*heads*head_dim), Hp % win == 0
    tab_h: jax.Array,   # (win, win, head_dim) gathered rel_pos_h table
    tab_w: jax.Array,   # (win, win, head_dim)
    *,
    scale: float,
    win: int,
    heads: int,
    head_dim: int,
    gw: int = 0,
    interpret: bool = False,
    rel_h: Optional[jax.Array] = None,  # (B, Hp, Wp, heads*win) precomputed
    rel_w: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,   # (3C,) qkv bias for overhang fixup
    rel_bias_h: Optional[jax.Array] = None,  # (win, heads*win) bias folds
    rel_bias_w: Optional[jax.Array] = None,
    valid_w: int = 0,  # >0: buffer is valid_w cols wide, the last window's
    # overhang columns are synthesised in-kernel from bias/rel_bias_*
    bands_per_program: int = 1,  # k>=2: process k row bands (k*gw windows)
    # per grid step — issue-floor amortisation experiment (ablate_win_issue)
) -> jax.Array:
    """Windowed SAM attention over the spatial qkv map, windows addressed by
    BlockSpec indexing (no partition copies).  Pad tokens carry qkv = dense
    bias, reproducing the reference's window_partition + linear semantics
    (segment-anything image_encoder.py:166-182).  Returns (B, Hp, Wp, C).

    Two geometries:
      * valid_w == 0 (legacy/tests): the map is column-padded to >= gw*win
        and pad tokens already carry bias qkv (the caller zero-padded the
        LN output BEFORE the qkv dense).  Wp may exceed gw*win (sublane
        alignment); the extra columns are never read.  gw=0 derives
        gw = Wp // win.
      * valid_w > 0 (production): the map is NOT column-padded
        (Wp == valid_w < gw*win); the last window's overhang columns are
        synthesised in VMEM from `bias` and the `rel_bias_*` folds — the
        padded qkv map never exists in HBM (~2 ms/fwd however XLA
        materialises it, profiled 2026-08-19).  Row padding is still the
        caller's (cheap, 1280-wide, and zero x rows produce bias qkv
        through the dense automatically)."""
    b, hp, wp, c3 = qkv_sp.shape
    assert hp % win == 0
    c = heads * head_dim
    assert c3 == 3 * c
    if gw == 0:
        gw = wp // win
    if valid_w > 0:
        assert valid_w == wp and gw * win >= valid_w, (valid_w, wp, gw)
        assert rel_h is not None and rel_bias_h is not None
    else:
        assert gw * win <= wp
    if rel_h is None:
        # decomposed rel-pos terms from UNSCALED q in the padded spatial
        # layout (the per-window row/col index is I % win / J % win ->
        # tables tiled; tiles rounded up to cover alignment columns past the
        # last window — those rel values are garbage but no window reads
        # them).  The production encoder path precomputes these instead via
        # window_rel_terms_from_x (rel tables folded into the q projection).
        qg = qkv_sp[..., :c].reshape(b, hp, wp, heads, head_dim)
        th_exp = jnp.tile(tab_h, (hp // win, 1, 1)).astype(qkv_sp.dtype)
        tw_exp = jnp.tile(tab_w, (-(-wp // win), 1, 1))[:wp].astype(
            qkv_sp.dtype)
        rel_h = jnp.einsum("bIJhc,Ikc->bIJhk", qg, th_exp).reshape(
            b, hp, wp, heads * win)
        rel_w = jnp.einsum("bIJhc,Jkc->bIJhk", qg, tw_exp).reshape(
            b, hp, wp, heads * win)
    if bias is None:
        bias = jnp.zeros((c3,), qkv_sp.dtype)
    if rel_bias_h is None:
        rel_bias_h = jnp.zeros((win, heads * win), qkv_sp.dtype)
        rel_bias_w = jnp.zeros((win, heads * win), qkv_sp.dtype)
    kb = bands_per_program
    assert (hp // win) % kb == 0, (hp, win, kb)
    kernel = functools.partial(_window_block_kernel, scale=scale, win=win,
                               gw=gw, heads=heads, head_dim=head_dim,
                               valid_w=valid_w, kbands=kb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), qkv_sp.dtype),
        grid=(b, hp // (win * kb)),
        in_specs=[
            pl.BlockSpec((1, win * kb, wp, c3), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win * kb, wp, heads * win),
                         lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win * kb, wp, heads * win),
                         lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, heads * win), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, heads * win), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, win * kb, wp, c),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=(64 if kb == 1 else 110) * 2 ** 20)}),
    )(qkv_sp, rel_h, rel_w, bias.reshape(1, c3), rel_bias_h, rel_bias_w)


def window_rel_terms_from_x(
    x_sp: jax.Array,   # (B, Hp, Wp_buf, C) padded LN output, Hp % win == 0
    wq: jax.Array,     # (C, heads*head_dim) q-projection weight (fp32 params)
    bq: jax.Array,     # (heads*head_dim,) q-projection bias
    tab_h: jax.Array,  # (win, win, head_dim) gathered rel_pos_h table (fp32)
    tab_w: jax.Array,
    *,
    win: int,
    heads: int,
    head_dim: int,
) -> tuple:
    """Decomposed rel-pos q-terms computed straight from the LN output.

    rel_h[t, k] = q[t] . tab_h[r_t, k] with q = x @ Wq + bq and r_t the
    token's row inside its window.  Folding the table into the projection —
    W_rh[r] = Wq_head @ tab_h[r]^T, done in fp32 at negligible cost
    (~0.65 GFLOP/table) — turns the per-token rel einsum over the qkv dense
    OUTPUT (an N=14-lane batched matmul XLA tiles poorly, part of the
    ~5.6 ms/fwd glue in the round-2 profile) into win-batched fat matmuls
    over x with N = heads*win = 224 lanes.  Exact up to bf16 rounding:
    (x@Wq+bq)@tab == x@(Wq@tab) + bq@tab.

    r_t is constant along each spatial row (r = I % win) and c_t along each
    column (c = J % win), so grouping rows / columns by residue makes the
    folded weight a clean batch dimension.  Returns
    (rel_h, rel_w, b_rh, b_rw): the per-token terms, each
    (B, Hp, Wp_buf, heads*win), plus the (win, heads*win) bias folds
    bq @ tab — the rel values a pad token (zero x) carries; the window
    kernel uses them to synthesise overhang columns it never reads from
    HBM.
    """
    b, hp, wp, cin = x_sp.shape
    dt = x_sp.dtype
    wq3 = wq.reshape(cin, heads, head_dim)
    bq2 = bq.reshape(heads, head_dim)
    # fp32 folds (tiny); cast folded weights once for the wide matmuls
    w_rh = jnp.einsum("chd,rkd->rchk", wq3, tab_h).reshape(
        win, cin, heads * win).astype(dt)
    b_rh = jnp.einsum("hd,rkd->rhk", bq2, tab_h).reshape(
        win, heads * win).astype(dt)
    w_rw = jnp.einsum("chd,jkd->jchk", wq3, tab_w).reshape(
        win, cin, heads * win).astype(dt)
    b_rw = jnp.einsum("hd,jkd->jhk", bq2, tab_w).reshape(
        win, heads * win).astype(dt)
    xg = x_sp.reshape(b, hp // win, win, wp, cin)
    rel_h = jnp.einsum("bIrJc,rck->bIrJk", xg, w_rh) \
        + b_rh[None, None, :, None, :]
    rel_h = rel_h.reshape(b, hp, wp, heads * win)
    # rel_w groups columns by residue, which needs a win-multiple width.
    # Slicing the buffer to gw*win first makes the einsum input sublane-
    # misaligned (wp is 8-aligned, gw*win generally is not — measured
    # 0.07 ms/layer vs the 0.015 ms matmul bound); instead pad UP to the
    # next win multiple, compute, and slice the 8-aligned buffer width back.
    wq_cols = -(-wp // win) * win
    xw = x_sp if wq_cols == wp else jnp.pad(
        x_sp, ((0, 0), (0, 0), (0, wq_cols - wp), (0, 0)))
    xw = xw.reshape(b, hp, wq_cols // win, win, cin)
    rel_w = jnp.einsum("bIgjc,jck->bIgjk", xw, w_rw) \
        + b_rw[None, None, None, :, :]
    rel_w = rel_w.reshape(b, hp, wq_cols, heads * win)[:, :, :wp]
    return rel_h, rel_w, b_rh, b_rw


def _on_tpu() -> bool:
    # kernel-dispatch gate: False under runtime.disable_pallas() (training
    # paths — the Pallas kernels have no VJPs; XLA paths are differentiable)
    from inklayer_tpu.runtime import pallas_enabled

    return pallas_enabled()


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    min_flash_len: int = 1024,
) -> jax.Array:
    """Auto-dispatching attention for (B, H, N, D) inputs.

    Routes long unbiased/unmasked sequences to the Pallas flash kernel on TPU;
    everything else through the fused-XLA reference path.
    """
    nk = k.shape[-2]
    use_flash = (
        _on_tpu() and bias is None and mask is None and nk >= min_flash_len
        and q.ndim == 4
    )
    if not use_flash:
        return sdpa(q, k, v, bias=bias, mask=mask, scale=scale)
    b, h, nq, d = q.shape
    fold = lambda x: x.reshape(b * h, x.shape[-2], x.shape[-1])
    out = flash_attention(fold(q), fold(k), fold(v), scale=scale)
    return out.reshape(b, h, nq, d)
