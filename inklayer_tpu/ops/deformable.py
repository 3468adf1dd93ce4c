"""Multi-scale deformable attention sampling, TPU-native.

This replaces the reference's only native CUDA kernel
(GroundingDINO csrc/MsDeformAttn/ms_deform_im2col_cuda.cuh — bilinear
sampling of n_points per level per head from a level-flattened value tensor,
weighted sum), matching ``F.grid_sample(align_corners=False, padding_mode=
'zeros')`` semantics exactly: pixel coordinate = loc * size - 0.5,
out-of-range corners contribute zero.

Three implementations (see ``ms_deform_attn`` impl):
  * 'gather': 4 corner ``take_along_axis`` gathers per level — exact fp32,
    the CPU / parity path (TPU dynamic-gather is slow: 58 ms/encoder-layer);
  * 'dense': bilinear sampling as dense separable weight matmuls
    Sy @ V @ Sx^T with Sy[q, r] = max(0, 1 - |y_q - r|) — no gathers, pure
    MXU (33 ms/layer), but HBM-bound on the Sy@V intermediate;
  * 'pallas': the dense formulation fused in one kernel with the level's
    value tile resident in VMEM (20 ms/layer on v5e).
Spatial shapes are static (shape-bucketed images), so per-level loops unroll
at trace time.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn(
    value: jax.Array,  # (B, sum_l H_l*W_l, n_heads, head_dim)
    spatial_shapes: Tuple[Tuple[int, int], ...],  # static ((H_l, W_l), ...)
    sampling_locations: jax.Array,  # (B, Lq, n_heads, n_levels, n_points, 2) in [0,1]
    attention_weights: jax.Array,  # (B, Lq, n_heads, n_levels, n_points)
    impl: str = "auto",
) -> jax.Array:
    """Returns (B, Lq, n_heads * head_dim).

    impl:
      'gather' — corner take_along_axis, exact fp32 (CPU / parity oracle);
      'dense'  — separable bilinear-weight matmuls in XLA (no gathers);
      'pallas' — fused kernel: per-level value tile stays in VMEM, both
                 separable contractions fused (no HBM intermediate; measured
                 58 -> 33 -> 20 ms/encoder-layer gather/dense/pallas on v5e);
      'auto'   — pallas on TPU for large query counts, gather otherwise."""
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and sampling_locations.shape[1] >= 512:
            impl = "pallas"
        else:
            impl = "gather"
    if impl == "pallas":
        return _ms_deform_attn_pallas_fused(value, spatial_shapes,
                                            sampling_locations,
                                            attention_weights)
    if impl == "pallas_per_level":
        return _ms_deform_attn_pallas(value, spatial_shapes,
                                      sampling_locations, attention_weights)
    if impl == "dense":
        return _ms_deform_attn_dense(value, spatial_shapes,
                                     sampling_locations, attention_weights)
    return _ms_deform_attn_gather(value, spatial_shapes, sampling_locations,
                                  attention_weights)


def _pallas_level_kernel(hh: int, ww: int, d: int, n_points: int, bq: int):
    from jax.experimental import pallas as pl  # noqa: F811
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    def kern(y_ref, x_ref, w_ref, v_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, hh), 1).astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, ww), 1).astype(jnp.float32)
        # expansion/reduction selectors built from iota (Mosaic cannot
        # reshape (bq, ww, d) <-> (bq, ww*d); MXU does it faster anyway)
        col_e = jax.lax.broadcasted_iota(jnp.int32, (ww, ww * d), 1)
        row_e = jax.lax.broadcasted_iota(jnp.int32, (ww, ww * d), 0)
        expand = (col_e // d == row_e).astype(jnp.bfloat16)
        col_g = jax.lax.broadcasted_iota(jnp.int32, (ww * d, d), 1)
        row_g = jax.lax.broadcasted_iota(jnp.int32, (ww * d, d), 0)
        reduce = (row_g % d == col_g).astype(jnp.bfloat16)
        v = v_ref[0]  # (hh, ww*d) bf16
        acc = jnp.zeros((bq, d), jnp.float32)
        for p in range(n_points):
            yv = y_ref[0, :, p][:, None]
            xv = x_ref[0, :, p][:, None]
            wl = w_ref[0, :, p][:, None]
            # dense 2-tap bilinear rows: max(0, 1 - |coord - index|)
            sy = jnp.maximum(0.0, 1.0 - jnp.abs(yv - rows)).astype(jnp.bfloat16)
            sx = (jnp.maximum(0.0, 1.0 - jnp.abs(xv - cols)) * wl
                  ).astype(jnp.bfloat16)
            t = jnp.dot(sy, v, preferred_element_type=jnp.float32)
            sx_exp = jnp.dot(sx, expand, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot((t * sx_exp).astype(jnp.bfloat16), reduce,
                                preferred_element_type=jnp.float32)
        o_ref[0] = acc

    return kern


def _pallas_level_kernel_v2(hh: int, ww: int, d: int, n_points: int, bq: int):
    """w-minor value layout variant: v arrives as (hh, d*ww) with
    v2[h, k*ww + w] = v[h, w, k].  The Sx expansion then becomes a
    pltpu.repeat TILE (concatenation of d copies) instead of the
    (bq, ww) @ (ww, ww*d) expansion matmul — which cost more FLOPs than the
    actual bilinear contraction (147 vs 110 MF per point-program at level 0).
    pltpu.repeat is exact for non-128-multiple ww (verified on v5e)."""
    from jax.experimental import pallas as pl  # noqa: F811
    from jax.experimental.pallas import tpu as pltpu

    def kern(y_ref, x_ref, w_ref, v_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, hh), 1).astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, ww), 1).astype(jnp.float32)
        col_g = jax.lax.broadcasted_iota(jnp.int32, (d * ww, d), 1)
        row_g = jax.lax.broadcasted_iota(jnp.int32, (d * ww, d), 0)
        reduce = (row_g // ww == col_g).astype(jnp.bfloat16)
        v = v_ref[0]  # (hh, d*ww) bf16, w-minor
        acc = jnp.zeros((bq, d), jnp.float32)
        for p in range(n_points):
            yv = y_ref[0, :, p][:, None]
            xv = x_ref[0, :, p][:, None]
            wl = w_ref[0, :, p][:, None]
            sy = jnp.maximum(0.0, 1.0 - jnp.abs(yv - rows)).astype(jnp.bfloat16)
            sx = jnp.maximum(0.0, 1.0 - jnp.abs(xv - cols)) * wl
            # bf16 everywhere in the elementwise section: the (bq, d*ww)
            # t*sx product is the kernel's VPU wall (the product was rounded
            # to bf16 before the reduce matmul anyway)
            t = jnp.dot(sy, v,
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            sx_exp = pltpu.repeat(sx.astype(jnp.bfloat16), d, axis=1)
            acc = acc + jnp.dot(t * sx_exp, reduce,
                                preferred_element_type=jnp.float32)
        o_ref[0] = acc

    return kern


def _pallas_fused_levels_kernel(spatial_shapes, d: int, n_levels: int,
                                n_points: int, bq: int):
    """ALL levels in one program: the per-level value tiles live in VMEM
    together (~1.1MB per head for GDINO shapes) and the output accumulates
    in-register across levels — removes the 4x pallas_call launch grid and
    the (bh, q, d) HBM accumulate between levels (measured: the 4-call
    version spent most of its time outside the matmuls)."""
    from jax.experimental.pallas import tpu as pltpu

    def kern(y_ref, x_ref, w_ref, *refs):
        v_refs = refs[:n_levels]
        o_ref = refs[n_levels]
        acc = jnp.zeros((bq, d), jnp.float32)
        for lvl, (hh, ww) in enumerate(spatial_shapes):
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (bq, hh), 1).astype(jnp.float32)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (bq, ww), 1).astype(jnp.float32)
            col_g = jax.lax.broadcasted_iota(jnp.int32, (d * ww, d), 1)
            row_g = jax.lax.broadcasted_iota(jnp.int32, (d * ww, d), 0)
            reduce = (row_g // ww == col_g).astype(jnp.bfloat16)
            v = v_refs[lvl][0]  # (hh, d*ww) bf16, w-minor
            for p in range(n_points):
                k = lvl * n_points + p
                yv = y_ref[0, :, k][:, None]
                xv = x_ref[0, :, k][:, None]
                wl = w_ref[0, :, k][:, None]
                sy = jnp.maximum(0.0, 1.0 - jnp.abs(yv - rows)
                                 ).astype(jnp.bfloat16)
                sx = jnp.maximum(0.0, 1.0 - jnp.abs(xv - cols)) * wl
                t = jnp.dot(sy, v, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
                sx_exp = pltpu.repeat(sx.astype(jnp.bfloat16), d, axis=1)
                acc = acc + jnp.dot(t * sx_exp, reduce,
                                    preferred_element_type=jnp.float32)
        o_ref[0] = acc

    return kern


def _pallas_fused_levels_kernel_v3(spatial_shapes, d: int, n_levels: int,
                                   n_points: int, bq: int):
    """Point-concat variant of the fused all-levels kernel: the n_points
    per-point matmuls of each level collapse into TWO matmuls with
    n_points*bq rows (points stacked along sublanes).  Same FLOPs, but
    4x fewer / 4x taller MXU ops — the per-point version issues 32 small
    matmuls per program and spends most of its time sequencing them
    (measured 8.25 ms/encoder-layer at ~40% MXU)."""
    from jax.experimental.pallas import tpu as pltpu

    def kern(y_ref, x_ref, w_ref, *refs):
        v_refs = refs[:n_levels]
        o_ref = refs[n_levels]
        acc = jnp.zeros((bq, d), jnp.float32)
        for lvl, (hh, ww) in enumerate(spatial_shapes):
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (bq, hh), 1).astype(jnp.float32)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (bq, ww), 1).astype(jnp.float32)
            col_g = jax.lax.broadcasted_iota(jnp.int32, (d * ww, d), 1)
            row_g = jax.lax.broadcasted_iota(jnp.int32, (d * ww, d), 0)
            reduce = (row_g // ww == col_g).astype(jnp.bfloat16)
            v = v_refs[lvl][0]  # (hh, d*ww) bf16, w-minor
            k0 = lvl * n_points
            # per-point selector rows, stacked along sublanes AFTER the
            # full-width elementwise ops (Mosaic cannot concat lane-offset
            # (bq, 1) slices along dim 0)
            sys_, sxs = [], []
            for p in range(n_points):
                yv = y_ref[0, :, k0 + p][:, None]
                xv = x_ref[0, :, k0 + p][:, None]
                wlp = w_ref[0, :, k0 + p][:, None]
                sys_.append(jnp.maximum(0.0, 1.0 - jnp.abs(yv - rows))
                            .astype(jnp.bfloat16))
                sxs.append(jnp.maximum(0.0, 1.0 - jnp.abs(xv - cols)) * wlp)
            sy = jnp.concatenate(sys_, axis=0)  # (n_points*bq, hh)
            sx = jnp.concatenate(sxs, axis=0)   # (n_points*bq, ww)
            t = jnp.dot(sy, v, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)  # (pbq, d*ww)
            sx_exp = pltpu.repeat(sx.astype(jnp.bfloat16), d, axis=1)
            r = jnp.dot(t * sx_exp, reduce,
                        preferred_element_type=jnp.float32)  # (pbq, d)
            for p in range(n_points):
                acc = acc + r[p * bq:(p + 1) * bq]
        o_ref[0] = acc

    return kern


def _ms_deform_attn_pallas_fused(value, spatial_shapes, sampling_locations,
                                 attention_weights, block_q: int = 256,
                                 interpret: bool = False,
                                 kernel_version: int = 3):
    """Single-pallas_call variant: grid (b*heads, q-blocks), all levels and
    points computed per program."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = value.shape
    q = sampling_locations.shape[1]
    n_levels = sampling_locations.shape[3]
    n_points = sampling_locations.shape[4]
    bq = block_q
    qp = ((q + bq - 1) // bq) * bq
    bh = b * h

    # per-query coords scaled to each level's pixel space, flattened (L*P)
    sizes_w = jnp.asarray([w_ for _, w_ in spatial_shapes], jnp.float32)
    sizes_h = jnp.asarray([h_ for h_, _ in spatial_shapes], jnp.float32)
    xy = sampling_locations.astype(jnp.float32)  # (B, Q, H, L, P, 2)
    x = xy[..., 0] * sizes_w[None, None, None, :, None] - 0.5
    y = xy[..., 1] * sizes_h[None, None, None, :, None] - 0.5
    x = x.transpose(0, 2, 1, 3, 4).reshape(bh, q, n_levels * n_points)
    y = y.transpose(0, 2, 1, 3, 4).reshape(bh, q, n_levels * n_points)
    wl = attention_weights.astype(jnp.float32).transpose(0, 2, 1, 3, 4) \
        .reshape(bh, q, n_levels * n_points)
    pad = ((0, 0), (0, qp - q), (0, 0))
    x = jnp.pad(x, pad)
    y = jnp.pad(y, pad)
    wl = jnp.pad(wl, pad)

    vs = []
    off = 0
    for hh, ww in spatial_shapes:
        v = value[:, off: off + hh * ww].astype(jnp.bfloat16)
        off += hh * ww
        vs.append(v.reshape(b, hh, ww, h, d).transpose(0, 3, 1, 4, 2)
                  .reshape(bh, hh, d * ww))

    kern = (_pallas_fused_levels_kernel_v3 if kernel_version == 3
            else _pallas_fused_levels_kernel)(spatial_shapes, d, n_levels,
                                              n_points, bq)
    lp = n_levels * n_points
    # v3 holds (n_points*bq, d*ww) intermediates for the largest level in
    # VMEM (~13MB at bq=256 for GDINO shapes) — raise the scoped limit
    params = {}
    if kernel_version == 3 and not interpret:
        try:
            from jax.experimental.pallas import tpu as pltpu_mod
            params["compiler_params"] = pltpu_mod.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20)
        except Exception:  # pragma: no cover - older pallas API
            pass
    o = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bh, qp, d), jnp.float32),
        grid=(bh, qp // bq),
        **params,
        in_specs=[
            pl.BlockSpec((1, bq, lp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, hh, d * ww), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for hh, ww in spatial_shapes
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, x, wl, *vs)
    out = o[:, :q].reshape(b, h, q, d).transpose(0, 2, 1, 3).reshape(
        b, q, h * d)
    return out.astype(value.dtype)


def _ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                           attention_weights, block_q: int = 128,
                           interpret: bool = False, kernel_version: int = 2):
    """Fused Pallas kernel (TPU): per-(head, query-block) program holds the
    level's value tile in VMEM and computes Sy@V, the Sx expansion, and the
    d-reduction without touching HBM.  bfloat16 weight/matmul precision
    (same class as the reference's fp16 CUDA grid_sample)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = value.shape
    q = sampling_locations.shape[1]
    n_points = sampling_locations.shape[4]
    bq = block_q
    qp = ((q + bq - 1) // bq) * bq
    bh = b * h
    out = jnp.zeros((bh, q, d), jnp.float32)
    off = 0
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        v = value[:, off: off + hh * ww].astype(jnp.bfloat16)
        off += hh * ww
        if kernel_version == 2:
            # w-minor layout for the v2 kernel: v2[bh, h, k*ww + w]
            v = v.reshape(b, hh, ww, h, d).transpose(0, 3, 1, 4, 2) \
                .reshape(bh, hh, d * ww)
        else:
            v = v.transpose(0, 2, 1, 3).reshape(bh, hh, ww * d)
        xy = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # (B,Q,H,P,2)
        x = (xy[..., 0] * ww - 0.5).transpose(0, 2, 1, 3).reshape(bh, q, n_points)
        y = (xy[..., 1] * hh - 0.5).transpose(0, 2, 1, 3).reshape(bh, q, n_points)
        wl = attention_weights[:, :, :, lvl].astype(jnp.float32)
        wl = wl.transpose(0, 2, 1, 3).reshape(bh, q, n_points)
        pad = ((0, 0), (0, qp - q), (0, 0))
        x = jnp.pad(x, pad)
        y = jnp.pad(y, pad)
        wl = jnp.pad(wl, pad)
        kern = (_pallas_level_kernel_v2 if kernel_version == 2
                else _pallas_level_kernel)(hh, ww, d, n_points, bq)
        o = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((bh, qp, d), jnp.float32),
            grid=(bh, qp // bq),
            in_specs=[
                pl.BlockSpec((1, bq, n_points), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, n_points), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, n_points), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hh, d * ww), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(y, x, wl, v)
        out = out + o[:, :q]
    out = out.reshape(b, h, q, d).transpose(0, 2, 1, 3).reshape(b, q, h * d)
    return out.astype(value.dtype)


def _ms_deform_attn_dense(value, spatial_shapes, sampling_locations,
                          attention_weights):
    """TPU MXU formulation: the 2-tap bilinear kernel in each axis is the
    dense weight row Sy[q, r] = max(0, 1 - |y_q - r|) (zero-padding
    semantics fall out: out-of-range samples put <=1 tap in range).
    sample = Sy @ V @ Sx^T, attention weights folded into Sx.

    Replaces the irregular gather (slow on TPU) with batched matmuls.
    """
    b, n, h, d = value.shape
    q = sampling_locations.shape[1]
    n_points = sampling_locations.shape[4]
    compute_dtype = value.dtype
    out = jnp.zeros((b, h, q, d), jnp.float32)
    off = 0
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        v = value[:, off: off + hh * ww]
        off += hh * ww
        v = v.transpose(0, 2, 1, 3).reshape(b, h, hh, ww * d)
        xy = sampling_locations[:, :, :, lvl].astype(jnp.float32)
        x = xy[..., 0] * ww - 0.5
        y = xy[..., 1] * hh - 0.5
        wl = attention_weights[:, :, :, lvl].astype(jnp.float32)
        rows = jnp.arange(hh, dtype=jnp.float32)
        cols = jnp.arange(ww, dtype=jnp.float32)
        sy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - rows))
        sx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - cols))
        sx = sx * wl[..., None]
        syt = sy.transpose(0, 2, 3, 1, 4).astype(compute_dtype)  # (B,H,P,Q,hh)
        sxt = sx.transpose(0, 2, 3, 1, 4)  # (B,H,P,Q,ww)
        t = jnp.einsum("bhpqr,bhrk->bhpqk", syt, v,
                       preferred_element_type=jnp.float32)
        t = t.reshape(b, h, n_points, q, ww, d)
        out = out + jnp.einsum("bhpqw,bhpqwd->bhqd", sxt, t)
    return out.transpose(0, 2, 1, 3).reshape(b, q, h * d).astype(compute_dtype)


def _ms_deform_attn_gather(value, spatial_shapes, sampling_locations,
                           attention_weights):
    """Exact fp32 corner-gather formulation (XLA dynamic-gather)."""
    b, _, n_heads, head_dim = value.shape
    lq = sampling_locations.shape[1]
    n_points = sampling_locations.shape[4]
    compute_dtype = value.dtype

    out = jnp.zeros((b, n_heads, lq, head_dim), jnp.float32)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, offset: offset + h * w]  # (B, hw, H, D)
        offset += h * w
        v = v.transpose(0, 2, 1, 3)  # (B, H, hw, D)
        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # (B,Lq,H,P,2)
        wts = attention_weights[:, :, :, lvl].astype(jnp.float32)  # (B,Lq,H,P)
        # grid_sample(align_corners=False): pixel coord = loc*size - 0.5
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        acc = jnp.zeros((b, n_heads, lq * n_points, head_dim), jnp.float32)
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            xi = x0i + dx
            yi = y0i + dy
            wx = jnp.where(dx == 1, fx, 1.0 - fx)
            wy = jnp.where(dy == 1, fy, 1.0 - fy)
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            cw = (wx * wy * valid).astype(jnp.float32)  # (B,Lq,H,P)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            # (B,Lq,H,P) -> (B,H,Lq*P)
            idx = idx.transpose(0, 2, 1, 3).reshape(b, n_heads, lq * n_points)
            g = jnp.take_along_axis(
                v, idx[..., None], axis=2)  # (B,H,Lq*P,D)
            cwt = cw.transpose(0, 2, 1, 3).reshape(b, n_heads, lq * n_points, 1)
            acc = acc + g.astype(jnp.float32) * cwt
        wts_t = wts.transpose(0, 2, 1, 3).reshape(b, n_heads, lq * n_points, 1)
        acc = acc * wts_t
        out = out + acc.reshape(b, n_heads, lq, n_points, head_dim).sum(axis=3)

    out = out.transpose(0, 2, 1, 3).reshape(b, lq, n_heads * head_dim)
    return out.astype(compute_dtype)


def ms_deform_attn_ref(value, spatial_shapes, sampling_locations, attention_weights):
    """Pure-numpy oracle (same math, scalar loops). Test use only."""
    import numpy as np

    value = np.asarray(value, np.float64)
    locs = np.asarray(sampling_locations, np.float64)
    wts = np.asarray(attention_weights, np.float64)
    b, _, n_heads, d = value.shape
    lq, n_levels, n_points = locs.shape[1], locs.shape[3], locs.shape[4]
    out = np.zeros((b, lq, n_heads, d))
    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])
    for bi in range(b):
        for q in range(lq):
            for hd in range(n_heads):
                for lvl, (h, w) in enumerate(spatial_shapes):
                    vl = value[bi, starts[lvl]: starts[lvl + 1], hd].reshape(h, w, d)
                    for p in range(n_points):
                        x = locs[bi, q, hd, lvl, p, 0] * w - 0.5
                        y = locs[bi, q, hd, lvl, p, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        fx, fy = x - x0, y - y0
                        s = 0.0
                        for dy, wy in ((0, 1 - fy), (1, fy)):
                            for dx, wx in ((0, 1 - fx), (1, fx)):
                                xi, yi = x0 + dx, y0 + dy
                                if 0 <= xi < w and 0 <= yi < h:
                                    s = s + wy * wx * vl[yi, xi]
                        out[bi, q, hd] += s * wts[bi, q, hd, lvl, p]
    return out.reshape(b, lq, n_heads * d)
