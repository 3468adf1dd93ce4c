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
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ms_deform_attn(
    value: jax.Array,  # (B, sum_l H_l*W_l, n_heads, head_dim)
    spatial_shapes: Tuple[Tuple[int, int], ...],  # static ((H_l, W_l), ...)
    sampling_locations: jax.Array,  # (B, Lq, n_heads, n_levels, n_points, 2) in [0,1]
    attention_weights: jax.Array,  # (B, Lq, n_heads, n_levels, n_points)
    impl: str = "auto",
    query_raster: bool = False,
) -> jax.Array:
    """Returns (B, Lq, n_heads * head_dim).

    impl:
      'gather' — corner take_along_axis, exact fp32 (CPU / parity oracle);
      'dense'  — separable bilinear-weight matmuls in XLA (no gathers);
      'pallas' — fused kernel: per-level value tile stays in VMEM, both
                 separable contractions fused (no HBM intermediate; measured
                 58 -> 33 -> 20 ms/encoder-layer gather/dense/pallas on v5e);
      'tiled'  — 2D-query-tiled variant of 'pallas' with dynamic x-windows
                 on the big levels (requires ``query_raster``: queries are
                 the flattened level rasters, i.e. encoder self-attention);
                 ~2x on the level-0 share (see _ms_deform_attn_pallas_tiled);
      'auto'   — tiled/pallas on TPU for large query counts, gather
                 otherwise."""
    if impl == "auto":
        from inklayer_tpu.runtime import pallas_enabled

        on_tpu = pallas_enabled()
        if on_tpu and sampling_locations.shape[1] >= 512:
            impl = ("tiled" if query_raster
                    and _tiled_plan(spatial_shapes) is not None else "pallas")
        else:
            impl = "gather"
    if impl == "tiled":
        return _ms_deform_attn_pallas_tiled(value, spatial_shapes,
                                            sampling_locations,
                                            attention_weights)
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


def _pallas_fused_allheads_kernel(spatial_shapes, d: int, h_heads: int,
                                  n_levels: int, n_points: int, bq: int):
    """v4: ALL heads per program.  The coords arrive in the Dense-native
    flat (bq, heads*levels*points) lane layout — no host-side
    (B,Q,H,..)->(B*H,Q,..) transposes exist anywhere (each one costs
    ~1.2 ms at GDINO encoder shapes on v5e: 16-lane minor arrays tile
    terribly) — and the head loop is unrolled in-kernel with static lane
    offsets.  The per-level value tiles for ALL heads are VMEM-resident
    across the whole q sweep (fetched once per batch element), and the
    output block is the flat (bq, heads*d) layout the proj Dense consumes
    directly."""
    from jax.experimental.pallas import tpu as pltpu

    lp = n_levels * n_points

    def kern(y_ref, x_ref, w_ref, *refs):
        v_refs = refs[:n_levels]
        o_ref = refs[n_levels]
        outs = []
        for ih in range(h_heads):
            acc = jnp.zeros((bq, d), jnp.float32)
            for lvl, (hh, ww) in enumerate(spatial_shapes):
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (bq, hh), 1).astype(jnp.float32)
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (bq, ww), 1).astype(jnp.float32)
                col_g = jax.lax.broadcasted_iota(jnp.int32, (d * ww, d), 1)
                row_g = jax.lax.broadcasted_iota(jnp.int32, (d * ww, d), 0)
                reduce = (row_g // ww == col_g).astype(jnp.bfloat16)
                v = v_refs[lvl][ih]  # (hh, d*ww) bf16, w-minor
                k0 = ih * lp + lvl * n_points
                sys_, sxs = [], []
                for p in range(n_points):
                    yv = y_ref[:, k0 + p][:, None]
                    xv = x_ref[:, k0 + p][:, None]
                    wlp = w_ref[:, k0 + p][:, None]
                    sys_.append(jnp.maximum(0.0, 1.0 - jnp.abs(yv - rows))
                                .astype(jnp.bfloat16))
                    sxs.append(jnp.maximum(0.0, 1.0 - jnp.abs(xv - cols))
                               * wlp)
                sy = jnp.concatenate(sys_, axis=0)  # (n_points*bq, hh)
                sx = jnp.concatenate(sxs, axis=0)   # (n_points*bq, ww)
                t = jnp.dot(sy, v, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)  # (pbq, d*ww)
                sx_exp = pltpu.repeat(sx.astype(jnp.bfloat16), d, axis=1)
                r = jnp.dot(t * sx_exp, reduce,
                            preferred_element_type=jnp.float32)  # (pbq, d)
                for p in range(n_points):
                    acc = acc + r[p * bq:(p + 1) * bq]
            outs.append(acc)
        o_ref[...] = jnp.concatenate(outs, axis=1)  # (bq, heads*d)

    return kern


def _ms_deform_attn_pallas_fused_v4(value, spatial_shapes,
                                    sampling_locations, attention_weights,
                                    block_q: int = 256,
                                    interpret: bool = False):
    """All-heads-per-program fused kernel (v4): transpose-free host layouts.

    Returns (B, Q, heads*d) like the other impls."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = value.shape
    q = sampling_locations.shape[1]
    n_levels = sampling_locations.shape[3]
    n_points = sampling_locations.shape[4]
    lp = n_levels * n_points
    bq = block_q
    qp = ((q + bq - 1) // bq) * bq

    # coords in Dense-native flat lanes: lane = head*lp + level*points + p
    sizes_w = jnp.asarray([w_ for _, w_ in spatial_shapes], jnp.float32)
    sizes_h = jnp.asarray([h_ for h_, _ in spatial_shapes], jnp.float32)
    xy = sampling_locations.astype(jnp.float32)  # (B, Q, H, L, P, 2)
    x = (xy[..., 0] * sizes_w[None, None, None, :, None] - 0.5
         ).reshape(b, q, h * lp)
    y = (xy[..., 1] * sizes_h[None, None, None, :, None] - 0.5
         ).reshape(b, q, h * lp)
    wl = attention_weights.astype(jnp.float32).reshape(b, q, h * lp)
    pad = ((0, 0), (0, qp - q), (0, 0))
    x = jnp.pad(x, pad)
    y = jnp.pad(y, pad)
    wl = jnp.pad(wl, pad)

    # per-level value, all heads stacked: (B, heads, hh, d*ww) w-minor
    vs = []
    off = 0
    for hh, ww in spatial_shapes:
        v = value[:, off: off + hh * ww].astype(jnp.bfloat16)
        off += hh * ww
        vs.append(v.reshape(b, hh, ww, h, d).transpose(0, 3, 1, 4, 2)
                  .reshape(b, h, hh, d * ww))

    kern = _pallas_fused_allheads_kernel(spatial_shapes, d, h, n_levels,
                                         n_points, bq)
    params = {}
    if not interpret:
        try:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20)
        except Exception:  # pragma: no cover - older pallas API
            pass
    o = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, qp, h * d), jnp.float32),
        grid=(b, qp // bq),
        **params,
        in_specs=[
            pl.BlockSpec((None, bq, h * lp), lambda ib, j: (ib, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, h * lp), lambda ib, j: (ib, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, h * lp), lambda ib, j: (ib, j, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((None, h, hh, d * ww), lambda ib, j: (ib, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for hh, ww in spatial_shapes
        ],
        out_specs=pl.BlockSpec((None, bq, h * d), lambda ib, j: (ib, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, x, wl, *vs)
    return o[:, :q].astype(value.dtype)


def _ms_deform_attn_pallas_fused(value, spatial_shapes, sampling_locations,
                                 attention_weights, block_q: int = 256,
                                 interpret: bool = False,
                                 kernel_version: int = 3):
    """Single-pallas_call variant: all levels and points computed per
    program.  kernel_version 3 (default) = per-head grid (b*heads,
    q-blocks); 4 = all-heads-per-program with transpose-free host layouts.

    Measured null (do not retry): v4 LOSES at the production decoder shape
    (Q=900, (800,800) bucket levels) — wall p50 26.9 vs 23.7 ms, min 24.0
    vs 22.8, on v5e 2026-08-19.  With only 4 q-blocks the per-head grid
    gives v3 32 programs of core parallelism vs v4's 4; the host-transpose
    savings v4 was built for are proportional to Q and tiny at 900.  v4
    also compiles 2.3x slower (1212 vs 531 s remote).  v4 could still pay
    on a >=512-query raster path with many q-blocks, but that path is
    served by the tiled kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if kernel_version == 4:
        return _ms_deform_attn_pallas_fused_v4(
            value, spatial_shapes, sampling_locations, attention_weights,
            block_q=block_q, interpret=interpret)

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


# ---------------------------------------------------------------------------
# Tiled-window kernel (v5): 2D query tiles + dynamic x-windows on big levels
# ---------------------------------------------------------------------------
#
# The fused dense kernel computes the full interpolated row t = Sy @ V of
# width d*ww per query — ~50x wider than the 2-tap bilinear support.  For
# encoder queries (raster-ordered per level) the samples of a 2D query tile
# touch only a narrow x-range of the big levels, so t shrinks to a 48/32
# column dynamic window: queries are re-tiled (ty, tx) host-side with pure
# reshape/transposes, the window block index per (head, tile, level) is
# computed in XLA and fed through scalar prefetch, and samples whose taps
# fall outside their tile's window are EXCLUDED from the windowed kernel
# (weights zeroed) and computed exactly by the dense kernel under a
# lax.cond that only fires when such samples exist (offsets beyond ~7-23px
# of the tile bound; never at the reference's offset-init scale).
# All levels share ONE reduce matmul (vstacked selector): matmul ops carry
# a measured ~0.25us fixed cost each (scripts/_tmp_deform_probe.py).
#
# Predicted nulls (analysed, not implemented — the kernel is MXU-PASS-bound,
# see the phase-split / window-narrowing measured nulls above):
#   * y-windowing the tall level-0 value tile (100 -> ~80 rows): the rows
#     are the K dim of the Sy @ V contraction, and K=100 already fits in a
#     single 128-deep MXU pass — shrinking it to 80 removes zero passes.
#     The only real saving is HBM traffic on the value window (~0.4 ms of
#     an ~8 ms layer), bought with a second scalar-prefetch axis, row-block
#     concats in VMEM, and a new escape surface on y.  Not worth it.
#   * int8 value tiles: halves the same ~0.4 ms HBM term, changes no pass
#     count (M/N unchanged, K still single-pass), and risks bilinear parity.

_WBLK = 16    # window block granularity (columns)
_TILE_Q = 400  # queries per tile = ty*tx (50x8 at standard GDINO shapes)


def _nwb(ww):
    """Window size in 16-col blocks for a windowed level.

    Measured null (do not retry): narrowing the wide-level window to 2
    blocks (48 -> 32 cols) REGRESSES the layer 8.5 -> 16.4 ms on-chip
    (ablate_deform_tiled.py A/B, 2026-08-19) — the tighter margin trips
    the exact dense escape correction every call, which re-runs the full
    fused kernel under lax.cond on top of the tiled pass."""
    return 3 if ww > 64 else 2


def _win_levels(spatial_shapes):
    return [l for l, (hh, ww) in enumerate(spatial_shapes) if ww > 3 * _WBLK]


def _tiled_plan(spatial_shapes, d=32):
    """Static tiling plan. Returns (tiles, win_levels) or None.

    tiles[L] = (ty, tx) for query levels processed by the tiled kernel
    (None = tail -> dense kernel); win_levels = sampled levels whose value
    tensor is windowed."""
    if (d * _WBLK) % 128 != 0:  # window piece widths must be lane-aligned
        return None
    win_levels = _win_levels(spatial_shapes)
    if not win_levels:
        return None
    tiles = []
    for L, (hq, wq) in enumerate(spatial_shapes):
        ty = min(hq, 50)
        if ty < 25 or _TILE_Q % ty or hq * wq < 1000:
            tiles.append(None)
            continue
        tx = _TILE_Q // ty
        if tx > 8 or wq < tx:
            tiles.append(None)
            continue
        tiles.append((ty, tx))
    if not any(tiles):
        return None
    return tiles, win_levels


def _tile_fwd(arr, hq, wq, ty, tx):
    """(bh, hq*wq, k) -> (bh, ntiles*ty*tx, k) in tile raster order."""
    bh, _, k = arr.shape
    hp = -(-hq // ty) * ty
    wp = -(-wq // tx) * tx
    a = arr.reshape(bh, hq, wq, k)
    a = jnp.pad(a, ((0, 0), (0, hp - hq), (0, wp - wq), (0, 0)))
    a = a.reshape(bh, hp // ty, ty, wp // tx, tx, k)
    a = a.transpose(0, 1, 3, 2, 4, 5)
    return a.reshape(bh, (hp // ty) * (wp // tx) * ty * tx, k)


def _tile_inv(arr, hq, wq, ty, tx):
    """Inverse of _tile_fwd on (bh, ntiles*ty*tx, k)."""
    bh, _, k = arr.shape
    hp = -(-hq // ty) * ty
    wp = -(-wq // tx) * tx
    a = arr.reshape(bh, hp // ty, wp // tx, ty, tx, k)
    a = a.transpose(0, 1, 3, 2, 4, 5).reshape(bh, hp, wp, k)
    return a[:, :hq, :wq].reshape(bh, hq * wq, k)


def _wwpad(ww, d):
    """Pad ww so the w-minor width d*ww_pad is 128-aligned (lane concat)."""
    g = 128 // np.gcd(d, 128)
    return -(-ww // g) * g


def _pallas_tiled_kernel(spatial_shapes, d, n_points, bq, win_levels):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # static per-level geometry
    geo = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        if lvl in win_levels:
            geo.append((hh, ww, _nwb(ww) * _WBLK, True))
        else:
            geo.append((hh, ww, _wwpad(ww, d), False))

    def kern(s_ref, y_ref, x_ref, w_ref, *refs):
        i = pl.program_id(0)
        j = pl.program_id(1)
        o_ref, e_ref = refs[-2], refs[-1]
        prods = []
        reduces = []
        esc_cnt = jnp.zeros((bq, 1), jnp.float32)
        ri = 0
        for lvl, (hh, ww, wwk, windowed) in enumerate(geo):
            if windowed:
                nwb = wwk // _WBLK
                v = jnp.concatenate(
                    [refs[ri + t][0, 0] for t in range(nwb)], axis=1)
                ri += nwb
                a0 = (s_ref[i, j, win_levels.index(lvl)]
                      * _WBLK).astype(jnp.float32)
                # col j of the window: x-position = (j // (d*16))*16 + j%16
                cj = jax.lax.broadcasted_iota(jnp.int32, (bq, d * wwk), 1)
                coloff = ((cj // (d * _WBLK)) * _WBLK
                          + cj % _WBLK).astype(jnp.float32)
            else:
                v = refs[ri][0]
                ri += 1
                a0 = 0.0
                cj = jax.lax.broadcasted_iota(jnp.int32, (bq, d * wwk), 1)
                coloff = (cj % wwk).astype(jnp.float32)
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (bq, hh), 1).astype(jnp.float32)
            k0 = lvl * n_points
            sys_, sxs = [], []
            for p in range(n_points):
                yv = y_ref[0, :, k0 + p][:, None]
                xv = x_ref[0, :, k0 + p][:, None]
                xl = xv - a0
                wlp = w_ref[0, :, k0 + p][:, None]
                if windowed:
                    # escaped sample: an in-image x-tap outside the window.
                    # Zero it here (exact value comes from the dense-kernel
                    # correction the wrapper runs when e_ref reports any).
                    c0 = jnp.floor(xv)
                    esc = jnp.zeros((bq, 1), bool)
                    for dx in (0.0, 1.0):
                        c = c0 + dx
                        esc |= ((c >= 0) & (c <= ww - 1)
                                & ((c < a0) | (c >= a0 + wwk)))
                    esc &= (yv > -1.0) & (yv < hh) & (wlp > 0)
                    esc = esc.astype(jnp.float32)
                    esc_cnt = esc_cnt + esc
                    wlp = wlp * (1.0 - esc)
                sys_.append(jnp.maximum(0.0, 1.0 - jnp.abs(yv - rows))
                            .astype(jnp.bfloat16))
                # full-width iota build beats narrow-build + pltpu.repeat
                # by ~15% here (repeat lowers to strided copies)
                sxs.append((jnp.maximum(0.0, 1.0 - jnp.abs(xl - coloff))
                            * wlp).astype(jnp.bfloat16))
            sy = jnp.concatenate(sys_, axis=0)      # (P*bq, hh)
            sx_exp = jnp.concatenate(sxs, axis=0)   # (P*bq, d*wwk)
            t = jnp.dot(sy, v, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            prods.append(t * sx_exp)
            # selector rows for this level in the vstacked mega-reduce
            rg = jax.lax.broadcasted_iota(jnp.int32, (d * wwk, d), 0)
            cg = jax.lax.broadcasted_iota(jnp.int32, (d * wwk, d), 1)
            if windowed:
                reduces.append(((rg % (d * _WBLK)) // _WBLK == cg)
                               .astype(jnp.bfloat16))
            else:
                reduces.append((rg // wwk == cg).astype(jnp.bfloat16))
        prod = jnp.concatenate(prods, axis=1)    # (P*bq, sum_w)
        red = jnp.concatenate(reduces, axis=0)   # (sum_w, d)
        # fold the point dimension BEFORE the reduce matmul: 4x fewer
        # K-deep reduce passes for three cheap VPU adds
        psum = prod[0 * bq:1 * bq]
        for p in range(1, n_points):
            psum = psum + prod[p * bq:(p + 1) * bq]
        acc = jnp.dot(psum, red, preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(o_ref.dtype)
        e_ref[i, j] = jnp.sum(esc_cnt)

    return kern


def _ms_deform_attn_pallas_tiled(value, spatial_shapes, sampling_locations,
                                 attention_weights, interpret: bool = False):
    """Tiled-window kernel for raster-ordered queries (encoder self-attn).

    Exact: samples whose x-taps escape their tile's window are routed
    through the dense kernel under lax.cond (weights split in-window /
    escaped so nothing is double counted)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = value.shape
    plan = _tiled_plan(spatial_shapes, d)
    assert plan is not None
    tiles, win_levels = plan
    q = sampling_locations.shape[1]
    n_levels = sampling_locations.shape[3]
    n_points = sampling_locations.shape[4]
    bq = _TILE_Q
    bh = b * h
    lp = n_levels * n_points

    sizes_w = jnp.asarray([w_ for _, w_ in spatial_shapes], jnp.float32)
    sizes_h = jnp.asarray([h_ for h_, _ in spatial_shapes], jnp.float32)
    xy = sampling_locations.astype(jnp.float32)  # (B, Q, H, L, P, 2)
    x = xy[..., 0] * sizes_w[None, None, None, :, None] - 0.5
    y = xy[..., 1] * sizes_h[None, None, None, :, None] - 0.5
    x = x.transpose(0, 2, 1, 3, 4).reshape(bh, q, lp)
    y = y.transpose(0, 2, 1, 3, 4).reshape(bh, q, lp)
    wl = attention_weights.astype(jnp.float32).transpose(0, 2, 1, 3, 4) \
        .reshape(bh, q, lp)

    # --- split queries: tiled levels vs tail --------------------------------
    sizes_q = [hh * ww for hh, ww in spatial_shapes]
    offs = np.cumsum([0] + sizes_q)
    tiled_L = [L for L, t in enumerate(tiles) if t]
    npad_L = {L: (-(-spatial_shapes[L][0] // tiles[L][0]) * tiles[L][0]) *
              (-(-spatial_shapes[L][1] // tiles[L][1]) * tiles[L][1])
              for L in tiled_L}

    def fwd_all(a):
        parts = [_tile_fwd(a[:, offs[L]:offs[L + 1]], *spatial_shapes[L],
                           *tiles[L]) for L in tiled_L]
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    xt, yt, wt = fwd_all(x), fwd_all(y), fwd_all(wl)
    n_tiles = xt.shape[1] // bq

    # --- window block indices (tiled order) ---------------------------------
    # One full-width (lp-lane) pass: per-level slices are 4-lane arrays that
    # tile terribly on TPU; compute the per-(tile, level) min over all lp
    # columns at once.  Escape detection lives INSIDE the kernel (it has the
    # per-point scalars anyway) — the XLA-side mask is only rebuilt lazily
    # in the correction branch.
    x4 = xt.reshape(bh, n_tiles, bq, lp)
    w4 = wt.reshape(bh, n_tiles, bq, lp)
    xmin_c = jnp.min(jnp.where(w4 > 0, x4, jnp.inf), axis=2)  # (bh,nt,lp)
    s_list = []
    for wi, lvl in enumerate(win_levels):
        hh, ww = spatial_shapes[lvl]
        nwb = _nwb(ww)
        nxb = -(-ww // _WBLK)
        cols = slice(lvl * n_points, (lvl + 1) * n_points)
        xmin = jnp.min(xmin_c[..., cols], axis=-1)  # (bh, n_tiles)
        xmin = jnp.where(jnp.isfinite(xmin), xmin, 0.0)  # pad-only tiles
        a_blk = jnp.clip(jnp.floor(xmin / _WBLK), 0, max(nxb - nwb, 0)
                         ).astype(jnp.int32)
        s_list.append((a_blk, nwb, cols))
    s = jnp.stack([a for a, _, _ in s_list], axis=-1)  # (bh, nt, n_win)

    # --- value layouts ------------------------------------------------------
    v_ins, v_specs = [], []
    off = 0
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        v = value[:, off: off + hh * ww].astype(jnp.bfloat16)
        off += hh * ww
        v5 = v.reshape(b, hh, ww, h, d)
        if lvl in win_levels:
            wi = win_levels.index(lvl)
            nwb = _nwb(ww)
            nxb = -(-ww // _WBLK)
            vp = jnp.pad(v5, ((0, 0), (0, 0), (0, nxb * _WBLK - ww),
                              (0, 0), (0, 0)))
            # (b, hh, nxb, 16, h, d) -> (bh, nxb, hh, d*16), w-minor chunks
            vt = vp.reshape(b, hh, nxb, _WBLK, h, d) \
                .transpose(0, 4, 2, 1, 5, 3) \
                .reshape(bh, nxb, hh, d * _WBLK)
            for t in range(nwb):
                v_ins.append(vt)
                v_specs.append(pl.BlockSpec(
                    (1, 1, hh, d * _WBLK),
                    lambda i, j, sref, wi=wi, t=t: (i, sref[i, j, wi] + t,
                                                    0, 0),
                    memory_space=pltpu.VMEM))
        else:
            wwp = _wwpad(ww, d)
            vt = v5.transpose(0, 3, 1, 4, 2).reshape(bh, hh, d, ww)
            vt = jnp.pad(vt, ((0, 0), (0, 0), (0, 0), (0, wwp - ww))) \
                .reshape(bh, hh, d * wwp)
            v_ins.append(vt)
            v_specs.append(pl.BlockSpec(
                (1, hh, d * wwp), lambda i, j, sref: (i, 0, 0),
                memory_space=pltpu.VMEM))

    kern = _pallas_tiled_kernel(spatial_shapes, d, n_points, bq, win_levels)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_tiles),
        in_specs=[
            pl.BlockSpec((1, bq, lp), lambda i, j, sref: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lp), lambda i, j, sref: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lp), lambda i, j, sref: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ] + v_specs,
        out_specs=(pl.BlockSpec((1, bq, d), lambda i, j, sref: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bh, n_tiles), lambda i, j, sref: (0, 0),
                                memory_space=pltpu.SMEM)),
    )
    o, esc_cnt = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((bh, n_tiles * bq, d), jnp.bfloat16),
                   jax.ShapeDtypeStruct((bh, n_tiles), jnp.float32)),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(s, yt, xt, wt, *v_ins)

    # --- back to query order ------------------------------------------------
    out_parts = {}
    pos_L = {}
    pos = 0
    for L in tiled_L:
        hq, wq = spatial_shapes[L]
        ty, tx = tiles[L]
        npad = npad_L[L]
        out_parts[L] = _tile_inv(o[:, pos:pos + npad], hq, wq, ty, tx)
        pos_L[L] = pos
        pos += npad

    # --- tail queries through the dense kernel -----------------------------
    tail_L = [L for L in range(n_levels) if not tiles[L]]
    if tail_L:
        tail_loc = jnp.concatenate(
            [sampling_locations[:, offs[L]:offs[L + 1]] for L in tail_L],
            axis=1)
        tail_attn = jnp.concatenate(
            [attention_weights[:, offs[L]:offs[L + 1]] for L in tail_L],
            axis=1)
        tail_o = _ms_deform_attn_pallas_fused(
            value, spatial_shapes, tail_loc, tail_attn, interpret=interpret)
        tail_o = tail_o.reshape(b, -1, h, d).transpose(0, 2, 1, 3) \
            .reshape(bh, -1, d).astype(jnp.bfloat16)
        toff = 0
        for L in tail_L:
            nL = sizes_q[L]
            out_parts[L] = tail_o[:, toff:toff + nL]
            toff += nL
    out = jnp.concatenate([out_parts[L] for L in range(n_levels)], axis=1)

    # --- exact escape correction (rare) -------------------------------------
    def _corr(_):
        # rebuild the per-sample escape mask (tiled order) — mirrors the
        # in-kernel test — then scatter back to (B, Q, H, L, P) weights
        lo_b = jnp.full((bh, n_tiles, 1, lp), -jnp.inf, jnp.float32)
        hi_b = jnp.full((bh, n_tiles, 1, lp), jnp.inf, jnp.float32)
        for a_blk, nwb, cols in s_list:
            a0 = (a_blk * _WBLK).astype(jnp.float32)[:, :, None, None]
            lo_b = lo_b.at[..., cols].set(a0)
            hi_b = hi_b.at[..., cols].set(a0 + nwb * _WBLK)
        ww_c = jnp.asarray(np.repeat(
            [ww for _, ww in spatial_shapes], n_points).astype(np.float32))
        hh_c = jnp.asarray(np.repeat(
            [hh for hh, _ in spatial_shapes], n_points).astype(np.float32))
        y4 = yt.reshape(bh, n_tiles, bq, lp)
        tap0 = jnp.floor(x4)
        esc = jnp.zeros(x4.shape, bool)
        for dx in (0.0, 1.0):
            c = tap0 + dx
            esc |= (c >= 0) & (c <= ww_c - 1) & ((c < lo_b) | (c >= hi_b))
        esc &= (y4 > -1.0) & (y4 < hh_c) & (w4 > 0)
        esc_t = esc.astype(jnp.float32).reshape(bh, n_tiles * bq, lp)
        w_esc = jnp.concatenate(
            [_tile_inv(esc_t[:, pos_L[L]:pos_L[L] + npad_L[L]],
                       *spatial_shapes[L], *tiles[L]) if tiles[L]
             else jnp.zeros((bh, sizes_q[L], lp), jnp.float32)
             for L in range(n_levels)], axis=1)
        w_esc = w_esc.reshape(b, h, q, n_levels, n_points) \
            .transpose(0, 2, 1, 3, 4)
        co = _ms_deform_attn_pallas_fused(
            value, spatial_shapes, sampling_locations,
            attention_weights.astype(jnp.float32) * w_esc,
            interpret=interpret)
        return co.reshape(b, q, h, d).transpose(0, 2, 1, 3) \
            .reshape(bh, q, d).astype(jnp.bfloat16)

    out = out + jax.lax.cond(
        jnp.sum(esc_cnt) > 0, _corr,
        lambda _: jnp.zeros((bh, q, d), jnp.bfloat16), None)

    return out.reshape(b, h, q, d).transpose(0, 2, 1, 3) \
        .reshape(b, q, h * d).astype(value.dtype)
