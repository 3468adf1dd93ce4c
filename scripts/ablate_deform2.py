"""Deformable-attention kernel experiments on the chip.

v3 (current): per level — point-concat sy@v, repeat+multiply, reduce matmul.
v4: phase-split across levels — ALL first matmuls, then ALL elementwise
    products, then ALL reduce matmuls (independent chains let the scheduler
    overlap MXU and VPU work).
v5: v4 with the sx expansion moved back to the MXU (expand matmul) so the
    VPU only does the t*sx_exp product (balances pipes differently).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inklayer_tpu.ops.deformable import (
    _ms_deform_attn_pallas_fused, ms_deform_attn)

SPATIAL = ((100, 100), (50, 50), (25, 25), (13, 13))


def _kernel_v4(spatial_shapes, d, n_levels, n_points, bq, expand_mxu=False):
    def kern(y_ref, x_ref, w_ref, *refs):
        v_refs = refs[:n_levels]
        o_ref = refs[n_levels]
        # phase 1: selector construction + first matmuls for every level
        ts, sxs_l = [], []
        for lvl, (hh, ww) in enumerate(spatial_shapes):
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (bq, hh), 1).astype(jnp.float32)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (bq, ww), 1).astype(jnp.float32)
            v = v_refs[lvl][0]
            k0 = lvl * n_points
            sys_, sxs = [], []
            for p in range(n_points):
                yv = y_ref[0, :, k0 + p][:, None]
                xv = x_ref[0, :, k0 + p][:, None]
                wlp = w_ref[0, :, k0 + p][:, None]
                sys_.append(jnp.maximum(0.0, 1.0 - jnp.abs(yv - rows))
                            .astype(jnp.bfloat16))
                sxs.append(jnp.maximum(0.0, 1.0 - jnp.abs(xv - cols)) * wlp)
            sy = jnp.concatenate(sys_, axis=0)
            sx = jnp.concatenate(sxs, axis=0)
            ts.append(jnp.dot(sy, v, preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16))
            sxs_l.append(sx.astype(jnp.bfloat16))
        # phase 2: per-level expansion + product
        prods = []
        for lvl, (hh, ww) in enumerate(spatial_shapes):
            if expand_mxu:
                col_e = jax.lax.broadcasted_iota(jnp.int32, (ww, d * ww), 1)
                row_e = jax.lax.broadcasted_iota(jnp.int32, (ww, d * ww), 0)
                expand = (col_e % ww == row_e).astype(jnp.bfloat16)
                sx_exp = jnp.dot(sxs_l[lvl], expand,
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16)
            else:
                sx_exp = pltpu.repeat(sxs_l[lvl], d, axis=1)
            prods.append(ts[lvl] * sx_exp)
        # phase 3: reduce matmuls + accumulate
        acc = jnp.zeros((bq, d), jnp.float32)
        for lvl, (hh, ww) in enumerate(spatial_shapes):
            col_g = jax.lax.broadcasted_iota(jnp.int32, (d * ww, d), 1)
            row_g = jax.lax.broadcasted_iota(jnp.int32, (d * ww, d), 0)
            reduce = (row_g // ww == col_g).astype(jnp.bfloat16)
            r = jnp.dot(prods[lvl], reduce, preferred_element_type=jnp.float32)
            for p in range(n_points):
                acc = acc + r[p * bq:(p + 1) * bq]
        o_ref[0] = acc

    return kern


def pallas_fused_v4(value, spatial_shapes, sampling_locations,
                    attention_weights, block_q=256, expand_mxu=False):
    b, n, h, d = value.shape
    q = sampling_locations.shape[1]
    n_levels = sampling_locations.shape[3]
    n_points = sampling_locations.shape[4]
    bq = block_q
    qp = ((q + bq - 1) // bq) * bq
    bh = b * h

    sizes_w = jnp.asarray([w_ for _, w_ in spatial_shapes], jnp.float32)
    sizes_h = jnp.asarray([h_ for h_, _ in spatial_shapes], jnp.float32)
    xy = sampling_locations.astype(jnp.float32)
    x = xy[..., 0] * sizes_w[None, None, None, :, None] - 0.5
    y = xy[..., 1] * sizes_h[None, None, None, :, None] - 0.5
    x = x.transpose(0, 2, 1, 3, 4).reshape(bh, q, n_levels * n_points)
    y = y.transpose(0, 2, 1, 3, 4).reshape(bh, q, n_levels * n_points)
    wl = attention_weights.astype(jnp.float32).transpose(0, 2, 1, 3, 4) \
        .reshape(bh, q, n_levels * n_points)
    pad = ((0, 0), (0, qp - q), (0, 0))
    x, y, wl = jnp.pad(x, pad), jnp.pad(y, pad), jnp.pad(wl, pad)

    vs = []
    off = 0
    for hh, ww in spatial_shapes:
        v = value[:, off: off + hh * ww].astype(jnp.bfloat16)
        off += hh * ww
        vs.append(v.reshape(b, hh, ww, h, d).transpose(0, 3, 1, 4, 2)
                  .reshape(bh, hh, d * ww))

    kern = _kernel_v4(spatial_shapes, d, n_levels, n_points, bq,
                      expand_mxu=expand_mxu)
    lp = n_levels * n_points
    o = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bh, qp, d), jnp.float32),
        grid=(bh, qp // bq),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
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
    )(y, x, wl, *vs)
    out = o[:, :q].reshape(b, h, q, d).transpose(0, 2, 1, 3).reshape(
        b, q, h * d)
    return out.astype(value.dtype)


def main():
    b, h, d = 1, 8, 32
    n_points = 4
    n = sum(hh * ww for hh, ww in SPATIAL)
    q = n
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(b, n, h, d) * 0.3, jnp.bfloat16)
    locs = jnp.asarray(rng.rand(b, q, h, len(SPATIAL), n_points), jnp.float32)
    locs = jnp.stack([locs, jnp.asarray(
        rng.rand(b, q, h, len(SPATIAL), n_points), jnp.float32)], axis=-1)
    wts = jax.nn.softmax(jnp.asarray(
        rng.randn(b, q, h, len(SPATIAL), n_points), jnp.float32), axis=-1)

    variants = {
        "v3 (current)": jax.jit(lambda v, l, w: _ms_deform_attn_pallas_fused(
            v, SPATIAL, l, w, kernel_version=3)),
        "v4 phase-split": jax.jit(lambda v, l, w: pallas_fused_v4(
            v, SPATIAL, l, w)),
        "v5 phase+mxu-expand": jax.jit(lambda v, l, w: pallas_fused_v4(
            v, SPATIAL, l, w, expand_mxu=True)),
        "v4 bq512": jax.jit(lambda v, l, w: pallas_fused_v4(
            v, SPATIAL, l, w, block_q=512)),
    }
    ref = None
    for name, fn in variants.items():
        out = fn(value, locs, wts)
        got = np.asarray(out[0, :8, :8], np.float32)
        if ref is None:
            ref = got
        err = np.abs(got - ref).max()

        @jax.jit
        def loop(v, l, w, fn=fn):
            acc = jnp.float32(0)
            for _ in range(4):
                o = fn(v, l, w)
                acc = acc + jnp.sum(o.astype(jnp.float32))
                v = v + 0.0 * acc.astype(v.dtype)
            return acc

        float(loop(value, locs, wts))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(loop(value, locs, wts))
            ts.append((time.perf_counter() - t0) * 1e3)
        p50 = float(np.percentile(ts, 50)) / 4
        print(f"{name:22s}: {p50:7.2f} ms/layer   max_err={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
