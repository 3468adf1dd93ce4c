"""Cost split of the fused deformable kernel's pieces at level-0 GDINO
shapes: sy matmul / + elementwise / + reduce matmul.  Each variant runs the
same grid (bh=8, 52 q-blocks) chained REPS per dispatch."""

import functools
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HH = WW = 100
D, P, BQ, BH = 32, 4, 256, 8
QP = 13312  # padded query count


def make_kernel(mode):
    def kern(y_ref, x_ref, w_ref, v_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (BQ, HH), 1).astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, WW), 1).astype(jnp.float32)
        col_g = jax.lax.broadcasted_iota(jnp.int32, (D * WW, D), 1)
        row_g = jax.lax.broadcasted_iota(jnp.int32, (D * WW, D), 0)
        reduce = (row_g // WW == col_g).astype(jnp.bfloat16)
        v = v_ref[0]
        sys_, sxs = [], []
        for p in range(P):
            yv = y_ref[0, :, p][:, None]
            xv = x_ref[0, :, p][:, None]
            wlp = w_ref[0, :, p][:, None]
            sys_.append(jnp.maximum(0.0, 1.0 - jnp.abs(yv - rows))
                        .astype(jnp.bfloat16))
            sxs.append(jnp.maximum(0.0, 1.0 - jnp.abs(xv - cols)) * wlp)
        sy = jnp.concatenate(sys_, axis=0)
        sx = jnp.concatenate(sxs, axis=0)
        t = jnp.dot(sy, v, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
        if mode == "sy":
            # full-width lane reduction so Mosaic cannot narrow the matmul
            r = jnp.sum(t.astype(jnp.float32), axis=1)[:, None]
            o_ref[0] = r[:BQ] + jnp.zeros((BQ, D), jnp.float32)
            return
        sx_exp = pltpu.repeat(sx.astype(jnp.bfloat16), D, axis=1)
        ts = t * sx_exp
        if mode == "mult":
            r = jnp.sum(ts.astype(jnp.float32), axis=1)[:, None]
            o_ref[0] = r[:BQ] + jnp.zeros((BQ, D), jnp.float32)
            return
        r = jnp.dot(ts, reduce, preferred_element_type=jnp.float32)
        acc = jnp.zeros((BQ, D), jnp.float32)
        for p in range(P):
            acc = acc + r[p * BQ:(p + 1) * BQ]
        o_ref[0] = acc

    return kern


def bench(mode):
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.rand(BH, QP, P) * HH, jnp.float32)
    x = jnp.asarray(rng.rand(BH, QP, P) * WW, jnp.float32)
    w = jnp.asarray(rng.rand(BH, QP, P), jnp.float32)
    v = jnp.asarray(rng.randn(BH, HH, D * WW), jnp.bfloat16)
    call = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((BH, QP, D), jnp.float32),
        grid=(BH, QP // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, P), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, P), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, P), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HH, D * WW), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )

    REPS = 10

    @jax.jit
    def run(y, x, w, v):
        acc = jnp.float32(0)
        for _ in range(REPS):
            o = call(y, x, w, v)
            acc = acc + o[0, 0, 0]
            y = y + 0.0 * acc
        return acc

    float(run(y, x, w, v))
    for _ in range(2):
        float(run(y, x, w, v))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(run(y, x, w, v))
        ts.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(ts, 50))
    print(f"{mode:6s}: {(p50 - 35.0) / REPS * 1e3:7.0f} us/call "
          f"(raw p50 {p50:.1f} ms incl ~35ms RTT)", flush=True)


for m in ("sy", "mult", "full"):
    bench(m)
