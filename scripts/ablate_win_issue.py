"""SAM window-attention kernel issue-floor decomposition (VERDICT r02 weak #3).

The windowed blocks cost ~0.25 ms/block vs an estimated ~0.15 ms floor and a
~0.03 ms pure-FLOP roofline (400 attention units of (196,108)@(108,196) +
softmax + (196,196)@(196,80) per block).  Claim to test: the residual is a
per-small-matmul issue floor that cannot be amortised.  Experiments:

  full     production sam_window_block_attention (1 row band / program)
  kband5   SAME kernel, 5 row bands (25 windows) per grid step — amortises
           program prologue/epilogue across k windows (the untried lever
           named by the r02 verdict)
  dots     pure-matmul control at IDENTICAL shapes: the exact dot sequence
           (80 units x 2 dots per program, same VMEM layouts) with no
           softmax and no window assembly — the silicon floor for the
           matmul work
  dots+sm  control + fp32 softmax between the two dots — isolates softmax
           VPU cost; (full - dots+sm) ~= in-kernel window assembly cost

Timing: 20-deep jitted fori_loop, scalar readback, p50 of 8 (same protocol
as ablate_deform_tiled.py; ~1.5 ms RTT residual / 20 iters = 0.075 ms).

(Measured numbers appended below by the round-3 run; conclusion recorded
in BASELINE.md.)
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

from inklayer_tpu.ops.attention import sam_window_block_attention

WIN, HEADS, HD, GW = 14, 16, 80, 5
HP, W = 70, 64
N = WIN * WIN
C = HEADS * HD
C3 = 3 * C
AW = HD + 2 * WIN  # aug contraction width 108
LOOP, N_WARM, N_ITER = 20, 2, 8


def _dots_kernel(aq_ref, ak_ref, v_ref, o_ref, *, softmax: bool):
    for j in range(GW):
        for h in range(HEADS):
            aq = aq_ref[j, :, h * AW:(h + 1) * AW]
            ak = ak_ref[j, :, h * AW:(h + 1) * AW]
            s = jax.lax.dot_general(
                aq, ak, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (n, n)
            if softmax:
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                l = jnp.sum(p, axis=-1, keepdims=True)
            else:
                p, l = s, 1.0
            v = v_ref[j, :, h * HD:(h + 1) * HD]
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[j, :, h * HD:(h + 1) * HD] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("softmax",))
def dots_control(aq, ak, v, softmax=False):
    """Exact dot sequence of one windowed block: grid (5,), each program =
    one row band = 5 windows x 16 heads x (aug-QK, PV)."""
    nw = aq.shape[0]
    return pl.pallas_call(
        functools.partial(_dots_kernel, softmax=softmax),
        out_shape=jax.ShapeDtypeStruct((nw, N, C), v.dtype),
        grid=(nw // GW,),
        in_specs=[
            pl.BlockSpec((GW, N, HEADS * AW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GW, N, HEADS * AW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GW, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GW, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
    )(aq, ak, v)


def _dots_aligned_kernel(aq_ref, ak_ref, v_ref, o_ref):
    """Same dot sequence, head slices at 128-aligned lane offsets."""
    for j in range(GW):
        for h in range(HEADS):
            aq = aq_ref[j, :, h * 128:h * 128 + AW]
            ak = ak_ref[j, :, h * 128:h * 128 + AW]
            s = jax.lax.dot_general(
                aq, ak, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            v = v_ref[j, :, h * 128:h * 128 + HD]
            o = jnp.dot(s.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[j, :, h * 128:h * 128 + HD] = o.astype(o_ref.dtype)


@jax.jit
def dots_aligned(aq, ak, v):
    nw = aq.shape[0]
    return pl.pallas_call(
        _dots_aligned_kernel,
        out_shape=jax.ShapeDtypeStruct((nw, N, HEADS * 128), v.dtype),
        grid=(nw // GW,),
        in_specs=[
            pl.BlockSpec((GW, N, HEADS * 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GW, N, HEADS * 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GW, N, HEADS * 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GW, N, HEADS * 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(aq, ak, v)


def _dots_headmajor_kernel(aq_ref, ak_ref, v_ref, o_ref):
    """Same dot sequence, (window*head) as a leading dim — every slice
    starts at lane 0 (no lane rotates)."""
    for u in range(GW * HEADS):
        aq = aq_ref[u]  # (n, AW)
        ak = ak_ref[u]
        s = jax.lax.dot_general(
            aq, ak, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        v = v_ref[u]
        o = jnp.dot(s.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
        o_ref[u] = o.astype(o_ref.dtype)


@jax.jit
def dots_headmajor(aq, ak, v):
    nu = aq.shape[0]  # nw*heads
    blk = GW * HEADS
    return pl.pallas_call(
        _dots_headmajor_kernel,
        out_shape=jax.ShapeDtypeStruct((nu, N, HD), v.dtype),
        grid=(nu // blk,),
        in_specs=[
            pl.BlockSpec((blk, N, AW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, N, AW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, N, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, N, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
    )(aq, ak, v)


def bench(name, f, args):
    @jax.jit
    def many(*a):
        def body(i, s):
            # s*0 into the first operand: loop-carried dependence so the
            # (pure) pallas call cannot be hoisted out of the loop
            a0 = (a[0] + jnp.asarray(s * 0, a[0].dtype),) + a[1:]
            return s + jnp.sum(f(*a0).astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    float(many(*args))
    for _ in range(N_WARM):
        float(many(*args))
    ts = []
    for _ in range(N_ITER):
        t0 = time.perf_counter()
        float(many(*args))
        ts.append((time.perf_counter() - t0) * 1e3 / LOOP)
    print(f"{name:8s} p50 {np.percentile(ts, 50):6.3f} ms/block "
          f"(incl ~0.075 RTT residual)", flush=True)


def main():
    r = np.random.RandomState(0)
    qkv = jnp.asarray(r.randn(1, HP, W, C3) * 0.3, jnp.bfloat16)
    rel_h = jnp.asarray(r.randn(1, HP, W, HEADS * WIN) * 0.1, jnp.bfloat16)
    rel_w = jnp.asarray(r.randn(1, HP, W, HEADS * WIN) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(r.randn(C3) * 0.1, jnp.bfloat16)
    brh = jnp.asarray(r.randn(WIN, HEADS * WIN) * 0.1, jnp.bfloat16)
    brw = jnp.asarray(r.randn(WIN, HEADS * WIN) * 0.1, jnp.bfloat16)
    tab = jnp.zeros((WIN, WIN, HD), jnp.bfloat16)
    kw = dict(scale=HD ** -0.5, win=WIN, heads=HEADS, head_dim=HD, gw=GW,
              rel_h=rel_h, rel_w=rel_w, bias=bias, rel_bias_h=brh,
              rel_bias_w=brw, valid_w=W)
    bench("full", lambda q: sam_window_block_attention(q, tab, tab, **kw),
          (qkv,))
    bench("kband5",
          lambda q: sam_window_block_attention(q, tab, tab,
                                               bands_per_program=5, **kw),
          (qkv,))
    nw = GW * (HP // WIN)
    aq = jnp.asarray(r.randn(nw, N, HEADS * AW) * 0.3, jnp.bfloat16)
    ak = jnp.asarray(r.randn(nw, N, HEADS * AW) * 0.3, jnp.bfloat16)
    v = jnp.asarray(r.randn(nw, N, C) * 0.3, jnp.bfloat16)
    bench("dots", lambda a, b, c: dots_control(a, b, c, softmax=False),
          (aq, ak, v))
    bench("dots+sm", lambda a, b, c: dots_control(a, b, c, softmax=True),
          (aq, ak, v))
    aqA = jnp.asarray(r.randn(nw, N, HEADS * 128) * 0.3, jnp.bfloat16)
    akA = jnp.asarray(r.randn(nw, N, HEADS * 128) * 0.3, jnp.bfloat16)
    vA = jnp.asarray(r.randn(nw, N, HEADS * 128) * 0.3, jnp.bfloat16)
    bench("aligned", dots_aligned, (aqA, akA, vA))
    aqH = jnp.asarray(r.randn(nw * HEADS, N, AW) * 0.3, jnp.bfloat16)
    akH = jnp.asarray(r.randn(nw * HEADS, N, AW) * 0.3, jnp.bfloat16)
    vH = jnp.asarray(r.randn(nw * HEADS, N, HD) * 0.3, jnp.bfloat16)
    bench("headmaj", dots_headmajor, (aqH, akH, vH))


if __name__ == "__main__":
    main()
