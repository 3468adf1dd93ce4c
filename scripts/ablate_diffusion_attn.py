"""Decompose the SD UNet self-attention cost at 768² shapes (VERDICT r03 #3).

The diffusion trace shows flash_attention at ~38 ms/step (40% of device
time).  UNet self-attention shapes at 768²: (B*H=16, N=9216, D=40) at the
320-channel level and (16, 2304, 80) at 640 channels — head dims 40/80 pad
to the 128-lane boundary (3.2x/1.6x MXU waste) and the (bq, N) fp32
softmax rides the VPU.

Variants timed with the chained-calls-in-one-jit protocol (wall-clock of a
single call is RTT-dominated; see verify SKILL round-3 notes):
  flash      — production kernel as-is
  dots       — QK+AV matmuls only (no softmax): MXU floor incl. lane pad
  bf16sm     — softmax in bf16 (exp/sum on packed bf16)
  bq{N}      — block_q sweep
  xla        — plain sdpa (XLA fused attention)

Measured 2026-08-20 (v5e, chain=8, shapes (16,9216,40)):
  see printout; summary recorded in BASELINE.md "Diffusion stage".
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/inklayer_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bh", type=int, default=16)
    ap.add_argument("--n", type=int, default=9216)
    ap.add_argument("--d", type=int, default=40)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import importlib

    A = importlib.import_module("inklayer_tpu.ops.attention")

    bh, n, d = args.bh, args.n, args.d
    dt = jnp.bfloat16
    key = jax.random.key(0)
    q = jax.random.normal(key, (bh, n, d), dt)
    k = jax.random.normal(jax.random.key(1), (bh, n, d), dt)
    v = jax.random.normal(jax.random.key(2), (bh, n, d), dt)

    useful_flops = 4 * bh * n * n * d  # QK + AV, 2 MACs each
    padded_flops = 4 * bh * n * n * 128

    def chain(fn):
        @jax.jit
        def run(q, k, v):
            o = fn(q, k, v)
            for _ in range(args.chain - 1):
                # loop-carry: feed the output back as q (same shape)
                o = fn(o.astype(dt), k, v)
            return o.astype(jnp.float32).sum()
        return run

    def timeit(name, fn, flops=None):
        run = chain(fn)
        float(run(q, k, v))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(q, k, v))
            ts.append((time.perf_counter() - t0) / args.chain * 1e3)
        ms = float(np.median(ts))
        eff = f"  useful-MFU {useful_flops / (ms / 1e3) / 197e12 * 100:5.1f}%"
        print(f"{name:18s} {ms:7.2f} ms/call{eff}")
        return ms

    print(f"shapes: ({bh}, {n}, {d}), chain {args.chain}, "
          f"useful {useful_flops / 1e9:.1f} GFLOP/call, "
          f"lane-padded {padded_flops / 1e9:.1f}")

    timeit("flash (prod)", lambda q, k, v: A.flash_attention(q, k, v))
    for bq in (128, 512, 1024):
        timeit(f"flash bq={bq}",
               functools.partial(lambda q, k, v, bq: A.flash_attention(
                   q, k, v, block_q=bq), bq=bq))

    # dots-only control: same pallas structure, softmax removed
    def _dots_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
        qq = q_ref[0]
        kk = k_ref[0]
        vv = v_ref[0]
        s = jax.lax.dot_general(qq, kk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        o = jnp.dot(s.astype(vv.dtype), vv,
                    preferred_element_type=jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)

    def dots(q, k, v, block_q=256):
        scale = d ** -0.5
        qp = A._pad_to(q, 2, 128)
        kp = A._pad_to(k, 2, 128)
        vp = A._pad_to(v, 2, 128)
        dp = qp.shape[-1]
        grid = (bh, n // block_q)
        return pl.pallas_call(
            functools.partial(_dots_kernel, scale=scale),
            out_shape=jax.ShapeDtypeStruct((bh, n, dp), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2 ** 20),
        )(qp, kp, vp)[:, :, :d]

    timeit("dots only", dots)

    # bf16 softmax variant
    def _bf16_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
        qq = q_ref[0]
        kk = k_ref[0]
        vv = v_ref[0]
        s = jax.lax.dot_general(qq, kk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = (s - jnp.max(s, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        p = jnp.exp(s)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p.astype(vv.dtype), vv,
                    preferred_element_type=jnp.float32)
        o_ref[0] = (o / l).astype(o_ref.dtype)

    def bf16sm(q, k, v, block_q=256):
        scale = d ** -0.5
        qp = A._pad_to(q, 2, 128)
        kp = A._pad_to(k, 2, 128)
        vp = A._pad_to(v, 2, 128)
        dp = qp.shape[-1]
        grid = (bh, n // block_q)
        return pl.pallas_call(
            functools.partial(_bf16_kernel, scale=scale),
            out_shape=jax.ShapeDtypeStruct((bh, n, dp), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2 ** 20),
        )(qp, kp, vp)[:, :, :d]

    timeit("bf16 softmax", bf16sm)

    # XLA reference (fused attention, no pallas)
    def xla(q, k, v):
        return A.sdpa(q, k, v)

    # pre-transposed K: kernel receives kT (dp, nk) so the QK dot runs in
    # the MXU's natural orientation (no per-program (nk, dp) transpose)
    def _dots_kt_kernel(q_ref, kt_ref, v_ref, o_ref, *, scale):
        qq = q_ref[0]
        kt = kt_ref[0]  # (dp, nk)
        vv = v_ref[0]
        s = jax.lax.dot_general(qq, kt, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        o = jnp.dot(s.astype(vv.dtype), vv,
                    preferred_element_type=jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)

    def _flash_kt_kernel(q_ref, kt_ref, v_ref, o_ref, *, scale):
        qq = q_ref[0]
        kt = kt_ref[0]
        vv = v_ref[0]
        s = jax.lax.dot_general(qq, kt, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        pexp = jnp.exp(s)
        l = jnp.sum(pexp, axis=-1, keepdims=True)
        o = jnp.dot(pexp.astype(vv.dtype), vv,
                    preferred_element_type=jnp.float32)
        o_ref[0] = (o / l).astype(o_ref.dtype)

    def kt_call(kernel_fn, q, k, v, block_q=256):
        scale = d ** -0.5
        qp = A._pad_to(q, 2, 128)
        kp = A._pad_to(k, 2, 128)
        vp = A._pad_to(v, 2, 128)
        dp = qp.shape[-1]
        kt = kp.transpose(0, 2, 1)  # (bh, dp, nk) one-time HBM transpose
        grid = (bh, n // block_q)
        return pl.pallas_call(
            functools.partial(kernel_fn, scale=scale),
            out_shape=jax.ShapeDtypeStruct((bh, n, dp), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dp, n), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2 ** 20),
        )(qp, kt, vp)[:, :, :d]

    timeit("dots kT", functools.partial(kt_call, _dots_kt_kernel))
    timeit("flash kT", functools.partial(kt_call, _flash_kt_kernel))
    timeit("flash kT bq512",
           functools.partial(kt_call, _flash_kt_kernel, block_q=512))

    timeit("xla sdpa f32sm", xla)
    timeit("xla sdpa bf16sm",
           lambda q, k, v: A.sdpa(q, k, v, softmax_dtype=jnp.bfloat16))


if __name__ == "__main__":
    main()
