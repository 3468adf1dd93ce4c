"""Softmax dtype/exp variants inside the SAM global aug kernel.

The fused global kernel (ops/attention.py sam_global_attention2) is
profiled at ~1.28 ms/block vs an ~0.85 ms bound; ~0.6 ms/block is fp32
softmax VPU time on the (4096, 4096) logits (scripts/profile_sam.py
2026-08-19).  Variants:

  fp32      — production kernel (exp in fp32)
  bf16exp   — exp computed on bf16 (half the VPU element width)
  exp2      — exp2 instead of exp; log2(e) folded into aug_q OUTSIDE the
              kernel so in-kernel work is exp2(s - max) only (the softmax
              base cancels in the normalization)
  exp2bf16  — both

RESULT (v5e, 2026-08-19): near-null.  fp32 2.864 / bf16exp 2.730 / exp2
2.750 / exp2bf16 2.722 ms/call — the exp variants shave only ~5% of the
kernel (~0.13 ms/block, ~0.5 ms/fwd across the 4 global blocks), far from
the ~0.6 ms/block hoped; the softmax tail is not exp-issue-bound.  Numerics
fine (max|diff| 3e-5).  Not worth the production-kernel fork; keep fp32.
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

heads, hd, kh, kw = 16, 80, 64, 64
n = kh * kw
scale = hd ** -0.5
aug = 128 + kh + kw
block_q = 256

rng = np.random.RandomState(0)
aug_q = jnp.asarray(rng.randn(n, heads * aug) * 0.1, jnp.bfloat16)
aug_k = jnp.asarray(rng.randn(n, heads * aug) * 0.1, jnp.bfloat16)
v2 = jnp.asarray(rng.randn(n, heads * 128) * 0.1, jnp.bfloat16)


def make_kernel(variant):
    def kern(q_ref, k_ref, v_ref, o_ref):
        s = jax.lax.dot_general(
            q_ref[...], k_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        if variant == "fp32":
            p = jnp.exp(s)
        elif variant == "bf16exp":
            p = jnp.exp(s.astype(jnp.bfloat16))
        elif variant == "exp2":
            p = jnp.exp2(s)
        elif variant == "exp2bf16":
            p = jnp.exp2(s.astype(jnp.bfloat16))
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[...],
                    preferred_element_type=jnp.float32)
        o_ref[...] = (o / l).astype(o_ref.dtype)

    return kern


def call(variant, q2):
    return pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((n, heads * 128), jnp.bfloat16),
        grid=(heads, n // block_q),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20),
    )(q2, k_in, v2)


k_in = aug_k
REPS = 20


def bench(variant):
    # exp2 variants: logits must arrive pre-multiplied by log2(e); emulate
    # the outside fold by scaling aug_q (exact same kernel-side work)
    q_in = aug_q * np.float32(np.log2(np.e)) if "exp2" in variant else aug_q

    @jax.jit
    def run(q2):
        acc = jnp.float32(0)
        x = q2
        for _ in range(REPS):
            o = call(variant, x)
            acc = acc + jnp.sum(o.astype(jnp.float32))
            x = q2 + 0.0 * acc.astype(x.dtype)
        return acc

    float(run(q_in))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(run(q_in))
        ts.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(ts, 50))
    print(f"{variant:10s}: {p50 / REPS:7.3f} ms/call (chain p50 {p50:.1f} ms)",
          flush=True)


# numeric check vs fp32
ref = np.asarray(call("fp32", aug_q), np.float32)
for var in ("bf16exp", "exp2", "exp2bf16"):
    q_in = aug_q * np.float32(np.log2(np.e)) if "exp2" in var else aug_q
    out = np.asarray(call(var, q_in), np.float32)
    err = np.abs(out - ref).max()
    print(f"{var:10s} max|diff| vs fp32: {err:.5f}")

for var in ("fp32", "bf16exp", "exp2", "exp2bf16"):
    bench(var)
