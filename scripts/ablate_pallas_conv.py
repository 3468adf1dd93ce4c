"""Prototype: Pallas 3×3 same-pad NHWC conv vs the XLA emitter (VERDICT r04 #2).

ablate_diffusion_convs.py (chain=64, 2026-08-21) put the XLA conv emitter at
27-30% useful MFU on the UNet's conv shapes and the production ResnetBlockT
at 33-41% in isolation — i.e. the in-program conv+GN total (~31 ms/step of
93.5) ALREADY runs at the emitter's rate; the remaining recoverable item is
the emitter rate itself.  This prototype tests whether a Pallas shift-9
formulation (whole padded image VMEM-resident per batch item; the 9 taps
become free VMEM addressing + one MXU dot each, K=Cin, accumulated f32)
beats it.

Roofline: (B*H*W, Cin) @ (Cin, Cout) per tap; Cin=Cout=320 pads to 384 on
both K and N -> 69% lane ceiling; the flash-attention dots-only control
reaches ~75% of its ceiling, so ~50% useful MFU (~0.34 ms vs XLA's 0.62 at
96²/320) is the realistic target.

Usage: python scripts/ablate_pallas_conv.py [--levels 0,1,2,3] [--chain 64]

Measured 2026-08-21 (v5e, chain=64, bf16, batch 2) — RECORDED NULL:
  L0 (96², 320):  xla 0.672 ms (25.7%) | shift-9 taps 0.699-0.751 (23-25%)
                  | im2col-VMEM concat 0.670-0.691 (24.9-25.8%)
  L1 (48², 640):  xla 0.614 ms (28.1%) | taps 0.618-0.643 (27-28%)
                  | concat 0.564-0.569 (30.3-30.6%)
  All three implementations tie within ~10%.  The same-shape pure-matmul
  controls (ablate_conv_matmul_controls.py) bound what ANY im2col conv can
  reach: the bare (B·H·W, 9C)@(9C, C) dot gets 33% at L0 / 45% at L1, and
  the VMEM patch construction (9 shifted sublane reads + aligned stores
  per chunk) eats the difference — measured directly here as concat vs the
  control.  Conclusion: the UNet convs are bound by v5e matmul geometry at
  K,N≈320-1280 plus unavoidable patch movement, not by the XLA emitter;
  no integration (XLA conv stays).  Earlier variants that failed en route:
  multi-contracting-dim dot (Mosaic 'lhs contracting dims must be of size
  1'), unrolled-chunk concat (35 MB scoped-VMEM stack OOM).
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

V5E_BF16_PEAK = 197e12
LEVELS = [(96, 96, 320), (48, 48, 640), (24, 24, 1280), (12, 12, 1280)]


def make_pallas_conv_concat(B, H, W, C, Cout, R, cout_block, dt):
    """im2col-in-VMEM: per row chunk, write the 9 tap slices into a
    tap-major (9, R*W, C) scratch, then ONE dot contracting (tap, C) —
    K=9C rides a single MXU accumulation chain (the matmul controls put
    K=9C at 33-45% vs 8-11% for the per-tap K=C shape)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cout = Cout // cout_block

    Cp = ((C + 127) // 128) * 128  # lane-aligned channel stride

    def kernel(x_ref, w_ref, o_ref, patch):
        # x (1, H+2, W+2, Cp) zero-padded channels; w (9*Cp, cout_block)
        # with zero rows at the pad positions; o (1, H, W, cout_block)
        def chunk(i, carry):
            r0 = i * R
            for t in range(9):
                dy, dx = t // 3, t % 3
                xs = x_ref[0, pl.ds(r0 + dy, R), dx:dx + W, :]
                patch[:, t * Cp:(t + 1) * Cp] = xs.reshape(R * W, Cp)
            acc = jax.lax.dot_general(
                patch[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (R*W, cout_block)
            o_ref[0, pl.ds(r0, R), :, :] = acc.reshape(
                R, W, cout_block).astype(dt)
            return carry

        jax.lax.fori_loop(0, H // R, chunk, 0)

    conv = pl.pallas_call(
        kernel,
        grid=(B, n_cout),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, Cp), lambda b, c: (b, 0, 0, 0)),
            pl.BlockSpec((9 * Cp, cout_block), lambda b, c: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, H, W, cout_block),
                               lambda b, c: (b, 0, 0, c)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), dt),
        scratch_shapes=[pltpu.VMEM((R * W, 9 * Cp), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def run(x, w):  # w (3, 3, C, Cout) HWIO
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, Cp - C)))
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
        return conv(xp, wp.reshape(9 * Cp, Cout))

    return run


def make_pallas_conv(B, H, W, C, Cout, R, cout_block, dt):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cout = Cout // cout_block

    def kernel(x_ref, w_ref, o_ref):
        # x (1, H+2, W+2, C); w (9, C, cout_block); o (1, H, W, cout_block)
        for r0 in range(0, H, R):
            acc = jnp.zeros((R * W, cout_block), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    xs = x_ref[0, r0 + dy:r0 + dy + R, dx:dx + W, :]
                    acc = acc + jax.lax.dot_general(
                        xs.reshape(R * W, C), w_ref[dy * 3 + dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            o_ref[0, r0:r0 + R, :, :] = acc.reshape(
                R, W, cout_block).astype(dt)

    conv = pl.pallas_call(
        kernel,
        grid=(B, n_cout),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C), lambda b, c: (b, 0, 0, 0)),
            pl.BlockSpec((9, C, cout_block), lambda b, c: (0, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, H, W, cout_block),
                               lambda b, c: (b, 0, 0, c)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), dt),
    )

    def run(x, w):  # x (B, H, W, C) unpadded; w (3, 3, C, Cout) HWIO
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return conv(xp, w.reshape(9, C, Cout))

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--levels", type=str, default="0,1,2,3")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16
    B = args.batch

    def timeit(name, fn, x, w, flops, chain=args.chain):
        @jax.jit
        def run(x, w):
            def body(_, o):
                return fn(o.astype(dt), w)
            o = jax.lax.fori_loop(0, chain, body, x)
            return o.astype(jnp.float32).sum()

        float(run(x, w))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(x, w))
            ts.append((time.perf_counter() - t0) / chain * 1e3)
        ms = float(np.median(ts))
        mfu = flops / (ms / 1e3) / V5E_BF16_PEAK * 100
        print(f"  {name:22s} {ms:7.3f} ms  useful-MFU {mfu:5.1f}%")
        return ms

    for li in [int(s) for s in args.levels.split(",")]:
        H, W, C = LEVELS[li]
        print(f"level {li}: ({B},{H},{W},{C}) bf16")
        x = jax.random.normal(jax.random.key(li), (B, H, W, C), dt)
        w = jax.random.normal(jax.random.key(50 + li), (3, 3, C, C),
                              dt) * 0.02
        flops = 2 * B * H * W * 9 * C * C

        def xla_conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        timeit("xla_conv", xla_conv, x, w, flops)

        # correctness once per level (first variant)
        checked = False
        for R in (8, 16, 32):
            if H % R:
                continue
            # keep weights block under ~8 MB
            cout_block = C if 9 * C * C * 2 <= 8 << 20 else 128
            if C % cout_block:
                cout_block = 128
            try:
                pc = make_pallas_conv(B, H, W, C, C, R, cout_block, dt)
                if not checked:
                    ref = xla_conv(x, w)
                    got = pc(x, w)
                    err = float(jnp.max(jnp.abs(
                        ref.astype(jnp.float32) - got.astype(jnp.float32))))
                    print(f"  [check R={R}] max|d| {err:.3e}")
                    checked = True
                timeit(f"pallas_R{R}_cb{cout_block}", pc, x, w, flops)
            except Exception as e:  # noqa: BLE001
                print(f"  pallas_R{R} FAILED: {type(e).__name__}: {e}")
            try:
                pcc = make_pallas_conv_concat(B, H, W, C, C, R, cout_block,
                                              dt)
                got = pcc(x, w)
                err = float(jnp.max(jnp.abs(
                    xla_conv(x, w).astype(jnp.float32) -
                    got.astype(jnp.float32))))
                print(f"  [concat check R={R}] max|d| {err:.3e}")
                timeit(f"concat_R{R}_cb{cout_block}", pcc, x, w, flops)
            except Exception as e:  # noqa: BLE001
                print(f"  concat_R{R} FAILED: {type(e).__name__}: {e}")
        print()


if __name__ == "__main__":
    main()
