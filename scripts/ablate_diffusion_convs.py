"""Decompose + attack the SD UNet conv cost at 768² shapes (VERDICT r04 #2).

BASELINE.md "Diffusion stage roofline": ~28 ms/step sits in conv+GN
`convert_reduce_fusion`s running at 2-47% MFU each, while a standalone
3×3 320ch conv reaches 27.8% — XLA emitter/fusion overhead on ~90 small
fused convs is the named recoverable item (~15-20 ms/step if every conv
fusion reached the standalone rate).

This script measures, at the four UNet resolutions (96²/320, 48²/640,
24²/1280, 12²/1280; batch 2 = CFG pair, bf16 like production):

  resnet      — production ResnetBlockT (GN+SiLU+conv ×2 + temb + res)
  resnet_bar  — same with optimization_barrier between GN+SiLU and conv
                (splits the conv out of the convert_reduce_fusion)
  gnsilu_conv — one GN+SiLU+conv3×3 chain (the repeated unit)
  gnc_bar     — the unit with a barrier before the conv
  conv        — bare 3×3 conv (the 27.8% standalone control)
  gn          — bare GroupNorm+SiLU (HBM-bound control)
  im2col      — conv as conv_general_dilated_patches → one (BHW, 9Cin)
                @ (9Cin, Cout) matmul (explicit MXU lowering)
  shift9      — conv as sum of 9 shifted (BHW, Cin) @ (Cin, Cout) matmuls
  conv_nchw   — bare conv with NCHW dimension numbers (layout control)
  conv_f32acc — bare conv with preferred_element_type=f32

Chained-calls-in-one-jit protocol (single-call wall is RTT-dominated
through this tunnel; see ablate_diffusion_attn.py).

Usage: python scripts/ablate_diffusion_convs.py [--chain 64] [--levels 0,1,2,3]

Measured 2026-08-21 (v5e, chain=64 fori_loop, bf16, batch 2) — the
round-4 "15-20 ms/step recoverable" premise is RETRACTED (see BASELINE.md
"Diffusion stage roofline (round 5 update)"):
  level 0 (96², 320):  resnet 1.030 ms (33.5% MFU) | gn+silu+conv 0.642
    (26.9) | conv 0.621 (27.8) | gn 0.375 | im2col-HBM 2.424 | shift9
    0.732 | nchw 0.624 | f32acc 0.624
  level 1 (48², 640):  resnet 0.837 (41.2%) | unit 0.585 | conv 0.586
    (29.4) | gn 0.397
  level 2 (24², 1280): resnet 0.921 (37.4%) | conv 0.613 (28.2)
  level 3 (12², 1280): resnet 0.614 (14.0%) | conv 0.493 (8.7)
  KEY RESULT: the production ResnetBlockT (2 conv + 2 GN+SiLU + temb +
  residual) runs FASTER than two standalone convs — the GN/elementwise
  work fully overlaps, i.e. the in-program conv+GN fusion total
  (~31 ms/step by trace) already sits AT the emitter's standalone rate.
  The 2-47% per-fusion MFU spread in the round-4 trace was shape variance,
  not fusion overhead.  (Earlier chain=8 numbers were RTT-floor artifacts:
  every variant read ~3.1 ms ≈ 25 ms tunnel RTT / 8.)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/inklayer_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import time

import numpy as np

V5E_BF16_PEAK = 197e12

# (H, W, C) at 768² input; batch 2 (classifier-free guidance pair)
LEVELS = [(96, 96, 320), (48, 48, 640), (24, 24, 1280), (12, 12, 1280)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--levels", type=str, default="0,1,2,3")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from inklayer_tpu.models.diffusion.unet import ResnetBlockT

    dt = jnp.bfloat16
    B = args.batch

    def timeit(name, fn, x_args, flops, chain=args.chain):
        """fn: pytree->same-shape output as x_args[0]; loop-carried via
        fori_loop so chain=64+ compiles once (the 24 ms tunnel RTT needs
        ≥64 links to amortize below 0.4 ms/link)."""
        @jax.jit
        def run(*xa):
            def body(_, o):
                return fn(o.astype(dt), *xa[1:])
            o = jax.lax.fori_loop(0, chain, body, xa[0])
            return o.astype(jnp.float32).sum()

        float(run(*x_args))  # compile
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(*x_args))
            ts.append((time.perf_counter() - t0) / chain * 1e3)
        ms = float(np.median(ts))
        mfu = flops / (ms / 1e3) / V5E_BF16_PEAK * 100
        print(f"  {name:12s} {ms:7.3f} ms  useful-MFU {mfu:5.1f}%")
        return ms

    for li in [int(s) for s in args.levels.split(",")]:
        H, W, C = LEVELS[li]
        print(f"level {li}: ({B},{H},{W},{C}) bf16")
        key = jax.random.key(li)
        x = jax.random.normal(key, (B, H, W, C), dt)
        temb = jax.random.normal(jax.random.key(90 + li), (B, 1280), dt)
        conv_flops = 2 * B * H * W * 9 * C * C
        gn_flops = 0  # HBM-bound; report MFU vs conv flops for context only

        # ---- production ResnetBlockT --------------------------------------
        blk = ResnetBlockT(C, dtype=dt)
        pb = blk.init(jax.random.key(1), x, temb)
        timeit("resnet", lambda x, temb: blk.apply(pb, x, temb),
               (x, temb), 2 * conv_flops)

        # ---- barrier variant of the block ---------------------------------
        class ResnetBar(nn.Module):
            out_ch: int

            @nn.compact
            def __call__(self, x, temb):
                h = nn.GroupNorm(num_groups=32, dtype=dt, name="norm1")(x)
                h = nn.silu(h)
                h = jax.lax.optimization_barrier(h)
                h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=dt,
                            name="conv1")(h)
                te = nn.Dense(self.out_ch, dtype=dt, name="time_emb_proj")(
                    nn.silu(temb))
                h = h + te[:, None, None, :]
                h = nn.GroupNorm(num_groups=32, dtype=dt, name="norm2")(h)
                h = nn.silu(h)
                h = jax.lax.optimization_barrier(h)
                h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=dt,
                            name="conv2")(h)
                return x + h

        bar = ResnetBar(C)
        pbar = bar.init(jax.random.key(1), x, temb)
        timeit("resnet_bar", lambda x, temb: bar.apply(pbar, x, temb),
               (x, temb), 2 * conv_flops)

        # ---- the repeated unit: GN+SiLU+conv ------------------------------
        gn = nn.GroupNorm(num_groups=32, dtype=dt)
        pgn = gn.init(jax.random.key(2), x)
        conv = nn.Conv(C, (3, 3), padding=1, dtype=dt)
        pconv = conv.init(jax.random.key(3), x)

        timeit("gnsilu_conv",
               lambda x: conv.apply(pconv, nn.silu(gn.apply(pgn, x))),
               (x,), conv_flops)
        timeit("gnc_bar",
               lambda x: conv.apply(pconv, jax.lax.optimization_barrier(
                   nn.silu(gn.apply(pgn, x)))),
               (x,), conv_flops)
        timeit("conv", lambda x: conv.apply(pconv, x), (x,), conv_flops)
        timeit("gn", lambda x: nn.silu(gn.apply(pgn, x)), (x,), conv_flops)

        # ---- explicit matmul lowerings ------------------------------------
        wmat = jax.random.normal(jax.random.key(4), (9 * C, C), dt) * 0.02
        w33 = wmat.reshape(3, 3, C, C)

        def im2col(x):
            p = jax.lax.conv_general_dilated_patches(
                x.astype(dt), (3, 3), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # patches channel order is (C, 3, 3) flattened (feature-major)
            o = p.reshape(B * H * W, 9 * C) @ wmat
            return o.reshape(B, H, W, C)

        timeit("im2col", im2col, (x,), conv_flops)

        def shift9(x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((B * H * W, C), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    xs = jax.lax.dynamic_slice(
                        xp, (0, dy, dx, 0), (B, H, W, C))
                    acc = acc + (xs.reshape(B * H * W, C) @ w33[dy, dx]
                                 ).astype(jnp.float32)
            return acc.astype(dt).reshape(B, H, W, C)

        timeit("shift9", shift9, (x,), conv_flops)

        # ---- layout / accumulation controls -------------------------------
        def conv_nchw(x):
            xn = x.transpose(0, 3, 1, 2)
            o = jax.lax.conv_general_dilated(
                xn, w33.transpose(3, 2, 0, 1), (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return o.transpose(0, 2, 3, 1)

        timeit("conv_nchw", conv_nchw, (x,), conv_flops)

        def conv_f32acc(x):
            o = jax.lax.conv_general_dilated(
                x, w33, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return o.astype(dt)

        timeit("conv_f32acc", conv_f32acc, (x,), conv_flops)
        print()


if __name__ == "__main__":
    main()
