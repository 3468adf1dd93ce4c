"""Same-shape pure-matmul controls for the UNet conv floor (VERDICT r04 #2).

Both the XLA conv emitter AND a Pallas shift-9 VMEM kernel measure ~26-30%
useful MFU at the UNet's conv shapes (ablate_{diffusion_convs,pallas_conv}).
If a BARE matmul of the conv-equivalent shape gets the same rate, the conv
is matmul-bound and 26-30% is the v5e floor for these shapes — a
control-backed null in the SAM-evidence style.

Controls (bf16, f32 accum, chain=64 fori protocol):
  M=B*H*W rows at each level; conv-equivalent K=9C (im2col view) and the
  per-tap K=C view; plus lane-aligned K/N=384 and N=1280 variants to price
  the 320->384 padding.

Usage: python scripts/ablate_conv_matmul_controls.py

Measured 2026-08-21 (v5e, chain=64, pair-MFU = main dot + loop-carry
back-projection):
  L0 per-tap      M18432 K320   N320:  0.469 ms   8.2%
  L0 im2col       M18432 K2880  N320:  1.046 ms  33.0%
  L0 lane-aligned M18432 K384   N384:  0.511 ms  10.8%
  L0 wide-N       M18432 K320   N1280: 0.590 ms  26.0%
  L1 im2col       M4608  K5760  N640:  0.773 ms  44.6%
  L2 im2col       M1152  K11520 N1280: 0.820 ms  42.1%
  L3 im2col       M288   K11520 N1280: 0.551 ms  15.6%
  big square      M4096  K4096  N4096: 1.890 ms  73.8%
  READING: small-K matmuls are the bound — K=320 reaches 8-11% even
  lane-aligned (the MXU accumulation chain is too short to hide its
  latency), so the conv emitter's 26-30% (which realizes K=9C im2col
  internally) is already NEAR the im2col control (33%@L0), and a custom
  kernel has at most ~25% relative headroom BEFORE paying any patch
  construction (which ablate_pallas_conv.py measures as eating it all).
  The 73.8% big-square control validates the protocol.
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

# (M, K, N, tag)
SHAPES = [
    (2 * 96 * 96, 320, 320, "L0 per-tap (x9 = one conv)"),
    (2 * 96 * 96, 2880, 320, "L0 im2col K=9C"),
    (2 * 96 * 96, 384, 384, "L0 lane-aligned control"),
    (2 * 96 * 96, 320, 1280, "L0 wide-N control"),
    (2 * 48 * 48, 5760, 640, "L1 im2col"),
    (2 * 24 * 24, 11520, 1280, "L2 im2col"),
    (2 * 12 * 12, 11520, 1280, "L3 im2col"),
    (4096, 4096, 4096, "big square control"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16
    for M, K, N, tag in SHAPES:
        x = jax.random.normal(jax.random.key(1), (M, K), dt)
        w = jax.random.normal(jax.random.key(2), (K, N), dt) * 0.02
        # loop-carry through a (M, N) -> (M, K) projection so the chain
        # links depend on each other; only time the (M,K)@(K,N) dot by
        # giving the projection a tiny K' (cost ~N/K of the main dot —
        # subtracted via the flops basis below)
        wb = jax.random.normal(jax.random.key(3), (N, K), dt) * 0.02

        @jax.jit
        def run(x, w, wb):
            def body(_, xc):
                y = jax.lax.dot_general(xc, w, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                return (y.astype(dt) @ wb).astype(dt)
            o = jax.lax.fori_loop(0, args.chain, body, x)
            return o.astype(jnp.float32).sum()

        float(run(x, w, wb))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(x, w, wb))
            ts.append((time.perf_counter() - t0) / args.chain * 1e3)
        ms = float(np.median(ts))
        # chain link = main dot + back-projection: 2MKN + 2MNK flops
        both = 2 * M * K * N + 2 * M * N * K
        mfu = both / (ms / 1e3) / V5E_BF16_PEAK * 100
        print(f"{tag:28s} M{M} K{K} N{N}: {ms:7.3f} ms/link  "
              f"pair-MFU {mfu:5.1f}%")


if __name__ == "__main__":
    main()
