"""SAM ViT-H encoder MFU vs batch size on the real chip.

BASELINE.json's north star asks for >80% of the v5e matmul roofline on the
encoder.  Single-image the encoder sits at ~64% device MFU with the
remaining gap itemised as small-matmul issue floors + per-image glue
(ablate_sam_encoder.py header).  The one honest remaining lever is batch:
a batched sweep amortises kernel launch and glue over more useful MXU
passes.  This measures p50 per-image device time at batch 1/2/4 with the
tunnel RTT amortised by a jitted 4-deep fori_loop (same protocol as
ablate_deform_tiled.py).

Roofline: ~6.2 TFLOP/image forward at bf16 on v5e (197 TFLOP/s peak)
=> ~31.5 ms/image ideal.

Round-2 caveat (advisor): the first capture used LOOP=4, too shallow to
amortise the ~35 ms tunnel RTT — RTT added ~8.8 ms/img at batch 1 vs ~2.2
at batch 4, so the apparent "batching buys ~7%" mostly measured RTT
amortisation, not device behavior.  LOOP is now 20 (~1.75 ms RTT residual
per image at batch 1, ~0.4 at batch 4).

Measured 2026-08-20 (LOOP=20, v5e through the axon tunnel):
  batch 1: p50 50.34 ms/img  MFU 62.5%
  batch 2: p50 50.54 ms/img  MFU 62.3%
  batch 4: p50 51.65 ms/img  MFU 60.9%
Device time is FLAT across batch sizes: batching buys ~0% on device — the
round-2 "batch buys ~7%" delta was tunnel-RTT amortisation, exactly as the
advisor predicted.  THE unified-protocol MFU number is 62.5% (batch 1,
loop-amortized device time).  The residual gap to 80% is itemised
per-kernel in ablate_win_issue.py (issue-floor decomposition with
pure-matmul controls) and the achievable-roofline claim is recorded in
BASELINE.md.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT

TFLOP_PER_IMG = 6.2
PEAK_TFLOPS = 197.0  # v5e bf16
ROOF_MS = TFLOP_PER_IMG / PEAK_TFLOPS * 1e3
LOOP = 20
N_WARM, N_ITER = 2, 8

H = dict(img_size=1024, patch_size=16, embed_dim=1280, depth=32,
         num_heads=16, out_chans=256, window_size=14,
         global_attn_indexes=(7, 15, 23, 31), dtype=jnp.bfloat16)


def main():
    model = ImageEncoderViT(**H)
    x1 = jnp.asarray(np.random.RandomState(0).randn(1, 1024, 1024, 3),
                     jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: model.init(k, x1), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    for b in (1, 2, 4):
        x = jnp.asarray(np.random.RandomState(1).randn(b, 1024, 1024, 3),
                        jnp.bfloat16)

        @jax.jit
        def many(p, xx):
            def body(i, s):
                return s + jnp.sum(model.apply(p, xx + s * 0)
                                   .astype(jnp.float32))
            return jax.lax.fori_loop(0, LOOP, body, 0.0)

        t0 = time.perf_counter()
        float(many(params, x))
        # compile + one full LOOP-deep execution + a tunnel RTT (label was
        # previously just "compile" — advisor r02)
        compile_s = time.perf_counter() - t0
        for _ in range(N_WARM):
            float(many(params, x))
        ts = []
        for _ in range(N_ITER):
            t = time.perf_counter()
            float(many(params, x))
            ts.append((time.perf_counter() - t) * 1e3 / (LOOP * b))
        p50 = float(np.percentile(ts, 50))
        mfu = ROOF_MS / p50 * 100.0
        print(f"batch {b}: p50 {p50:6.2f} ms/img  "
              f"MFU {mfu:5.1f}%  (compile+first-run {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
