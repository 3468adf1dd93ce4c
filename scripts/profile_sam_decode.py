"""Itemize the SAM decode path (VERDICT r03 #6: "~40 ms/image decode is
unitemized and suspicious").

Pieces, each timed with the chained-in-one-jit protocol at the pipeline's
production shapes (capacity 64 boxes, 750² image):
  decode      — prompt encode + TwoWayTransformer + lowres masks (cap, 256²)
  upsample    — lowres -> 1024² -> crop -> 750² (resize_batch_matmul) + threshold
  pack        — bitplane packing for the masks/ readback (ops/bits)
  sum         — vs the host-observed 'segment' stage time

Usage: python scripts/profile_sam_decode.py [--cap 64]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/inklayer_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--hw", type=int, default=750)
    ap.add_argument("--chain", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from inklayer_tpu.build import _placeholder_params
    from inklayer_tpu.config import SamConfig
    from inklayer_tpu.models.sam import Sam, SamPredictor
    from inklayer_tpu.ops.bits import pack_bits

    cfg = SamConfig()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = Sam(cfg, dtype=dtype)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    boxes = jnp.zeros((args.cap, 4))
    params = _placeholder_params(model, img, boxes, dtype=dtype)
    pred = SamPredictor(params, cfg, dtype=dtype, box_capacity=args.cap)

    h = w = args.hw
    state = {
        "embedding": jnp.zeros((1, 64, 64, 256), dtype),
        "scale": np.asarray([1024 / w, 1024 / h], np.float32),
        "orig_hw": (h, w),
        "input_hw": (1024, 1024),
    }
    boxes_dev = jnp.asarray(
        np.random.default_rng(0).random((args.cap, 4)).astype(np.float32)
        * 1024)

    fsum = jax.jit(lambda x: x.astype(jnp.float32).sum())

    def timed(name, fn, *xs, n=None):
        # call the production function directly (it carries its own jits —
        # resize matrices are built host-side so an outer jit can't wrap it)
        run = lambda *a: float(fsum(fn(*a)))
        run(*xs)
        # chain is awkward across heterogeneous fns; loop calls and use the
        # median minus the measured RTT instead
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            run(*xs)
            ts.append((time.perf_counter() - t0) * 1e3)
        ms = float(np.median(ts))
        print(f"{name:34s} {ms:8.2f} ms (incl ~1 RTT)")
        return ms

    # RTT reference
    f0 = jax.jit(lambda x: x + 1)
    float(f0(jnp.float32(0)))
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        float(f0(jnp.float32(0)))
        ts.append((time.perf_counter() - t0) * 1e3)
    rtt = float(np.median(ts))
    print(f"rtt ≈ {rtt:.1f} ms (subtract from every row)")

    # 1. two-way decode to lowres logits at capacity
    lowres, iou = pred.decode_lowres_state(state, boxes_dev)
    lowres = jax.block_until_ready(lowres)
    timed("decode (prompt+twoway+lowres)",
          lambda b: pred._decode(pred.params, state["embedding"], b)[0],
          boxes_dev)

    # 2. upsample + threshold at n=cap
    timed(f"upsample+threshold n={args.cap}",
          lambda lr: pred.masks_from_lowres(state, lr, args.cap), lowres)
    for nn_ in (16, 8):
        timed(f"upsample+threshold n={nn_}",
              lambda lr, nn_=nn_: pred.masks_from_lowres(state, lr, nn_),
              lowres)

    # 3. packing for host transfer
    masks = pred.masks_from_lowres(state, lowres, args.cap)
    masks = jax.block_until_ready(masks)
    timed("pack_bits", lambda m: pack_bits(m), masks)

    # 4. fused chain decode->masks (what the pipeline dispatches)
    def full(b):
        lr, _ = pred.decode_lowres_state(state, b)
        return pred.masks_from_lowres(state, lr, args.cap)

    timed("decode->masks fused", full, boxes_dev)


if __name__ == "__main__":
    main()
