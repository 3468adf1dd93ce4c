"""Standalone Depth-Anything-V2 demo CLI (image / directory / video).

Parity target: Depth_Anything_V2/run.py (:1-72) and run_video.py (:1-92) —
the reference's standalone depth demos (SURVEY §2.5 "run scripts").
TPU-native: one DepthEstimator built once (bucketed shapes, no per-frame
rebuild); video frames stream through the same cached jit.

Usage:
  python scripts/run_depth.py --img-path sketch.png [--outdir ./vis_depth]
  python scripts/run_depth.py --img-path dir/ [--grayscale] [--pred-only]
  python scripts/run_depth.py --video-path clip.mp4 [--outdir ./vis_video]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import os

import numpy as np


def build_estimator(encoder: str, models_dir):
    import jax
    import jax.numpy as jnp

    from inklayer_tpu.config import DepthConfig
    from inklayer_tpu.models.depth import DepthAnythingV2, DepthEstimator

    presets = {
        "vits": dict(encoder="vits", features=64,
                     out_channels=(48, 96, 192, 384), embed_dim=384,
                     depth=12, num_heads=6),
        "vitb": dict(encoder="vitb", features=128,
                     out_channels=(96, 192, 384, 768), embed_dim=768,
                     depth=12, num_heads=12),
        "vitl": dict(encoder="vitl", features=256,
                     out_channels=(256, 512, 1024, 1024), embed_dim=1024,
                     depth=24, num_heads=16),
    }
    cfg = DepthConfig(**presets[encoder])
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = DepthAnythingV2(cfg, dtype=dtype)
    args_ex = (jnp.zeros((1, cfg.input_size, cfg.input_size, 3)),)
    ckpt = None
    if models_dir:
        p = os.path.join(models_dir, f"depth_anything_v2_{encoder}.pth")
        ckpt = p if os.path.exists(p) else None
    if ckpt:
        from inklayer_tpu.io.weights import load_depth_params

        params = load_depth_params(ckpt, cfg, model, args_ex)
    else:
        print("[run_depth] no checkpoint — placeholder params (outputs are "
              "numerically meaningless; pass --models_dir)")
        shapes = jax.eval_shape(lambda k: model.init(k, *args_ex),
                                jax.random.key(0))
        params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype),
                              shapes)
    return DepthEstimator(params, cfg, dtype=dtype)


def colorize(depth: np.ndarray, grayscale: bool) -> np.ndarray:
    lo, hi = float(depth.min()), float(depth.max())
    norm = (depth - lo) / (hi - lo) if hi > lo else np.zeros_like(depth)
    if grayscale:
        return np.repeat((norm * 255).astype(np.uint8)[..., None], 3, -1)
    import matplotlib

    cmap = matplotlib.colormaps.get_cmap("Spectral_r")
    return (cmap(norm)[..., :3] * 255).astype(np.uint8)


def side_by_side(rgb, vis, pred_only):
    if pred_only:
        return vis
    split = np.full((rgb.shape[0], 50, 3), 255, np.uint8)
    return np.concatenate([rgb, split, vis], axis=1)


def main():
    ap = argparse.ArgumentParser(description="Depth Anything V2 (TPU)")
    ap.add_argument("--img-path", type=str, default=None)
    ap.add_argument("--video-path", type=str, default=None)
    ap.add_argument("--outdir", type=str, default="./vis_depth")
    ap.add_argument("--encoder", type=str, default="vitb",
                    choices=["vits", "vitb", "vitl"])
    ap.add_argument("--models_dir", type=str, default=None)
    ap.add_argument("--pred-only", action="store_true")
    ap.add_argument("--grayscale", action="store_true")
    args = ap.parse_args()
    if not args.img_path and not args.video_path:
        ap.error("need --img-path or --video-path")

    est = build_estimator(args.encoder, args.models_dir)
    os.makedirs(args.outdir, exist_ok=True)

    if args.img_path:
        from PIL import Image

        if os.path.isfile(args.img_path):
            if args.img_path.endswith("txt"):
                with open(args.img_path) as f:
                    files = f.read().splitlines()
            else:
                files = [args.img_path]
        else:
            files = sorted(glob.glob(os.path.join(args.img_path, "**/*"),
                                     recursive=True))
        for k, fn in enumerate(files):
            try:
                rgb = np.asarray(Image.open(fn).convert("RGB"))
            except Exception:
                continue
            print(f"[{k + 1}/{len(files)}] {fn}", flush=True)
            depth = est.infer_image(rgb)
            out = side_by_side(rgb, colorize(depth, args.grayscale),
                               args.pred_only)
            base = os.path.splitext(os.path.basename(fn))[0]
            Image.fromarray(out).save(
                os.path.join(args.outdir, base + ".png"))
        return

    import cv2

    cap = cv2.VideoCapture(args.video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    out_w = w if args.pred_only else 2 * w + 50
    base = os.path.splitext(os.path.basename(args.video_path))[0]
    out_path = os.path.join(args.outdir, base + ".mp4")
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (out_w, h))
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        depth = est.infer_image(rgb)
        out = side_by_side(rgb, colorize(depth, args.grayscale),
                           args.pred_only)
        writer.write(cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        n += 1
        if n % 25 == 0:
            print(f"frame {n}", flush=True)
    cap.release()
    writer.release()
    print(f"wrote {out_path} ({n} frames)")


if __name__ == "__main__":
    main()
