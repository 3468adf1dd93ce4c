"""Standalone Depth-Anything-V2 demos, TPU-native.

Parity targets: the reference's unused-by-pipeline run scripts —
Depth_Anything_V2/run.py (image CLI: file/txt-list/dir glob, Spectral_r
colormap, --pred-only/--grayscale, side-by-side hconcat with a 50px white
margin), run_video.py (cv2 VideoCapture/VideoWriter mp4 loop), app.py
(gradio web demo — here a dependency-free WSGI page on the framework's own
server instead; gradio is not vendored).

One process builds the DepthEstimator once (the reference rebuilds the torch
model per script); frames stream through the single fused depth jit per
shape bucket, so video runs at device speed after the first frame's compile.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MARGIN = 50


def colorize(depth: np.ndarray, grayscale: bool = False) -> np.ndarray:
    """(H, W) float -> (H, W, 3) uint8 RGB; Spectral_r like run.py:51-66."""
    lo, hi = float(depth.min()), float(depth.max())
    d8 = ((depth - lo) / max(hi - lo, 1e-8) * 255.0).astype(np.uint8)
    if grayscale:
        return np.repeat(d8[..., None], 3, axis=-1)
    import matplotlib

    cmap = matplotlib.colormaps.get_cmap("Spectral_r")
    return (cmap(d8)[:, :, :3] * 255).astype(np.uint8)


def side_by_side(raw_rgb: np.ndarray, vis: np.ndarray) -> np.ndarray:
    split = np.full((raw_rgb.shape[0], MARGIN, 3), 255, np.uint8)
    return np.concatenate([raw_rgb, split, vis], axis=1)


def build_estimator(encoder: str, models_dir=None, input_size: int = 518):
    from inklayer_tpu.config import DepthConfig
    from inklayer_tpu.models.depth import DepthAnythingV2, DepthEstimator

    import jax
    import jax.numpy as jnp

    factories = {"vits": DepthConfig.vits, "vitb": DepthConfig,
                 "vitl": DepthConfig.vitl}
    if encoder not in factories:
        raise SystemExit(f"encoder must be one of {sorted(factories)} "
                         "(vitg weights are not published)")
    cfg = factories[encoder]()
    if input_size != cfg.input_size:
        import dataclasses

        cfg = dataclasses.replace(cfg, input_size=input_size)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = DepthAnythingV2(cfg, dtype=dtype)
    params = None
    if models_dir:
        p = os.path.join(models_dir, f"depth_anything_v2_{encoder}.pth")
        if os.path.exists(p):
            from inklayer_tpu.io.weights import load_depth_params

            args = (jnp.zeros((1, cfg.input_size, cfg.input_size, 3)),)
            params = load_depth_params(p, cfg, model, args)
    if params is None:
        from inklayer_tpu.build import _placeholder_params

        params = _placeholder_params(
            model, jnp.zeros((1, cfg.input_size, cfg.input_size, 3)))
    return DepthEstimator(params, cfg, dtype=dtype)


def iter_inputs(path: str):
    """run.py:39-46 input enumeration: single file, .txt list, or dir."""
    if os.path.isfile(path):
        if path.endswith("txt"):
            with open(path) as f:
                return f.read().splitlines()
        return [path]
    return sorted(f for f in glob.glob(os.path.join(path, "**/*"),
                                       recursive=True) if os.path.isfile(f))


def run_images(est, args) -> list:
    from PIL import Image

    os.makedirs(args.outdir, exist_ok=True)
    written = []
    files = iter_inputs(args.img_path)
    for k, filename in enumerate(files):
        print(f"Progress {k + 1}/{len(files)}: {filename}", flush=True)
        raw = np.asarray(Image.open(filename).convert("RGB"))
        vis = colorize(est.infer_image(raw), args.grayscale)
        out = vis if args.pred_only else side_by_side(raw, vis)
        name = os.path.splitext(os.path.basename(filename))[0] + ".png"
        dst = os.path.join(args.outdir, name)
        Image.fromarray(out).save(dst)
        written.append(dst)
    return written


def run_video(est, args) -> list:
    import cv2

    os.makedirs(args.outdir, exist_ok=True)
    written = []
    files = iter_inputs(args.video_path)
    for k, filename in enumerate(files):
        print(f"Progress {k + 1}/{len(files)}: {filename}", flush=True)
        cap = cv2.VideoCapture(filename)
        fw = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        fh = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        fps = int(cap.get(cv2.CAP_PROP_FPS)) or 24
        ow = fw if args.pred_only else fw * 2 + MARGIN
        dst = os.path.join(
            args.outdir,
            os.path.splitext(os.path.basename(filename))[0] + ".mp4")
        writer = cv2.VideoWriter(dst, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                                 (ow, fh))
        while cap.isOpened():
            ret, bgr = cap.read()
            if not ret:
                break
            rgb = bgr[:, :, ::-1]
            vis = colorize(est.infer_image(rgb), args.grayscale)
            frame = vis if args.pred_only else side_by_side(rgb, vis)
            writer.write(np.ascontiguousarray(frame[:, :, ::-1]))
        cap.release()
        writer.release()
        written.append(dst)
    return written


_PAGE = """<!doctype html><title>Depth Anything V2 (TPU)</title>
<h1>Depth Anything V2</h1>
<p>Upload an image; the TPU estimator returns the colorized relative-depth
map (app.py equivalent, no gradio).</p>
<form method=post enctype=multipart/form-data action=/depth>
<input type=file name=image><button>Estimate</button></form>"""


def serve(est, host: str, port: int):
    """Minimal app.py equivalent on the framework's WSGI machinery."""
    import io as _io
    from wsgiref.simple_server import make_server

    from PIL import Image

    def app(environ, start):
        if environ["REQUEST_METHOD"] == "POST":
            from inklayer_tpu.serve.app import Request

            _, data = Request(environ).file_upload("image")
            if not data:
                start("400 Bad Request", [("Content-Type", "text/plain")])
                return [b"no image field"]
            raw = np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"))
            vis = side_by_side(raw, colorize(est.infer_image(raw)))
            buf = _io.BytesIO()
            Image.fromarray(vis).save(buf, "PNG")
            start("200 OK", [("Content-Type", "image/png")])
            return [buf.getvalue()]
        start("200 OK", [("Content-Type", "text/html")])
        return [_PAGE.encode()]

    print(f"serving on http://{host}:{port}", flush=True)
    make_server(host, port, app).serve_forever()


def main(argv=None):
    ap = argparse.ArgumentParser(description="Depth Anything V2 (TPU)")
    ap.add_argument("--img-path", type=str)
    ap.add_argument("--video-path", type=str)
    ap.add_argument("--input-size", type=int, default=518)
    ap.add_argument("--outdir", type=str, default="./vis_depth")
    ap.add_argument("--encoder", type=str, default="vitl",
                    choices=["vits", "vitb", "vitl"])
    ap.add_argument("--pred-only", dest="pred_only", action="store_true")
    ap.add_argument("--grayscale", dest="grayscale", action="store_true")
    ap.add_argument("--models_dir", default=None)
    ap.add_argument("--serve", action="store_true",
                    help="web demo (app.py equivalent) instead of batch")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args(argv)

    est = build_estimator(args.encoder, args.models_dir, args.input_size)
    if args.serve:
        serve(est, "0.0.0.0", args.port)
    elif args.video_path:
        return run_video(est, args)
    elif args.img_path:
        return run_images(est, args)
    else:
        raise SystemExit("need --img-path, --video-path, or --serve")


if __name__ == "__main__":
    main()
