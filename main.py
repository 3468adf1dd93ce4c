"""CLI entry point — reference-compatible (main.py:8-32):

    python main.py --img <path> | --dir <path> [--out_dir ./output]
                   [--no_intermediate] [--inpaint]

Extras over the reference: --models_dir (checkpoints to convert),
--config (JSON PipelineConfig), --cpu (force CPU backend).
"""

import argparse
import glob
import os
import sys

# persistent XLA compilation cache: the big detector/segmentor compiles are
# paid once, then reused across processes and directory sweeps
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/inklayer_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    parser = argparse.ArgumentParser(description="InkLayer-TPU scene-sketch segmentation")
    parser.add_argument("--img", type=str, default=None, help="single input image")
    parser.add_argument("--dir", type=str, default=None,
                        help="directory of input images (*.png, *.jpg)")
    parser.add_argument("--out_dir", type=str, default="./output")
    parser.add_argument("--no_intermediate", action="store_true",
                        help="delete intermediate outputs, keep final layers")
    parser.add_argument("--inpaint", action="store_true",
                        help="run occluded-stroke inpainting")
    parser.add_argument("--models_dir", type=str, default=None,
                        help="directory with reference .pth checkpoints")
    parser.add_argument("--config", type=str, default=None,
                        help="JSON PipelineConfig path")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--batch", type=int, default=1,
                        help="batch GDINO/SAM dispatches across images in "
                             "--dir mode (throughput)")
    parser.add_argument("--num_hosts", type=int,
                        default=int(os.environ.get("INKLAYER_NUM_HOSTS", 1)),
                        help="multi-host --dir sweep: total number of worker "
                             "hosts (embarrassingly parallel over DCN, no "
                             "collectives — SURVEY §2.9)")
    parser.add_argument("--host_id", type=int,
                        default=int(os.environ.get("INKLAYER_HOST_ID", 0)),
                        help="this worker's index in [0, num_hosts)")
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.img is None and args.dir is None:
        parser.error("provide --img or --dir")

    from inklayer_tpu.config import PipelineConfig, load_config
    from inklayer_tpu.build import build_pipeline

    cfg = load_config(args.config) if args.config else PipelineConfig()
    pipeline = build_pipeline(cfg, models_dir=args.models_dir)

    if args.img is not None:
        paths = [args.img]
    else:
        paths = sorted(glob.glob(os.path.join(args.dir, "*.png"))
                       + glob.glob(os.path.join(args.dir, "*.jpg")))
    if not paths:
        print("no input images found", file=sys.stderr)
        sys.exit(1)
    if args.num_hosts > 1:
        if not 0 <= args.host_id < args.num_hosts:
            parser.error("--host_id must be in [0, num_hosts)")
        # deterministic round-robin shard of the sorted list: every host
        # computes the same assignment without any communication
        paths = paths[args.host_id::args.num_hosts]
        if not paths:
            print(f"host {args.host_id}: no images in shard")
            return

    if len(paths) > 1:
        # directory sweep: host IO overlaps the next image's device work
        outs = pipeline.run_dir(paths, args.out_dir, args.no_intermediate,
                                args.inpaint, batch_size=args.batch)
        for p, out in zip(paths, outs):
            print(f"{p} -> {out}")
    else:
        out = pipeline.run(paths[0], args.out_dir, args.no_intermediate,
                           args.inpaint)
        print(f"{paths[0]} -> {out}")
    print("stage times (s):",
          {k: round(v, 2) for k, v in pipeline.stage_times.times.items()})


if __name__ == "__main__":
    main()
