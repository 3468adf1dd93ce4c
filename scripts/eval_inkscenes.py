"""InkScenes benchmark CLI (ROADMAP #10; SURVEY §2.8 dataset tooling).

Runs the full pipeline over a directory of InkScenes sketches (optional),
then scores masks_final against the dataset's .mat instance GT
(INSTANCE_GT label matrices, reference InkScenes/read_GT_mat_file.py) and
writes a JSON report with per-image and aggregate mIoU / AP / AR.

Usage:
  # score existing pipeline outputs
  python scripts/eval_inkscenes.py --outputs /tmp/out --gt_dir DATASET/GT

  # run the pipeline first, then score
  python scripts/eval_inkscenes.py --sketch_dir DATASET/sketches \
      --gt_dir DATASET/GT --outputs /tmp/out

  # visualize one GT .mat file (read_GT_mat_file.py equivalent)
  python scripts/eval_inkscenes.py --visualize DATASET/GT/scene.mat --out viz.png
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import json
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outputs", help="pipeline output base dir to score")
    ap.add_argument("--gt_dir", help="directory of {name}.mat instance GT")
    ap.add_argument("--sketch_dir",
                    help="run the pipeline over these sketches first")
    ap.add_argument("--report", default=None,
                    help="report JSON path (default: OUTPUTS/inkscenes_eval.json)")
    ap.add_argument("--visualize", help="render one GT .mat to --out and exit")
    ap.add_argument("--out", default="gt_viz.png")
    ap.add_argument("--no_intermediate", action="store_true", default=True)
    args = ap.parse_args()

    from inklayer_tpu.pipeline import eval as ev

    if args.visualize:
        ev.visualize_label_matrix(ev.load_instance_gt(args.visualize),
                                  out_path=args.out)
        print(f"wrote {args.out}")
        return

    if not (args.outputs and args.gt_dir):
        ap.error("--outputs and --gt_dir are required (or use --visualize)")

    if args.sketch_dir:
        from inklayer_tpu.build import build_pipeline
        from inklayer_tpu.config import PipelineConfig

        paths = sorted(glob.glob(os.path.join(args.sketch_dir, "*.png")) +
                       glob.glob(os.path.join(args.sketch_dir, "*.jpg")))
        if not paths:
            raise SystemExit(f"no sketches in {args.sketch_dir}")
        pipe = build_pipeline(PipelineConfig())
        pipe.run_dir(paths, args.outputs,
                     no_intermediate=args.no_intermediate)

    report_path = args.report or os.path.join(args.outputs,
                                              "inkscenes_eval.json")
    report = ev.evaluate_sweep(args.outputs, args.gt_dir,
                               report_path=report_path)
    print(json.dumps(report["aggregate"], indent=2))
    print(f"report: {report_path}")


if __name__ == "__main__":
    main()
