"""XLA device trace of the GDINO detection forward; prints top ops.

Usage: python scripts/profile_gdino.py [--out /tmp/gdino_trace]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from profile_sam import summarize  # noqa: E402

from inklayer_tpu.build import build_pipeline  # noqa: E402
from inklayer_tpu.config import PipelineConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/gdino_trace")
    args = ap.parse_args()

    pipe = build_pipeline(PipelineConfig())
    from PIL import Image

    img = np.asarray(Image.open(
        "/root/reference/data/bunny_cook_sketch.png").convert("RGB"))
    det = pipe.detector

    fin = det.detect_dispatch(img)
    fin()
    t0 = time.perf_counter()
    det.detect_dispatch(img)()
    print(f"warm detect {1e3 * (time.perf_counter() - t0):.1f} ms",
          flush=True)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(3):
            det.detect_dispatch(img)()
    summarize(args.out, top=25)


if __name__ == "__main__":
    main()
