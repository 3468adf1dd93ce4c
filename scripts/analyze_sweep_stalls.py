"""Where does the directory-sweep wall time go?  (VERDICT r02 next #3)

Runs a warm 4-image run_dir sweep under the JAX profiler and reports, per
image: wall time, DEVICE-BUSY time (sum of device-track complete events in
the trace), and the host/RTT gap.  The claim to check: the gap between the
measured ~2.1 sketches/s and the device-bound ceiling is tunnel round
trips (each host<->device sync costs ~24-35 ms through the axon tunnel),
which vanish on a real TPU VM (~0.2 ms RTT).

Usage: python scripts/analyze_sweep_stalls.py [--n 4]

Measured 2026-08-20 (quiet host, 4-image warm sweep, median of 3):
  baseline (r02 code):     wall 751 ms/img under CPU contention; with the
                           r02 tree the recorded bench sweep was 2.088 sk/s
  + device gray plane:     wall 413 ms/img, 2.42 sk/s, gap 239 ms/img
  + fused NMS/depth front: wall 414 ms/img, 2.41 sk/s, gap 240 ms/img
                           (NMS host-block 103 -> 54 ms/img; the wall is
                           wait-for-device-dominated so the saving moved
                           the block, not the wall)
  device busy: 174 ms/img -> ceiling 5.74 sk/s.
Interpretation + real-TPU-VM projection recorded in ROADMAP.md item 3b.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import glob
import gzip
import json
import shutil
import tempfile
import time

import numpy as np


from inklayer_tpu.profiling import device_busy_ms  # shared with bench.py


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--device-front", action="store_true")
    args = ap.parse_args()

    import jax

    from inklayer_tpu.build import build_pipeline
    from inklayer_tpu.config import PipelineConfig

    src = "/root/reference/data/bunny_cook_sketch.png"
    import dataclasses
    cfg = PipelineConfig(device_front=args.device_front)
    pipe = build_pipeline(cfg)
    out = tempfile.mkdtemp(prefix="sweep_stall_")
    sweep_in = _os.path.join(out, "in")
    _os.makedirs(sweep_in)
    paths = []
    for i in range(args.n):
        p = _os.path.join(sweep_in, f"sketch_{i}.png")
        shutil.copyfile(src, p)
        paths.append(p)
    try:
        # two warm passes (first compiles, second stabilizes caches)
        pipe.run_dir(paths, out, no_intermediate=True, inpaint=False)
        pipe.run_dir(paths, out, no_intermediate=True, inpaint=False)

        # UNPROFILED wall (the profiler itself costs seconds through the
        # tunnel — its wall time is invalid, only its device track is)
        pipe.stage_times.times.clear()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            pipe.run_dir(paths, out, no_intermediate=True, inpaint=False)
            walls.append((time.perf_counter() - t0) * 1e3)
        wall = float(np.median(walls))
        st = dict(pipe.stage_times.times)

        tdir = _os.path.join(out, "trace")
        with jax.profiler.trace(tdir):
            pipe.run_dir(paths, out, no_intermediate=True, inpaint=False)
        busy, top = device_busy_ms(tdir)
        n = args.n
        print(f"sweep n={n}: wall {wall:.0f} ms ({wall / n:.0f}/img, "
              f"{n / wall * 1e3:.2f} sk/s) [unprofiled, median of 3]")
        print(f"device busy {busy:.0f} ms ({busy / n:.0f}/img) -> "
              f"host/RTT gap {(wall - busy) / n:.0f} ms/img")
        print(f"device-bound ceiling {n / busy * 1e3:.2f} sk/s")
        print("top device ops (profiled pass):")
        for name, dur in top:
            print(f"  {name:44s} {dur / 1e3:9.1f} ms")
        print("stage times (host-observed over the 3 unprofiled runs, s):",
              {k: round(v, 2) for k, v in st.items()})
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
