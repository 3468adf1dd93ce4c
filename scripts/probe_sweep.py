"""Probe run_dir throughput vs worker count (diagnosing the sweep
regression: bench showed 0.55 sk/s sweep vs 2.0 sk/s single)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/inklayer_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import os
import shutil
import tempfile
import time

from inklayer_tpu.build import build_pipeline
from inklayer_tpu.config import PipelineConfig

SRC = "/root/reference/data/bunny_cook_sketch.png"

pipe = build_pipeline(PipelineConfig())
out = tempfile.mkdtemp(prefix="sweep_probe_")
n = 4
paths = []
for i in range(n):
    p = os.path.join(out, f"sketch_{i}.png")
    shutil.copyfile(SRC, p)
    paths.append(p)

# warm every stage
pipe.run(SRC, out, no_intermediate=True, inpaint=False)
pipe.drain()

for workers in (1, 2, 4):
    pipe.run_dir(paths, out, no_intermediate=True, workers=workers)  # warm
    t0 = time.perf_counter()
    pipe.run_dir(paths, out, no_intermediate=True, workers=workers)
    dt = time.perf_counter() - t0
    print(f"workers={workers}: {n / dt:.3f} sketches/s  ({dt:.2f}s total)",
          flush=True)

t0 = time.perf_counter()
for p in paths:
    pipe.run(p, out, no_intermediate=True)
pipe.drain()
dt = time.perf_counter() - t0
print(f"sequential run() loop: {n / dt:.3f} sketches/s ({dt:.2f}s)")
shutil.rmtree(out, ignore_errors=True)
