"""A/B the directory-sweep configurations on the real chip: workers=2 (the
default), workers=3, and batch_size=2/4 batched model dispatches."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import shutil
import tempfile
import time

from inklayer_tpu.build import build_pipeline
from inklayer_tpu.config import PipelineConfig

SRC = "/root/reference/data/bunny_cook_sketch.png"
N = 8

pipe = build_pipeline(PipelineConfig())
out = tempfile.mkdtemp(prefix="inklayer_sweep_")
sweep_in = _os.path.join(out, "in")
_os.makedirs(sweep_in)
paths = []
for i in range(N):
    p = _os.path.join(sweep_in, f"sketch_{i}.png")
    shutil.copyfile(SRC, p)
    paths.append(p)

# warm every compile bucket once
pipe.run(SRC, out, no_intermediate=True, inpaint=False)
pipe.drain()

for label, kw in [
    ("workers=6", dict(workers=6)),
    ("workers=8", dict(workers=8)),
    ("workers=8 (rep)", dict(workers=8)),
    ("workers=6 (rep)", dict(workers=6)),
]:
    pipe.run_dir(paths, out, no_intermediate=True, inpaint=False, **kw)  # warm
    t0 = time.perf_counter()
    pipe.run_dir(paths, out, no_intermediate=True, inpaint=False, **kw)
    dt = time.perf_counter() - t0
    print(f"{label:20s} {N / dt:.2f} sketches/s  ({dt / N * 1e3:.0f} ms/img)",
          flush=True)

shutil.rmtree(out, ignore_errors=True)
