"""Full-pipeline profile on the real chip: stage times + host/IO breakdown.

Wraps the host-side writers (readbacks, PNG encodes, colorization) with
timers to locate the ~0.3-0.4s host residue seen in round 2.
"""

import os
import shutil
import tempfile
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/inklayer_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import inklayer_tpu.io.outputs as io_out
import inklayer_tpu.ops.bits as bits
import inklayer_tpu.ops.color as color
from inklayer_tpu.build import build_pipeline
from inklayer_tpu.config import PipelineConfig

DATA = "/root/reference/data/bunny_cook_sketch.png"

acc = {}


def wrap(mod, name):
    fn = getattr(mod, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0
        return out

    setattr(mod, name, timed)


wrap(io_out, "save_masks_dir")
wrap(io_out, "draw_boxes_image")
wrap(bits, "disjoint_masks_to_host")
wrap(bits, "masks_to_host")
wrap(color, "color_sketch_by_masks")

# runner imported these symbols directly; re-point them
import inklayer_tpu.pipeline.runner as runner  # noqa: E402

runner.io_out = io_out
runner.color_sketch_by_masks = color.color_sketch_by_masks

pipe = build_pipeline(PipelineConfig())
out = tempfile.mkdtemp(prefix="inklayer_prof_")
try:
    pipe.run(DATA, out, no_intermediate=True, inpaint=False)  # warm
    pipe.drain()
    pipe.stage_times.times.clear()
    acc.clear()
    for it in range(3):
        t0 = time.perf_counter()
        pipe.run(DATA, out, no_intermediate=True, inpaint=False)
        pipe.drain()
        print(f"iter {it}: {(time.perf_counter() - t0) * 1e3:.0f} ms")
    print("\nstage times (3 iters):")
    for k, v in sorted(pipe.stage_times.times.items()):
        print(f"  {k:10s} {v / 3 * 1e3:8.1f} ms")
    print("host/IO pieces (3 iters):")
    for k, v in sorted(acc.items()):
        print(f"  {k:24s} {v / 3 * 1e3:8.1f} ms")
finally:
    shutil.rmtree(out, ignore_errors=True)

# --- device trace of one warm run (run with PROFILE_TRACE=1) ---------------
if os.environ.get("PROFILE_TRACE"):
    import jax
    out2 = tempfile.mkdtemp(prefix="inklayer_prof_trace_")
    with jax.profiler.trace("/tmp/pipe_trace"):
        pipe.run(DATA, out2, no_intermediate=True)
        pipe.drain()
    shutil.rmtree(out2, ignore_errors=True)
    print("trace written to /tmp/pipe_trace")
