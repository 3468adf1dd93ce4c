import os, sys, time, shutil, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/inklayer_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
from inklayer_tpu.build import build_pipeline
from inklayer_tpu.config import PipelineConfig

SRC = "/root/reference/data/bunny_cook_sketch.png"
pipe = build_pipeline(PipelineConfig())
out = tempfile.mkdtemp(prefix="inklayer_sweep_")
sweep_in = os.path.join(out, "in")
os.makedirs(sweep_in)
paths = []
for i in range(6):
    p = os.path.join(sweep_in, f"sk_{i}.png")
    shutil.copyfile(SRC, p)
    paths.append(p)
try:
    for wk in (1, 2, 3):
        pipe.run_dir(paths[:2], out, no_intermediate=True, workers=wk)  # warm
        t0 = time.perf_counter()
        pipe.run_dir(paths, out, no_intermediate=True, workers=wk)
        dt = time.perf_counter() - t0
        print(f"workers={wk}: {dt:.2f}s for 6 = {6/dt:.2f} sketches/s", flush=True)
finally:
    shutil.rmtree(out, ignore_errors=True)
