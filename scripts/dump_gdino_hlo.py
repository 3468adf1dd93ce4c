"""Dump the optimized HLO of the GDINO detect forward to /tmp/gdino_hlo.txt
and print the definition lines of interesting fusions (trace correlation)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import jax
import jax.numpy as jnp
import numpy as np
from inklayer_tpu.build import build_detector
from inklayer_tpu.config import PipelineConfig

det = build_detector(PipelineConfig())
img = np.zeros((750, 750, 3), np.uint8)
args = det.prepare_args(img) if hasattr(det, "prepare_args") else None
# reproduce what detect_dispatch traces: use the jit's lower() on the same args
import inspect
# fall back: monkeypatch jax.jit call to capture args
orig = det._jit
captured = {}
class Cap:
    def __call__(self, *a, **k):
        captured["a"] = a
        return orig(*a, **k)
det._jit = Cap()
det.detect_dispatch(img)()
det._jit = orig
lowered = jax.jit(det._forward).lower(*captured["a"])
txt = lowered.compile().as_text()
open("/tmp/gdino_hlo.txt", "w").write(txt)
print(f"wrote /tmp/gdino_hlo.txt ({len(txt.splitlines())} lines)")
pats = sys.argv[1:] or ["fusion.4444", "convert_reduce_fusion.1 ", "fusion.582",
                        "copy.4275", "fusion.587", "fusion.936", "copy.4281",
                        "copy.4297", "fusion.1079", "add_add_fusion"]
for line in txt.splitlines():
    s = line.strip()
    head = s.split(" = ")[0].lstrip("%") + " "
    for p in pats:
        if head.startswith(p.strip() + " "):
            print(s[:320]); break
