"""Control-backed floors for the detect stage's dense rows (VERDICT r04 #6).

The round-4 table asserted Swin "~8 ms", decoder "~7.2", "projs + heads +
glue ~9" without per-op evidence.  The round-5 whole-forward class totals
(profile_gdino_roofline.py) reattribute the budget:

  pallas attn (6 enc deform + 12 dec)  37.90 ms x  18
  layout/copy glue                      9.28 ms x1455   <- the asserted rows
  other fusions (matmul+elementwise)    6.30 ms x 986      mostly live HERE
  convert fusions                       1.19 ms x 389
  convolution fusions                   0.97 ms x  77

This script supplies the controls:
  1. per-submodule (Swin / BERT / transformer) chained p50 + profiler-trace
     class totals + XLA flop counts -> how much of each row is dense work
     vs layout/copy, and the realized dense rate
  2. tiny-op ISSUE FLOOR: a chain of barrier-separated micro-ops measures
     the per-op device issue cost — if the layout/copy ops sit at that
     floor x count, the glue budget is op-count-bound (the fix would be
     fewer ops, and XLA already fused everything it can), not a slow-copy
     bug
  3. dense-rate control: the conv/matmul controls
     (ablate_conv_matmul_controls.py) price small-K/N matmuls at 8-45% —
     the fusion classes are compared against those rates

Usage: python scripts/ablate_gdino_dense.py

Measured 2026-08-21 (v5e) — BASELINE.md "Detect stage roofline (round 5
update)":
  tiny-op issue floor: slope ~0 us/op (512- vs 2048-op barrier chains
    time the same — micro-op issue is fully pipelined), so the traced
    6-8 us/op for layout/copy ops is DATA MOVEMENT, not launch overhead:
    6.6 us x ~800 GB/s ~= 5 MB, exactly the per-level feature tensors.
  Swin-T:      device 6.10 ms = 2.77 dense @23.3% of peak (121 fusions —
    49-token window matmuls, consistent with the small-K matmul controls)
    + 2.37 layout/copy (285 ops, window partition/reverse) + 0.59 convs
  BERT:        device 0.58 ms (1.1 G — launch-bound, cached per caption)
  transformer: device 50.60 ms = 37.9 pallas attn (30.7 enc deformable,
    floor-proven r2-4; 7.2 dec small-shape) + 6.79 layout/copy (1030 ops
    — per-level split/flatten/gather feeding the deformable kernels)
    + 3.24 dense @59.0% of peak + 0.95 convert
  Sum 57.3 ms ~= the 57.7 ms whole-forward trace: the round-4 "~9 ms
  projs+heads+glue" row was mostly this structural data movement.
  No >=2 ms harvest: dense fusions already run at 59% (transformer) /
  the small-window shape rate (Swin); copies are BW-bound feature moves
  whose elimination would require fusing the per-level deformable
  interface into one kernel (the v1-v5 kernel design trades exactly the
  other way, and is itself floor-proven).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/inklayer_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import collections
import glob
import gzip
import json
import tempfile
import time

import numpy as np

V5E_BF16_PEAK = 197e12


def klass(nm):
    base = nm.split(".")[0]
    if base in ("self_attn", "cross_attn", "flash_attention", "win_attn"):
        return "pallas attn"
    if base in ("copy", "reshape", "transpose", "bitcast", "pad", "slice",
                "concatenate", "dynamic-slice"):
        return "layout/copy"
    if base.startswith("convert"):
        return "convert fusions"
    if "conv" in base:
        return "conv fusions"
    if "fusion" in base or base == "dot":
        return "matmul/elt fusions"
    return "misc"


def trace_classes(fn, *args):
    import jax

    tdir = tempfile.mkdtemp(prefix="gdd_trace_")
    with jax.profiler.trace(tdir):
        float(fn(*args))
    path = max(glob.glob(_os.path.join(tdir, "**", "*.trace.json.gz"),
                         recursive=True), key=_os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Chip" in n or "/device" in n.lower()}
    agg, cnt = collections.Counter(), collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            nm = e["name"]
            if nm.startswith(("jit_", "while")) or nm.endswith(
                    ("-start", "-done")):
                continue
            agg[klass(nm)] += e["dur"]
            cnt[klass(nm)] += 1
    return agg, cnt


def main():
    import jax
    import jax.numpy as jnp

    from inklayer_tpu.config import GDinoConfig
    from inklayer_tpu.models.gdino.bert import BertEncoder, subsentence_masks
    from inklayer_tpu.models.gdino.swin import SwinTransformer
    from inklayer_tpu.models.gdino.transformer import (GDinoTransformer,
                                                       sine_pos_embed_hw)

    CFG = GDinoConfig()
    DT = jnp.bfloat16

    # ---- tiny-op issue floor ------------------------------------------
    # two chain lengths; the slope cancels the ~24 ms tunnel RTT
    def make_chain(n):
        @jax.jit
        def issue_chain(x):
            for _ in range(n):
                x = jax.lax.optimization_barrier(x * 1.000001)
            return x.sum()
        return issue_chain

    x0 = jnp.ones((8, 128), jnp.float32)
    med = {}
    for n in (512, 2048):
        ch = make_chain(n)
        float(ch(x0))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(ch(x0))
            ts.append(time.perf_counter() - t0)
        med[n] = float(np.median(ts))
    per = (med[2048] - med[512]) / (2048 - 512) * 1e6
    print(f"tiny-op issue floor: {per:.2f} us/op (slope of 512- vs "
          f"2048-op barrier chains of (8,128) multiplies; RTT cancelled)")

    # ---- submodules ----------------------------------------------------
    img = jax.jit(lambda k: jax.random.normal(k, (1, 800, 800, 3), DT))(
        jax.random.key(0))
    pad = jnp.zeros((1, 800, 800), bool)
    ids = np.asarray([[101, 4874, 1012, 102, 0, 0]], np.int32)
    attn, pos = subsentence_masks(ids)
    ids_j, attn_j = jnp.asarray(ids), jnp.asarray(attn)
    pos_j = jnp.asarray(pos.astype(np.int32))

    shapes_hw = [(100, 100), (50, 50), (25, 25), (13, 13)]
    srcs = [jax.jit(lambda k, h=h, w=w: jax.random.normal(
        k, (1, h, w, 256), DT))(jax.random.key(i))
        for i, (h, w) in enumerate(shapes_hw)]
    masks = [jnp.zeros((1, h, w), bool) for h, w in shapes_hw]
    poses = [sine_pos_embed_hw(m, 128, 20.0, 20.0).astype(DT) for m in masks]
    text = jax.jit(lambda k: jax.random.normal(k, (1, 6, 256), DT))(
        jax.random.key(9))
    tok_mask = jnp.asarray(ids != 0)

    subs = [
        ("Swin-T", SwinTransformer(CFG.swin, dtype=DT), (img, pad)),
        ("BERT", BertEncoder(CFG.bert, dtype=DT), (ids_j, attn_j, pos_j)),
        ("transformer", GDinoTransformer(CFG, dtype=DT),
         (srcs, masks, poses, text, tok_mask, attn_j, pos_j)),
    ]
    for name, model, args in subs:
        shapes = jax.eval_shape(lambda k: model.init(k, *args),
                                jax.random.key(0))
        params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype),
                              shapes)

        @jax.jit
        def fwd(p, *a):
            out = model.apply(p, *a)
            leaves = [z for z in jax.tree_util.tree_leaves(out)
                      if hasattr(z, "dtype")
                      and jnp.issubdtype(z.dtype, jnp.floating)]
            return sum(jnp.sum(z.astype(jnp.float32)) for z in leaves)

        t0 = time.perf_counter()
        float(fwd(params, *args))
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(fwd(params, *args))
            ts.append((time.perf_counter() - t0) * 1e3)
        p50 = float(np.percentile(ts, 50))
        try:
            flops = jax.jit(lambda p, *a: model.apply(p, *a)).lower(
                params, *args).compile().cost_analysis()["flops"]
        except Exception:  # noqa: BLE001
            flops = float("nan")
        agg, cnt = trace_classes(fwd, params, *args)
        dev = sum(agg.values()) / 1e3
        print(f"\n{name}: wall p50 {p50:.1f} ms, traced device {dev:.2f} ms,"
              f" XLA flops {flops / 1e9:.1f} G (compile {comp:.0f}s)")
        for k, dur in agg.most_common(8):
            per = dur / max(cnt[k], 1)
            print(f"  {dur / 1e3:7.2f} ms x{cnt[k]:5d} ({per:5.1f} us/op)"
                  f"  {k}")
        mm = agg.get("matmul/elt fusions", 0) / 1e3
        if mm and np.isfinite(flops):
            rate = flops / (mm / 1e3) / V5E_BF16_PEAK * 100
            print(f"  dense rate: {rate:.1f}% of peak over the matmul/elt "
                  f"fusions alone")


if __name__ == "__main__":
    main()
