"""Capture an XLA device trace of the SAM ViT-H encoder forward and print
the top ops by total device time.

The trace dir contains a perfetto .trace.json.gz; we aggregate complete
events on the device track by (name prefix) to find where the wall time
goes.  Usage:  python scripts/profile_sam.py [--depth 32] [--out DIR]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT


def build(depth, global_idx):
    model = ImageEncoderViT(
        img_size=1024, patch_size=16, embed_dim=1280, depth=depth,
        num_heads=16, out_chans=256, window_size=14,
        global_attn_indexes=global_idx, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1024, 1024, 3),
                    jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
    params = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16
                           if s.dtype == jnp.float32 else s.dtype), shapes)

    @jax.jit
    def fwd(p, xx):
        return jnp.sum(model.apply(p, xx).astype(jnp.float32))

    return fwd, params, x


def summarize(trace_dir, top=40):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace json found under", trace_dir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device-side process ids (TPU/device track names)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    if not dev_pids:
        print("process names:", sorted(set(pid_names.values())))
        dev_pids = set(pid_names)
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        # strip uniquifying suffixes: fusion.123 -> fusion
        base = name.split(".")[0]
        agg[base] += dur
        cnt[base] += 1
        total += dur
    print(f"\ndevice total {total:.1f} ms across {sum(cnt.values())} events"
          f"  ({path})")
    print(f"{'op':40s} {'total ms':>9s} {'count':>6s}")
    for name, ms in agg.most_common(top):
        print(f"{name:40s} {ms:9.2f} {cnt[name]:6d}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--global-idx", type=str, default="7,15,23,31")
    ap.add_argument("--out", type=str, default="/tmp/sam_trace")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    gidx = tuple(int(i) for i in args.global_idx.split(",")) \
        if args.global_idx else ()
    gidx = tuple(i for i in gidx if i < args.depth)

    fwd, params, x = build(args.depth, gidx)
    t0 = time.perf_counter()
    float(fwd(params, x))
    print(f"compile {time.perf_counter() - t0:.0f}s")
    for _ in range(2):
        float(fwd(params, x))
    t0 = time.perf_counter()
    float(fwd(params, x))
    print(f"warm p50-ish {1e3 * (time.perf_counter() - t0):.1f} ms")

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            float(fwd(params, x))
    summarize(args.out)


if __name__ == "__main__":
    main()
