"""Decompose the workers=4 sweep stall budget.  (VERDICT r04 next #1a)

The round-4 artifact shows sweep 4.16 sk/s against a 7.4 sk/s device-busy
ceiling: ~240 ms wall/img vs 135.5 ms busy, with 2 syncs x ~24 ms RTT
covering <=48 ms — leaving ~55-100 ms/img unattributed.  This script gives
that gap names, on the REAL workers=4 path (4 concurrent run() threads on a
1-CPU host):

  * wall (median of 3 unprofiled warm sweeps)
  * device busy (profiler trace device track) -> occupancy + ceiling
  * TOTAL host CPU demand across all threads (process_time delta) — on a
    1-core box host work is strictly serial regardless of thread count, so
    host_cpu/img vs wall/img decides whether the host core is the wall
  * per-function host CPU + wall, attributed by monkeypatched wrappers
    around the known host hotspots (PNG encode, PNG decode/convert,
    grayscale, mask bit-unpack, colorization, final batched readback,
    uploads).  wrapper cpu ~= compute the GIL must serialize; wall-cpu ~=
    blocking (transport/device wait, or GIL wait under contention).

Usage: python scripts/analyze_sweep_stalls4.py [--n 8] [--workers 4]

Measured 2026-08-21 (quiet host, n=8 warm sweep, workers=4, subset path,
median of 3) — see BASELINE.md "Sweep stall budget (round 5)":

  BEFORE the round-5 host attacks: wall 283/img, host CPU 223/img
  (PNG encode 95, colorize 37) -> 3.5-4.2 sk/s.
  AFTER native filter-0 PNG + LUT colorizer:       208/img wall, 106 host
  AFTER bilevel masks + input byte-copy + native integral:
    wall 183/img (5.45 sk/s on the ramp-included n=8 probe; bench n=16
    steady-state: 6.01), device busy 136/img -> occupancy 74% (n=8) /
    81% (n=16), HOST CPU 72/img = 39% of the core — the host core is NO
    LONGER the wall.  Largest remaining host items: save_png 19.9 cpu
    (3 calls: bboxes_final/depth_map/segmented_final), colorize_lut 11.6,
    png_decode 8.1, unattributed glue 23.6.  workers=6 probe REGRESSED
    (5.07: more GIL contention, worse ramp at n=8) — 4 stays.
  The residual gap to the 7.38 ceiling is device idle during the 2
  syncs/img x ~24 ms RTT that 4 workers cannot fully hide through this
  tunnel; on PCIe-local TPU VMs (~0.2 ms dispatch) the same structure
  projects to the ceiling.

  --device-front re-probe (the r3 transport made it a loss; r4 transport
  is dependency-only): STILL a loss, for a different reason — 4.30 sk/s,
  device busy 136 -> 177 ms/img: the device-front path cleans the full
  capacity-64 mask stack, forfeiting the r4 subset-clean win (clean only
  prefilter survivors).  Its ceiling drops to 5.64 < the default path's
  achieved 6.0.  Default stays off; marrying device_front with
  survivor-subset cleaning would need the prefilter gates on device
  before mask materialization (a r6 candidate, not attempted).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import shutil
import tempfile
import threading
import time
from collections import defaultdict

import numpy as np

from inklayer_tpu.profiling import device_busy_ms


class Acct:
    """Thread-safe per-key (cpu_s, wall_s, calls) accumulator."""

    def __init__(self):
        self.lock = threading.Lock()
        self.cpu = defaultdict(float)
        self.wall = defaultdict(float)
        self.calls = defaultdict(int)

    def wrap(self, key, fn):
        def wrapped(*a, **kw):
            c0, w0 = time.thread_time(), time.perf_counter()
            try:
                return fn(*a, **kw)
            finally:
                dc = time.thread_time() - c0
                dw = time.perf_counter() - w0
                with self.lock:
                    self.cpu[key] += dc
                    self.wall[key] += dw
                    self.calls[key] += 1
        return wrapped

    def reset(self):
        with self.lock:
            self.cpu.clear(); self.wall.clear(); self.calls.clear()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--device-front", action="store_true",
                    help="probe cfg.device_front=True (r3 transport made "
                    "it a loss; the r4 dependency-only transport may not)")
    args = ap.parse_args()

    import jax  # noqa: F401  (device init before timing)
    from PIL import Image

    import inklayer_tpu.io.outputs as io_out
    import inklayer_tpu.ops.bits as bits
    import inklayer_tpu.pipeline.runner as runner_mod
    from inklayer_tpu.build import build_pipeline
    from inklayer_tpu.config import PipelineConfig

    acct = Acct()

    # ---- instrument the host hotspots --------------------------------
    _orig_save = Image.Image.save

    def _save_keyed(self, fp, *a, **kw):
        name = _os.path.basename(str(fp))
        if name.startswith("mask_"):
            key = "png_encode[masks]"
        elif name.startswith(("input", "depth", "segmented")):
            key = f"png_encode[{name.split('.')[0].split('_')[0]}]"
        else:
            key = "png_encode[other]"
        c0, w0 = time.thread_time(), time.perf_counter()
        try:
            return _orig_save(self, fp, *a, **kw)
        finally:
            with acct.lock:
                acct.cpu[key] += time.thread_time() - c0
                acct.wall[key] += time.perf_counter() - w0
                acct.calls[key] += 1

    Image.Image.save = _save_keyed
    Image.Image.convert = acct.wrap("png_decode(Image.convert)",
                                    Image.Image.convert)
    runner_mod._to_gray = acct.wrap("grayscale", runner_mod._to_gray)
    bits.masks_to_host = acct.wrap("mask_bit_unpack", bits.masks_to_host)
    bits.batched_final_readback = acct.wrap("final_readback(sync)",
                                            bits.batched_final_readback)
    runner_mod.color_sketch_by_masks = acct.wrap(
        "colorize", runner_mod.color_sketch_by_masks)
    runner_mod.color_sketch_by_label_map = acct.wrap(
        "colorize_lut", runner_mod.color_sketch_by_label_map)
    runner_mod.upload_image = acct.wrap("upload", runner_mod.upload_image)
    io_out.save_norm_bboxes = acct.wrap("json_writes", io_out.save_norm_bboxes)
    io_out.save_masks_dir = acct.wrap("save_masks(fastpng)",
                                      io_out.save_masks_dir)
    _orig_save_png = io_out.save_png
    io_out.save_png = acct.wrap("save_png(fastpng)", _orig_save_png)
    runner_mod.io_out.save_png = io_out.save_png
    from inklayer_tpu.pipeline.refine import nms as nms_mod
    nms_mod.nms_host_prefilter = acct.wrap("nms_prefilter",
                                           nms_mod.nms_host_prefilter)

    # every data-dependent sync funnels through jax.device_get (detect
    # finalize, NMS front, final readback).  CPU inside it ~0 (waiting);
    # its wall overlaps the final_readback wrapper's wall — report-only,
    # excluded from the attributed-cpu total by its near-zero cpu.
    jax.device_get = acct.wrap("device_get_wait(sync)", jax.device_get)

    import dataclasses

    cfg = PipelineConfig()
    if args.device_front:
        cfg = dataclasses.replace(cfg, device_front=True)
    pipe = build_pipeline(cfg)

    src = "/root/reference/data/bunny_cook_sketch.png"
    out = tempfile.mkdtemp(prefix="sweep_stall4_")
    sweep_in = _os.path.join(out, "in")
    _os.makedirs(sweep_in)
    paths = []
    for i in range(args.n):
        p = _os.path.join(sweep_in, f"sketch_{i}.png")
        shutil.copyfile(src, p)
        paths.append(p)
    kw = dict(no_intermediate=True, inpaint=False)
    if args.workers is not None:
        kw["workers"] = args.workers
    n = args.n
    try:
        pipe.run_dir(paths, out, **kw)   # compile
        pipe.run_dir(paths, out, **kw)   # stabilize caches
        acct.reset()
        walls, cpus = [], []
        for _ in range(args.reps):
            c0 = time.process_time()
            t0 = time.perf_counter()
            pipe.run_dir(paths, out, **kw)
            walls.append((time.perf_counter() - t0) * 1e3)
            cpus.append((time.process_time() - c0) * 1e3)
        wall = float(np.median(walls))
        cpu = float(np.median(cpus))
        reps = args.reps

        acct_snapshot = (dict(acct.cpu), dict(acct.wall), dict(acct.calls))

        tdir = _os.path.join(out, "trace")
        with jax.profiler.trace(tdir):
            pipe.run_dir(paths, out, **kw)
        busy, top = device_busy_ms(tdir)
        # per-function numbers must cover ONLY the timed sweeps (the traced
        # pass would inflate them by (reps+1)/reps)
        acct.cpu, acct.wall, acct.calls = (defaultdict(float, acct_snapshot[0]),
                                           defaultdict(float, acct_snapshot[1]),
                                           defaultdict(int, acct_snapshot[2]))

        print(f"sweep n={n} workers={kw.get('workers', cfg.sweep_workers)}: "
              f"wall {wall:.0f} ms ({wall / n:.0f}/img, "
              f"{n / wall * 1e3:.2f} sk/s) [median of {reps}]")
        print(f"device busy {busy:.0f} ms ({busy / n:.0f}/img) -> "
              f"occupancy {busy / wall * 100:.0f}%, "
              f"ceiling {n / busy * 1e3:.2f} sk/s")
        print(f"HOST CPU demand {cpu:.0f} ms ({cpu / n:.0f}/img) = "
              f"{cpu / wall * 100:.0f}% of one core "
              f"(1-CPU box: >90% means the host core IS the wall)")
        print(f"\nper-function attribution (summed over {reps} timed sweeps; "
              f"/img = /{n * reps}):")
        print(f"  {'key':28s} {'cpu ms/img':>10s} {'wall ms/img':>11s} "
              f"{'calls/img':>9s}")
        tot_cpu = 0.0
        for key in sorted(acct.cpu, key=lambda k: -acct.cpu[k]):
            c = acct.cpu[key] * 1e3 / (n * reps)
            w = acct.wall[key] * 1e3 / (n * reps)
            tot_cpu += c
            print(f"  {key:28s} {c:10.1f} {w:11.1f} "
                  f"{acct.calls[key] / (n * reps):9.1f}")
        print(f"  {'[attributed total]':28s} {tot_cpu:10.1f}")
        print(f"  {'[unattributed host cpu]':28s} {cpu / n - tot_cpu:10.1f}"
              f"   (jax dispatch glue, numpy prefilter, json, thread sched)")
        print("\ntop device ops (profiled pass):")
        for name, dur in top[:8]:
            print(f"  {name:44s} {dur / 1e3:9.1f} ms")
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
