"""Benchmark: p50 single-sketch detect+segment latency on the current
backend (BASELINE.json metric).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

vs_baseline is the speedup over the CPU-backend reference time for the same
workload, read from BASELINE_CPU.json (generate once with --calibrate-cpu;
that runs the identical compute path on XLA:CPU — the closest available
stand-in for the reference's CPU torch path, which cannot run here: no
GPU, no reference weights, torchvision/timm absent).

Measurement notes (see .claude/skills/verify/SKILL.md): the axon tunnel adds
~35ms per dispatch and async-dispatch timing lies, so every timed iteration
ends in a tiny scalar readback that forces completion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/inklayer_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BASELINE_CPU.json")
DATA = "/root/reference/data/bunny_cook_sketch.png"


def build_workload():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from inklayer_tpu.config import GDinoConfig, SamConfig
    from inklayer_tpu.models.gdino import GroundingDINO
    from inklayer_tpu.models.gdino.bert import subsentence_masks
    from inklayer_tpu.models.gdino.gdino import IMAGENET_MEAN, IMAGENET_STD, top_detections
    from inklayer_tpu.models.sam import Sam
    from inklayer_tpu.ops.image import resize_scale, scale_pad_normalize

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    gcfg = GDinoConfig()
    scfg = SamConfig()
    gmodel = GroundingDINO(gcfg, dtype=dtype)
    smodel = Sam(scfg, dtype=dtype)

    if os.path.exists(DATA):
        img = np.asarray(Image.open(DATA).convert("RGB"))
    else:
        img = (np.random.default_rng(0).random((750, 750, 3)) * 255).astype(np.uint8)
    h, w = img.shape[:2]

    bucket = (800, 800)
    ids = np.asarray([[101, 4874, 1012, 102]], np.int32)
    attn, pos = subsentence_masks(ids)
    g_args = (jnp.zeros((1,) + bucket + (3,)), jnp.zeros((1,) + bucket, bool),
              jnp.asarray(ids), jnp.asarray(attn),
              jnp.asarray(pos.astype(np.int32)))

    def fill(shapes):
        # bf16 param storage on TPU: fp32 params cost a convert + 2x HBM
        # reads inside every consumer matmul fusion
        return jax.tree.map(
            lambda s: jnp.full(
                s.shape, 0.01,
                dtype if s.dtype == jnp.float32 else s.dtype), shapes)

    gparams = fill(jax.eval_shape(lambda k: gmodel.init(k, *g_args),
                                  jax.random.key(0)))
    s_img = jnp.zeros((1, 1024, 1024, 3))
    s_boxes = jnp.zeros((16, 4))
    sparams = fill(jax.eval_shape(lambda k: smodel.init(k, s_img, s_boxes),
                                  jax.random.key(1)))

    device_img = jnp.asarray(img)
    gscale = resize_scale((h, w), bucket, "shortest")
    gscale = min(gscale, bucket[0] / h, bucket[1] / w)
    sscale = resize_scale((h, w), (1024, 1024), "longest")
    pad_mask = np.ones((1,) + bucket, bool)
    pad_mask[:, : int(round(h * gscale)), : int(round(w * gscale))] = False
    pad_mask = jnp.asarray(pad_mask)

    @jax.jit
    def detect_segment(gp, sp, raw_img):
        """Full detect+segment for one sketch, fused into ONE dispatch:
        preprocess -> GDINO -> top-16 boxes -> SAM encode -> decode masks."""
        gpre = scale_pad_normalize(raw_img, jnp.float32(gscale),
                                   IMAGENET_MEAN, IMAGENET_STD, bucket)
        logits, boxes = gmodel.apply(gp, gpre[None], pad_mask, *g_args[2:])
        scores, top_boxes, _ = top_detections(logits, boxes, 16)
        # cxcywh normalized -> xyxy in SAM 1024-space
        b = top_boxes[0]
        xyxy = jnp.stack([
            (b[:, 0] - b[:, 2] / 2) * w, (b[:, 1] - b[:, 3] / 2) * h,
            (b[:, 0] + b[:, 2] / 2) * w, (b[:, 1] + b[:, 3] / 2) * h,
        ], axis=-1) * sscale
        spre = scale_pad_normalize(raw_img, jnp.float32(sscale),
                                   scfg.pixel_mean, scfg.pixel_std, (1024, 1024))
        emb = smodel.apply(sp, spre[None], method=Sam.encode)
        mask_logits, iou = smodel.apply(sp, emb, xyxy, method=Sam.decode_boxes)
        # tiny readback forces real completion through the tunnel
        return (scores.sum() + mask_logits.astype(jnp.float32).sum()
                + iou.astype(jnp.float32).sum())

    return detect_segment, gparams, sparams, device_img


def measure(iters: int = 10):
    fn, gp, sp, img = build_workload()
    t0 = time.perf_counter()
    float(fn(gp, sp, img))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(gp, sp, img))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(times, 50)), compile_s, times


def measure_throughput(batch: int = 4, iters: int = 5):
    """Sketches/sec: B sketches through the fused detect+segment per launch
    (directory-sweep batching, BASELINE.json config 2)."""
    import glob

    import jax
    import jax.numpy as jnp
    from PIL import Image

    fn, gp, sp, _ = build_workload()
    paths = sorted(glob.glob("/root/reference/data/*.png"))[:batch] or [DATA]
    imgs = []
    for p in paths:
        arr = np.asarray(Image.open(p).convert("RGB").resize((750, 750)))
        imgs.append(arr)
    while len(imgs) < batch:
        imgs.append(imgs[-1])
    batch_imgs = [jnp.asarray(x) for x in imgs]

    # sequential launches over the batch, one warm pass first
    for im in batch_imgs:
        float(fn(gp, sp, im))
    t0 = time.perf_counter()
    for _ in range(iters):
        vals = [fn(gp, sp, im) for im in batch_imgs]
        for v in vals:
            float(v)  # force completion
    dt = time.perf_counter() - t0
    return batch * iters / dt


# Round-3 measured tunnel RTT band: 24-35 ms per host<->device sync.  A
# capture whose measured RTT exceeds this baseline materially is weather,
# not a code regression — the WEATHER flag makes that decidable from the
# artifact alone (VERDICT r03 next #1/#7).
RTT_BASELINE_MS = 35.0


def measure_rtt_ms(n: int = 12) -> float:
    """Median round-trip of a trivial jitted scalar readback — the per-sync
    transport cost every data-dependent host sync pays."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.float32(0)
    float(f(x))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def weather_flag(rtt_ms: float, times_ms,
                 rtt_baseline: float = RTT_BASELINE_MS,
                 host_load: float = 0.0) -> str:
    """'OK' or a WEATHER message.  Flags (a) transport RTT above the
    recorded baseline band, (b) high run-to-run spread in the timed iters,
    (c) a busy host (the e2e path has real host-side PNG/NMS work; a loaded
    machine inflates it — measured 516 -> 630 ms p50 under a concurrent
    test-suite run with RTT unchanged) — any of these makes the capture
    unrepresentative of the code."""
    msgs = []
    if rtt_ms > rtt_baseline * 1.25:
        msgs.append(f"rtt {rtt_ms:.1f} ms > {rtt_baseline:.0f} ms baseline")
    if len(times_ms) >= 2:
        spread = max(times_ms) / max(min(times_ms), 1e-9)
        if spread > 1.4:
            msgs.append(f"iter spread {spread:.2f}x (max/min)")
    # the bench itself keeps ~1 core busy; flag only EXTRA load beyond
    # our own (this box reports a single CPU — any concurrent work there
    # directly serializes against the pipeline's host path)
    ncpu = os.cpu_count() or 1
    if host_load > 1.0 + 0.5 * ncpu:
        msgs.append(f"host load {host_load:.1f} on {ncpu} cpus")
    return "WEATHER: " + "; ".join(msgs) if msgs else "OK"


def assemble_e2e_fields(times_ms, sweep_ts_s, n_sweep, syncs_per_img,
                        busy_ms_per_img, rtt_ms,
                        host_load: float = 0.0) -> dict:
    """Pure assembly of the e2e attribution fields (schema pinned by
    tests/test_bench_schema.py)."""
    p50 = float(np.percentile(times_ms, 50))
    fields = {
        "e2e_full_pipeline_p50_ms": round(p50, 1),
        "e2e_full_pipeline_min_ms": round(float(min(times_ms)), 1),
        "e2e_iters": len(times_ms),
        "e2e_sketches_per_sec_per_chip": round(1e3 / p50, 3),
        "e2e_sweep_sketches_per_sec_per_chip":
            round(n_sweep / float(np.median(sweep_ts_s)), 3),
        "e2e_sweep_best_sketches_per_sec_per_chip":
            round(n_sweep / float(min(sweep_ts_s)), 3),
        "syncs_per_img": round(float(syncs_per_img), 2),
        "device_busy_ms_per_img": (round(float(busy_ms_per_img), 1)
                                   if busy_ms_per_img is not None else None),
        "rtt_ms": round(rtt_ms, 1),
        "rtt_baseline_ms": RTT_BASELINE_MS,
        "host_load_1m": round(float(host_load), 2),
    }
    fields["weather"] = weather_flag(rtt_ms, times_ms, host_load=host_load)
    return fields


def measure_full_pipeline(iters: int = 5):
    """Warm FULL pipeline (detect -> segment -> clean -> NMS -> depth ->
    refine -> output contract, --no_intermediate) — the BASELINE.json
    'sketches/sec per chip end-to-end' metric.  Covers everything the
    reference's run_inklayer_pipeline does except inpainting (runner.py:21-103
    scope; --inpaint is a separate opt-in stage there too).

    Returns the attribution dict from assemble_e2e_fields: min/median over
    >=iters runs, per-image host-sync count, device-busy ms/img from one
    profiler-traced run, and the measured transport RTT + WEATHER flag."""
    import shutil
    import tempfile

    from inklayer_tpu.build import build_pipeline
    from inklayer_tpu.config import PipelineConfig

    pipe = build_pipeline(PipelineConfig())
    out = tempfile.mkdtemp(prefix="inklayer_bench_")
    src = DATA if os.path.exists(DATA) else None
    if src is None:
        from PIL import Image

        src = os.path.join(out, "synth.png")
        arr = (np.random.default_rng(0).random((750, 750, 3)) * 255
               ).astype(np.uint8)
        Image.fromarray(arr).save(src)
    try:
        pipe.run(src, out, no_intermediate=True, inpaint=False)  # warm/compile
        pipe.drain()
        sync0 = pipe.sync_count
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            pipe.run(src, out, no_intermediate=True, inpaint=False)
            pipe.drain()
            times.append(time.perf_counter() - t0)
        syncs_per_img = (pipe.sync_count - sync0) / iters

        # one traced run for the device-busy attribution (the traced run's
        # wall time is invalid through the tunnel; only its device track
        # is read)
        busy_per_img = None
        try:
            import jax

            from inklayer_tpu.profiling import device_busy_ms

            tdir = os.path.join(out, "_trace")
            with jax.profiler.trace(tdir):
                pipe.run(src, out, no_intermediate=True, inpaint=False)
                pipe.drain()
            busy_per_img, _ = device_busy_ms(tdir)
        except Exception:
            pass

        # directory-sweep mode: run_dir overlaps host IO / readbacks of
        # image i with device compute of image i+1 — the BASELINE
        # "sketches/sec per chip" production configuration.  Same image
        # under distinct names keeps every stage in one compile bucket.
        # 16 images (r05, was 8/4): sweep throughput is a steady-state
        # metric; with 4 concurrent workers the pipeline's fill/drain
        # edges span ~4 images at each end — measured n=8 4.6-4.8 sk/s vs
        # n=16 5.3-5.8 on identical code (analyze_sweep_stalls4.py).  The
        # reference demo dir itself has 15 sketches.
        n_sweep = 16
        sweep_in = os.path.join(out, "_sweep_in")
        os.makedirs(sweep_in, exist_ok=True)
        paths = []
        for i in range(n_sweep):
            p = os.path.join(sweep_in, f"sketch_{i}.png")
            shutil.copyfile(src, p)
            paths.append(p)
        cc_noise = pipe.cc_cap_hits
        pipe.run_dir(paths, out, no_intermediate=True, inpaint=False)  # warm
        # median of 5: one-sample sweep timings vary ~20-30% through the
        # tunnel (measured 1.79 vs 2.38 sk/s for identical warm runs)
        sweep_ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            pipe.run_dir(paths, out, no_intermediate=True, inpaint=False)
            sweep_ts.append(time.perf_counter() - t0)
        cc_noise = (pipe.cc_cap_hits - cc_noise) / 6 / n_sweep
        rtt_ms = measure_rtt_ms()
        blob_fields = _blob_probe(pipe, src, out)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    try:
        host_load = os.getloadavg()[0]
    except OSError:
        host_load = 0.0
    fields = assemble_e2e_fields([t * 1e3 for t in times], sweep_ts, n_sweep,
                                 syncs_per_img, busy_per_img, rtt_ms,
                                 host_load)
    fields["cc_cap_hits_per_img_noise"] = round(float(cc_noise), 2)
    fields.update(blob_fields)
    return fields


def _blob_probe(pipe, src: str, out: str, iters: int = 4) -> dict:
    """Realistic-mask-statistics probe (VERDICT r04 next #7): placeholder
    weights make SAM emit near-noise masks, which push CC iteration counts
    to the cap and skew the cleaning/NMS/refine cost profile.  This probe
    keeps EVERY device stage identical (the real decode still runs and its
    cost is paid) but swaps its output for compact elliptical blobs — the
    statistics real checkpoint masks have — and re-measures p50, device
    busy and cc-cap hits so the device-bound ceiling can be quoted for
    realistic content."""
    import jax
    import jax.numpy as jnp

    sam = pipe.sam
    orig = sam.masks_from_lowres
    blob_cache = {}

    def blobs_for(cap, h, w):
        key = (cap, h, w)
        if key not in blob_cache:
            k = np.arange(cap)
            gx, gy = k % 5, k // 5  # centers on a 5-column grid
            cy = (0.15 + 0.7 * (gy % 5) / 4.0)[:, None, None] * h
            cx = (0.1 + 0.8 * gx / 4.0)[:, None, None] * w
            yy = np.arange(h)[None, :, None]
            xx = np.arange(w)[None, None, :]
            ry, rx = 0.16 * h, 0.13 * w
            m = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) < 1.0
            blob_cache[key] = jnp.asarray(m)
        return blob_cache[key]

    def patched(state, lowres, cap, *a, **kw):
        m = orig(state, lowres, cap, *a, **kw)  # real decode cost stays
        return blobs_for(int(m.shape[0]), int(m.shape[1]), int(m.shape[2]))

    sam.masks_from_lowres = patched
    try:
        pipe.run(src, out, no_intermediate=True, inpaint=False)  # warm
        pipe.drain()
        cc0 = pipe.cc_cap_hits
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            pipe.run(src, out, no_intermediate=True, inpaint=False)
            pipe.drain()
            times.append(time.perf_counter() - t0)
        cc = (pipe.cc_cap_hits - cc0) / iters
        busy = None
        try:
            from inklayer_tpu.profiling import device_busy_ms

            tdir = os.path.join(out, "_trace_blob")
            with jax.profiler.trace(tdir):
                pipe.run(src, out, no_intermediate=True, inpaint=False)
                pipe.drain()
            busy, _ = device_busy_ms(tdir)
        except Exception:
            pass
    finally:
        sam.masks_from_lowres = orig
    return {
        "e2e_blob_probe_p50_ms": round(float(np.percentile(times, 50)) * 1e3,
                                       1),
        "device_busy_ms_per_img_blob": (round(float(busy), 1)
                                        if busy is not None else None),
        "cc_cap_hits_per_img_blob": round(float(cc), 2),
    }


def measure_inpaint():
    """Driver-visible inpainting numbers (VERDICT r04 next #4): warm wall
    per fused 768^2 30-step ControlNet sample (ONE pass — the reference's
    2-pass loop is 2x this) and the 4-layer batched scaling (one UNet launch
    carries 4 independent layers; the reference inpaints layers strictly
    sequentially, inpainting/util.py:263-316, i.e. scaling 4.0)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from inklayer_tpu.build import build_inpainter
    from inklayer_tpu.config import PipelineConfig

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    ink = build_inpainter(PipelineConfig(), dtype=dtype)
    pipe = ink.get_pipeline()
    rng = np.random.default_rng(0)
    img = Image.fromarray((rng.random((768, 768, 3)) * 255).astype(np.uint8))
    mask = Image.fromarray(
        ((rng.random((768, 768)) > 0.5) * 255).astype(np.uint8))

    pipe.generate(img, mask, num_passes=1)  # compile + warm
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        pipe.generate(img, mask, num_passes=1)
        ts.append(time.perf_counter() - t0)
    t1 = float(np.median(ts))

    pipe.generate_batch([img] * 4, [mask] * 4, num_passes=1)  # compile+warm
    t0 = time.perf_counter()
    pipe.generate_batch([img] * 4, [mask] * 4, num_passes=1)
    t4 = time.perf_counter() - t0
    return {
        "inpaint_ms_per_sample": round(t1 * 1e3, 1),
        "inpaint_batch4_scaling": round(t4 / t1, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calibrate-cpu", action="store_true",
                    help="measure the CPU-backend reference time and store it")
    ap.add_argument("--throughput", action="store_true",
                    help="measure sketches/sec over the demo directory")
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full-pipeline end-to-end measurement")
    ap.add_argument("--skip-inpaint", action="store_true",
                    help="skip the inpainting stage measurement")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.throughput:
        sps = measure_throughput(iters=args.iters)
        print(json.dumps({
            "metric": "sketches/sec per chip detect+segment",
            "value": round(sps, 3), "unit": "sketches/s",
            "vs_baseline": 0.0,
        }))
        return

    if args.calibrate_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        p50, compile_s, times = measure(max(2, min(args.iters, 3)))
        with open(BASELINE_FILE, "w") as f:
            json.dump({"cpu_p50_ms": p50, "times_ms": times,
                       "note": "XLA:CPU detect+segment reference"}, f, indent=2)
        print(json.dumps({"cpu_p50_ms": p50}))
        return

    p50, compile_s, times = measure(args.iters)
    vs = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            vs = round(json.load(f)["cpu_p50_ms"] / p50, 2)
    out = {
        "metric": "p50 single-sketch detect+segment latency",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": vs if vs is not None else 0.0,
        # no checkpoints ship in this env: compute paths are real, but box
        # counts / SAM prompt batches are unrepresentative of real sketches
        "weights": "placeholder (seeded fill; no checkpoints in env)",
    }
    if not args.skip_full:
        try:
            out.update(measure_full_pipeline())
        except Exception as e:  # never lose the primary metric
            out["e2e_error"] = f"{type(e).__name__}: {e}"[:200]
    if not args.skip_inpaint:
        try:
            out.update(measure_inpaint())
        except Exception as e:  # never lose the primary metric
            out["inpaint_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
