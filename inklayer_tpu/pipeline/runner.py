"""Pipeline orchestrator: detect -> segment -> clean -> NMS -> depth-sort ->
refine -> (inpaint) with the reference's exact output-directory contract.

Parity target: InkLayer/runner.py run_inklayer_pipeline (:21-103).

TPU redesign: the reference moves every intermediate through PNG files on
disk and re-reads them in the next stage (runner.py:57-63 etc.) and rebuilds
SAM per image (segmentor/sam.py:23).  Here all intermediates stay in memory
(device where hot), models are built once, and the stage jits are cached
across images (bucketed static shapes) — disk writes happen only for the
output contract.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from inklayer_tpu.config import PipelineConfig
from inklayer_tpu.io import outputs as io_out
from inklayer_tpu.ops.color import (color_sketch_by_label_map,
                                    color_sketch_by_masks,
                                    generate_pastel_colors)
from inklayer_tpu.pipeline.refine.mask_cleaner import run_clean_masks
from inklayer_tpu.pipeline.refine.nms import sketch_nms
from inklayer_tpu.pipeline.refine.refiner import (improve_masks_deferred,
                                                  parse_masks_to_disjoint)


def _to_gray(rgb: np.ndarray) -> np.ndarray:
    return np.asarray(Image.fromarray(rgb).convert("L"))


_QUANTIZE_DEPTH_JIT = None


def _quantize_depth(depth):
    """Device (H, W) float depth -> uint8 0-255 normalized ON DEVICE
    (refiner.py:419-423 normalization), so the depth_map.png contract costs a
    4x-smaller readback than the float map.  The jit is module-cached: a
    fresh closure per call would retrace and re-upload the executable every
    image (~0.5 s through the device tunnel)."""
    global _QUANTIZE_DEPTH_JIT
    if _QUANTIZE_DEPTH_JIT is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def q(d):
            lo, hi = d.min(), d.max()
            rng = hi - lo
            norm = jnp.where(rng > 0,
                             (d - lo) / jnp.maximum(rng, 1e-12) * 255.0,
                             jnp.zeros_like(d))
            return norm.astype(jnp.uint8)

        _QUANTIZE_DEPTH_JIT = q
    return _QUANTIZE_DEPTH_JIT(depth)


@dataclass
class StageTimes:
    times: Dict[str, float] = field(default_factory=dict)

    def add(self, name: str, dt: float):
        # worker threads in run_dir update concurrently
        with _STAGE_LOCK:
            self.times[name] = self.times.get(name, 0.0) + dt


import threading

_STAGE_LOCK = threading.Lock()

_BOXES_SAM_JIT = None
_GRAY_EXPAND_JIT = None


def upload_image(image: np.ndarray):
    """Host (H, W, 3) uint8 -> device (H, W, 3), uploading ONE channel when
    all three are equal (scene sketches are grayscale-in-RGB) and
    broadcasting on device — the tunnel moves ~26MB/s, so the 750^2 RGB
    upload costs ~100ms of which 2/3 vanishes for single-channel content."""
    global _GRAY_EXPAND_JIT
    if (image.ndim == 3 and image.shape[2] == 3
            and (image[..., 0] == image[..., 1]).all()
            and (image[..., 1] == image[..., 2]).all()):
        import jax
        import jax.numpy as jnp

        if _GRAY_EXPAND_JIT is None:
            @jax.jit
            def expand(g):
                return jnp.broadcast_to(g[..., None], g.shape + (3,))

            _GRAY_EXPAND_JIT = expand
        return _GRAY_EXPAND_JIT(jnp.asarray(np.ascontiguousarray(
            image[..., 0])))
    import jax.numpy as jnp

    return jnp.asarray(image)


def _boxes_cxcywh_to_sam_space(boxes_dev, hw, scale_xy):
    """Device (K, 4) normalized cxcywh -> (K, 4) xyxy in SAM model space,
    replicating the host path bit-for-bit modulo f32: xyxy_norm * [w,h,w,h]
    -> astype(int) truncation (utils/processing.py parity) -> per-axis SAM
    scale.  Module-cached jit (a per-call closure would retrace)."""
    global _BOXES_SAM_JIT
    import jax
    import jax.numpy as jnp

    if _BOXES_SAM_JIT is None:
        @jax.jit
        def f(b, wh, sc):
            b = b.astype(jnp.float32)
            half = b[:, 2:4] / 2
            x1y1 = (b[:, 0:2] - half) * wh
            x2y2 = (b[:, 0:2] + half) * wh
            xyxy = jnp.concatenate([x1y1, x2y2], axis=1)
            xyxy = jnp.trunc(xyxy)  # host parity: astype(int) truncates
            return xyxy * jnp.concatenate([sc, sc])

        _BOXES_SAM_JIT = f
    h, w = hw
    import numpy as _np

    return _BOXES_SAM_JIT(boxes_dev,
                          jnp.asarray([float(w), float(h)], jnp.float32),
                          jnp.asarray(_np.asarray(scale_xy, _np.float32)))


class InkLayerPipeline:
    """End-to-end pipeline. Models are injected (built once by the caller —
    see inklayer_tpu.build.build_pipeline)."""

    def __init__(self, detector, sam_predictor, depth_estimator,
                 inpainter=None, cfg: PipelineConfig = PipelineConfig()):
        self.detector = detector
        self.sam = sam_predictor
        self.depth = depth_estimator
        self.inpainter = inpainter
        self.cfg = cfg
        self.stage_times = StageTimes()
        # stage-level software pipelining (BASELINE config 2): host-side
        # finalisation (packed mask readback + PNG writes + colorization)
        # runs on writer threads so the device can start the next image.
        from concurrent.futures import ThreadPoolExecutor

        self._writer = ThreadPoolExecutor(max_workers=2)
        # pending write-futures are PER-THREAD: concurrent run() calls
        # (serve requests, run_dir workers>1) each drain exactly the writes
        # they submitted — a shared list let thread A's drain clear thread
        # B's futures before B awaited them (B could then return with PNGs
        # still in flight)
        self._local = threading.local()
        # diffusion serializes on the device anyway (run_dir uses workers=1
        # for the same reason); a single-slot lock bounds device memory to
        # one in-flight 768² sample when serve runs concurrent requests
        self.inpaint_lock = threading.Lock()
        # host-blocking device readbacks, counted for bench attribution
        # (each costs a full transport RTT on remote-device tunnels)
        self.sync_count = 0
        # masks whose CC propagation hit the iteration cap during cleaning
        # (labels may be split -> keep decisions can drift from the exact
        # reference); counted + warned so a deployment never silently
        # inherits a cap tuned on placeholder-noise masks
        self.cc_cap_hits = 0
        self._sync_guard = threading.Lock()
        self._batched_encoder = None
        self._det_cache: dict = {}
        self._sam_state_cache: dict = {}
        self._img_cache: dict = {}
        self._depth_cache: dict = {}
        self._host_cache: dict = {}  # path -> (rgb ndarray, gray ndarray)

    def enable_batched_encoder(self, batch_buckets=(1, 2, 4),
                               max_wait_ms: float = 10.0):
        """Route SAM image encoding through a serving MicroBatcher so that
        concurrent requests (web app) share one batched ViT-H launch."""
        if self._batched_encoder is None:
            from inklayer_tpu.serve.batcher import BatchedSamEncoder

            self._batched_encoder = BatchedSamEncoder(
                self.sam.model, self.sam.params, batch_buckets, max_wait_ms)
            self.sam.encode_fn = self._batched_encoder.encode
        return self._batched_encoder

    @property
    def _pending(self) -> List:
        lst = getattr(self._local, "pending", None)
        if lst is None:
            lst = self._local.pending = []
        return lst

    @property
    def async_io(self) -> bool:
        # per-thread like _pending: concurrent run() calls must not restore
        # each other's flag (a stale True makes a run skip its final drain)
        return getattr(self._local, "async_io", False)

    @async_io.setter
    def async_io(self, value: bool):
        self._local.async_io = value

    def _count_sync(self, n: int = 1):
        with self._sync_guard:
            self.sync_count += n

    def _note_cc_caps(self, capped_flags, image_name: str):
        """capped_flags: (N,) bool host array from the cleaning stage."""
        n = int(np.asarray(capped_flags).sum())
        if n:
            with self._sync_guard:
                self.cc_cap_hits += n
            print(f"WARNING: {image_name}: mask cleaning hit the "
                  f"connected-components iteration cap on {n}/"
                  f"{len(capped_flags)} masks — component labels may be "
                  f"split and keep decisions may differ from the exact "
                  f"reference (compact masks converge in 2-4 iterations; "
                  f"cap hits indicate noise-like masks).")

    def _submit(self, fn, *args):
        if self.async_io:
            self._pending.append(self._writer.submit(fn, *args))
        else:
            fn(*args)

    def drain(self):
        """Wait for all host-side writes submitted BY THIS THREAD."""
        pending = self._pending
        for f in pending:
            f.result()
        pending.clear()

    def run_dir(self, paths, out_base_dir: str, no_intermediate: bool = False,
                inpaint: bool = False, batch_size: int = 1,
                workers: Optional[int] = None):
        """Directory sweep with host-IO/device overlap: image i's PNG
        output-contract work runs on writer threads while image i+1 is on
        device (the reference processes strictly sequentially).

        workers defaults to cfg.sweep_workers (4): worker threads run
        images concurrently, so image i's data-dependent readback waits
        overlap image i+1's dispatch + device work.  Re-measured
        2026-08-20: the transport completes a get as soon as its
        dependencies finish and serves parallel gets concurrently, so
        workers=2/3 reach 2.8-3.3 sk/s vs 2.4-2.9 single-threaded.
        (An EARLIER transport build drained the whole queue on every get;
        there workers=1 with the dispatch-lookahead hook below was the
        only configuration that didn't collapse — 1.4-2.7 vs 0.95 sk/s.
        The workers==1 path keeps that mode available.)

        workers == 1 pipelines on ONE thread: the full device front of
        image i+1 (upload, detect with chained top-K boxes, SAM encode,
        depth) is dispatched asynchronously before image i's readbacks,
        so the device streams while the host blocks.

        batch_size > 1 instead BATCHES the two big model dispatches
        across images: GDINO detect groups same-bucket images into one
        forward, and SAM ViT-H encodes batch_size images per launch —
        amortizing per-dispatch overhead and filling the MXU at batch
        dimension (one extra compile per batch shape).

        Measured through the axon tunnel (4-image sweep, 2026-08-20):
        batch_size=2 LOSES to the default lookahead — 1.47 vs 1.96
        sketches/s — because _prefill_batches serializes all device
        batches BEFORE any per-image host work, forfeiting the
        device/host overlap, and the batched uploads ride the slow
        tunnel.  Keep batch_size=1 here; batching should win on real TPU
        VMs where host<->device is fast and dispatch is cheap."""
        if workers is None:
            workers = max(1, int(getattr(self.cfg, "sweep_workers", 1)))
        self.async_io = True
        self._det_cache, self._sam_state_cache = {}, {}
        try:
            if batch_size > 1:
                self._prefill_batches(paths, batch_size)
            self._img_cache, self._depth_cache = {}, {}
            if inpaint:
                workers = 1  # diffusion dominates and serializes on the
                # device anyway; keep the sweep single-threaded (per-thread
                # pending lists have made mid-run drains safe, but there is
                # nothing to win)
            if workers > 1 and len(paths) > 1:
                # (combines with batch_size > 1: the prefill above already
                # cached detect results + SAM states for every image, so
                # worker threads only run the host/refine path concurrently)
                from concurrent.futures import ThreadPoolExecutor

                def _run_and_drain(p):
                    out = self.run(p, out_base_dir, no_intermediate, inpaint)
                    self.drain()  # pending lists are thread-local: each
                    # worker awaits exactly the writes it submitted
                    return out

                with ThreadPoolExecutor(max_workers=workers) as ex:
                    outs = list(ex.map(_run_and_drain, paths))
                return outs
            outs = []
            # PNG decode (+grayscale) of image i+1 rides a dedicated thread
            # while image i's device front executes; the dispatch hook below
            # then only uploads + enqueues (decode is ~25 ms/750^2 of pure
            # host time that otherwise sits on the serial path twice — the
            # hook decoded it AND run() re-decoded it)
            from concurrent.futures import ThreadPoolExecutor

            def _decode(q):
                rgb = np.asarray(Image.open(q).convert("RGB"))
                return rgb, _to_gray(rgb)

            with ThreadPoolExecutor(max_workers=1) as decode_pool:
                dec_futs: dict = {}
                if paths:
                    dec_futs[paths[0]] = decode_pool.submit(_decode, paths[0])
                for i, p in enumerate(paths):
                    # cross-stage device pipelining: enqueue the FULL device
                    # front of image i+1 (upload, detect incl. the device
                    # top-K boxes that chain into SAM decode, ViT-H encode,
                    # depth) while image i blocks on its first readback —
                    # run() invokes the hook right before that block, so
                    # i+1's front queues AFTER image i's own dispatches but
                    # fills the device during image i's host stalls
                    nxt = paths[i + 1] if i + 1 < len(paths) else None
                    if nxt is not None and nxt not in dec_futs:
                        dec_futs[nxt] = decode_pool.submit(_decode, nxt)

                    def _prefetch(nxt=nxt):
                        if nxt is None or nxt in self._det_cache:
                            return
                        fut = dec_futs.pop(nxt, None)
                        img_next, gray_next = (fut.result() if fut is not None
                                               else _decode(nxt))
                        dev_next = upload_image(img_next)
                        if (self.cfg.device_front and hasattr(
                                self.detector,
                                "detect_dispatch_device_parts")):
                            self._det_cache[nxt] = self.detector.\
                                detect_dispatch_device_parts(dev_next)
                        else:
                            self._det_cache[nxt] = \
                                self.detector.detect_dispatch_device(dev_next)
                        self._sam_state_cache[nxt] = \
                            self.sam.compute_image_state(dev_next)
                        self._depth_cache[nxt] = \
                            self.depth.infer_image_device(dev_next)
                        self._img_cache[nxt] = dev_next
                        self._host_cache[nxt] = (img_next, gray_next)

                    if p in dec_futs:
                        fut = dec_futs.pop(p)
                        if p not in self._host_cache:
                            self._host_cache[p] = fut.result()
                    outs.append(self.run(p, out_base_dir, no_intermediate,
                                         inpaint, _prefetch_hook=_prefetch))
        finally:
            self.drain()
            self.async_io = False
            self._det_cache, self._sam_state_cache = {}, {}
            self._img_cache, self._depth_cache = {}, {}
            self._host_cache = {}
        return outs

    def _prefill_batches(self, paths, batch_size: int):
        images = {}
        for p in paths:
            images[p] = np.asarray(Image.open(p).convert("RGB"))
        todo = list(paths)
        for s in range(0, len(todo), batch_size):
            chunk = todo[s: s + batch_size]
            t0 = time.perf_counter()
            dets = self.detector.detect_batch([images[p] for p in chunk])
            self.stage_times.add("detect", time.perf_counter() - t0)
            t0 = time.perf_counter()
            states = self.sam.precompute_image_states(
                [images[p] for p in chunk])
            self.stage_times.add("segment", time.perf_counter() - t0)
            for p, d, st in zip(chunk, dets, states):
                self._det_cache[p] = d
                self._sam_state_cache[p] = st

    # ------------------------------------------------------------------
    def run(self, input_path: str, out_base_dir: str,
            no_intermediate: bool = False, inpaint: bool = False,
            _prefetch_hook=None) -> str:
        cfg = self.cfg
        input_name = os.path.basename(input_path).split(".")[0]
        cached_host = self._host_cache.pop(input_path, None)
        if cached_host is not None:  # run_dir lookahead decoded it already
            image, gray = cached_host
            image_pil = Image.fromarray(image)
        else:
            image_pil = Image.open(input_path).convert("RGB")
            image = np.asarray(image_pil)
            gray = _to_gray(image)
        h, w = image.shape[:2]

        out_dir = io_out.prepare_out_dir(out_base_dir, input_name)

        # host writes go to the writer threads even in standalone runs so
        # PNG encodes overlap device compute; drained before returning
        was_async = self.async_io
        self.async_io = True
        # byte-copy when the source is a PNG (no re-encode; io/outputs.py)
        self._submit(functools.partial(io_out.save_input_png,
                                       os.path.join(out_dir, "input.png"),
                                       input_path, image))

        # single host->device upload of the input image (one channel when
        # grayscale-in-RGB); every stage's jnp.asarray(image) is then a
        # no-op (the tunnel makes repeated uploads of the same pixels the
        # next-biggest IO cost after masks).  run_dir's lookahead may have
        # uploaded it already.
        image_dev = self._img_cache.pop(input_path, None)
        if image_dev is None:
            image_dev = upload_image(image)
        # device gray plane, uploaded/sliced ONCE: every refine stage
        # thresholds it on device instead of uploading its own ink plane
        # (~0.55MB x 4 stages/image through the tunnel otherwise).  For
        # grayscale-in-RGB sketches PIL's L conversion is exactly channel 0
        # (0.299+0.587+0.114 == 1), so the slice is free and bit-exact.
        import jax.numpy as _jnp

        gray_dev = (image_dev[..., 0]
                    if np.array_equal(image[..., 0], gray)
                    else _jnp.asarray(gray))

        # mmdetection alt path (refinement/bbox_filter.py:40-45): when
        # mmdet_out/*.json is present its boxes replace GDINO's before NMS,
        # so the detect->decode device chaining below must be skipped
        import glob as _glob

        mmdet_json = _glob.glob(os.path.join(out_dir, "mmdet_out", "*.json"))

        # ---- device dispatch ahead of the first readback -----------------
        # detect, SAM encode and depth are all image-only: enqueue all three
        # NOW (jax dispatch is async) so the device streams through them
        # while the host blocks on the detect readback and does bbox
        # json/draw/PNG work — instead of idling between serialized stages
        t0 = time.perf_counter()
        cached_det = self._det_cache.pop(input_path, None)
        boxes_dev = None
        det_fin = det_parts = det_finalize_host = None
        use_parts = (cfg.device_front
                     and hasattr(self.detector,
                                 "detect_dispatch_device_parts"))
        if cached_det is None:
            if use_parts:
                # device-front mode defers the detect readback so it can
                # fuse with the NMS/depth-front readback (ONE round-trip)
                det_parts, det_finalize_host, _scores_dev, boxes_dev = \
                    self.detector.detect_dispatch_device_parts(image_dev)
            else:
                det_fin, _scores_dev, boxes_dev = \
                    self.detector.detect_dispatch_device(image_dev)
        elif isinstance(cached_det, tuple) and len(cached_det) == 4:
            det_parts, det_finalize_host, _scores_dev, boxes_dev = cached_det
        elif isinstance(cached_det, tuple):
            # run_dir lookahead cached the device triple, keeping the
            # detect -> SAM decode chaining live for prefetched images
            det_fin, _scores_dev, boxes_dev = cached_det
        else:
            det_fin = cached_det
        self.stage_times.add("detect", time.perf_counter() - t0)

        t0 = time.perf_counter()
        sam_state = self._sam_state_cache.pop(input_path, None)
        if sam_state is None:
            # async ViT-H encode dispatch; the state stays LOCAL to this
            # call (no predictor mutation) so concurrent run_dir workers
            # don't race on the shared SamPredictor
            sam_state = self.sam.compute_image_state(image_dev)
        # detect -> SAM decode chained ON DEVICE: the top-K boxes feed the
        # low-res mask decode without waiting for the detect readback (the
        # surviving detections are a score-sorted PREFIX of the top-K, so
        # the host slices [:n] afterwards).  The TwoWayTransformer thus
        # executes inside the ~35ms detect-readback round-trip.
        lowres_dev = None
        if boxes_dev is not None and not mmdet_json:
            boxes_model = _boxes_cxcywh_to_sam_space(
                boxes_dev, (h, w), sam_state["scale"])
            lowres_dev, _ = self.sam.decode_lowres_state(sam_state,
                                                         boxes_model)
        self.stage_times.add("segment", time.perf_counter() - t0)

        t0 = time.perf_counter()
        depth = self._depth_cache.pop(input_path, None)
        if depth is None:
            depth = self.depth.infer_image_device(image_dev)
        depth_u8 = _quantize_depth(depth)
        self.stage_times.add("depth", time.perf_counter() - t0)

        # ---- detect-readback-free device front ---------------------------
        # When the detect->SAM chain is live, the ENTIRE mask path up to the
        # NMS keep flags dispatches from device-resident detect outputs:
        # capacity-K masks, cleaning, the device NMS prefilter+gates and the
        # fused NMS/depth-stat front all queue BEFORE the detect readback,
        # so the device streams straight through while the host decodes the
        # detections (previously the device idled between cleaning and the
        # front while the host ran the prefilter on read-back boxes).
        import jax
        import jax.numpy as jnp

        from inklayer_tpu.pipeline.refine.front import (nms_depth_front,
                                                        nms_depth_front_device)
        from inklayer_tpu.pipeline.refine.mask_cleaner import clean_masks_device

        device_front = None
        masks_dev = cleaned_dev = None
        if lowres_dev is not None and not mmdet_json and cfg.device_front:
            t0 = time.perf_counter()
            cap = int(lowres_dev.shape[0])
            masks_dev = self.sam.masks_from_lowres(sam_state, lowres_dev, cap)
            self.stage_times.add("segment", time.perf_counter() - t0)
            t0 = time.perf_counter()
            cleaned_dev, capped_dev = clean_masks_device(masks_dev,
                                                         cfg.refine,
                                                         with_stats=True)
            self.stage_times.add("clean", time.perf_counter() - t0)
            t0 = time.perf_counter()
            device_front = nms_depth_front_device(
                boxes_dev, _scores_dev, cleaned_dev, gray_dev, depth,
                (h, w), cfg.refine,
                box_threshold=self.detector.cfg.box_threshold)
            self.stage_times.add("nms", time.perf_counter() - t0)

        # ---- detection -------------------------------------------------
        t0 = time.perf_counter()
        front_host = None
        if det_parts is not None:
            self._count_sync()
            if device_front is not None:
                # ONE fused transport round-trip for detect outputs + the
                # whole NMS/depth-front results (2 syncs/image total
                # instead of 3 — each costs a full RTT on remote tunnels)
                host_parts, front_host = jax.device_get(
                    (det_parts, device_front))
            else:  # mmdet alt path or no chained decode: plain readback
                host_parts = jax.device_get(det_parts)
            det = det_finalize_host(host_parts)
        elif callable(det_fin):
            self._count_sync()
            det = det_fin()
        else:
            det = det_fin
        self.stage_times.add("detect", time.perf_counter() - t0)
        boxes_cxcywh = det["boxes"]  # normalized
        scores = det["scores"]
        # cxcywh -> xyxy normalized -> abs int (utils/processing.py:6-33)
        xyxy_norm = np.stack([
            boxes_cxcywh[:, 0] - boxes_cxcywh[:, 2] / 2,
            boxes_cxcywh[:, 1] - boxes_cxcywh[:, 3] / 2,
            boxes_cxcywh[:, 0] + boxes_cxcywh[:, 2] / 2,
            boxes_cxcywh[:, 1] + boxes_cxcywh[:, 3] / 2,
        ], axis=-1) if len(boxes_cxcywh) else np.zeros((0, 4))
        boxes_abs = (xyxy_norm * np.asarray([w, h, w, h])).astype(int).astype(float)

        def write_bbox_outputs():
            io_out.save_norm_bboxes(boxes_abs, scores, image_pil.size,
                                    os.path.join(out_dir, "bboxes.json"))
            io_out.save_png(
                os.path.join(out_dir, "bboxes.png"),
                np.asarray(io_out.draw_boxes_image(
                    image_pil, xyxy_norm.tolist(), scores,
                    labels=det.get("labels"))))

        # bboxes.json/.png are not in the --no_intermediate keep-list:
        # skip the doomed draw+encode (host time on the writer threads)
        if not no_intermediate:
            self._submit(write_bbox_outputs)

        # ---- segmentation (masks stay on device) -------------------------
        from inklayer_tpu.ops.bits import masks_to_host

        n_det = len(boxes_abs)
        # --no_intermediate + chained decode: masks/masks_cleaned are never
        # written, and NMS/refine only ever read the PREFILTER SURVIVORS'
        # cleaned masks — so defer mask materialization until after the
        # host prefilter and compute it for a pow2 BUCKET of the survivor
        # count instead of the full top-K capacity (mask cleaning was 37%
        # of device busy at capacity 64; real sketches keep ~10-30).  The
        # bucket also fixes per-count compile churn for varying n_det.
        subset_masks = (no_intermediate and device_front is None
                        and lowres_dev is not None and not mmdet_json
                        and n_det > 0)
        t0 = time.perf_counter()
        if device_front is not None or subset_masks:
            pass  # capacity-K masks precomputed / deferred to the prefilter
        elif n_det and lowres_dev is not None:
            # chained path: low-res logits already computed for the top-K
            # prefix during the detect readback
            masks_dev = self.sam.masks_from_lowres(sam_state, lowres_dev,
                                                   n_det)
        elif n_det:
            masks_dev, _iou = self.sam.predict_device_state(sam_state,
                                                            boxes_abs)
        else:
            masks_dev = jnp.zeros((0, h, w), bool)
        self.stage_times.add("segment", time.perf_counter() - t0)
        def write_sam_outputs(masks_dev_):
            self._count_sync()
            masks = masks_to_host(masks_dev_)  # packed transfer
            io_out.save_masks_dir(masks, os.path.join(out_dir, "masks"))
            seg = color_sketch_by_masks(image, list(masks))
            io_out.save_png(os.path.join(out_dir, "segmented_sketch.png"),
                            seg)

        # --no_intermediate: these outputs are deleted by the final cleanup
        # (io/outputs.KEEP_LIST) — skip the device->host transfers entirely
        # (they dominate wall time through slow interconnects)
        if not no_intermediate:
            # capacity-K stacks are sliced to the surviving prefix: rows
            # [:n_det] are bit-identical to the unchained per-n compute
            # (every mask op is per-mask independent)
            self._submit(write_sam_outputs, masks_dev[:n_det])

        # ---- mask cleaning (device) --------------------------------------
        t0 = time.perf_counter()
        if cleaned_dev is None and not subset_masks:
            cleaned_dev, capped_dev = clean_masks_device(masks_dev,
                                                         cfg.refine,
                                                         with_stats=True)
        self.stage_times.add("clean", time.perf_counter() - t0)
        if not no_intermediate:
            def write_cleaned(cd):
                self._count_sync()
                io_out.save_masks_dir(
                    masks_to_host(cd), os.path.join(out_dir, "masks_cleaned"))

            self._submit(write_cleaned, cleaned_dev[:n_det])

        # ---- sketch NMS (IoU matrix on device) ---------------------------
        if mmdet_json:  # mmdetection alt path (globbed above)
            import json as _json

            with open(mmdet_json[0]) as f:
                alt = _json.load(f)
            alt_norm = np.asarray(alt["bboxes"], float)
            boxes_abs = alt_norm * np.asarray([w, h, w, h]) \
                if alt_norm.size and alt_norm.max() <= 1.0 else alt_norm
            scores = np.asarray(alt["scores"], float)
            xyxy_norm = boxes_abs / np.asarray([w, h, w, h]) \
                if boxes_abs.size else boxes_abs

        # NMS keep flags + the depth-sort per-mask stats share ONE device
        # readback: both the greedy NMS loop and the depth/overlap stats run
        # on device, and the stats are computed for the whole prefiltered
        # stack (per-mask independent), so the host can slice out the
        # NMS-surviving rows afterwards.
        from inklayer_tpu.pipeline.refine.depth_sort import (
            containment_graph, sort_order)
        from inklayer_tpu.pipeline.refine.front import nms_depth_front
        from inklayer_tpu.pipeline.refine.nms import nms_host_prefilter

        t0 = time.perf_counter()
        if device_front is not None:
            # everything already dispatched before the detect readback:
            # one batched readback of the K-capacity results; stats stay
            # in K-index space so `rows` below are the kept indices.
            # front_host is already here when the fused detect+front
            # readback ran above (det_parts path).
            if front_host is None:
                self._count_sync()
                front_host = jax.device_get(device_front)
            valid_np, order_np, keep_np, dscores, doverlap = front_host
            sel = keep_np & valid_np[order_np]
            kept = order_np[sel].astype(np.int64)
            rows_of_kept = kept
        else:
            kept0, order0, gate, iou_bbox = nms_host_prefilter(
                boxes_abs, scores, gray, cfg.refine)
            k = len(kept0)
            if subset_masks and k:
                # materialize + clean ONLY the survivors, padded to a pow2
                # bucket (one compile per bucket).  cleaned_dev rows are
                # then in kept0-POSITION space, matching the gate/iou
                # matrices the prefilter already returns in that space.
                bucket = 1
                while bucket < max(k, 1):
                    bucket *= 2
                bucket = min(bucket, int(lowres_dev.shape[0]))
                sel = np.zeros((bucket,), np.int32)
                sel[:k] = kept0
                t0s = time.perf_counter()
                masks_dev = self.sam.masks_from_lowres(
                    sam_state, lowres_dev[jnp.asarray(sel)], bucket)
                self.stage_times.add("segment", time.perf_counter() - t0s)
                t0s = time.perf_counter()
                cleaned_dev, capped_dev = clean_masks_device(
                    masks_dev, cfg.refine, with_stats=True)
                self.stage_times.add("clean", time.perf_counter() - t0s)
                front_rows = np.arange(k)
            else:
                front_rows = kept0
            if k:
                # ONE fused dispatch for the whole NMS + depth-stat device
                # front, ONE readback for its results
                keep_dev, dscores_dev, doverlap_dev = nms_depth_front(
                    front_rows, gate, iou_bbox, order0, cleaned_dev,
                    gray_dev, depth, cfg.refine)
                self._count_sync()
                keep_p, dscores_p, doverlap_p = jax.device_get(
                    (keep_dev, dscores_dev, doverlap_dev))
                keep = keep_p[:k]
                dscores = dscores_p[:k]
                doverlap = doverlap_p[:k, :k]
                kept = kept0[order0[keep]]
                pos = {int(o): i for i, o in enumerate(kept0)}
                rows_of_kept = np.asarray([pos[int(i)] for i in kept])
            else:
                kept = np.zeros((0,), np.int64)
                rows_of_kept = kept
                if subset_masks:  # nothing survived the prefilter: no mask
                    # work was (or needs to be) dispatched at all
                    cleaned_dev = jnp.zeros((0, h, w), bool)
                    capped_dev = jnp.zeros((0,), bool)
        self.stage_times.add("nms", time.perf_counter() - t0)
        final_norm = [xyxy_norm[i].tolist() for i in kept]
        final_data = {
            "bboxes": final_norm,
            "scores": [float(scores[i]) for i in kept],
            "kept_indices": [int(i) for i in kept],
            "threshold": cfg.refine.nms_iou,
        }
        def write_final_bbox_outputs():
            import json

            with open(os.path.join(out_dir, "bboxes_final.json"), "w") as f:
                json.dump(final_data, f, indent=4)
            io_out.save_png(
                os.path.join(out_dir, "bboxes_final.png"),
                np.asarray(io_out.draw_boxes_image(image_pil, final_norm,
                                                   final_data["scores"])))

        self._submit(write_final_bbox_outputs)

        # ---- refinement --------------------------------------------------
        # (depth was dispatched up front; it stays on device — the
        # depth-sort consumes it there and the depth_map.png contract needs
        # only a quantized uint8 readback)
        t0 = time.perf_counter()
        sort_result = None
        if len(kept):
            # subset mode's cleaned stack is in kept0-position space;
            # the full stacks (device_front / keep-intermediate) are in
            # original-detection-index space
            kept_masks = cleaned_dev[np.asarray(
                rows_of_kept if subset_masks else kept)]
            kept_boxes = np.asarray(
                [[int(xyxy_norm[i][0] * w), int(xyxy_norm[i][1] * h),
                  int(xyxy_norm[i][2] * w), int(xyxy_norm[i][3] * h)]
                 for i in kept], float)
            # depth-sort order from the stats that rode the NMS readback
            rows = rows_of_kept
            cont = containment_graph(kept_boxes, (h, w), cfg.refine)
            sort_result = sort_order(dscores[rows], cont,
                                     doverlap[np.ix_(rows, rows)])
        else:
            kept_masks = jnp.zeros((0, h, w), bool)
            kept_boxes = np.zeros((0, 4))
        disjoint_dev, sorted_boxes, _info = parse_masks_to_disjoint(
            kept_masks, kept_boxes, gray_dev, depth, cfg.refine,
            sort_result=sort_result)
        final_dev, extra_valid = improve_masks_deferred(
            disjoint_dev,
            np.asarray(sorted_boxes) if len(sorted_boxes) else np.zeros((0, 4)),
            gray_dev, cfg.refine)
        self.stage_times.add("refine", time.perf_counter() - t0)

        def write_final_outputs(disjoint_dev_, final_dev_, depth_u8_,
                                extra_valid_, capped_dev_):
            # masks_disjoint is needed on disk when inpainting runs (the
            # per-layer assembly and the web single-layer editor read it).
            # Both stacks are disjoint by construction -> uint8 label-map
            # transfers (8x less tunnel traffic than bit-planes), and ALL
            # final readbacks (incl. the unlabeled-extra-mask validity flag)
            # batch into ONE tunnel round-trip.
            from inklayer_tpu.ops.bits import batched_final_readback

            need_disjoint = not no_intermediate or inpaint
            stacks = ([disjoint_dev_, final_dev_] if need_disjoint
                      else [final_dev_])
            self._count_sync()
            host_stacks, extras, labels = batched_final_readback(
                stacks, [depth_u8_, extra_valid_, capped_dev_],
                with_labels=True)
            # CC-cap observability rides the existing readback (no extra
            # RTT); warn if any mask's cleaning hit the iteration cap
            self._note_cc_caps(extras[2], input_name)
            if need_disjoint:
                io_out.save_masks_dir(host_stacks[0],
                                      os.path.join(out_dir, "masks_disjoint"))
            final_masks = host_stacks[-1]
            lab_final = labels[-1]
            if not bool(extras[1]):  # candidate extra mask was empty
                n_full = len(final_masks)
                final_masks = final_masks[:-1]
                if lab_final is not None:  # dropped mask pixels -> background
                    lab_final = np.where(lab_final == n_full, 0, lab_final)
            io_out.save_masks_dir(final_masks,
                                  os.path.join(out_dir, "masks_final"))
            io_out.save_png(
                os.path.join(out_dir, "depth_map.png"),
                np.repeat(extras[0][:, :, None], 3, axis=2))
            # label-map LUT colorizer (bit-identical, ~4x less host CPU)
            # whenever the readback produced a label map
            if lab_final is not None:
                final_seg = color_sketch_by_label_map(image, lab_final,
                                                      len(final_masks))
            else:
                final_seg = color_sketch_by_masks(image, list(final_masks))
            io_out.save_png(
                os.path.join(out_dir, "segmented_sketch_final.png"),
                final_seg)

        # cc-cap flags: keep only the rows the pipeline actually used —
        # capacity-K garbage rows (device_front) / pow2-padding duplicates
        # of lowres row 0 (subset) would inflate cc_cap_hits spuriously
        capped_real = capped_dev[: (k if subset_masks else n_det)]
        self._submit(write_final_outputs, disjoint_dev, final_dev, depth_u8,
                     extra_valid, capped_real)

        if _prefetch_hook is not None:
            # run_dir lookahead: ALL of this image's device work is queued;
            # dispatch image i+1's device front now so it executes under
            # this image's final readback + PNG tail and the next host
            # prelude.  (Dispatching it any earlier injects ~0.2s of i+1
            # device work ahead of this image's data-dependent NMS/refine
            # dispatches — measured as a net loss through the tunnel.)
            _prefetch_hook()

        # ---- inpainting ---------------------------------------------------
        if inpaint:
            self.drain()  # the inpainter reads masks_final from disk
            if self.inpainter is None:
                print("Inpainting requested but no inpainter is configured; "
                      "skipping (provide diffusion weights to enable).")
            else:
                t0 = time.perf_counter()
                with self.inpaint_lock:
                    self.inpainter.run_on_sketch_dir(out_dir)
                self.stage_times.add("inpaint", time.perf_counter() - t0)

        if no_intermediate:
            self.drain()  # all writes to this dir must land before cleanup
            io_out.cleanup_intermediate(out_dir)
        self.async_io = was_async
        if not was_async:
            self.drain()  # standalone run: all outputs on disk on return
        return out_dir
