"""Continuous micro-batching for TPU serving.

The reference serves requests strictly sequentially (Flask handler calls the
whole pipeline synchronously, app.py:86).  Here: a generic micro-batcher
collects concurrent requests into fixed-size batches for a jitted batched
function — the SAM ViT-H encoder amortizes to near-constant cost per batch,
so concurrent /segment-sketch requests share one encoder launch.

Batch sizes are drawn from a static bucket list (1, 2, 4, 8 by default) and
padded, so at most len(buckets) compiles exist per function.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence

import numpy as np


class MicroBatcher:
    """fn(batched_input (B, ...)) -> batched_output (B, ...); inputs are
    stacked numpy/JAX arrays of identical shape."""

    def __init__(self, fn: Callable, batch_buckets: Sequence[int] = (1, 2, 4, 8),
                 max_wait_ms: float = 5.0):
        self.fn = fn
        self.buckets = sorted(batch_buckets)
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, item) -> Future:
        fut: Future = Future()
        self._q.put((item, fut))
        return fut

    def __call__(self, item):
        return self.submit(item).result()

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------
    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _worker(self):
        while not self._stop.is_set():
            first = self._q.get()
            if first is None:
                break
            batch = [first]
            deadline = None
            max_b = self.buckets[-1]
            import time

            deadline = time.monotonic() + self.max_wait
            while len(batch) < max_b:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._stop.set()
                    break
                batch.append(nxt)
            items = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            try:
                import jax.numpy as jnp

                n = len(items)
                bucket = self._bucket_for(n)
                stacked = jnp.stack(items)  # device inputs stay on device
                if bucket > n:
                    pad = jnp.repeat(stacked[-1:], bucket - n, axis=0)
                    stacked = jnp.concatenate([stacked, pad], axis=0)
                out = self.fn(stacked)
                # keep device arrays device-resident: slicing a jax array is
                # free, while np.asarray would force a (slow) host readback
                for i, fut in enumerate(futs):
                    fut.set_result(out[i])
            except Exception as e:  # propagate to all waiters
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)


class BatchedSamEncoder:
    """Wraps a Sam model + params into a micro-batched encoder usable by
    multiple SamPredictor-style callers concurrently."""

    def __init__(self, model, params, batch_buckets=(1, 2, 4),
                 max_wait_ms: float = 10.0):
        import jax

        self._encode = jax.jit(
            lambda p, imgs: model.apply(p, imgs, method=type(model).encode))
        self.params = params
        self.batcher = MicroBatcher(
            lambda imgs: self._encode(self.params, imgs),
            batch_buckets, max_wait_ms)

    def encode(self, preprocessed_image):
        """(S, S, 3) -> (G, G, C) embedding (batch dim handled internally).
        Accepts a device or host array; returns a device array."""
        return self.batcher(preprocessed_image)

    def __call__(self, preprocessed_image):
        return self.encode(preprocessed_image)

    def close(self):
        self.batcher.close()
