"""On-device image preprocessing ops.

The reference does all preprocessing on host (PIL/cv2 resize, numpy
normalise) and uploads per stage.  Here each stage's resize+normalise+pad is
one fused XLA op with a *static* output shape:
``jax.image.scale_and_translate`` resamples to an arbitrary scale into a
fixed-size canvas (zero-filled beyond the image), which fuses the reference's
resize -> normalise -> pad-to-square chain (segment-anything
modeling/sam.py:164-174, utils/transforms.py:16-102) into a single kernel and
keeps every downstream shape static — no recompilation across a directory
sweep.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_scale(in_hw: Tuple[int, int], out_hw: Tuple[int, int],
                 keep_aspect: str = "longest") -> float:
    """Scale factor used by the reference resize strategies.

    'longest': ResizeLongestSide (SAM) — longest side == max(out).
    'shortest': shorter side == min(out) (GDINO RandomResize lower bound).
    """
    h, w = in_hw
    oh, ow = out_hw
    if keep_aspect == "longest":
        return min(oh / h, ow / w)
    return max(oh / h, ow / w)


@functools.partial(jax.jit, static_argnames=("out_hw", "method", "antialias"))
def scale_pad_normalize(
    image: jax.Array,  # (H, W, 3) float32 or uint8, RGB
    scale: jax.Array,  # scalar float
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    out_hw: Tuple[int, int],
    method: str = "bilinear",
    antialias: bool = True,
) -> jax.Array:
    """Normalise, then resample by `scale` into a zero-padded (out_h, out_w)
    canvas (top-left anchored).  Output (out_h, out_w, 3) float32.

    Normalising *before* the resample means the zero fill corresponds to
    zero-padding in normalised space, matching the reference's
    pad-after-normalise (modeling/sam.py:164-174).
    """
    x = image.astype(jnp.float32)
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    scale = jnp.asarray(scale, jnp.float32)
    scale2 = (jnp.stack([scale, scale]) if scale.ndim == 0
              else scale).astype(jnp.float32)
    translation = jnp.zeros((2,), jnp.float32)
    return jax.image.scale_and_translate(
        x, (out_hw[0], out_hw[1], 3), (0, 1), scale2, translation,
        method=method, antialias=antialias)


def resize(image: jax.Array, out_hw: Tuple[int, int], method: str = "bilinear",
           antialias: bool = True) -> jax.Array:
    """Plain resize to (out_h, out_w), preserving trailing dims."""
    if (method in ("bilinear", "linear", "triangle")
            and jax.default_backend() == "tpu"
            and jnp.issubdtype(image.dtype, jnp.floating)
            and image.ndim in (2, 3)):
        # separable matmul form (MXU) — exact same linear map
        x3 = image[None] if image.ndim == 2 else image.transpose(2, 0, 1)
        out = resize_batch_matmul(x3, out_hw, method="bilinear",
                                  antialias=antialias)
        return out[0] if image.ndim == 2 else out.transpose(1, 2, 0)
    out_shape = (out_hw[0], out_hw[1]) + image.shape[2:]
    return jax.image.resize(image, out_shape, method=method, antialias=antialias)


def resize_align_corners(x: jax.Array, out_hw: Tuple[int, int],
                         spatial_dims: Tuple[int, int] = (1, 2)) -> jax.Array:
    """Bilinear resize with torch align_corners=True semantics:
    in_pos = out_pos * (in-1)/(out-1).  jax.image.resize is half-pixel
    (align_corners=False); the DPT head and Depth-Anything's final
    interpolation use align_corners=True, which differs enough to break
    parity.  Expressed via scale_and_translate: scale s = (out-1)/(in-1),
    translation 0.5 - 0.5*s."""
    d0, d1 = spatial_dims
    in_h, in_w = x.shape[d0], x.shape[d1]
    out_h, out_w = out_hw
    sh = (out_h - 1) / max(in_h - 1, 1) if out_h > 1 else 1.0
    sw = (out_w - 1) / max(in_w - 1, 1) if out_w > 1 else 1.0
    out_shape = list(x.shape)
    out_shape[d0], out_shape[d1] = out_h, out_w
    return jax.image.scale_and_translate(
        x, tuple(out_shape), (d0, d1),
        jnp.asarray([sh, sw], jnp.float32),
        jnp.asarray([0.5 - 0.5 * sh, 0.5 - 0.5 * sw], jnp.float32),
        method="bilinear", antialias=False)


def pick_bucket(h: int, w: int, buckets: Sequence[Tuple[int, int]],
                scale_mode: str = "shortest") -> Tuple[int, int]:
    """Choose the bucket whose aspect ratio is closest to the image's.

    Buckets keep jit compilations bounded across a directory sweep
    (BASELINE.json config 2)."""
    aspect = w / h
    return min(buckets, key=lambda b: abs((b[1] / b[0]) - aspect))


def to_device_image(np_image: np.ndarray) -> jax.Array:
    """Host uint8 HWC RGB -> device array (single host->HBM transfer)."""
    if np_image.ndim == 2:
        np_image = np.repeat(np_image[..., None], 3, axis=2)
    if np_image.shape[2] == 4:  # flatten alpha onto white, like the web app
        alpha = np_image[..., 3:4].astype(np.float32) / 255.0
        rgb = np_image[..., :3].astype(np.float32)
        np_image = (rgb * alpha + 255.0 * (1 - alpha)).astype(np.uint8)
    return jnp.asarray(np_image)


_RESIZE_MAT_CACHE: dict = {}


def resize_matrix(n_in: int, n_out: int, method: str = "bilinear",
                  antialias: bool = True) -> "np.ndarray":
    """The (n_out, n_in) matrix of the 1D jax.image.resize operator.

    Resize is linear, so resizing the identity yields its exact matrix —
    including jax's half-pixel centers, edge normalization and antialias
    widening on downscale.  Built once per shape on the CPU backend."""
    import numpy as np

    key = (n_in, n_out, method, antialias)
    m = _RESIZE_MAT_CACHE.get(key)
    if m is None:
        # ensure_compile_time_eval: callable from inside a jit trace (the
        # fused mask-postprocess program builds its matrices at trace time)
        with jax.ensure_compile_time_eval():
            cpu = jax.devices("cpu")[0]
            eye = jax.device_put(jnp.eye(n_in, dtype=jnp.float32), cpu)
            m = np.asarray(jax.image.resize(eye, (n_out, n_in),
                                            method=method,
                                            antialias=antialias))
        _RESIZE_MAT_CACHE[key] = m
    return m


_RESIZE_MAT_DEV_CACHE: dict = {}


def resize_matrix_device(n_in: int, n_out: int, method: str = "bilinear",
                         antialias: bool = True,
                         dtype=None) -> jax.Array:
    """Device-resident resize_matrix, uploaded ONCE per (shape, dtype).
    Re-uploading per call costs megabytes through slow transports (the
    eager mask-upsample path paid ~4MB of matrix uploads per image)."""
    np_dtype = np.dtype(jnp.dtype(dtype)) if dtype is not None else None
    m_np = resize_matrix(n_in, n_out, method, antialias)
    if np_dtype is not None and m_np.dtype != np_dtype:
        m_np = m_np.astype(np_dtype)
    try:
        _trace_state_clean = jax.core.trace_state_clean  # public alias
    except AttributeError:  # pragma: no cover - JAX version drift
        try:
            from jax._src import core as _core
            _trace_state_clean = _core.trace_state_clean
        except Exception:
            def _trace_state_clean():
                return False  # conservatively hand back the host constant
    if not _trace_state_clean():
        # inside a trace: hand back the host constant — jnp ops lift it
        # into the compiled program (caching a traced asarray would leak
        # the tracer into the cross-call cache)
        return m_np
    key = (n_in, n_out, method, antialias, str(dtype))
    m = _RESIZE_MAT_DEV_CACHE.get(key)
    if m is None:
        m = jnp.asarray(m_np)
        _RESIZE_MAT_DEV_CACHE[key] = m
    return m


def resize_batch_matmul(x: jax.Array, out_hw: Tuple[int, int],
                        method: str = "bilinear",
                        antialias: bool = True) -> jax.Array:
    """(N, H, W) resize via two separable matmuls — numerically the same
    linear map as jax.image.resize but on the MXU (the gather-based lowering
    runs ~20x off roofline for SAM's 64x256^2 -> 1024^2 mask upsample)."""
    n, h, w = x.shape
    oh, ow = out_hw
    wh = resize_matrix_device(h, oh, method, antialias, x.dtype)
    ww = resize_matrix_device(w, ow, method, antialias, x.dtype)
    y = jnp.einsum("oh,nhw->now", wh, x, preferred_element_type=x.dtype)
    return jnp.einsum("now,pw->nop", y, ww, preferred_element_type=x.dtype)
