"""Binary morphology as convolutions (MXU/VPU-friendly).

Replaces the reference's cv2/skimage host morphology (mask_cleaner.py
MORPH_CLOSE, refiner.py binary_dilation/disk, create_unlabeled_mask
MORPH_OPEN): dilation = conv(mask, SE) > 0, erosion = conv(mask, SE) == |SE|.
Structuring elements are tiny static kernels so XLA fuses the threshold into
the conv epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def rect_kernel(k: int) -> np.ndarray:
    return np.ones((k, k), np.float32)


@functools.lru_cache(maxsize=32)
def ellipse_kernel(k: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (k, k)) semantics."""
    se = np.zeros((k, k), np.float32)
    r = k // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    for i in range(k):
        dy = abs(i - r)
        if r > 0:
            dx = int(round(r * np.sqrt(max(0.0, 1.0 - (dy * dy) * inv_r2))))
        else:
            dx = 0
        se[i, max(0, r - dx): min(k, r + dx + 1)] = 1.0
    return se


@functools.lru_cache(maxsize=32)
def disk_kernel(radius: int) -> np.ndarray:
    """skimage.morphology.disk(radius) semantics: x^2 + y^2 <= r^2."""
    k = 2 * radius + 1
    yy, xx = np.mgrid[-radius: radius + 1, -radius: radius + 1]
    return ((yy * yy + xx * xx) <= radius * radius).astype(np.float32)


def _is_rect(se: np.ndarray) -> bool:
    return bool((se == 1.0).all())


def _conv_counts(mask: jax.Array, se: np.ndarray, border: float = 0.0) -> jax.Array:
    """mask: (..., H, W) bool -> neighbor counts under SE, same shape.
    `border` is the value assumed outside the image (cv2 semantics: 0 for
    dilation, 1 for erosion so borders are not eaten)."""
    shape = mask.shape
    x = mask.astype(jnp.float32).reshape((-1,) + shape[-2:] + (1,))
    kh, kw = se.shape
    x = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
                constant_values=border)
    if _is_rect(se) and min(kh, kw) > 3:
        # separable rect kernel: two 1D convs (k+k taps instead of k*k)
        kcol = jnp.ones((kh, 1, 1, 1), jnp.float32)
        krow = jnp.ones((1, kw, 1, 1), jnp.float32)
        out = jax.lax.conv_general_dilated(
            x, kcol, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            out, krow, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out[..., 0].reshape(shape)
    kernel = jnp.asarray(se)[:, :, None, None]
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[..., 0].reshape(shape)


def binary_dilate(mask: jax.Array, se: np.ndarray) -> jax.Array:
    return _conv_counts(mask, se, border=0.0) > 0.5


def binary_erode(mask: jax.Array, se: np.ndarray) -> jax.Array:
    return _conv_counts(mask, se, border=1.0) > float(se.sum()) - 0.5


def _dilate_rect_chan(x: jax.Array, kh: int, kw: int) -> jax.Array:
    """x: (1, H, W, N) bool; rect dilation via depthwise separable convs with
    the batch packed into CHANNELS — C=1 convs tile terribly on TPU
    (measured 15.6 -> 6.9 ms for a 64x750^2 close with k=19 on v5e).
    The any-nonzero threshold is immune to TPU conv rounding."""
    n = x.shape[-1]
    kcol = jnp.ones((kh, 1, 1, n), jnp.float32)
    krow = jnp.ones((1, kw, 1, n), jnp.float32)
    y = jnp.pad(x.astype(jnp.float32),
                ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    y = jax.lax.conv_general_dilated(
        y, kcol, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=n)
    y = jax.lax.conv_general_dilated(
        y, krow, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=n)
    return y > 0.5


def _rect_chan_path(mask: jax.Array, se: np.ndarray) -> bool:
    return (jax.default_backend() == "tpu" and _is_rect(se)
            and mask.ndim == 3 and mask.shape[0] > 1 and min(se.shape) > 3)


def morph_close(mask: jax.Array, se: np.ndarray) -> jax.Array:
    if _rect_chan_path(mask, se):
        kh, kw = se.shape
        x = mask.astype(bool).transpose(1, 2, 0)[None]
        d = _dilate_rect_chan(x, kh, kw)
        # erode(y) = ~dilate(~y); ~y's zero border = erode's 1-border
        e = ~_dilate_rect_chan(~d, kh, kw)
        return e[0].transpose(2, 0, 1)
    return binary_erode(binary_dilate(mask, se), se)


def morph_open(mask: jax.Array, se: np.ndarray) -> jax.Array:
    if _rect_chan_path(mask, se):
        kh, kw = se.shape
        x = mask.astype(bool).transpose(1, 2, 0)[None]
        e = ~_dilate_rect_chan(~x, kh, kw)
        d = _dilate_rect_chan(e, kh, kw)
        return d[0].transpose(2, 0, 1)
    return binary_dilate(binary_erode(mask, se), se)


def neighbor_count(mask: jax.Array, window: int = 3) -> jax.Array:
    """Number of True neighbors in a window, excluding the center pixel
    (refiner.py clean_delicate_mask:20-32)."""
    se = np.ones((window, window), np.float32)
    se[window // 2, window // 2] = 0.0
    return _conv_counts(mask, se)
