"""ctypes bindings for the native host ops (native/host_ops.cpp).

Builds the shared library with g++ on first use (cached beside the source);
every entry point has a pure-python/scipy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "host_ops.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libhost_ops.so")
_lib = None
_tried = False


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB_PATH, "-lz"],
            check=True, capture_output=True)
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    fresh = (os.path.exists(_LIB_PATH) and os.path.exists(_SRC)
             and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC))
    path = _LIB_PATH if fresh else _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.exact_edt.argtypes = [u8, f32, ctypes.c_int, ctypes.c_int]
    lib.watershed.argtypes = [i32, f32, u8, ctypes.c_int, ctypes.c_int,
                              ctypes.c_double]
    lib.connected_components.argtypes = [u8, i32, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int]
    lib.connected_components.restype = ctypes.c_int
    if hasattr(lib, "png_encode"):
        lib.png_encode.argtypes = [u8, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   u8, ctypes.c_longlong]
        lib.png_encode.restype = ctypes.c_longlong
    if hasattr(lib, "integral_nonzero"):
        lib.integral_nonzero.argtypes = [u8, i32, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def exact_edt(seeds: np.ndarray) -> np.ndarray:
    """Exact euclidean distance to the nearest True pixel."""
    lib = get_lib()
    h, w = seeds.shape
    if lib is None:
        from scipy import ndimage

        return ndimage.distance_transform_edt(~np.asarray(seeds, bool)).astype(
            np.float32)
    out = np.empty((h, w), np.float32)
    lib.exact_edt(np.ascontiguousarray(seeds, np.uint8), out, h, w)
    return out


def watershed(markers: np.ndarray, elevation: np.ndarray, region: np.ndarray,
              compactness: float = 0.0) -> np.ndarray:
    """Priority-flood watershed (skimage.segmentation.watershed equivalent)."""
    lib = get_lib()
    h, w = markers.shape
    labels = np.ascontiguousarray(markers, np.int32).copy()
    if lib is None:
        raise RuntimeError("native watershed unavailable (no g++)")
    lib.watershed(labels, np.ascontiguousarray(elevation, np.float32),
                  np.ascontiguousarray(region, np.uint8), h, w,
                  float(compactness))
    return labels


def connected_components(mask: np.ndarray, connectivity: int = 8
                         ) -> Tuple[np.ndarray, int]:
    lib = get_lib()
    h, w = mask.shape
    if lib is None:
        from scipy import ndimage

        structure = np.ones((3, 3)) if connectivity == 8 else None
        labels, n = ndimage.label(mask, structure=structure)
        return labels.astype(np.int32), int(n)
    labels = np.empty((h, w), np.int32)
    n = lib.connected_components(np.ascontiguousarray(mask, np.uint8), labels,
                                 h, w, connectivity)
    return labels, int(n)


def integral_nonzero(gray: np.ndarray) -> np.ndarray:
    """Padded (H+1, W+1) int32 integral image of (gray > 0) — the NMS
    prefilter's per-box ink-count lookup table.  Single C pass; numpy
    int32 double-cumsum fallback (bit-identical for images < 2^31 px)."""
    gray = np.ascontiguousarray(gray, np.uint8)
    h, w = gray.shape
    lib = get_lib()
    if lib is None or not hasattr(lib, "integral_nonzero"):
        return np.pad((gray > 0).astype(np.int32),
                      ((1, 0), (1, 0))).cumsum(0).cumsum(1)
    out = np.empty((h + 1, w + 1), np.int32)
    lib.integral_nonzero(gray.reshape(-1), out.reshape(-1), h, w)
    return out


def png_encode(arr: np.ndarray, bilevel: bool = False,
               level: int = 1) -> Optional[bytes]:
    """Encode (H, W) or (H, W, 3) uint8 to PNG bytes (filter-None + zlib).

    Decodes to bit-identical pixels vs PIL's encoder at a fraction of the
    host CPU (PIL spends most of its PNG time on adaptive filter search).
    bilevel packs a 0/nonzero (H, W) mask to 1-bit grayscale.  Returns None
    when the native lib (or png_encode in a stale build) is unavailable —
    callers fall back to PIL.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "png_encode"):
        return None
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w = arr.shape[:2]
    channels = 1 if arr.ndim == 2 else arr.shape[2]
    cap = arr.size + arr.size // 2 + 4096
    out = np.empty((cap,), np.uint8)
    n = lib.png_encode(arr.reshape(-1), h, w, channels,
                       1 if bilevel else 0, level, out, cap)
    if n <= 0:
        return None
    return out[:n].tobytes()
