"""Inpainting pre/post-processing.

Parity target: inpainting/inpaint_ControlNet.py —
preprocess_image (:49-65): contrast 1.2 + bilateral denoise;
preprocess_mask (:67-75): 3x3 dilate + gaussian blur;
make_inpaint_condition (:77-90): masked pixels -> -1.0 control image;
postprocess_result / _adaptive_threshold_blend (:92-124): gaussian adaptive
threshold binarisation + soft-mask blend; final grayscale + unsharp (:181-182).
"""

from __future__ import annotations

import cv2
import numpy as np
from PIL import Image, ImageEnhance, ImageFilter


def preprocess_image(image: Image.Image, enhance_contrast: bool = True,
                     denoise: bool = True) -> Image.Image:
    if enhance_contrast:
        image = ImageEnhance.Contrast(image).enhance(1.2)
    if denoise:
        arr = np.asarray(image)
        image = Image.fromarray(cv2.bilateralFilter(arr, 5, 50, 50))
    return image


def preprocess_mask(mask: Image.Image, dilate_iterations: int = 1,
                    blur_radius: int = 1) -> Image.Image:
    arr = np.asarray(mask.convert("L"))
    if dilate_iterations > 0:
        kernel = np.ones((3, 3), np.uint8)
        arr = cv2.dilate(arr, kernel, iterations=dilate_iterations)
    if blur_radius > 0:
        k = blur_radius * 2 + 1
        arr = cv2.GaussianBlur(arr, (k, k), 0)
    return Image.fromarray(arr)


def make_inpaint_condition(init_image: Image.Image,
                           mask_image: Image.Image) -> np.ndarray:
    """(H, W, 3) float32 in [0,1] with masked pixels = -1 (ControlNet
    inpaint conditioning convention)."""
    img = np.asarray(init_image.convert("RGB"), np.float32) / 255.0
    msk = np.asarray(mask_image.convert("L"), np.float32) / 255.0
    img = img.copy()
    img[msk > 0.5] = -1.0
    return img


def postprocess_result(result: Image.Image, original: Image.Image,
                       mask: Image.Image) -> Image.Image:
    res = np.asarray(result)
    orig = np.asarray(original)
    m = np.asarray(mask.convert("L")) / 255.0
    gray = cv2.cvtColor(res, cv2.COLOR_RGB2GRAY) if res.ndim == 3 else res.copy()
    thresh = cv2.adaptiveThreshold(gray, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                   cv2.THRESH_BINARY, 11, 2)
    if res.ndim == 3:
        clean = np.where(thresh[..., None] > 127, 255, res)
    else:
        clean = np.where(thresh > 127, 255, res)
    soft = np.clip(cv2.GaussianBlur(m, (3, 3), 1), 0, 1)
    if res.ndim == 3:
        soft = soft[..., None]
    blended = clean * soft + orig * (1 - soft)
    return Image.fromarray(blended.astype(np.uint8))


def finalize_sketch(image: Image.Image) -> Image.Image:
    """Grayscale + unsharp mask (ControlNet_inpaint :181-182)."""
    image = image.convert("L").convert("RGB")
    return image.filter(ImageFilter.UnsharpMask(radius=0.5, percent=150,
                                                threshold=3))
