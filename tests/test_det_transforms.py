"""Detection train-transform tests (pipeline/det_transforms.py) — checked
against the reference's torch transforms where importable."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from inklayer_tpu.pipeline.det_transforms import (
    boxes_to_cxcywh_norm, crop, detr_train_transform, hflip, resize_shorter)

GD_T = ("/root/reference/InkLayer/third_party/GroundingDINO/groundingdino/"
        "datasets/transforms.py")


def test_hflip_involution(rng):
    img = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
    boxes = np.array([[5.0, 10.0, 20.0, 30.0]])
    i2, b2 = hflip(*hflip(img, boxes))
    np.testing.assert_array_equal(i2, img)
    np.testing.assert_allclose(b2, boxes)
    # flipped box stays inside and mirrors x
    _, bf = hflip(img, boxes)
    np.testing.assert_allclose(bf[0], [60 - 20, 10, 60 - 5, 30])


def test_resize_shorter_cap(rng):
    img = (rng.random((300, 900, 3)) * 255).astype(np.uint8)
    boxes = np.array([[90.0, 30.0, 450.0, 150.0]])
    out, b = resize_shorter(img, boxes, 800, max_size=1333)
    # longer side capped: 900/300*800 = 2400 > 1333 -> short side 444
    assert max(out.shape[:2]) <= 1334
    assert min(out.shape[:2]) == int(round(1333 * 300 / 900))
    # box scales with the image
    sy, sx = out.shape[0] / 300, out.shape[1] / 900
    np.testing.assert_allclose(b[0], [90 * sx, 30 * sy, 450 * sx, 150 * sy],
                               rtol=1e-6)


def test_crop_clips_and_drops(rng):
    img = (rng.random((50, 50, 3)) * 255).astype(np.uint8)
    boxes = np.array([[5.0, 5.0, 20.0, 20.0],     # inside
                      [40.0, 40.0, 49.0, 49.0]])  # outside the crop
    out, b, keep = crop(img, boxes, (0, 0, 30, 30))
    assert out.shape[:2] == (30, 30)
    assert keep.tolist() == [True, False]


def test_cxcywh_normalization():
    b = np.array([[10.0, 20.0, 30.0, 60.0]])
    n = boxes_to_cxcywh_norm(b, (100, 200))
    np.testing.assert_allclose(n[0], [20 / 200, 40 / 100, 20 / 200, 40 / 100])


def test_train_transform_boxes_stay_normalized(rng):
    for seed in range(5):
        g = np.random.default_rng(seed)
        img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
        boxes = np.array([[100.0, 100.0, 400.0, 300.0],
                          [10.0, 20.0, 80.0, 90.0]])
        out, nb = detr_train_transform(g, img, boxes)
        assert out.dtype == np.uint8 and out.ndim == 3
        assert (nb >= 0).all() and (nb <= 1).all()
        assert (nb[:, 2:] > 0).all()  # no degenerate boxes survive


def test_resize_matches_reference_get_size():
    """Size arithmetic matches the reference RandomResize.get_size."""
    if not os.path.isfile(GD_T):
        pytest.skip("reference not mounted")
    # the reference module needs torch/torchvision; replicate only the
    # pure-python size computation it defines (transforms.py:226-246 path)
    src = open(GD_T).read()
    assert "get_size_with_aspect_ratio" in src

    def ref_get_size(h, w, size, max_size):
        # transcription of get_size_with_aspect_ratio semantics for oracle
        # comparison of OUR implementation's arithmetic
        if max_size is not None:
            min_original = float(min(h, w))
            max_original = float(max(h, w))
            if max_original / min_original * size > max_size:
                size = int(round(max_size * min_original / max_original))
        if (w <= h and w == size) or (h <= w and h == size):
            return h, w
        if w < h:
            ow = size
            oh = int(size * h / w)
        else:
            oh = size
            ow = int(size * w / h)
        return oh, ow

    rng = np.random.default_rng(0)
    for _ in range(50):
        h, w = int(rng.integers(100, 1500)), int(rng.integers(100, 1500))
        size = int(rng.choice([480, 640, 800]))
        img = np.zeros((h, w, 3), np.uint8)
        out, _ = resize_shorter(img, np.zeros((0, 4)), size, 1333)
        rh, rw = ref_get_size(h, w, size, 1333)
        assert abs(out.shape[0] - rh) <= 1 and abs(out.shape[1] - rw) <= 1, (
            (h, w, size, out.shape[:2], (rh, rw)))
