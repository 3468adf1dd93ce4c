"""Standalone depth demo CLI (run.py / run_video.py parity)."""

import argparse
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import depth_demo  # noqa: E402


class FakeEstimator:
    def infer_image(self, image):
        h, w = image.shape[:2]
        return np.linspace(0, 1, h * w, dtype=np.float32).reshape(h, w)


def _args(**kw):
    base = dict(img_path=None, video_path=None, input_size=518,
                outdir=None, encoder="vitb", pred_only=False,
                grayscale=False, models_dir=None, serve=False, port=0)
    base.update(kw)
    return argparse.Namespace(**base)


def test_colorize_modes():
    d = np.linspace(0, 5, 12, dtype=np.float32).reshape(3, 4)
    gray = depth_demo.colorize(d, grayscale=True)
    assert gray.shape == (3, 4, 3) and gray.dtype == np.uint8
    assert gray[0, 0, 0] == 0 and gray[-1, -1, 0] == 255
    assert (gray[..., 0] == gray[..., 1]).all()
    spec = depth_demo.colorize(d, grayscale=False)
    assert spec.shape == (3, 4, 3)
    assert not (spec[..., 0] == spec[..., 2]).all()  # actually colored


def test_run_images_file_txt_dir(tmp_path):
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    imgs = []
    for i in range(2):
        p = src_dir / f"im{i}.png"
        Image.fromarray(np.full((20, 30, 3), 40 * i, np.uint8)).save(p)
        imgs.append(str(p))
    # single file, side-by-side output (W*2 + 50 margin, run.py:69-73)
    out1 = depth_demo.run_images(FakeEstimator(), _args(
        img_path=imgs[0], outdir=str(tmp_path / "o1")))
    assert len(out1) == 1
    assert Image.open(out1[0]).size == (30 * 2 + 50, 20)
    # txt list, pred-only
    lst = tmp_path / "files.txt"
    lst.write_text("\n".join(imgs))
    out2 = depth_demo.run_images(FakeEstimator(), _args(
        img_path=str(lst), outdir=str(tmp_path / "o2"), pred_only=True))
    assert len(out2) == 2
    assert Image.open(out2[0]).size == (30, 20)
    # directory glob picks up both source images
    out3 = depth_demo.run_images(FakeEstimator(), _args(
        img_path=str(src_dir), outdir=str(tmp_path / "o3"), pred_only=True,
        grayscale=True))
    assert len(out3) == 2


def test_run_video_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    src = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 5, (32, 24))
    for i in range(4):
        w.write(np.full((24, 32, 3), 30 * i, np.uint8))
    w.release()
    out = depth_demo.run_video(FakeEstimator(), _args(
        video_path=src, outdir=str(tmp_path / "vo")))
    assert len(out) == 1 and os.path.exists(out[0])
    cap = cv2.VideoCapture(out[0])
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 32 * 2 + 50
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    cap.release()


def test_build_estimator_placeholder_tiny():
    # tiny config so the flax init is fast; placeholder params path
    import dataclasses

    from inklayer_tpu.config import DepthConfig

    tiny = dataclasses.replace(
        DepthConfig(), embed_dim=32, depth=4, num_heads=2, features=16,
        out_channels=(16, 16, 16, 16), input_size=28,
        intermediate_layers=(0, 1, 2, 3))
    import depth_demo as dd

    orig = dd.build_estimator.__globals__  # noqa: F841 - keep linter calm
    # monkeypatch the factory table to the tiny config
    from inklayer_tpu.models.depth import DepthEstimator

    est = None
    import unittest.mock as mock

    from inklayer_tpu import config as cfgmod

    with mock.patch.object(cfgmod.DepthConfig, "vits",
                           staticmethod(lambda: tiny)):
        est = dd.build_estimator("vits", models_dir=None, input_size=28)
    assert isinstance(est, DepthEstimator)
    d = est.infer_image(np.zeros((30, 40, 3), np.uint8))
    assert d.shape == (30, 40) and np.isfinite(d).all()
