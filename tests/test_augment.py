import numpy as np
import pytest

from inklayer_tpu.pipeline.augment import (
    augment_sketch,
    background_tint,
    elastic_warp,
    opacity_texture,
    stroke_width_jitter,
)


def _sketch():
    g = np.full((64, 64), 255, np.uint8)
    g[20:44, 30:33] = 0
    g[30:33, 10:54] = 0
    return g


def test_width_jitter_thicken_thin():
    g = _sketch()
    thick = stroke_width_jitter(g, 1)
    thin = stroke_width_jitter(g, -1)
    assert (thick < 250).sum() > (g < 250).sum()
    assert (thin < 250).sum() < (g < 250).sum()
    np.testing.assert_array_equal(stroke_width_jitter(g, 0), g)


def test_elastic_warp_preserves_ink_quantity():
    g = _sketch()
    w = elastic_warp(g, alpha=4.0, seed=1)
    ink0 = (g < 250).sum()
    ink1 = (w < 250).sum()
    assert 0.5 * ink0 < ink1 < 2.0 * ink0
    assert w.shape == g.shape


def test_opacity_texture_lightens_only_ink():
    g = _sketch()
    o = opacity_texture(g, strength=0.5, seed=2)
    assert (o[g >= 250] == g[g >= 250]).all()
    assert (o[g < 250] >= g[g < 250]).all()


def test_background_tint():
    g = _sketch()
    t = background_tint(g, tint=0.1, seed=3)
    assert (t[g >= 250] <= 255).all()
    assert (t[g < 250] == g[g < 250]).all()


def test_augment_with_labels_alignment():
    g = _sketch()
    labels = np.zeros((64, 64), np.int32)
    labels[g < 250] = 1
    out, wl = augment_sketch(g, labels, seed=7)
    assert out.shape == g.shape and wl.shape == labels.shape
    # warped ink and warped labels stay mostly aligned
    ink = out < 245
    inter = (ink & (wl > 0)).sum()
    assert inter > 0.5 * min(ink.sum(), (wl > 0).sum())


def test_augment_deterministic():
    g = _sketch()
    a1, _ = augment_sketch(g, seed=11)
    a2, _ = augment_sketch(g, seed=11)
    np.testing.assert_array_equal(a1, a2)
