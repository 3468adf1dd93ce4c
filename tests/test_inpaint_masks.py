import numpy as np
import pytest
from PIL import Image

from inklayer_tpu.pipeline.inpaint.masks import (
    _fill_holes,
    _otsu_threshold,
    create_rgba_layer,
    get_mask,
)
from inklayer_tpu.pipeline.inpaint.orchestrate import (
    Inpainter,
    assemble_inpaint_input,
    expand_mask_to_rect,
    mask_to_bbox,
    mask_within_bbox,
)
from inklayer_tpu.pipeline.inpaint.prepost import (
    finalize_sketch,
    make_inpaint_condition,
    postprocess_result,
    preprocess_image,
    preprocess_mask,
)


def _circle_sketch(h=128, w=128, cy=64, cx=64, r=30, thickness=3):
    g = np.full((h, w), 255, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    g[np.abs(d - r) < thickness] = 0
    return g


def test_otsu_bimodal():
    g = np.full((50, 50), 250, np.uint8)
    g[:10] = 5
    t = _otsu_threshold(g)
    # any plateau value separates the modes; thresholding is done with `> t`
    assert 5 <= t < 250


def test_fill_holes():
    m = np.zeros((20, 20), bool)
    m[5:15, 5:15] = True
    m[8:12, 8:12] = False  # hole
    out = _fill_holes(m)
    assert out[10, 10]
    assert not out[0, 0]


def test_get_mask_closed_silhouette():
    g = _circle_sketch()
    mask, mtype = get_mask(g)
    assert mtype.startswith("closed-silhouette")
    # interior is filled
    assert mask[64, 64]
    # strokes covered
    assert mask[(g < 128)].all()
    # far corner not in silhouette
    assert not mask[2, 2]


def test_get_mask_open_curve():
    g = np.full((64, 64), 255, np.uint8)
    g[0:64, 30:33] = 0  # line touching top and bottom borders
    mask, mtype = get_mask(g)
    assert mtype == "open-curve"
    assert mask[32, 31]
    assert not mask[32, 5]


def test_create_rgba_layer():
    g = _circle_sketch()
    rgb = np.repeat(g[..., None], 3, 2)
    rgba, mtype = create_rgba_layer(rgb)
    assert rgba.shape == (128, 128, 4)
    # ink opaque and dark
    assert rgba[64 - 30, 64, 3] == 255
    # interior silhouette white opaque
    assert (rgba[64, 64] == [255, 255, 255, 255]).all()
    # outside transparent
    assert rgba[2, 2, 3] == 0


def test_assemble_inpaint_front_layer():
    masks = [np.zeros((64, 64), bool), np.zeros((64, 64), bool)]
    masks[0][10:30, 10:30] = True
    masks[1][20:50, 20:50] = True
    sketch = np.full((64, 64, 3), 255, np.uint8)
    sketch[12:28, 12:28] = 0
    sketch[22:48, 22:48] = 50
    edit, layer, debug, need, om = assemble_inpaint_input(masks, 0, sketch)
    assert not need and edit is None
    # front layer keeps only its ink
    assert (layer[40, 40] == 255).all()


def test_assemble_inpaint_occluded_layer():
    # front mask is a plus-shape: its bbox covers corner pixels that belong
    # to the behind mask (this is what triggers the occlusion path for real,
    # non-rectangular masks — disjoint rectangles can never overlap a bbox)
    masks = [np.zeros((64, 64), bool), np.zeros((64, 64), bool)]
    masks[0][12:36, 20:28] = True
    masks[0][20:28, 12:36] = True
    masks[1][10:55, 10:55] = True
    masks[1] &= ~masks[0]  # pipeline masks are disjoint: occluder owns overlap
    sketch = np.full((64, 64, 3), 255, np.uint8)
    sketch[masks[0]] = 0
    sketch[masks[1]] = 80
    edit, layer, debug, need, om = assemble_inpaint_input(masks, 1, sketch)
    assert need
    assert edit is not None and edit.any()
    # edit region excludes the layer's own mask
    assert not (edit & masks[1]).any()


def test_inpainter_end_to_end(tmp_path):
    # fake sketch dir with masks_final + input.png
    d = tmp_path / "sketch"
    (d / "masks_final").mkdir(parents=True)
    h = w = 64
    m0 = np.zeros((h, w), bool)
    m0[5:25, 5:25] = True
    m1 = np.zeros((h, w), bool)
    m1[15:45, 15:45] = True
    for i, m in enumerate([m0, m1]):
        Image.fromarray(m.astype(np.uint8) * 255).save(
            d / "masks_final" / f"mask_{i}.png")
    sketch = np.full((h, w, 3), 255, np.uint8)
    sketch[6:24, 6:24] = 0
    sketch[16:44, 16:44] = np.minimum(sketch[16:44, 16:44], 60)
    Image.fromarray(sketch).save(d / "input.png")

    calls = []

    def fake_inpaint(img, mask):
        calls.append((img.size, mask.size))
        return img  # identity

    inp = Inpainter(fake_inpaint)
    layers_dir = inp.run_on_sketch_dir(str(d))
    assert len(calls) == 1  # only the occluded layer needs inpainting
    import os
    assert os.path.exists(str(d / "complete_layers" / "layer_0.png"))
    assert os.path.exists(str(d / "complete_layers" / "layer_1.png"))
    assert os.path.exists(
        str(d / "complete_layers_process" / "mask_1" / "edit_mask.png"))
    assert os.path.exists(str(d / "complete_layers_rgba" / "layer_0.png"))
    rgba = np.asarray(Image.open(d / "complete_layers_rgba" / "layer_0.png"))
    assert rgba.shape[-1] == 4


def test_prepost_roundtrip():
    img = Image.fromarray(np.full((64, 64, 3), 200, np.uint8))
    mask = Image.fromarray(np.zeros((64, 64), np.uint8))
    pre = preprocess_image(img)
    assert pre.size == img.size
    pm = preprocess_mask(mask)
    assert pm.size == mask.size
    cond = make_inpaint_condition(img, Image.fromarray(
        (np.eye(64) * 255).astype(np.uint8)))
    assert cond.min() == -1.0
    post = postprocess_result(img, img, mask)
    assert post.size == img.size
    fin = finalize_sketch(img)
    assert fin.mode == "RGB"


def test_expand_mask_to_rect():
    m = np.zeros((50, 50), bool)
    m[20:25, 20:25] = True
    out = expand_mask_to_rect(m, pad=10)
    assert out[11, 11] and out[33, 33]
    assert not out[5, 5]
