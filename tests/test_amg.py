import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inklayer_tpu.models.sam import Sam, SamPredictor
from inklayer_tpu.models.sam.amg import (
    SamAutomaticMaskGenerator,
    box_nms,
    build_point_grid,
    mask_boxes,
    mask_to_rle,
    rle_to_mask,
    stability_score,
)
from tests.test_sam import TINY


def test_point_grid():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert abs(g[0, 0] - 1 / 8) < 1e-9
    assert abs(g[-1, 1] - 7 / 8) < 1e-9


def test_stability_score():
    logits = jnp.asarray([[[2.0, 2.0], [0.5, -2.0]]])
    # >1: 2 px; >-1: 3 px -> 2/3
    s = np.asarray(stability_score(logits))
    np.testing.assert_allclose(s, [2 / 3], atol=1e-6)


def test_mask_boxes():
    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True
    boxes = np.asarray(mask_boxes(jnp.asarray(m)))
    np.testing.assert_array_equal(boxes[0], [3, 2, 7, 5])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])


def test_box_nms():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                       float)
    scores = np.asarray([0.9, 0.8, 0.7])
    keep = box_nms(boxes, scores, 0.5)
    assert 0 in keep and 2 in keep and 1 not in keep


def test_rle_roundtrip(rng):
    m = rng.random((13, 17)) > 0.6
    rle = mask_to_rle(m)
    np.testing.assert_array_equal(rle_to_mask(rle), m)
    assert rle["size"] == [13, 17]


@pytest.mark.slow
def test_amg_generate_tiny(rng):
    model = Sam(TINY)
    image = jnp.zeros((1, TINY.image_size, TINY.image_size, 3))
    boxes = jnp.zeros((2, 4))
    params = model.init(jax.random.key(0), image, boxes)
    pred = SamPredictor(params, TINY, box_capacity=4)
    amg = SamAutomaticMaskGenerator(
        pred, points_per_side=2, points_per_batch=4,
        pred_iou_thresh=-100.0, stability_score_thresh=0.0)
    img = (rng.random((50, 40, 3)) * 255).astype(np.uint8)
    records = amg.generate(img)
    assert len(records) > 0
    r = records[0]
    assert r["segmentation"].shape == (50, 40)
    assert set(r) >= {"segmentation", "area", "bbox", "predicted_iou",
                      "stability_score", "point_coords"}
