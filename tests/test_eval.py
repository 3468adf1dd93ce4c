import os

import numpy as np
import pytest
from PIL import Image

from inklayer_tpu.pipeline.eval import (
    evaluate_sweep,
    greedy_match,
    instance_metrics,
    labels_to_masks,
    load_instance_gt,
    mask_iou_matrix,
    visualize_label_matrix,
)


def test_labels_to_masks():
    lm = np.zeros((10, 10), np.int32)
    lm[2:5, 2:5] = 1
    lm[6:9, 6:9] = 7
    masks = labels_to_masks(lm)
    assert len(masks) == 2
    assert masks[0].sum() == 9 and masks[1].sum() == 9


def test_metrics_perfect_match():
    m1 = np.zeros((10, 10), bool)
    m1[:5] = True
    m2 = ~m1
    metrics = instance_metrics([m1, m2], [m2, m1])
    assert metrics["mean_matched_iou"] == 1.0
    assert metrics["precision@0.5"] == 1.0
    assert metrics["recall@0.75"] == 1.0


def test_metrics_partial():
    gt = np.zeros((10, 10), bool)
    gt[0:6] = True
    pred = np.zeros((10, 10), bool)
    pred[0:3] = True  # IoU 0.5
    metrics = instance_metrics([pred], [gt])
    assert metrics["precision@0.5"] == 1.0
    assert metrics["precision@0.75"] == 0.0
    assert abs(metrics["mean_matched_iou"] - 0.5) < 1e-9


def test_greedy_match_order():
    iou = np.asarray([[0.9, 0.2], [0.8, 0.7]])
    matches = greedy_match(iou)
    assert matches[0][:2] == (0, 0)
    assert matches[1][:2] == (1, 1)


def test_mat_roundtrip(tmp_path):
    from scipy.io import savemat

    lm = np.zeros((12, 12), np.uint8)
    lm[2:6, 2:6] = 1
    lm[7:11, 7:11] = 2
    mat = str(tmp_path / "toy.mat")
    savemat(mat, {"INSTANCE_GT": lm})
    loaded = load_instance_gt(mat)
    np.testing.assert_array_equal(loaded, lm)
    rgb = visualize_label_matrix(loaded, str(tmp_path / "vis.png"))
    assert (rgb[0, 0] == 255).all()
    assert not (rgb[3, 3] == 255).all()


def test_evaluate_sweep(tmp_path):
    from scipy.io import savemat

    out = tmp_path / "outputs" / "toy"
    (out / "masks_final").mkdir(parents=True)
    m = np.zeros((12, 12), bool)
    m[2:6, 2:6] = True
    Image.fromarray(m.astype(np.uint8) * 255).save(
        out / "masks_final" / "mask_0.png")
    lm = np.zeros((12, 12), np.uint8)
    lm[2:6, 2:6] = 1
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    savemat(str(gt_dir / "toy.mat"), {"INSTANCE_GT": lm})
    report = evaluate_sweep(str(tmp_path / "outputs"), str(gt_dir),
                            str(tmp_path / "report.json"))
    assert report["aggregate"]["mean_matched_iou"] == 1.0
    assert os.path.exists(tmp_path / "report.json")
