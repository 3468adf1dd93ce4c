"""COCO-style AP evaluator tests (pipeline/coco_eval.py)."""

import numpy as np

from inklayer_tpu.pipeline.coco_eval import (
    box_iou_matrix, evaluate_detections, _average_precision, _match_image)


def test_perfect_predictions():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]])}]
    pred = [{"boxes": gt[0]["boxes"].copy(),
             "scores": np.array([0.9, 0.8])}]
    m = evaluate_detections(pred, gt)
    assert m["mAP"] == 1.0 and m["AP50"] == 1.0 and m["AP75"] == 1.0
    assert m["AR100"] == 1.0


def test_localization_quality_graded_by_iou():
    gt = [{"boxes": np.array([[0.0, 0.0, 10.0, 10.0]])}]
    # shifted box: IoU ~0.54 -> counts at 0.5 but not at 0.75
    pred = [{"boxes": np.array([[3.0, 0.0, 13.0, 10.0]]),
             "scores": np.array([0.9])}]
    m = evaluate_detections(pred, gt)
    assert m["AP50"] == 1.0
    assert m["AP75"] == 0.0
    assert 0.0 < m["mAP"] < 1.0


def test_false_positives_lower_precision():
    gt = [{"boxes": np.array([[0, 0, 10, 10]])}]
    # a HIGHER-scored false positive ahead of the true positive
    pred = [{"boxes": np.array([[50, 50, 60, 60], [0, 0, 10, 10]]),
             "scores": np.array([0.95, 0.9])}]
    m = evaluate_detections(pred, gt)
    # precision at the recall point is 1/2
    assert abs(m["AP50"] - 0.5) < 0.02
    # lower-scored FP does NOT hurt (precision envelope)
    pred2 = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]]),
              "scores": np.array([0.9, 0.1])}]
    m2 = evaluate_detections(pred2, gt)
    assert m2["AP50"] == 1.0


def test_duplicate_detection_is_fp():
    gt = [{"boxes": np.array([[0, 0, 10, 10]])}]
    pred = [{"boxes": np.array([[0, 0, 10, 10], [0, 0, 10, 10]]),
             "scores": np.array([0.9, 0.8])}]
    tp, n_gt = _match_image(box_iou_matrix(pred[0]["boxes"], gt[0]["boxes"]),
                            pred[0]["scores"], 0.5)
    assert tp.tolist() == [True, False] and n_gt == 1


def test_multi_image_aggregation():
    gt = [{"boxes": np.array([[0, 0, 10, 10]])},
          {"boxes": np.array([[0, 0, 10, 10]])}]
    pred = [{"boxes": np.array([[0, 0, 10, 10]]), "scores": np.array([0.9])},
            {"boxes": np.zeros((0, 4)), "scores": np.zeros((0,))}]
    m = evaluate_detections(pred, gt)
    # one of two GTs found: recall caps at 0.5 -> AP ~0.5
    assert abs(m["AP50"] - 0.5) < 0.02
    assert abs(m["AR100"] - 0.5) < 1e-6


def test_mask_ap():
    a = np.zeros((20, 20), bool); a[:10, :10] = True
    b = np.zeros((20, 20), bool); b[5:15, :10] = True  # IoU = 1/3
    gt = [{"boxes": np.zeros((1, 4)), "masks": [a]}]
    pred = [{"boxes": np.zeros((1, 4)), "scores": np.array([0.9]),
             "masks": [a]}]
    assert evaluate_detections(pred, gt, use_masks=True)["mAP"] == 1.0
    pred2 = [{"boxes": np.zeros((1, 4)), "scores": np.array([0.9]),
              "masks": [b]}]
    assert evaluate_detections(pred2, gt, use_masks=True)["mAP"] == 0.0


def test_ap_interpolation_monotone():
    # three preds, middle one FP: precision envelope applies
    tp = np.array([True, False, True])
    scores = np.array([0.9, 0.8, 0.7])
    ap = _average_precision(tp, scores, n_gt=2)
    assert 0.5 < ap < 1.0
