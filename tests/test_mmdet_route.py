"""mmdetection-contract alt detector route (gdino_mmdetection.py parity)."""

import json
import os

import numpy as np
from PIL import Image

from inklayer_tpu.pipeline.mmdet_route import (_match_noun,
                                               run_ft_dino_inference_on_image)


class FakeDetector:
    def detect(self, image, caption=None, box_threshold=None):
        assert caption == "dog . cat"
        assert box_threshold == 0.3
        return {
            "boxes": np.asarray([[0.5, 0.5, 0.2, 0.4], [0.25, 0.25, 0.1, 0.1]]),
            "scores": np.asarray([0.9, 0.4]),
            "labels": ["dog", "cat"],
        }


def test_match_noun():
    assert _match_noun("dog", ["dog", "cat"]) == "dog"
    assert _match_noun("the big dog", ["dog", "cat"]) == "dog"
    assert _match_noun("", ["dog"]) == "unknown"
    assert _match_noun("zebra", ["dog", "cat"]) == "unknown"


def test_run_writes_mmdet_contract(tmp_path):
    img_path = str(tmp_path / "sketch.png")
    Image.fromarray(np.full((40, 80, 3), 255, np.uint8)).save(img_path)
    out = run_ft_dino_inference_on_image(
        FakeDetector(), img_path, ["dog", "cat"], str(tmp_path / "mmdet_out"),
        score_threshold=0.3)
    json_path = tmp_path / "mmdet_out" / "sketch.json"
    assert json_path.exists()
    assert (tmp_path / "mmdet_out" / "input_image.png").exists()
    assert (tmp_path / "mmdet_out" / "pred.png").exists()
    data = json.loads(json_path.read_text())
    assert data["labels"] == ["dog", "cat"]
    # cxcywh -> xyxy conversion (normalized)
    np.testing.assert_allclose(data["bboxes"][0], [0.4, 0.3, 0.6, 0.7],
                               atol=1e-9)
    assert data["model_info"]["score_threshold"] == 0.3
    assert out["scores"] == [0.9, 0.4]


def test_pipeline_prefers_mmdet_json():
    # the preference half lives in runner.py (mirrors bbox_filter.py:40-45)
    import inspect

    from inklayer_tpu.pipeline import runner

    src = inspect.getsource(runner.InkLayerPipeline.run)
    assert "mmdet_out" in src
