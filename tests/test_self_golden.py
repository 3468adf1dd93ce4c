"""Self-golden pixel regression (VERDICT r02 next-round #6).

Real checkpoints are absent in this environment, so numerical parity vs the
reference's committed goldens (output/bunny_cook_sketch) cannot be asserted.
But placeholder-weight forwards ARE deterministic (build.py
_placeholder_params is seeded), so one full pipeline run's outputs are
committed here as repo goldens and every stage's numerics are pinned:
an unintended change in ANY stage (detector, SAM, depth, cleaning, NMS,
depth-sort, refinement, writers) changes a hash and fails this test.

Regenerate intentionally with:
    INKLAYER_REGEN_GOLDEN=1 python -m pytest tests/test_self_golden.py -q
and commit the diff with a note on WHY the numerics changed.

Hashes cover decoded PIXELS (not PNG bytes) so a PNG-encoder change cannot
false-positive; JSON files are compared as parsed objects.
"""

import hashlib
import json
import os

import numpy as np
import pytest
from PIL import Image

from inklayer_tpu.build import build_pipeline
from tests.test_pipeline import TINY_PIPE

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "self_golden.json")

HASHED_DIRS = ("masks", "masks_cleaned", "masks_disjoint", "masks_final")
HASHED_IMAGES = ("depth_map.png", "segmented_sketch.png",
                 "segmented_sketch_final.png", "bboxes.png",
                 "bboxes_final.png")
JSON_FILES = ("bboxes.json", "bboxes_final.json")


def _sketch(tmp_path) -> str:
    """Fixed deterministic sketch: two rectangles + a shaded blob +
    diagonal stroke, enough for >=2 detections and non-trivial refine."""
    g = np.full((128, 128, 3), 255, np.uint8)
    g[10:60, 10:13] = 0
    g[10:60, 57:60] = 0
    g[10:13, 10:60] = 0
    g[57:60, 10:60] = 0
    g[40:100, 70:73] = 20
    g[40:100, 107:110] = 20
    g[40:43, 70:110] = 20
    g[97:100, 70:110] = 20
    for i in range(40):
        g[80 + i // 4, 20 + i, :] = 60
    path = tmp_path / "golden_sketch.png"
    Image.fromarray(g).save(path)
    return str(path)


def _pixel_hash(path: str) -> str:
    img = Image.open(path)
    if img.mode == "1":
        # bilevel mask PNGs decode to bool; normalize to the 0/255 uint8
        # plane so hashes are invariant to the (equivalent) bit depth
        img = img.convert("L")
    arr = np.asarray(img)
    return hashlib.sha256(
        arr.tobytes() + str(arr.shape).encode() + str(arr.dtype).encode()
    ).hexdigest()


def _capture(out_dir: str) -> dict:
    cap = {"dirs": {}, "images": {}, "json": {}}
    for d in HASHED_DIRS:
        full = os.path.join(out_dir, d)
        cap["dirs"][d] = {
            name: _pixel_hash(os.path.join(full, name))
            for name in sorted(os.listdir(full))
        }
    for f in HASHED_IMAGES:
        cap["images"][f] = _pixel_hash(os.path.join(out_dir, f))
    for f in JSON_FILES:
        with open(os.path.join(out_dir, f)) as fh:
            cap["json"][f] = json.load(fh)
    return cap


def test_self_golden(tmp_path):
    pipeline = build_pipeline(TINY_PIPE)
    pipeline.inpainter = None  # diffusion is pinned by its own unit tests
    out_dir = pipeline.run(_sketch(tmp_path), str(tmp_path / "out"))
    got = _capture(out_dir)

    if os.environ.get("INKLAYER_REGEN_GOLDEN") == "1":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.skip(f"golden regenerated at {GOLDEN_PATH}")

    assert os.path.exists(GOLDEN_PATH), (
        "no committed golden; run INKLAYER_REGEN_GOLDEN=1 pytest "
        "tests/test_self_golden.py")
    with open(GOLDEN_PATH) as f:
        want = json.load(f)

    assert got["json"] == want["json"], "bbox JSON drift"
    for d, files in want["dirs"].items():
        assert got["dirs"][d] == files, f"pixel drift in {d}/"
    for name, h in want["images"].items():
        assert got["images"][name] == h, f"pixel drift in {name}"
