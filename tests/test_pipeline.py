import json
import os

import numpy as np
import pytest
from PIL import Image

from inklayer_tpu.build import build_pipeline
from inklayer_tpu.config import (
    DepthConfig,
    PipelineConfig,
    RefineConfig,
    SamConfig,
)
from tests.test_gdino import TINY as TINY_GDINO
from tests.test_sam import TINY as TINY_SAM
from tests.test_depth import TINY as TINY_DEPTH

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier

TINY_PIPE = PipelineConfig(
    gdino=TINY_GDINO,
    sam=TINY_SAM,
    depth=TINY_DEPTH,
    refine=RefineConfig(min_cc_area=20),
)


@pytest.fixture(scope="module")
def pipeline():
    return build_pipeline(TINY_PIPE)


@pytest.fixture()
def sketch_file(tmp_path):
    g = np.full((96, 96, 3), 255, np.uint8)
    g[10:40, 10:12] = 0
    g[10:40, 38:40] = 0
    g[10:12, 10:40] = 0
    g[38:40, 10:40] = 0
    g[50:80, 50:80] = 30
    path = tmp_path / "toy_sketch.png"
    Image.fromarray(g).save(path)
    return str(path)


EXPECTED_LAYOUT = [
    "input.png", "bboxes.json", "bboxes.png", "masks", "segmented_sketch.png",
    "masks_cleaned", "bboxes_final.json", "bboxes_final.png", "masks_disjoint",
    "depth_map.png", "masks_final", "segmented_sketch_final.png",
]


def test_pipeline_output_layout(pipeline, sketch_file, tmp_path):
    out_dir = pipeline.run(sketch_file, str(tmp_path / "out"))
    assert os.path.basename(out_dir) == "toy_sketch"
    for item in EXPECTED_LAYOUT:
        assert os.path.exists(os.path.join(out_dir, item)), item
    with open(os.path.join(out_dir, "bboxes.json")) as f:
        data = json.load(f)
    assert set(data) == {"bboxes", "scores"}
    for b in data["bboxes"]:
        assert len(b) == 4 and all(-0.5 <= v <= 1.5 for v in b)
    with open(os.path.join(out_dir, "bboxes_final.json")) as f:
        final = json.load(f)
    assert set(final) == {"bboxes", "scores", "kept_indices", "threshold"}
    assert len(final["bboxes"]) == len(final["kept_indices"])
    # masks dirs contain mask_{i}.png at image resolution
    masks = sorted(os.listdir(os.path.join(out_dir, "masks")))
    if masks:
        # masks are 1-bit PNGs on the native path; consumers normalize
        # with convert("L"), which must yield the 0/255 plane
        m = np.asarray(Image.open(
            os.path.join(out_dir, "masks", masks[0])).convert("L"))
        assert m.shape == (96, 96)
        assert set(np.unique(m)) <= {0, 255}


def test_pipeline_no_intermediate(pipeline, sketch_file, tmp_path):
    out_dir = pipeline.run(sketch_file, str(tmp_path / "out2"),
                           no_intermediate=True)
    remaining = set(os.listdir(out_dir))
    assert "masks" not in remaining
    assert "masks_cleaned" not in remaining
    assert "input.png" in remaining
    assert "masks_final" in remaining
    assert "segmented_sketch_final.png" in remaining


def test_pipeline_rerun_overwrites(pipeline, sketch_file, tmp_path):
    out1 = pipeline.run(sketch_file, str(tmp_path / "out3"))
    marker = os.path.join(out1, "stale_file.txt")
    with open(marker, "w") as f:
        f.write("stale")
    out2 = pipeline.run(sketch_file, str(tmp_path / "out3"))
    assert out1 == out2
    assert not os.path.exists(marker)  # reference wipes pre-existing out dir


def test_pipeline_nonsquare_image(pipeline, tmp_path):
    """Non-square input exercises the pad-mask / valid-ratio paths."""
    g = np.full((64, 120, 3), 255, np.uint8)
    g[10:50, 10:13] = 0
    g[10:13, 10:60] = 0
    g[47:50, 10:60] = 0
    g[10:50, 57:60] = 0
    path = tmp_path / "wide.png"
    Image.fromarray(g).save(path)
    out_dir = pipeline.run(str(path), str(tmp_path / "out_wide"))
    masks = sorted(os.listdir(os.path.join(out_dir, "masks")))
    if masks:
        m = np.asarray(Image.open(os.path.join(out_dir, "masks", masks[0])))
        assert m.shape == (64, 120)
    with open(os.path.join(out_dir, "bboxes.json")) as f:
        data = json.load(f)
    assert all(len(b) == 4 for b in data["bboxes"])


def test_run_dir_async_io(pipeline, tmp_path):
    """Pipelined sweep produces the same contract as sequential runs."""
    paths = []
    for i in range(2):
        g = np.full((96, 96, 3), 255, np.uint8)
        g[10 + i * 5:40, 10:13] = 0
        g[50:80, 50:80] = 30
        p = tmp_path / f"s{i}.png"
        Image.fromarray(g).save(p)
        paths.append(str(p))
    outs = pipeline.run_dir(paths, str(tmp_path / "sweep"))
    assert len(outs) == 2
    for out in outs:
        for item in EXPECTED_LAYOUT:
            assert os.path.exists(os.path.join(out, item)), (out, item)
    assert not pipeline._pending
    assert pipeline.async_io is False


def test_run_dir_batched_matches_unbatched(tmp_path, rng):
    """batch_size=2 groups GDINO/SAM dispatches but must produce byte-
    identical outputs to the sequential path."""
    import json

    from inklayer_tpu.build import build_pipeline

    paths = []
    for i in range(3):
        img = (rng.random((40 + 4 * i, 52, 3)) * 200 + 30).astype(np.uint8)
        p = str(tmp_path / f"in_{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)

    out_a, out_b = str(tmp_path / "seq"), str(tmp_path / "bat")
    pa = build_pipeline(TINY_PIPE)
    pa.inpainter = None
    dirs_a = pa.run_dir(paths, out_a, no_intermediate=True)
    pb = build_pipeline(TINY_PIPE)
    pb.inpainter = None
    dirs_b = pb.run_dir(paths, out_b, no_intermediate=True, batch_size=2)

    for da, db in zip(dirs_a, dirs_b):
        ja = json.load(open(os.path.join(da, "bboxes_final.json")))
        jb = json.load(open(os.path.join(db, "bboxes_final.json")))
        assert ja == jb
        ma = sorted(os.listdir(os.path.join(da, "masks_final")))
        mb = sorted(os.listdir(os.path.join(db, "masks_final")))
        assert ma == mb
        for name in ma:
            a = np.asarray(Image.open(os.path.join(da, "masks_final", name)))
            b = np.asarray(Image.open(os.path.join(db, "masks_final", name)))
            np.testing.assert_array_equal(a, b)


def test_run_dir_pipelined_matches_sequential(pipeline, tmp_path):
    """Cross-stage pipelining (GDINO i+1 dispatched during image i) must not
    change any output: bboxes_final.json and masks_final are identical to
    strictly sequential run() calls."""
    paths = []
    for j in range(3):
        g = np.full((72, 72, 3), 255, np.uint8)
        g[8 + j:30 + j, 8:10] = 0
        g[8 + j:30 + j, 28:30] = 0
        g[8 + j, 8:30] = 0
        g[30 + j, 8:30] = 0
        g[40:60, 40 + j:60 + j] = 20
        p = tmp_path / f"s{j}.png"
        Image.fromarray(g).save(p)
        paths.append(str(p))

    seq_dir = tmp_path / "seq"
    for p in paths:
        pipeline.run(p, str(seq_dir))
    pipeline.drain()
    # default workers (cfg.sweep_workers=2, concurrent images) AND the
    # single-threaded lookahead mode must both match sequential output
    pipe_dir = tmp_path / "pipe"
    pipeline.run_dir(paths, str(pipe_dir))
    pipe1_dir = tmp_path / "pipe1"
    pipeline.run_dir(paths, str(pipe1_dir), workers=1)

    for p in paths:
        name = os.path.basename(p).split(".")[0]
        with open(os.path.join(seq_dir, name, "bboxes_final.json")) as f:
            a = json.load(f)
        with open(os.path.join(pipe_dir, name, "bboxes_final.json")) as f:
            b = json.load(f)
        assert a == b, name
        with open(os.path.join(pipe1_dir, name, "bboxes_final.json")) as f:
            b1 = json.load(f)
        assert a == b1, name
        fa = sorted(os.listdir(os.path.join(seq_dir, name, "masks_final")))
        fb = sorted(os.listdir(os.path.join(pipe_dir, name, "masks_final")))
        assert fa == fb, name
        for m in fa:
            ma = np.asarray(Image.open(
                os.path.join(seq_dir, name, "masks_final", m)))
            mb = np.asarray(Image.open(
                os.path.join(pipe_dir, name, "masks_final", m)))
            np.testing.assert_array_equal(ma, mb, err_msg=f"{name}/{m}")


REF_GOLDEN = "/root/reference/output/bunny_cook_sketch"


@pytest.mark.skipif(not os.path.isdir(REF_GOLDEN),
                    reason="reference golden outputs not mounted")
def test_output_contract_matches_reference_golden(pipeline, sketch_file,
                                                  tmp_path):
    """Structural parity vs the reference's COMMITTED golden output dir
    (output/bunny_cook_sketch): same entry set, same JSON schemas, same
    image conventions.  Numerical mask/box parity needs real checkpoints
    (absent in this env); the contract is what downstream consumers and the
    web UI read."""
    out_dir = pipeline.run(sketch_file, str(tmp_path / "out"))
    golden_entries = {e for e in os.listdir(REF_GOLDEN)}
    ours = set(os.listdir(out_dir))
    assert golden_entries <= ours, golden_entries - ours

    with open(os.path.join(REF_GOLDEN, "bboxes_final.json")) as f:
        golden_schema = set(json.load(f))
    with open(os.path.join(out_dir, "bboxes_final.json")) as f:
        ours_schema = set(json.load(f))
    assert ours_schema == golden_schema

    with open(os.path.join(REF_GOLDEN, "bboxes.json")) as f:
        golden_schema = set(json.load(f))
    with open(os.path.join(out_dir, "bboxes.json")) as f:
        assert set(json.load(f)) == golden_schema

    # mask file naming convention (mask_{i}.png) and image conventions
    for sub in ("masks", "masks_cleaned", "masks_disjoint", "masks_final"):
        files = os.listdir(os.path.join(out_dir, sub))
        assert all(f.startswith("mask_") and f.endswith(".png")
                   for f in files), sub
    im = Image.open(os.path.join(out_dir, "depth_map.png"))
    ref_im = Image.open(os.path.join(REF_GOLDEN, "depth_map.png"))
    assert im.mode == ref_im.mode  # RGB grayscale-replicated
    in_im = Image.open(sketch_file)
    assert im.size == in_im.size  # depth map at input resolution
    seg = Image.open(os.path.join(out_dir, "segmented_sketch_final.png"))
    assert seg.mode == "RGB" and seg.size == in_im.size


def test_device_front_mode_matches_default(tmp_path, sketch_file):
    """cfg.device_front=True (mask/clean/NMS front dispatched before the
    detect readback — the PCIe-local TPU VM mode) must produce byte-equal
    outputs to the default ordering."""
    import dataclasses
    import json

    pa = build_pipeline(TINY_PIPE)
    pa.inpainter = None
    da = pa.run(sketch_file, str(tmp_path / "a"))
    pb = build_pipeline(dataclasses.replace(TINY_PIPE, device_front=True))
    pb.inpainter = None
    db = pb.run(sketch_file, str(tmp_path / "b"))

    ja = json.load(open(os.path.join(da, "bboxes_final.json")))
    jb = json.load(open(os.path.join(db, "bboxes_final.json")))
    assert ja == jb
    ma = sorted(os.listdir(os.path.join(da, "masks_final")))
    mb = sorted(os.listdir(os.path.join(db, "masks_final")))
    assert ma == mb
    for name in ma:
        a = np.asarray(Image.open(os.path.join(da, "masks_final", name)))
        b = np.asarray(Image.open(os.path.join(db, "masks_final", name)))
        np.testing.assert_array_equal(a, b)


def test_no_intermediate_final_outputs_match_full(pipeline, sketch_file,
                                                  tmp_path):
    """--no_intermediate defers mask materialization to the prefilter
    survivors (pow2-bucketed subset clean) — its FINAL outputs must be
    byte-identical to the keep-intermediate path that cleans every
    detection."""
    full_dir = pipeline.run(sketch_file, str(tmp_path / "full"),
                            no_intermediate=False)
    pipeline.drain()
    slim_dir = pipeline.run(sketch_file, str(tmp_path / "slim"),
                            no_intermediate=True)
    pipeline.drain()

    with open(os.path.join(full_dir, "bboxes_final.json")) as f:
        a = json.load(f)
    with open(os.path.join(slim_dir, "bboxes_final.json")) as f:
        b = json.load(f)
    assert a == b
    ma = sorted(os.listdir(os.path.join(full_dir, "masks_final")))
    mb = sorted(os.listdir(os.path.join(slim_dir, "masks_final")))
    assert ma == mb and ma, "vacuous: no final masks"
    for name in ma:
        pa_ = np.asarray(Image.open(os.path.join(full_dir, "masks_final",
                                                 name)))
        pb_ = np.asarray(Image.open(os.path.join(slim_dir, "masks_final",
                                                 name)))
        np.testing.assert_array_equal(pa_, pb_, err_msg=name)
