import jax.numpy as jnp
import numpy as np
import pytest

from inklayer_tpu.config import RefineConfig
from inklayer_tpu.pipeline.refine.mask_cleaner import run_clean_masks
from inklayer_tpu.pipeline.refine.nms import bbox_iou_matrix, sketch_nms
from inklayer_tpu.pipeline.refine.depth_sort import (
    containment_graph,
    major_overlap_matrix,
    mask_depth_scores,
    sample_stroke_points,
    sort_order,
)
from inklayer_tpu.pipeline.refine.refiner import (
    add_unlabeled_mask,
    composite_masks,
    improve_masks,
    parse_masks_to_disjoint,
)

CFG = RefineConfig()


def _sketch_with_rects(h=128, w=128, rects=((10, 10, 50, 50), (60, 60, 110, 110))):
    """White canvas with black rectangle outlines."""
    g = np.full((h, w), 255, np.uint8)
    for x1, y1, x2, y2 in rects:
        g[y1:y2, x1:x1 + 2] = 0
        g[y1:y2, x2 - 2:x2] = 0
        g[y1:y1 + 2, x1:x2] = 0
        g[y2 - 2:y2, x1:x2] = 0
    return g


def _filled_mask(h, w, box):
    m = np.zeros((h, w), bool)
    x1, y1, x2, y2 = box
    m[y1:y2, x1:x2] = True
    return m


@pytest.mark.slow
def test_clean_masks_removes_small_blobs():
    masks = np.zeros((2, 100, 100), np.uint8)
    masks[0, 20:70, 20:70] = 255  # big blob, kept
    masks[1, 5:9, 5:9] = 255  # 4x4 square: area 16 < 500, aspect 1.0 -> gone
    out = run_clean_masks(masks)
    assert out[0].sum() > 1000
    assert out[1].sum() == 0


def test_bbox_iou_matrix():
    b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = bbox_iou_matrix(b)
    assert iou[0, 2] == 0
    np.testing.assert_allclose(iou[0, 1], 25 / 175, atol=1e-6)
    np.testing.assert_allclose(np.diag(iou), 1.0)


def test_sketch_nms_suppresses_duplicates():
    g = _sketch_with_rects()
    h, w = g.shape
    # two near-identical boxes on the first rect + one distinct
    boxes = np.asarray([[10, 10, 50, 50], [11, 11, 51, 51], [60, 60, 110, 110]],
                       float)
    scores = np.asarray([0.9, 0.5, 0.8])
    masks = np.stack([
        _filled_mask(h, w, (10, 10, 50, 50)),
        _filled_mask(h, w, (11, 11, 51, 51)),
        _filled_mask(h, w, (60, 60, 110, 110)),
    ])
    kept = sketch_nms(boxes, scores, masks, g, CFG)
    assert 0 in kept and 2 in kept and 1 not in kept


def test_sketch_nms_device_matches_host_reference(rng):
    """The device greedy scan (sketch_nms) vs the literal host double-loop
    oracle on randomized crowded scenes."""
    from inklayer_tpu.pipeline.refine.nms import _sketch_nms_host_reference

    h = w = 160
    g = np.full((h, w), 255, np.uint8)
    n = 14
    boxes, masks = [], []
    for _ in range(n):
        x1, y1 = rng.integers(0, w - 40, 2)
        bw, bh = rng.integers(15, 60, 2)
        x2, y2 = min(w - 1, x1 + bw), min(h - 1, y1 + bh)
        boxes.append([x1, y1, x2, y2])
        m = _filled_mask(h, w, (x1, y1, x2, y2))
        masks.append(m)
        g[y1:y2, x1:x2] = 40  # ink strokes inside every box
    boxes = np.asarray(boxes, float)
    scores = rng.random(n)
    masks = np.stack(masks)
    want = _sketch_nms_host_reference(boxes, scores, masks, g, CFG)
    got = sketch_nms(boxes, scores, masks, g, CFG)
    np.testing.assert_array_equal(np.sort(got), np.sort(want))
    np.testing.assert_array_equal(got, want)


def test_sketch_nms_keeps_distinct():
    g = _sketch_with_rects()
    boxes = np.asarray([[10, 10, 50, 50], [60, 60, 110, 110]], float)
    scores = np.asarray([0.9, 0.8])
    masks = np.stack([_filled_mask(128, 128, (10, 10, 50, 50)),
                      _filled_mask(128, 128, (60, 60, 110, 110))])
    kept = sketch_nms(boxes, scores, masks, g, CFG)
    assert set(kept.tolist()) == {0, 1}


def test_nms_full_image_box_filtered():
    g = _sketch_with_rects()
    boxes = np.asarray([[0, 0, 128, 128], [10, 10, 50, 50]], float)
    scores = np.asarray([0.99, 0.5])
    masks = np.stack([np.ones((128, 128), bool),
                      _filled_mask(128, 128, (10, 10, 50, 50))])
    kept = sketch_nms(boxes, scores, masks, g, CFG)
    assert 0 not in kept and 1 in kept


def test_sample_stroke_points():
    ink = np.zeros((64, 64), bool)
    ink[10, :] = True
    pts, valid = sample_stroke_points(jnp.asarray(ink), 8)
    pts, valid = np.asarray(pts), np.asarray(valid)
    chosen = pts[valid]
    assert (chosen[:, 0] == 10).all()  # all on the stroke row
    assert len(chosen) == 8  # one per 8px cell along the row


def test_mask_depth_scores_mode():
    masks = np.zeros((2, 16, 16), bool)
    masks[0, :8] = True
    masks[1, 8:] = True
    depth = np.zeros((16, 16), np.float32)
    depth[:8] = 2.0
    depth[8:] = 5.0
    pts = np.asarray([[i, j] for i in range(0, 16, 2) for j in range(0, 16, 2)],
                     np.int32)
    valid = np.ones(len(pts), bool)
    scores = np.asarray(mask_depth_scores(
        jnp.asarray(masks), jnp.asarray(pts), jnp.asarray(valid),
        jnp.asarray(depth)))
    np.testing.assert_allclose(scores, [2.0, 5.0], atol=1e-5)


def test_containment_graph():
    boxes = np.asarray([[0, 0, 100, 100], [10, 10, 40, 40], [200, 200, 220, 220]],
                       float)
    g = containment_graph(boxes, (256, 256))
    assert g[0, 1] and not g[1, 0]
    assert not g[0, 2] and not g[2, 0]


def test_sort_order_contained_moves_first():
    # reference code semantics (sort_sketch_masks :285-286): when the earlier
    # box CONTAINS the later overlapping one, they swap — the contained
    # (inner) object surfaces in front of its container
    scores = np.asarray([5.0, 2.0])
    cont = np.asarray([[False, True], [False, False]])  # 0 contains 1
    ov = np.asarray([[False, True], [True, False]])
    assert sort_order(scores, cont, ov) == [1, 0]
    # no containment -> pure depth order preserved
    cont2 = np.zeros((2, 2), bool)
    assert sort_order(scores, cont2, ov) == [0, 1]


def test_composite_masks_front_wins():
    masks = np.zeros((2, 8, 8), bool)
    masks[0, 2:6, 2:6] = True
    masks[1, 4:8, 4:8] = True
    comp = np.asarray(composite_masks(jnp.asarray(masks)))
    assert comp[3, 3] == 1
    assert comp[5, 5] == 1  # overlap -> front (index 0) wins
    assert comp[7, 7] == 2
    assert comp[0, 0] == 0


@pytest.mark.slow
def test_parse_and_improve_end_to_end():
    g = _sketch_with_rects()
    h, w = g.shape
    masks = np.stack([_filled_mask(h, w, (10, 10, 50, 50)),
                      _filled_mask(h, w, (60, 60, 110, 110))])
    boxes = np.asarray([[10, 10, 50, 50], [60, 60, 110, 110]], float)
    depth = np.ones((h, w), np.float32)
    depth[:, 60:] = 3.0
    disjoint, sorted_boxes, info = parse_masks_to_disjoint(
        masks, boxes, g, depth, CFG)
    assert len(disjoint) == 2
    # disjointness
    inter = np.logical_and(disjoint[0], disjoint[1]).sum()
    assert inter == 0
    final = improve_masks(np.stack(disjoint), np.asarray(sorted_boxes), g, CFG)
    ink = g < CFG.ink_threshold
    covered = final.any(axis=0)
    # nearly all ink covered after completion
    assert (ink & ~covered).sum() < 0.02 * ink.sum()


def test_add_unlabeled_mask():
    # strokes must survive MORPH_OPEN(3x3): use a filled blob
    g = np.full((128, 128), 255, np.uint8)
    g[30:60, 30:60] = 0
    masks = np.zeros((0, 128, 128), bool)
    out = add_unlabeled_mask(masks, g, CFG)
    assert out.shape[0] == 1
    assert out[0].sum() > 0
    # thin 1px strokes are opened away, like the reference
    g2 = np.full((128, 128), 255, np.uint8)
    g2[64, :] = 0
    out2 = add_unlabeled_mask(masks, g2, CFG)
    assert out2.shape[0] == 0


def test_empty_masks_pipeline_stages():
    g = _sketch_with_rects()
    empty = np.zeros((0, 128, 128), bool)
    disjoint, boxes, info = parse_masks_to_disjoint(
        empty, np.zeros((0, 4)), g, np.ones((128, 128), np.float32), CFG)
    assert disjoint.shape[0] == 0 and boxes == [] and info == []
    final = improve_masks(empty, np.zeros((0, 4)), g, CFG)
    # only the unlabeled-extra mask may appear (strokes too thin here -> none)
    assert final.shape[0] in (0, 1)


def test_pack_bits_roundtrip(rng):
    import jax.numpy as jnp
    from inklayer_tpu.ops.bits import masks_to_device, masks_to_host, pack_bits

    m = rng.random((3, 21, 37)) > 0.5
    back = masks_to_host(jnp.asarray(m))
    np.testing.assert_array_equal(back, m)
    dev = masks_to_device(m)
    np.testing.assert_array_equal(np.asarray(dev), m)
    empty = masks_to_host(jnp.zeros((0, 16, 16), bool))
    assert empty.shape == (0, 16, 16)


def test_nms_depth_front_matches_unfused(rng):
    """The single-jit fused NMS+depth-stat front (pipeline/refine/front.py)
    must reproduce the unfused sketch_nms_dispatch + depth_stats_dispatch
    path exactly (keep flags, depth scores, overlap matrix)."""
    import jax
    import jax.numpy as jnp

    from inklayer_tpu.pipeline.refine.depth_sort import depth_stats_dispatch
    from inklayer_tpu.pipeline.refine.front import nms_depth_front
    from inklayer_tpu.pipeline.refine.nms import (nms_host_prefilter,
                                                  sketch_nms_dispatch)

    h = w = 96
    gray = np.full((h, w), 255, np.uint8)
    n = 6
    boxes = []
    masks = np.zeros((n, h, w), bool)
    for i in range(n):
        x0, y0 = 4 + 13 * i, 6 + 9 * i
        x1, y1 = x0 + 24, y0 + 20
        boxes.append([x0, y0, x1, y1])
        masks[i, y0:y1, x0:x1] = rng.random((y1 - y0, x1 - x0)) > 0.4
        gray[y0:y1, x0:x1] = np.where(masks[i, y0:y1, x0:x1], 30,
                                      gray[y0:y1, x0:x1])
    # a duplicate of mask 0 to exercise suppression
    masks[n - 1] = masks[0]
    boxes[n - 1] = list(boxes[0])
    boxes = np.asarray(boxes, float)
    scores = rng.random(n)
    depth = rng.random((h, w)).astype(np.float32)
    masks_dev = jnp.asarray(masks)
    gray_dev = jnp.asarray(gray)
    depth_dev = jnp.asarray(depth)

    kept0, order0, keep_dev = sketch_nms_dispatch(
        boxes, scores, masks_dev, gray)
    assert len(kept0) >= 2
    ds_dev, ov_dev = depth_stats_dispatch(
        masks_dev[np.asarray(kept0)], gray, depth)
    keep_u, ds_u, ov_u = jax.device_get((keep_dev, ds_dev, ov_dev))

    kept0f, orderf, gate, iou_bbox = nms_host_prefilter(
        boxes, scores, gray)
    np.testing.assert_array_equal(kept0f, kept0)
    keep_f, ds_f, ov_f = jax.device_get(nms_depth_front(
        kept0f, gate, iou_bbox, orderf, masks_dev, gray_dev, depth_dev))
    k = len(kept0)
    np.testing.assert_array_equal(keep_f[:k], keep_u)
    np.testing.assert_allclose(ds_f[:k], ds_u, rtol=1e-6)
    np.testing.assert_array_equal(ov_f[:k, :k], ov_u)


def test_device_prefilter_matches_host(rng):
    """_device_prefilter_gates (detect-readback-free front) must reproduce
    nms_host_prefilter's valid set, gates and ordering from device-resident
    top-K cxcywh boxes + scores."""
    import jax
    import jax.numpy as jnp

    from inklayer_tpu.pipeline.refine.front import _device_prefilter_gates
    from inklayer_tpu.pipeline.refine.nms import nms_host_prefilter

    h, w = 96, 80
    gray = np.full((h, w), 255, np.uint8)
    gray[10:80, 8:70] = (rng.random((70, 62)) * 255).astype(np.uint8)
    K = 12
    cx = rng.random(K) * 0.8 + 0.1
    cy = rng.random(K) * 0.8 + 0.1
    bw = rng.random(K) * 0.4 + 0.05
    bh = rng.random(K) * 0.4 + 0.05
    boxes_cxcywh = np.stack([cx, cy, bw, bh], -1).astype(np.float32)
    scores = np.sort(rng.random(K).astype(np.float32))[::-1].copy()
    thresh = float(scores[8])  # 8 boxes survive (> is strict)

    valid, gate, bb_gated, order = jax.device_get(_device_prefilter_gates(
        jnp.asarray(boxes_cxcywh), jnp.asarray(scores), jnp.asarray(gray),
        hw=(h, w), max_area_frac=0.9, max_contained=5,
        eps_per_kdiag=8.0, thresh=thresh))

    n = int((scores > thresh).sum())
    xyxy = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
    boxes_abs = (xyxy[:n] * np.asarray([w, h, w, h])).astype(int).astype(float)
    from inklayer_tpu.config import RefineConfig

    cfg = RefineConfig(nms_max_area_frac=0.9, nms_max_contained=5,
                       nms_eps_px_per_kdiag=8.0)
    kept0, order0, gate_h, iou_h = nms_host_prefilter(
        boxes_abs, scores[:n], gray, cfg)

    np.testing.assert_array_equal(np.nonzero(valid)[0], kept0)
    # device gates live in K-space; host in kept0-space
    np.testing.assert_array_equal(gate[np.ix_(kept0, kept0)], gate_h)
    np.testing.assert_allclose(bb_gated[np.ix_(kept0, kept0)],
                               np.where(gate_h, iou_h, 0.0), atol=1e-5)
    # ordering restricted to valid rows matches the host score order
    dev_valid_order = [i for i in order if valid[i]]
    np.testing.assert_array_equal(dev_valid_order, kept0[order0])
