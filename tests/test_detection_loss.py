import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inklayer_tpu.parallel.detection_loss import (
    box_cxcywh_to_xyxy,
    detection_loss,
    generalized_box_iou,
    greedy_assignment,
)

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier


def test_giou_known_values():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[0.0, 0.0, 2.0, 2.0], [2.0, 2.0, 4.0, 4.0],
                     [1.0, 1.0, 3.0, 3.0]])
    g = np.asarray(generalized_box_iou(a, b))
    assert abs(g[0, 0] - 1.0) < 1e-6  # identical
    # disjoint diagonal boxes: iou 0, enclosing 16, union 8 -> giou -0.5
    assert abs(g[0, 1] - (-0.5)) < 1e-6
    # overlap 1, union 7, enclosing 9 -> 1/7 - 2/9
    assert abs(g[0, 2] - (1 / 7 - 2 / 9)) < 1e-6


def test_greedy_assignment():
    cost = jnp.asarray([[0.1, 5.0], [3.0, 0.2], [9.0, 9.0]])
    valid = jnp.asarray([True, True])
    a = np.asarray(greedy_assignment(cost, valid))
    assert a[0] == 0 and a[1] == 1
    # invalid GT unassigned
    a2 = np.asarray(greedy_assignment(cost, jnp.asarray([True, False])))
    assert a2[1] == -1


def test_detection_loss_perfect_prediction_lower():
    nq, m, t = 8, 2, 6
    rng = np.random.default_rng(0)
    gt_boxes = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]])
    posmap = np.zeros((1, m, t))
    posmap[0, 0, 1] = 1
    posmap[0, 1, 2] = 1
    valid = jnp.asarray([[True, True]])

    # perfect: two queries exactly on the GTs with confident right tokens
    boxes = jnp.asarray(rng.random((1, nq, 4)), jnp.float32)
    boxes = boxes.at[0, 0].set(jnp.asarray([0.3, 0.3, 0.2, 0.2]))
    boxes = boxes.at[0, 1].set(jnp.asarray([0.7, 0.7, 0.2, 0.2]))
    logits = jnp.full((1, nq, t), -8.0)
    logits = logits.at[0, 0, 1].set(8.0).at[0, 1, 2].set(8.0)
    good, gm = detection_loss(logits, boxes, gt_boxes, jnp.asarray(posmap),
                              valid)

    bad_logits = jnp.full((1, nq, t), 0.0)
    bad_boxes = jnp.full((1, nq, 4), 0.5)
    bad, bm = detection_loss(bad_logits, bad_boxes, gt_boxes,
                             jnp.asarray(posmap), valid)
    assert float(good) < float(bad)
    assert float(gm["loss_l1"]) < 1e-5
    assert float(gm["loss_giou"]) < 1e-5


def test_detection_loss_grad_finite():
    nq, m, t = 6, 2, 4
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((1, nq, t)), jnp.float32)
    boxes = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((1, nq, 4))))
    gt = jnp.asarray([[[0.4, 0.4, 0.3, 0.3], [0.0, 0.0, 0.0, 0.0]]])
    pm = jnp.zeros((1, m, t)).at[0, 0, 0].set(1.0)
    valid = jnp.asarray([[True, False]])

    def loss_fn(lg, bx):
        total, _ = detection_loss(lg, bx, gt, pm, valid)
        return total

    g1, g2 = jax.grad(loss_fn, argnums=(0, 1))(logits, boxes)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()


def test_gdino_finetune_step_tiny():
    """One gradient step through the FULL detector with the detection loss —
    proves the whole GDINO graph is differentiable and trainable."""
    import optax

    from tests.test_gdino import TINY
    from inklayer_tpu.models.gdino import GroundingDINO
    from inklayer_tpu.models.gdino.bert import subsentence_masks

    model = GroundingDINO(TINY)
    ids = np.asarray([[101, 4874, 1012, 102]], np.int32)
    attn, pos = subsentence_masks(ids)
    rng = np.random.default_rng(0)
    # a real (non-constant) image: an all-zeros input makes LayerNorm
    # statistics degenerate and produces NaN grads at the patch embed
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    args = (img, jnp.zeros((1, 64, 64), bool),
            jnp.asarray(ids), jnp.asarray(attn),
            jnp.asarray(pos.astype(np.int32)))
    params = model.init(jax.random.key(0), *args)

    gt_boxes = jnp.asarray([[[0.4, 0.4, 0.3, 0.3]]])
    pm = jnp.zeros((1, 1, TINY.max_text_len)).at[0, 0, 1].set(1.0)
    valid = jnp.asarray([[True]])

    def loss_fn(p):
        logits, boxes = model.apply(p, *args)
        total, _ = detection_loss(logits, boxes, gt_boxes, pm, valid)
        return total

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    finite = [bool(np.isfinite(np.asarray(g)).all()) for g in leaves]
    assert all(finite)
    # at least most grads are nonzero (model is actually learning signal)
    nonzero = sum(bool(np.abs(np.asarray(g)).sum() > 0) for g in leaves)
    assert nonzero > len(leaves) * 0.5

    opt = optax.adamw(1e-4)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    loss2 = loss_fn(new_params)
    assert np.isfinite(float(loss2))


def test_positive_map():
    from inklayer_tpu.models.gdino.tokenizer import WordPieceTokenizer
    from inklayer_tpu.models.gdino.vl_utils import create_positive_map

    tok = WordPieceTokenizer()
    caption = "cat. dog."
    # spans: 'cat' = [0,3), 'dog' = [5,8)
    pm = create_positive_map(tok, caption, [(0, 3), (5, 8)], max_text_len=16)
    assert pm.shape == (2, 16)
    ids = tok.encode(caption, 16)
    # token 1 = cat, token 3 = dog ([CLS] cat . dog . [SEP])
    assert pm[0, 1] == 1.0 and pm[0].sum() == 1.0
    assert pm[1, 3] == 1.0 and pm[1].sum() == 1.0


def test_silog_loss():
    import jax.numpy as jnp

    from inklayer_tpu.parallel.train import silog_loss

    pred = jnp.full((8, 8), 2.0)
    tgt = jnp.full((8, 8), 2.0)
    valid = jnp.ones((8, 8), bool)
    assert float(silog_loss(pred, tgt, valid)) < 1e-5
    worse = float(silog_loss(pred * 3, tgt, valid))
    assert worse > 0.1
