import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inklayer_tpu.config import BertConfig, GDinoConfig, SwinConfig
from inklayer_tpu.models.gdino import (
    GDinoDetector,
    GroundingDINO,
    SwinTransformer,
    WordPieceTokenizer,
    subsentence_masks,
)
from inklayer_tpu.models.gdino.transformer import (
    inverse_sigmoid,
    sine_embed_coords,
    sine_pos_embed_hw,
)

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier

TINY = GDinoConfig(
    hidden_dim=32,
    num_queries=12,
    enc_layers=2,
    dec_layers=2,
    dim_feedforward=64,
    nheads=4,
    enc_n_points=2,
    dec_n_points=2,
    max_text_len=16,
    fusion_embed_dim=64,
    fusion_nheads=2,
    text_enhancer_ffn=64,
    swin=SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
                    window_size=2),
    bert=BertConfig(vocab_size=30522, hidden_size=16, num_layers=2,
                    num_heads=2, intermediate_size=32),
    max_boxes=8,
    shape_buckets=((64, 64), (64, 96)),
    resize_short=64,
    resize_max=96,
)


def test_tokenizer_object_caption():
    tok = WordPieceTokenizer()
    ids = tok.encode("object.")
    assert ids == [101, 4874, 1012, 102]  # exact bert-base-uncased ids
    assert tok.decode(ids) == "object."[:-1] + "."


def test_tokenizer_wordpiece_fallback():
    tok = WordPieceTokenizer()
    ids = tok.encode("cats")  # 'cats' not in vocab whole -> cat + ##s
    assert ids == [101, 4937, 2015, 102]


def test_subsentence_masks():
    # [CLS] w w . w [SEP]
    ids = np.asarray([[101, 5, 6, 1012, 7, 102]])
    attn, pos = subsentence_masks(ids)
    # span 1: tokens 1..3 (incl. the '.'), span 2: token 4 (+[SEP] at end)
    assert attn[0, 1, 2] and attn[0, 2, 3]
    assert not attn[0, 1, 4]
    assert attn[0, 4, 4]
    np.testing.assert_array_equal(pos[0], [0, 0, 1, 2, 0, 0])
    # [CLS]/[SEP] isolated
    assert attn[0, 0].sum() == 1 and attn[0, 5].sum() == 1


def test_sine_pos_embed_shapes():
    mask = jnp.zeros((2, 6, 8), bool)
    pos = sine_pos_embed_hw(mask, 16)
    assert pos.shape == (2, 6, 8, 32)
    emb = sine_embed_coords(jnp.asarray([[[0.3, 0.7, 0.1, 0.2]]]), 8)
    assert emb.shape == (1, 1, 32)


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x), atol=1e-5)


def test_swin_tiny_shapes(rng):
    cfg = TINY.swin
    model = SwinTransformer(cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    mask = jnp.zeros((1, 64, 96), bool).at[:, 48:, :].set(True)
    params = model.init(jax.random.key(0), x, mask)
    outs = model.apply(params, x, mask)
    assert len(outs) == 3
    # stage dims: 8 * 2^stage for out_indices (1,2,3)
    assert outs[0][0].shape == (1, 8, 12, 16)
    assert outs[1][0].shape == (1, 4, 6, 32)
    assert outs[2][0].shape == (1, 2, 3, 64)
    for feat, m in outs:
        assert m.shape == feat.shape[:3]
        assert np.isfinite(np.asarray(feat)).all()


@pytest.fixture(scope="module")
def tiny_gdino():
    model = GroundingDINO(TINY)
    image = jnp.zeros((1, 64, 64, 3))
    pad_mask = jnp.zeros((1, 64, 64), bool)
    ids = jnp.asarray([[101, 4874, 1012, 102]], jnp.int32)
    attn, pos = subsentence_masks(np.asarray(ids))
    params = model.init(jax.random.key(0), image, pad_mask, ids,
                        jnp.asarray(attn), jnp.asarray(pos.astype(np.int32)))
    return model, params


def test_gdino_forward_shapes(tiny_gdino, rng):
    model, params = tiny_gdino
    image = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    pad_mask = jnp.zeros((1, 64, 64), bool).at[:, :, 48:].set(True)
    ids = jnp.asarray([[101, 4874, 1012, 102]], jnp.int32)
    attn, pos = subsentence_masks(np.asarray(ids))
    logits, boxes = model.apply(params, image, pad_mask, ids,
                                jnp.asarray(attn), jnp.asarray(pos.astype(np.int32)))
    assert logits.shape == (1, TINY.num_queries, TINY.max_text_len)
    assert boxes.shape == (1, TINY.num_queries, 4)
    b = np.asarray(boxes)
    assert ((b >= 0) & (b <= 1)).all()
    lg = np.asarray(logits)
    # valid text positions finite, padded positions -inf
    assert np.isfinite(lg[..., :4]).all()
    assert np.all(np.isneginf(lg[..., 4:]))


def test_detector_wrapper(tiny_gdino, rng):
    _, params = tiny_gdino
    det = GDinoDetector(params, TINY)
    img = (rng.random((100, 80, 3)) * 255).astype(np.uint8)
    out = det.detect(img, box_threshold=-1.0)  # keep everything
    assert out["boxes"].shape == (TINY.max_boxes, 4)
    assert out["scores"].shape == (TINY.max_boxes,)
    assert (np.diff(out["scores"]) <= 1e-6).all()  # sorted desc
    out2 = det.detect(img, box_threshold=2.0)  # keep nothing
    assert out2["boxes"].shape == (0, 4)
