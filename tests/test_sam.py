import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inklayer_tpu.config import SamConfig
from inklayer_tpu.models.sam import Sam, SamPredictor
from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT, _gather_rel_pos


TINY = SamConfig(
    encoder_embed_dim=32,
    encoder_depth=3,
    encoder_num_heads=2,
    encoder_global_attn_indexes=(1,),
    encoder_window_size=2,
    image_size=64,
    patch_size=16,
    prompt_embed_dim=32,
)


def test_gather_rel_pos_indexing():
    table = jnp.arange(7, dtype=jnp.float32)[:, None]  # (2*4-1, 1)
    out = _gather_rel_pos(table, 4, 4)
    # entry [i, j] = table[i - j + 3]
    for i in range(4):
        for j in range(4):
            assert out[i, j, 0] == i - j + 3


def test_image_encoder_shapes(rng):
    enc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        out_chans=16, window_size=2, global_attn_indexes=(1,))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    assert out.shape == (1, 4, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_sam_end_to_end_tiny(rng):
    model = Sam(TINY)
    image = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray([[8.0, 8.0, 40.0, 48.0], [0.0, 0.0, 64.0, 64.0]])
    params = model.init(jax.random.key(0), image, boxes)
    logits, iou = model.apply(params, image, boxes)
    assert logits.shape == (2, 1, 16, 16)
    assert iou.shape == (2, 1)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_predictor_capacity_and_postprocess(rng):
    model = Sam(TINY)
    image = jnp.zeros((1, 64, 64, 3))
    boxes = jnp.zeros((4, 4))
    params = model.init(jax.random.key(0), image, boxes)
    pred = SamPredictor(params, TINY, box_capacity=4)
    img = (rng.random((50, 30, 3)) * 255).astype(np.uint8)
    pred.set_image(img)
    masks, iou, low = pred.predict(np.asarray([[2.0, 2.0, 25.0, 45.0]]))
    assert masks.shape == (1, 50, 30)
    assert masks.dtype == bool
    assert low.shape == (1, 16, 16)

    # padded boxes must not change the result for the valid prompt
    masks2, _, _ = pred.predict(
        np.asarray([[2.0, 2.0, 25.0, 45.0], [1.0, 1.0, 10.0, 10.0],
                    [0.0, 0.0, 5.0, 5.0]]))
    np.testing.assert_array_equal(masks[0], masks2[0])
