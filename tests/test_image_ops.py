import jax.numpy as jnp
import numpy as np
import pytest

from inklayer_tpu.ops.image import (
    pick_bucket,
    resize_scale,
    scale_pad_normalize,
    to_device_image,
)


def test_resize_scale_longest():
    # SAM semantics: longest side -> 1024
    assert resize_scale((500, 1000), (1024, 1024), "longest") == 1024 / 1000
    assert resize_scale((2000, 1000), (1024, 1024), "longest") == 1024 / 2000


def test_resize_scale_shortest():
    assert resize_scale((500, 1000), (800, 800), "shortest") == 800 / 500


def test_pick_bucket_aspect():
    buckets = ((800, 800), (800, 1344), (1344, 800))
    assert pick_bucket(750, 750, buckets) == (800, 800)
    assert pick_bucket(500, 900, buckets) == (800, 1344)
    assert pick_bucket(900, 500, buckets) == (1344, 800)


def test_scale_pad_normalize_identity_region(rng):
    img = (rng.random((50, 100, 3)) * 255).astype(np.uint8)
    out = np.asarray(scale_pad_normalize(
        jnp.asarray(img), jnp.float32(1.0), (0, 0, 0), (1, 1, 1), (64, 128)))
    # scale 1: content preserved (interior pixels exact)
    np.testing.assert_allclose(out[10, 10], img[10, 10].astype(np.float32),
                               atol=1e-3)
    # padding region is zero-fill
    assert np.abs(out[60:, :]).max() < 1e-6
    assert np.abs(out[:, 110:]).max() < 1e-6


def test_scale_pad_normalize_mean_std(rng):
    img = np.full((10, 10, 3), 100, np.uint8)
    out = np.asarray(scale_pad_normalize(
        jnp.asarray(img), jnp.float32(1.0), (50, 50, 50), (25, 25, 25),
        (10, 10)))
    np.testing.assert_allclose(out, 2.0, atol=1e-5)


def test_to_device_image_alpha_flatten():
    rgba = np.zeros((4, 4, 4), np.uint8)
    rgba[..., 3] = 0  # fully transparent -> white
    out = np.asarray(to_device_image(rgba))
    assert (out == 255).all()
    gray2d = np.full((4, 4), 7, np.uint8)
    out2 = np.asarray(to_device_image(gray2d))
    assert out2.shape == (4, 4, 3)


def test_wordpiece_vocab_file(tmp_path):
    from inklayer_tpu.models.gdino.tokenizer import WordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "rocket", "##ship", "."]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(path))
    ids = tok.encode("rocketship.")
    assert ids == [2, 4, 5, 6, 3]  # [CLS] rocket ##ship . [SEP]


def test_resize_batch_matmul_matches_jax_image():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from inklayer_tpu.ops.image import resize_batch_matmul

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(3, 37, 53), jnp.float32)
    for out_hw in ((74, 106), (128, 96), (25, 31)):  # up, mixed, down
        a = resize_batch_matmul(x, out_hw)
        b = jax.image.resize(x, (3,) + out_hw, method="bilinear")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)
