import jax
import jax.numpy as jnp
import pytest
import numpy as np

from inklayer_tpu.config import DepthConfig
from inklayer_tpu.models.depth import DepthAnythingV2, DepthEstimator, depth_bucket

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier

TINY = DepthConfig(
    encoder="tiny", embed_dim=32, depth=4, num_heads=2, patch_size=14,
    intermediate_layers=(0, 1, 2, 3), features=16,
    out_channels=(8, 16, 16, 32), input_size=56)


def test_depth_bucket_multiple_of_patch():
    cfg = DepthConfig()
    for h, w in [(750, 750), (480, 640), (1333, 800), (100, 2000)]:
        bh, bw = depth_bucket(h, w, cfg)
        assert bh % 14 == 0 and bw % 14 == 0
        assert bh >= cfg.input_size and bw >= cfg.input_size


def test_depth_forward_tiny(rng):
    model = DepthAnythingV2(TINY)
    x = jnp.asarray(rng.standard_normal((1, 56, 70, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    depth = model.apply(params, x)
    assert depth.shape == (1, 56, 70)
    d = np.asarray(depth)
    assert np.isfinite(d).all()
    assert (d >= 0).all()  # ReLU'd relative depth


def test_depth_estimator_roundtrip(rng):
    model = DepthAnythingV2(TINY)
    x = jnp.zeros((1, 56, 56, 3))
    params = model.init(jax.random.key(0), x)
    est = DepthEstimator(params, TINY)
    img = (rng.random((100, 130, 3)) * 255).astype(np.uint8)
    depth = est.infer_image(img)
    assert depth.shape == (100, 130)
    assert np.isfinite(depth).all()
