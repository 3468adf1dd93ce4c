import threading
import time

import numpy as np
import pytest

from inklayer_tpu.serve.batcher import BatchedSamEncoder, MicroBatcher


def test_batcher_single():
    calls = []

    def fn(x):
        calls.append(x.shape[0])
        return x * 2

    b = MicroBatcher(fn, batch_buckets=(1, 2, 4), max_wait_ms=1.0)
    out = b(np.ones((3,)))
    np.testing.assert_array_equal(out, 2 * np.ones((3,)))
    b.close()
    assert calls == [1]


def test_batcher_coalesces_concurrent():
    seen_batches = []
    release = threading.Event()

    def fn(x):
        seen_batches.append(x.shape[0])
        return x + 1

    b = MicroBatcher(fn, batch_buckets=(1, 2, 4), max_wait_ms=50.0)
    futs = [b.submit(np.full((2,), i, float)) for i in range(4)]
    results = [f.result(timeout=5) for f in futs]
    for i, r in enumerate(results):
        np.testing.assert_array_equal(r, np.full((2,), i + 1.0))
    b.close()
    # at least one call served multiple requests
    assert max(seen_batches) >= 2
    # padded to bucket sizes
    assert all(s in (1, 2, 4) for s in seen_batches)


def test_batcher_error_propagates():
    def fn(x):
        raise ValueError("boom")

    b = MicroBatcher(fn, max_wait_ms=1.0)
    with pytest.raises(ValueError):
        b(np.ones((1,)))
    b.close()


def test_batched_sam_encoder_matches_direct(rng):
    import jax
    import jax.numpy as jnp

    from inklayer_tpu.models.sam import Sam
    from tests.test_sam import TINY

    model = Sam(TINY)
    img = jnp.zeros((1, TINY.image_size, TINY.image_size, 3))
    params = model.init(jax.random.key(0), img, jnp.zeros((2, 4)))
    enc = BatchedSamEncoder(model, params, batch_buckets=(1, 2),
                            max_wait_ms=5.0)
    x = rng.standard_normal(
        (TINY.image_size, TINY.image_size, 3)).astype(np.float32)
    out = enc.encode(x)
    direct = model.apply(params, jnp.asarray(x)[None], method=Sam.encode)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-5)
    enc.close()


@pytest.mark.slow
def test_pipeline_batched_encoder_wiring(rng):
    """SamPredictor.set_image routes through a shared BatchedSamEncoder when
    enabled, and produces identical masks to the direct path."""
    import jax
    import jax.numpy as jnp

    from inklayer_tpu.models.sam import Sam, SamPredictor
    from tests.test_sam import TINY

    model = Sam(TINY)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, TINY.image_size, TINY.image_size, 3)),
        jnp.zeros((2, 4)))
    direct = SamPredictor(params, TINY, box_capacity=4)
    batched = SamPredictor(params, TINY, box_capacity=4)
    enc = BatchedSamEncoder(batched.model, params, batch_buckets=(1, 2),
                            max_wait_ms=5.0)
    batched.encode_fn = enc.encode

    img = (rng.random((40, 52, 3)) * 255).astype(np.uint8)
    boxes = np.asarray([[4.0, 4.0, 30.0, 28.0]])
    direct.set_image(img)
    batched.set_image(img)
    m1, _, _ = direct.predict_boxes(boxes)
    m2, _, _ = batched.predict_boxes(boxes)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    # concurrent callers coalesce into one batched launch
    outs = [enc.batcher.submit(
        jnp.asarray(rng.standard_normal(
            (TINY.image_size, TINY.image_size, 3)).astype(np.float32)))
        for _ in range(2)]
    for f in outs:
        assert f.result(timeout=30).shape[-1] == TINY.prompt_embed_dim
    enc.close()
