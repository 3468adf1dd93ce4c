"""Tensor/data-parallel INFERENCE sharding tests (SURVEY §2.9's TPU-native
plan: tp-shard SAM for latency, dp-shard batches) on the 8-virtual-device
CPU mesh: sharded execution must be numerically identical to single-device
execution, with XLA inserting the collectives via GSPMD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from inklayer_tpu.parallel.mesh import make_mesh
from inklayer_tpu.parallel.sharding import batch_sharding, param_sharding_rules

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier


@pytest.fixture(scope="module")
def sam_setup():
    from inklayer_tpu.models.sam import Sam
    from tests.test_sam import TINY

    model = Sam(TINY)
    img = jnp.zeros((1, TINY.image_size, TINY.image_size, 3))
    params = model.init(jax.random.key(0), img, jnp.zeros((2, 4)))
    return model, params, TINY


def test_tp_sharded_sam_encode_matches(sam_setup, rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model, params, TINY = sam_setup
    x = jnp.asarray(rng.standard_normal(
        (2, TINY.image_size, TINY.image_size, 3)), jnp.float32)

    ref = model.apply(params, x, method=type(model).encode)

    mesh = make_mesh(dp=2, fsdp=1, tp=4)
    shardings = param_sharding_rules(params, mesh)
    p_sharded = jax.tree.map(jax.device_put, params, shardings)
    fn = jax.jit(
        lambda p, xx: model.apply(p, xx, method=type(model).encode),
        in_shardings=(shardings, batch_sharding(mesh)),
    )
    out = fn(p_sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # the tp axis actually partitioned something (not all replicated)
    leaves = jax.tree_util.tree_leaves(shardings)
    assert any("tp" in str(s.spec) for s in leaves)


def test_dp_sharded_gdino_detect_matches(rng):
    """Batch-sharded GroundingDINO forward over dp=8 == single device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from inklayer_tpu.models.gdino.bert import subsentence_masks
    from inklayer_tpu.models.gdino.gdino import GroundingDINO
    from tests.test_gdino import TINY

    model = GroundingDINO(TINY)
    size = 64
    ids = np.zeros((1, 6), np.int32)
    ids[0] = [101, 4874, 1012, 102, 0, 0]
    attn, pos = subsentence_masks(ids)
    b = 8
    img = jnp.asarray(rng.standard_normal((b, size, size, 3)), jnp.float32)
    pad = jnp.zeros((b, size, size), bool)
    ids_b = jnp.broadcast_to(jnp.asarray(ids), (b, ids.shape[1]))
    attn_b = jnp.broadcast_to(jnp.asarray(attn), (b,) + attn.shape[1:])
    pos_b = jnp.broadcast_to(jnp.asarray(pos.astype(np.int32)),
                             (b, pos.shape[1]))
    params = model.init(jax.random.key(0), img[:1], pad[:1],
                        jnp.asarray(ids), jnp.asarray(attn),
                        jnp.asarray(pos.astype(np.int32)))

    ref_logits, ref_boxes = model.apply(params, img, pad, ids_b, attn_b, pos_b)

    mesh = make_mesh(dp=8, fsdp=1, tp=1)
    dp = NamedSharding(mesh, P("dp"))
    fn = jax.jit(model.apply,
                 in_shardings=(None, dp, dp, dp, dp, dp))
    logits, boxes = fn(params, img, pad, ids_b, attn_b, pos_b)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_boxes),
                               atol=1e-5, rtol=1e-5)
    fin = np.isfinite(np.asarray(ref_logits))
    np.testing.assert_allclose(np.asarray(logits)[fin],
                               np.asarray(ref_logits)[fin],
                               atol=2e-5, rtol=1e-5)
