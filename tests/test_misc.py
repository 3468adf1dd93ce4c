import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from inklayer_tpu.io.checkpoint import load_params, save_params
from inklayer_tpu.profiling import Timer


def test_checkpoint_roundtrip(tmp_path):
    params = {"params": {"layer": {"kernel": jnp.ones((3, 4)),
                                   "bias": jnp.zeros((4,))}}}
    save_params(params, str(tmp_path / "ckpt"))
    loaded = load_params(str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["layer"]["kernel"]), np.ones((3, 4)))


def test_checkpoint_with_config(tmp_path):
    from inklayer_tpu.config import PipelineConfig

    params = {"params": {"w": jnp.ones((2,))}}
    save_params(params, str(tmp_path / "c"), config=PipelineConfig())
    with open(tmp_path / "c" / "config.json") as f:
        cfg = json.load(f)
    assert cfg["gdino"]["num_queries"] == 900


def test_timer_sections():
    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    rep = t.report()
    assert rep["a"]["calls"] == 2
    assert rep["b"]["calls"] == 1


def test_export_sam_decoder_roundtrip(tmp_path, rng):
    import jax

    from inklayer_tpu.io.export import export_sam_decoder, load_exported
    from inklayer_tpu.models.sam import Sam
    from tests.test_sam import TINY

    model = Sam(TINY)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, TINY.image_size, TINY.image_size, 3)),
                        jnp.zeros((2, 4)))
    path = str(tmp_path / "sam_decoder.stablehlo")
    exported, blob = export_sam_decoder(params, TINY, path, box_capacity=2)
    assert len(blob) > 1000

    grid = TINY.image_size // TINY.patch_size
    emb = jnp.asarray(
        rng.standard_normal((1, grid, grid, TINY.prompt_embed_dim)),
        jnp.float32)
    boxes = jnp.asarray([[4.0, 4.0, 30.0, 30.0], [0.0, 0.0, 64.0, 64.0]])
    direct_logits, direct_iou = model.apply(params, emb, boxes,
                                            method=Sam.decode_boxes)
    restored = load_exported(path)
    out_logits, out_iou = restored.call(emb, boxes)
    np.testing.assert_allclose(np.asarray(out_logits),
                               np.asarray(direct_logits), atol=1e-5)


def test_cached_jit_cpu_passthrough(tmp_path, rng):
    """On CPU the cache is bypassed (plain jit); behavior identical."""
    from inklayer_tpu.io.aotcache import cached_jit

    f = cached_jit(lambda a, b: a @ b, name="t", cache_dir=str(tmp_path))
    a = jnp.ones((4, 4))
    np.testing.assert_allclose(np.asarray(f(a, a)), 4 * np.ones((4, 4)))
    assert not list(tmp_path.iterdir())  # nothing written on CPU


def test_multihost_shard_assignment():
    """main.py --num_hosts/--host_id round-robin sharding: disjoint,
    complete, deterministic (embarrassingly parallel DCN sweep plan,
    SURVEY §2.9)."""
    paths = [f"img_{i:03d}.png" for i in range(11)]
    shards = [paths[h::4] for h in range(4)]
    joined = [p for s in shards for p in s]
    assert sorted(joined) == paths
    assert len({p for s in shards for p in s}) == len(paths)
    assert shards[0] == ["img_000.png", "img_004.png", "img_008.png"]
