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
