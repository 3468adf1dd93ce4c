"""Numerical parity of the Depth-Anything-V2 stack against the REFERENCE's
torch implementation (read-only oracle import; torchvision is stubbed — the
reference only imports Compose for its host-side transform)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from inklayer_tpu.config import DepthConfig
from inklayer_tpu.io import weights as W
from inklayer_tpu.models.depth import DepthAnythingV2 as OursDepth

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier

REF = "/root/reference/InkLayer/third_party/Depth_Anything_V2/depth_anything_v2"


@pytest.fixture(scope="module")
def refdav2():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    # stub torchvision (absent in env; reference only uses transforms.Compose)
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.Compose = lambda fns: fns
    tv.transforms = tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)

    pkg = types.ModuleType("refdav2")
    pkg.__path__ = [REF]
    sys.modules["refdav2"] = pkg
    sub = types.ModuleType("refdav2.dinov2_layers")
    sub.__path__ = [os.path.join(REF, "dinov2_layers")]
    sys.modules["refdav2.dinov2_layers"] = sub
    util = types.ModuleType("refdav2.util")
    util.__path__ = [os.path.join(REF, "util")]
    sys.modules["refdav2.util"] = util

    def load(qualname, relpath):
        spec = importlib.util.spec_from_file_location(
            qualname, os.path.join(REF, relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[qualname] = mod
        spec.loader.exec_module(mod)
        return mod

    for name in ("drop_path", "layer_scale", "mlp", "patch_embed",
                 "swiglu_ffn", "attention", "block"):
        load(f"refdav2.dinov2_layers.{name}", f"dinov2_layers/{name}.py")
    layers_init = load("refdav2.dinov2_layers.__init__",
                       "dinov2_layers/__init__.py")
    for k in ("Mlp", "PatchEmbed", "SwiGLUFFNFused", "MemEffAttention",
              "NestedTensorBlock"):
        setattr(sub, k, getattr(layers_init, k))
    load("refdav2.util.blocks", "util/blocks.py")
    load("refdav2.util.transform", "util/transform.py")
    for k in ("blocks", "transform"):
        setattr(util, k, sys.modules[f"refdav2.util.{k}"])
    dinov2 = load("refdav2.dinov2", "dinov2.py")
    setattr(pkg, "dinov2", dinov2)
    dpt = load("refdav2.dpt", "dpt.py")
    return dpt


@pytest.fixture(scope="module")
def models(refdav2, tmp_path_factory):
    torch.manual_seed(0)
    ref = refdav2.DepthAnythingV2(
        encoder="vits", features=64, out_channels=[48, 96, 192, 384])
    ref.eval()
    sd = {k: v for k, v in ref.state_dict().items()}
    path = str(tmp_path_factory.mktemp("d") / "depth_vits.pth")
    torch.save(sd, path)
    cfg = DepthConfig.vits()
    ours = OursDepth(cfg)
    args = (jnp.zeros((1, cfg.input_size, cfg.input_size, 3)),)
    from inklayer_tpu.io.weights import load_depth_params

    params = load_depth_params(path, cfg, ours, args)
    return ref, ours, params


@pytest.mark.slow
def test_depth_native_size_parity(models, rng):
    """518x518 (native grid, no pos-embed interpolation) — tight parity."""
    ref, ours, params = models
    x = rng.standard_normal((1, 518, 518, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours_out = np.asarray(ours.apply(params, jnp.asarray(x)))
    scale = max(np.abs(ref_out).max(), 1e-6)
    assert ours_out.shape == ref_out.shape
    np.testing.assert_allclose(ours_out / scale, ref_out / scale, atol=2e-3)


def test_depth_interpolated_size(models, rng):
    """Non-native grid exercises pos-embed interpolation; torch uses bicubic
    a=-0.75 with an offset fudge vs jax bicubic a=-0.5 — allow loose bounds
    but demand high correlation."""
    ref, ours, params = models
    x = rng.standard_normal((1, 140, 196, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours_out = np.asarray(ours.apply(params, jnp.asarray(x)))
    assert ours_out.shape == ref_out.shape
    a, b = ref_out.reshape(-1), ours_out.reshape(-1)
    if a.std() > 1e-6 and b.std() > 1e-6:
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.99, corr
