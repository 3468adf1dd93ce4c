"""Numerical parity of the Swin-T backbone against the REFERENCE's torch
implementation (read-only oracle; timm and groundingdino.util.misc are
stubbed — the backbone uses DropPath(identity at eval)/to_2tuple/
trunc_normal_ and NestedTensor only)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from inklayer_tpu.config import SwinConfig
from inklayer_tpu.io import weights as W
from inklayer_tpu.models.gdino.swin import SwinTransformer

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier

REF = ("/root/reference/InkLayer/third_party/GroundingDINO/groundingdino/"
       "models/GroundingDINO/backbone/swin_transformer.py")


@pytest.fixture(scope="module")
def ref_swin_module():
    if not os.path.exists(REF):
        pytest.skip("reference not mounted")
    # --- stub timm.models.layers ---
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)
    # --- stub groundingdino.util.misc.NestedTensor ---
    gd = types.ModuleType("groundingdino")
    gdu = types.ModuleType("groundingdino.util")
    gdm = types.ModuleType("groundingdino.util.misc")

    class NestedTensor:
        def __init__(self, tensors, mask):
            self.tensors = tensors
            self.mask = mask

        def decompose(self):
            return self.tensors, self.mask

    gdm.NestedTensor = NestedTensor
    gd.util = gdu
    gdu.misc = gdm
    sys.modules.setdefault("groundingdino", gd)
    sys.modules.setdefault("groundingdino.util", gdu)
    sys.modules.setdefault("groundingdino.util.misc", gdm)

    spec = importlib.util.spec_from_file_location("ref_swin", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_swin_t_parity(ref_swin_module, tmp_path, rng):
    torch.manual_seed(0)
    ref = ref_swin_module.SwinTransformer(
        pretrain_img_size=224, embed_dim=24, depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24), window_size=7, ape=False, patch_norm=True,
        out_indices=(1, 2, 3), use_checkpoint=False)
    ref.eval()
    sd = {f"backbone.0.{k}": v for k, v in ref.state_dict().items()}
    path = str(tmp_path / "swin.pth")
    torch.save(sd, path)

    cfg = SwinConfig(embed_dim=24, depths=(2, 2, 2, 2),
                     num_heads=(3, 6, 12, 24), window_size=7)
    ours = SwinTransformer(cfg)
    x = rng.standard_normal((1, 112, 140, 3)).astype(np.float32)
    mask = np.zeros((1, 112, 140), bool)
    template = jax.eval_shape(
        lambda k: ours.init(k, jnp.asarray(x), jnp.asarray(mask)),
        jax.random.key(0))
    raw = W.load_torch_state_dict(path)
    flat, unmatched = W.convert_state_dict(
        raw, W.GDINO_RULES, strict=False, ignore=W.GDINO_IGNORE)
    assert not unmatched, unmatched[:5]
    tree = W.tree_from_paths(flat)["backbone"]
    params = W.fill_params(template, {"params": tree})

    outs = ours.apply(params, jnp.asarray(x), jnp.asarray(mask))
    with torch.no_grad():
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        ref_outs = ref(NestedTensorLike(xt))
    for i, ((feat, m), key) in enumerate(zip(outs, sorted(ref_outs))):
        rt, rm = ref_outs[key].decompose()
        ours_nchw = np.asarray(feat).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours_nchw, rt.numpy(), atol=2e-4,
                                   rtol=1e-3, err_msg=f"stage {i}")
        np.testing.assert_array_equal(np.asarray(m), rm.numpy(),
                                      err_msg=f"mask {i}")


class NestedTensorLike:
    def __init__(self, tensors):
        self.tensors = tensors
        self.mask = torch.zeros((tensors.shape[0],) + tensors.shape[2:],
                                dtype=torch.bool)

    def decompose(self):
        return self.tensors, self.mask
