"""Parity of GDINO sub-modules against the REFERENCE's torch code
(read-only oracle imports): the GLIP bi-directional fusion block and the
pure-torch deformable-attention sampling function (the CUDA kernel's own
documented fallback, ms_deform_attn.py:93-133)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from inklayer_tpu.io import weights as W

GD = ("/root/reference/InkLayer/third_party/GroundingDINO/groundingdino/"
      "models/GroundingDINO")


def _stub_timm():
    if "timm.models.layers" in sys.modules:
        return
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers


def _load(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(GD, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_fuse():
    if not os.path.isdir(GD):
        pytest.skip("reference not mounted")
    _stub_timm()
    return _load("ref_fuse", "fuse_modules.py")


def test_bi_attention_block_parity(ref_fuse, tmp_path, rng):
    from inklayer_tpu.models.gdino.fusion import BiAttentionBlock

    torch.manual_seed(0)
    ref = ref_fuse.BiAttentionBlock(
        v_dim=16, l_dim=16, embed_dim=32, num_heads=2, dropout=0.0,
        drop_path=0.0)
    ref.eval()
    sd = {f"transformer.encoder.fusion_layers.0.{k}": v
          for k, v in ref.state_dict().items()}
    path = str(tmp_path / "fuse.pth")
    torch.save(sd, path)
    raw = W.load_torch_state_dict(path)
    flat, unmatched = W.convert_state_dict(raw, W.GDINO_RULES, strict=True)
    tree = W.tree_from_paths(flat)["transformer"]["enc_fusion_0"]

    ours = BiAttentionBlock(v_dim=16, l_dim=16, embed_dim=32, num_heads=2)
    v = rng.standard_normal((1, 11, 16)).astype(np.float32)
    l = rng.standard_normal((1, 5, 16)).astype(np.float32)
    lmask = np.asarray([[True, True, True, True, False]])
    vpad = np.zeros((1, 11), bool)
    vpad[0, 8:] = True  # padded image positions
    template = jax.eval_shape(
        lambda k: ours.init(k, jnp.asarray(v), jnp.asarray(l),
                            jnp.asarray(lmask), jnp.asarray(vpad)),
        jax.random.key(0))
    params = W.fill_params(template, {"params": tree})

    ours_v, ours_l = ours.apply(params, jnp.asarray(v), jnp.asarray(l),
                                jnp.asarray(lmask), jnp.asarray(vpad))
    with torch.no_grad():
        # reference attention_mask_l semantics: True = masked-out pad
        ref_v, ref_l = ref(torch.tensor(v), torch.tensor(l),
                           attention_mask_v=torch.tensor(vpad),
                           attention_mask_l=torch.tensor(~lmask))
    np.testing.assert_allclose(np.asarray(ours_v), ref_v.numpy(), atol=2e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_l), ref_l.numpy(), atol=2e-5,
                               rtol=1e-4)


def test_ms_deform_attn_vs_reference_torch(rng):
    """Cross-check our op against the reference's own pure-torch fallback
    (multi_scale_deformable_attn_pytorch) — the function the CUDA kernel is
    tested against upstream."""
    if not os.path.isdir(GD):
        pytest.skip("reference not mounted")
    _stub_timm()
    # ms_deform_attn.py imports groundingdino _C lazily inside try/except
    try:
        mod = _load("ref_msda", "ms_deform_attn.py")
    except Exception as e:
        pytest.skip(f"reference ms_deform_attn not importable: {e}")
    fn = mod.multi_scale_deformable_attn_pytorch

    from inklayer_tpu.ops.deformable import ms_deform_attn

    b, heads, d = 2, 2, 4
    shapes = ((6, 8), (3, 4))
    n = sum(h * w for h, w in shapes)
    lq, pts = 7, 3
    value = rng.standard_normal((b, n, heads, d)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, (b, lq, heads, len(shapes), pts, 2)
                       ).astype(np.float32)
    wts = rng.random((b, lq, heads, len(shapes), pts)).astype(np.float32)
    with torch.no_grad():
        ref = fn(torch.tensor(value), torch.tensor(shapes, dtype=torch.long),
                 torch.tensor(locs), torch.tensor(wts)).numpy()
    ours = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs),
                          jnp.asarray(wts), impl="gather")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_text_enhancer_parity(tmp_path, rng):
    """TransformerEncoderLayer (text enhancer) parity — validates the packed
    nn.MultiheadAttention in_proj -> q/k/v split conversion and the post-norm
    layer math, including GDINO's inverted-mask convention."""
    if not os.path.isdir(GD):
        pytest.skip("reference not mounted")
    _stub_timm()
    pkg = types.ModuleType("refgd")
    pkg.__path__ = [GD]
    sys.modules["refgd"] = pkg
    _load("refgd.utils", "utils.py")
    tv = _load("refgd.transformer_vanilla", "transformer_vanilla.py")

    from inklayer_tpu.models.gdino.fusion import TextEnhancerLayer

    torch.manual_seed(0)
    ref = tv.TransformerEncoderLayer(d_model=16, nhead=2, dim_feedforward=32,
                                     dropout=0.0)
    ref.eval()
    sd = {f"transformer.encoder.text_layers.0.{k}": v
          for k, v in ref.state_dict().items()}
    path = str(tmp_path / "text.pth")
    torch.save(sd, path)
    raw = W.load_torch_state_dict(path)
    flat, unmatched = W.convert_state_dict(raw, W.GDINO_RULES, strict=True)
    assert not unmatched
    flat = W._split_in_proj(flat, 0)
    tree = W.tree_from_paths(flat)["transformer"]["enc_text_0"]

    ours = TextEnhancerLayer(d_model=16, num_heads=2, ffn_dim=32)
    x = rng.standard_normal((1, 6, 16)).astype(np.float32)
    pos = rng.standard_normal((1, 6, 16)).astype(np.float32)
    # block-diagonal span mask, True = attend (our convention)
    allow = np.zeros((1, 6, 6), bool)
    allow[0, :3, :3] = True
    allow[0, 3:, 3:] = True
    template = jax.eval_shape(
        lambda k: ours.init(k, jnp.asarray(x), jnp.asarray(pos),
                            jnp.asarray(allow)), jax.random.key(0))
    params = W.fill_params(template, {"params": tree})
    out = ours.apply(params, jnp.asarray(x), jnp.asarray(pos),
                     jnp.asarray(allow))

    with torch.no_grad():
        # reference: seq-first layout, src_mask True = BLOCKED (~allow),
        # repeated per head inside the layer
        ref_out = ref(torch.tensor(x.transpose(1, 0, 2)),
                      src_mask=torch.tensor(~allow),
                      pos=torch.tensor(pos.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(out),
                               ref_out.numpy().transpose(1, 0, 2),
                               atol=2e-5, rtol=1e-4)
