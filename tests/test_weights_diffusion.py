"""Full-coverage conversion tests for the diffusion checkpoint rules.

Instead of hand-writing synthetic diffusers state dicts, the rule tables are
INVERTED: every flax parameter path of a tiny model is mapped back to its
torch key and a tensor of the correctly-transposed shape is synthesised.
This proves (a) every model parameter is reachable by some rule and (b) the
layout transforms land values in the right slots.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from inklayer_tpu.io import weights as W

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier

_INV_SHAPES = {
    "linear": lambda s: (s[1], s[0]),
    "conv": lambda s: (s[3], s[2], s[0], s[1]),
    "convT": lambda s: (s[2], s[3], s[0], s[1]),
    "id": lambda s: s,
}


def _invert_rule(rule: W.Rule):
    """Rule -> (compiled regex over flax paths, torch-key substitution)."""
    # path template: replace backrefs \1 / \g<1> with capture groups
    tgt = rule.path
    tgt_regex = ""
    i = 0
    n_groups = 0
    while i < len(tgt):
        m = re.match(r"\\g<(\d+)>|\\(\d)", tgt[i:])
        if m:
            tgt_regex += r"([0-9a-z_]+?)"
            n_groups += 1
            i += m.end()
        else:
            tgt_regex += re.escape(tgt[i])
            i += 1
    return re.compile(tgt_regex + r"\Z"), n_groups


def _source_key(rule: W.Rule, groups):
    """Substitute captured group values into the rule's source pattern."""
    src = rule.pattern
    out = ""
    i = 0
    gi = 0
    depth = 0
    while i < len(src):
        if src[i] == "\\" and i + 1 < len(src):
            out += src[i + 1]
            i += 2
        elif src[i] == "(":
            # find matching close paren
            j = i
            d = 0
            while j < len(src):
                if src[j] == "(" and (j == 0 or src[j - 1] != "\\"):
                    d += 1
                elif src[j] == ")" and src[j - 1] != "\\":
                    d -= 1
                    if d == 0:
                        break
                j += 1
            out += groups[gi]
            gi += 1
            i = j + 1
        else:
            out += src[i]
            i += 1
    return out


def _synthesize(rules, template, rng, extra_unused=()):
    """flax template -> synthetic torch state dict covering every leaf."""
    inverted = [(rule, *_invert_rule(rule)) for rule in rules]
    # literal (0-group) rules must win over wildcard ones (e.g. zero_conv_mid
    # vs zero_conv_\d)
    inverted.sort(key=lambda t: t[2])
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    sd = {}
    missing = []
    for path, leaf in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        assert keys[0] == "params"
        fpath = "/".join(keys[1:])
        for rule, regex, _n in inverted:
            m = regex.match(fpath)
            if m:
                key = _source_key(rule, list(m.groups()))
                shape = _INV_SHAPES[rule.transform_name](tuple(leaf.shape))
                sd[key] = rng.standard_normal(shape).astype(np.float32) * 0.02
                break
        else:
            missing.append(fpath)
    assert not missing, f"no rule covers: {missing[:10]}"
    return sd


@pytest.mark.parametrize(
    "which", ["unet", "controlnet", "vae", "clip", "sdxl_unet", "clip_g"])
def test_diffusion_conversion_coverage(which, rng, tmp_path):
    from inklayer_tpu.models.diffusion import (
        AutoencoderKL, CLIPTextEncoder, ControlNet, UNet2DCondition)
    from inklayer_tpu.models.diffusion.sdxl import CLIPTextTower

    if which == "sdxl_unet":
        # SDXL layout: 3 blocks, depths (0, 2, 10) -> tiny (0, 2, 2); linear
        # proj + text_time add-embedding
        model = UNet2DCondition(
            block_channels=(8, 16, 16), transformer_layers=(0, 2, 2),
            linear_proj=True, head_dim=4, context_dim=16,
            addition_embed_dim=8, addition_proj_dim=16 + 6 * 8)
        args = (jnp.zeros((1, 16, 16, 9)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 7, 16)), None, None, False,
                jnp.zeros((1, 16)), jnp.zeros((1, 6)))
        rules, loader = (W._sdxl_unet_rules((0, 2, 2)),
                         lambda p, m, a: W._load_component(
                             p, W._sdxl_unet_rules((0, 2, 2)), m, a))
    elif which == "clip_g":
        model = CLIPTextTower(hidden=16, layers=2, heads=2, max_len=8,
                              pooled_proj=8, act="gelu")
        args = (jnp.zeros((1, 8), jnp.int32),)
        rules, loader = W.SDXL_TEXT_RULES, W.load_sdxl_text_params
    elif which == "unet":
        model = UNet2DCondition(block_channels=(8, 16, 16, 16), context_dim=16)
        args = (jnp.zeros((1, 16, 16, 9)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 7, 16)))
        rules, loader = W.UNET_RULES, W.load_unet_params
    elif which == "controlnet":
        model = ControlNet(block_channels=(8, 16, 16, 16), context_dim=16)
        args = (jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 7, 16)), jnp.zeros((1, 128, 128, 3)))
        rules, loader = W.CONTROLNET_RULES, W.load_controlnet_params
    elif which == "vae":
        model = AutoencoderKL((8, 8, 8, 8), 4)
        args = (jnp.zeros((1, 32, 32, 3)),)
        rules, loader = W.VAE_RULES, W.load_vae_params
    else:
        model = CLIPTextEncoder(hidden=16, heads=2, layers=2, max_len=8)
        args = (jnp.zeros((1, 8), jnp.int32),)
        rules, loader = W.CLIP_TEXT_RULES, W.load_clip_text_params

    template = jax.eval_shape(lambda k: model.init(k, *args), jax.random.key(0))
    sd = _synthesize(rules, template, rng)
    path = str(tmp_path / f"{which}.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    params = loader(path, model, args)
    out = model.apply(params, *args)
    leaves = jax.tree_util.tree_leaves(out)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves
               if hasattr(l, "shape"))


def test_gdino_conversion_coverage(rng, tmp_path):
    """Full-coverage conversion for the GroundingDINO rule table, including
    the packed nn.MultiheadAttention in_proj splitting."""
    from tests.test_gdino import TINY
    from inklayer_tpu.models.gdino import GroundingDINO
    from inklayer_tpu.models.gdino.bert import subsentence_masks

    model = GroundingDINO(TINY)
    ids = np.asarray([[101, 4874, 1012, 102]], np.int32)
    attn, pos = subsentence_masks(ids)
    args = (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64), bool),
            jnp.asarray(ids), jnp.asarray(attn),
            jnp.asarray(pos.astype(np.int32)))
    template = jax.eval_shape(lambda k: model.init(k, *args),
                              jax.random.key(0))

    inverted = [(rule, *_invert_rule(rule)) for rule in W.GDINO_RULES
                if not rule.path.startswith("__special")]
    inverted.sort(key=lambda t: t[2])
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    sd = {}
    missing = []
    d = TINY.hidden_dim
    # packed in_proj tensors covered by the special split rules
    for i in range(TINY.dec_layers):
        sd[f"transformer.decoder.layers.{i}.self_attn.in_proj_weight"] = \
            rng.standard_normal((3 * d, d)).astype(np.float32) * 0.02
        sd[f"transformer.decoder.layers.{i}.self_attn.in_proj_bias"] = \
            np.zeros((3 * d,), np.float32)
        sd[f"transformer.decoder.layers.{i}.ca_text.in_proj_weight"] = \
            rng.standard_normal((3 * d, d)).astype(np.float32) * 0.02
        sd[f"transformer.decoder.layers.{i}.ca_text.in_proj_bias"] = \
            np.zeros((3 * d,), np.float32)
    for i in range(TINY.enc_layers):
        sd[f"transformer.encoder.text_layers.{i}.self_attn.in_proj_weight"] = \
            rng.standard_normal((3 * d, d)).astype(np.float32) * 0.02
        sd[f"transformer.encoder.text_layers.{i}.self_attn.in_proj_bias"] = \
            np.zeros((3 * d,), np.float32)
    split_covered = set()
    for i in range(TINY.dec_layers):
        for nm in ("q", "k", "v"):
            split_covered.add(f"transformer/dec_layer_{i}/sa_{nm}/kernel")
            split_covered.add(f"transformer/dec_layer_{i}/sa_{nm}/bias")
            split_covered.add(f"transformer/dec_layer_{i}/ca_text_{nm}/kernel")
            split_covered.add(f"transformer/dec_layer_{i}/ca_text_{nm}/bias")
    for i in range(TINY.enc_layers):
        for nm in ("q", "k", "v"):
            split_covered.add(f"transformer/enc_text_{i}/{nm}_proj/kernel")
            split_covered.add(f"transformer/enc_text_{i}/{nm}_proj/bias")

    for path, leaf in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        fpath = "/".join(keys[1:])
        if fpath in split_covered:
            continue
        for rule, regex, _n in inverted:
            m = regex.match(fpath)
            if m:
                key = _source_key(rule, list(m.groups()))
                shape = _INV_SHAPES[rule.transform_name](tuple(leaf.shape))
                sd[key] = rng.standard_normal(shape).astype(np.float32) * 0.02
                break
        else:
            missing.append(fpath)
    assert not missing, f"no rule covers: {missing[:10]}"

    path = str(tmp_path / "gdino_tiny.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    params = W.load_gdino_params(path, TINY, model, args)
    logits, boxes = model.apply(params, *args)
    assert np.isfinite(np.asarray(boxes)).all()
    # converted value actually landed (spot check)
    got = np.asarray(params["params"]["feat_map"]["kernel"])
    np.testing.assert_allclose(got, sd["feat_map.weight"].T, atol=1e-7)
