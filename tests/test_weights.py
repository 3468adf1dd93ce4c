import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from inklayer_tpu.io import weights as W
from tests.test_sam import TINY as TINY_SAM


def test_linear_transform_numeric(rng):
    lin = torch.nn.Linear(6, 4)
    x = rng.standard_normal((2, 6)).astype(np.float32)
    ref = lin(torch.tensor(x)).detach().numpy()
    import flax.linen as fnn

    dense = fnn.Dense(4)
    params = {"params": {
        "kernel": W.TRANSFORMS["linear"](lin.weight.detach().numpy()),
        "bias": lin.bias.detach().numpy(),
    }}
    out = dense.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_conv_transform_numeric(rng):
    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    ref = conv(torch.tensor(x)).detach().numpy().transpose(0, 2, 3, 1)
    import flax.linen as fnn

    fconv = fnn.Conv(5, (3, 3), padding=1)
    params = {"params": {
        "kernel": W.TRANSFORMS["conv"](conv.weight.detach().numpy()),
        "bias": conv.bias.detach().numpy(),
    }}
    out = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_convtranspose_transform_numeric(rng):
    convt = torch.nn.ConvTranspose2d(4, 6, 2, stride=2)
    x = rng.standard_normal((1, 4, 5, 5)).astype(np.float32)
    ref = convt(torch.tensor(x)).detach().numpy().transpose(0, 2, 3, 1)
    import flax.linen as fnn

    fconvt = fnn.ConvTranspose(6, (2, 2), strides=(2, 2))
    params = {"params": {
        "kernel": W.TRANSFORMS["convT"](convt.weight.detach().numpy()),
        "bias": convt.bias.detach().numpy(),
    }}
    out = fconvt.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def _tiny_sam_torch_state_dict(rng):
    """Synthetic state dict with official SAM key names at TINY_SAM sizes."""
    c = TINY_SAM
    d = {}

    def add(key, *shape):
        d[key] = rng.standard_normal(shape).astype(np.float32) * 0.02

    e = c.encoder_embed_dim
    add("image_encoder.patch_embed.proj.weight", e, 3, c.patch_size, c.patch_size)
    add("image_encoder.patch_embed.proj.bias", e)
    g = c.image_size // c.patch_size
    add("image_encoder.pos_embed", 1, g, g, e)
    hd = e // c.encoder_num_heads
    for i in range(c.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        for n in (1, 2):
            add(f"{p}.norm{n}.weight", e)
            add(f"{p}.norm{n}.bias", e)
        add(f"{p}.attn.qkv.weight", 3 * e, e)
        add(f"{p}.attn.qkv.bias", 3 * e)
        add(f"{p}.attn.proj.weight", e, e)
        add(f"{p}.attn.proj.bias", e)
        size = g if i in c.encoder_global_attn_indexes else c.encoder_window_size
        add(f"{p}.attn.rel_pos_h", 2 * size - 1, hd)
        add(f"{p}.attn.rel_pos_w", 2 * size - 1, hd)
        add(f"{p}.mlp.lin1.weight", 4 * e, e)
        add(f"{p}.mlp.lin1.bias", 4 * e)
        add(f"{p}.mlp.lin2.weight", e, 4 * e)
        add(f"{p}.mlp.lin2.bias", e)
    pe = c.prompt_embed_dim
    add("image_encoder.neck.0.weight", pe, e, 1, 1)
    add("image_encoder.neck.1.weight", pe)
    add("image_encoder.neck.1.bias", pe)
    add("image_encoder.neck.2.weight", pe, pe, 3, 3)
    add("image_encoder.neck.3.weight", pe)
    add("image_encoder.neck.3.bias", pe)
    # prompt encoder
    add("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix", 2, pe // 2)
    for i in range(4):
        add(f"prompt_encoder.point_embeddings.{i}.weight", 1, pe)
    add("prompt_encoder.not_a_point_embed.weight", 1, pe)
    add("prompt_encoder.no_mask_embed.weight", 1, pe)
    add("prompt_encoder.mask_downscaling.0.weight", 4, 1, 2, 2)
    add("prompt_encoder.mask_downscaling.0.bias", 4)
    add("prompt_encoder.mask_downscaling.1.weight", 4)
    add("prompt_encoder.mask_downscaling.1.bias", 4)
    add("prompt_encoder.mask_downscaling.3.weight", 16, 4, 2, 2)
    add("prompt_encoder.mask_downscaling.3.bias", 16)
    add("prompt_encoder.mask_downscaling.4.weight", 16)
    add("prompt_encoder.mask_downscaling.4.bias", 16)
    add("prompt_encoder.mask_downscaling.6.weight", pe, 16, 1, 1)
    add("prompt_encoder.mask_downscaling.6.bias", pe)
    # mask decoder
    add("mask_decoder.iou_token.weight", 1, pe)
    add("mask_decoder.mask_tokens.weight", 4, pe)
    for i in range(2):
        p = f"mask_decoder.transformer.layers.{i}"
        for attn, dim in (("self_attn", pe), ("cross_attn_token_to_image", pe // 2),
                          ("cross_attn_image_to_token", pe // 2)):
            for proj in ("q_proj", "k_proj", "v_proj"):
                add(f"{p}.{attn}.{proj}.weight", dim, pe)
                add(f"{p}.{attn}.{proj}.bias", dim)
            add(f"{p}.{attn}.out_proj.weight", pe, dim)
            add(f"{p}.{attn}.out_proj.bias", pe)
        for n in range(1, 5):
            add(f"{p}.norm{n}.weight", pe)
            add(f"{p}.norm{n}.bias", pe)
        add(f"{p}.mlp.lin1.weight", 8 * pe, pe)
        add(f"{p}.mlp.lin1.bias", 8 * pe)
        add(f"{p}.mlp.lin2.weight", pe, 8 * pe)
        add(f"{p}.mlp.lin2.bias", pe)
    for proj, dim in (("q_proj", pe // 2), ("k_proj", pe // 2), ("v_proj", pe // 2)):
        add(f"mask_decoder.transformer.final_attn_token_to_image.{proj}.weight",
            dim, pe)
        add(f"mask_decoder.transformer.final_attn_token_to_image.{proj}.bias", dim)
    add("mask_decoder.transformer.final_attn_token_to_image.out_proj.weight",
        pe, pe // 2)
    add("mask_decoder.transformer.final_attn_token_to_image.out_proj.bias", pe)
    add("mask_decoder.transformer.norm_final_attn.weight", pe)
    add("mask_decoder.transformer.norm_final_attn.bias", pe)
    add("mask_decoder.output_upscaling.0.weight", pe, pe // 4, 2, 2)
    add("mask_decoder.output_upscaling.0.bias", pe // 4)
    add("mask_decoder.output_upscaling.1.weight", pe // 4)
    add("mask_decoder.output_upscaling.1.bias", pe // 4)
    add("mask_decoder.output_upscaling.3.weight", pe // 4, pe // 8, 2, 2)
    add("mask_decoder.output_upscaling.3.bias", pe // 8)
    for i in range(4):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}"
        add(f"{p}.layers.0.weight", pe, pe)
        add(f"{p}.layers.0.bias", pe)
        add(f"{p}.layers.1.weight", pe, pe)
        add(f"{p}.layers.1.bias", pe)
        add(f"{p}.layers.2.weight", pe // 8, pe)
        add(f"{p}.layers.2.bias", pe // 8)
    add("mask_decoder.iou_prediction_head.layers.0.weight", pe, pe)
    add("mask_decoder.iou_prediction_head.layers.0.bias", pe)
    add("mask_decoder.iou_prediction_head.layers.1.weight", pe, pe)
    add("mask_decoder.iou_prediction_head.layers.1.bias", pe)
    add("mask_decoder.iou_prediction_head.layers.2.weight", 4, pe)
    add("mask_decoder.iou_prediction_head.layers.2.bias", 4)
    return d


def test_sam_checkpoint_conversion_full_coverage(rng, tmp_path):
    from inklayer_tpu.models.sam import Sam

    sd = _tiny_sam_torch_state_dict(rng)
    path = str(tmp_path / "sam_tiny.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

    model = Sam(TINY_SAM)
    args = (jnp.zeros((1, TINY_SAM.image_size, TINY_SAM.image_size, 3)),
            jnp.zeros((2, 4)))
    params = W.load_sam_params(path, TINY_SAM, model, args)
    # loaded values actually land in the tree
    got = np.asarray(
        params["params"]["image_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"])
    want = sd["image_encoder.blocks.0.attn.qkv.weight"].T
    np.testing.assert_allclose(got, want, atol=1e-7)
    # model runs with converted weights
    logits, iou = model.apply(params, *args)
    assert np.isfinite(np.asarray(logits)).all()


def test_unmatched_keys_raise(rng, tmp_path):
    sd = {"totally.unknown.key": np.zeros((3, 3), np.float32)}
    with pytest.raises(KeyError):
        W.convert_state_dict(sd, W.SAM_RULES, strict=True)


def _tiny_depth_torch_state_dict(rng):
    from tests.test_depth import TINY as C

    d = {}

    def add(key, *shape):
        d[key] = rng.standard_normal(shape).astype(np.float32) * 0.02

    e = C.embed_dim
    add("pretrained.cls_token", 1, 1, e)
    g = C.input_size // C.patch_size
    add("pretrained.pos_embed", 1, 1 + g * g, e)
    add("pretrained.patch_embed.proj.weight", e, 3, C.patch_size, C.patch_size)
    add("pretrained.patch_embed.proj.bias", e)
    add("pretrained.mask_token", 1, e)  # ignored
    for i in range(C.depth):
        p = f"pretrained.blocks.{i}"
        for n in (1, 2):
            add(f"{p}.norm{n}.weight", e)
            add(f"{p}.norm{n}.bias", e)
        add(f"{p}.attn.qkv.weight", 3 * e, e)
        add(f"{p}.attn.qkv.bias", 3 * e)
        add(f"{p}.attn.proj.weight", e, e)
        add(f"{p}.attn.proj.bias", e)
        add(f"{p}.ls1.gamma", e)
        add(f"{p}.ls2.gamma", e)
        add(f"{p}.mlp.fc1.weight", 4 * e, e)
        add(f"{p}.mlp.fc1.bias", 4 * e)
        add(f"{p}.mlp.fc2.weight", e, 4 * e)
        add(f"{p}.mlp.fc2.bias", e)
    add("pretrained.norm.weight", e)
    add("pretrained.norm.bias", e)
    oc = C.out_channels
    f = C.features
    for i in range(4):
        add(f"depth_head.projects.{i}.weight", oc[i], e, 1, 1)
        add(f"depth_head.projects.{i}.bias", oc[i])
    add("depth_head.resize_layers.0.weight", oc[0], oc[0], 4, 4)
    add("depth_head.resize_layers.0.bias", oc[0])
    add("depth_head.resize_layers.1.weight", oc[1], oc[1], 2, 2)
    add("depth_head.resize_layers.1.bias", oc[1])
    add("depth_head.resize_layers.3.weight", oc[3], oc[3], 3, 3)
    add("depth_head.resize_layers.3.bias", oc[3])
    for i in range(4):
        add(f"depth_head.scratch.layer{i + 1}_rn.weight", f, oc[i], 3, 3)
    for i in range(1, 5):
        p = f"depth_head.scratch.refinenet{i}"
        add(f"{p}.out_conv.weight", f, f, 1, 1)
        add(f"{p}.out_conv.bias", f)
        for u in (1, 2):
            for cidx in (1, 2):
                add(f"{p}.resConfUnit{u}.conv{cidx}.weight", f, f, 3, 3)
                add(f"{p}.resConfUnit{u}.conv{cidx}.bias", f)
    add("depth_head.scratch.output_conv1.weight", f // 2, f, 3, 3)
    add("depth_head.scratch.output_conv1.bias", f // 2)
    add("depth_head.scratch.output_conv2.0.weight", 32, f // 2, 3, 3)
    add("depth_head.scratch.output_conv2.0.bias", 32)
    add("depth_head.scratch.output_conv2.2.weight", 1, 32, 1, 1)
    add("depth_head.scratch.output_conv2.2.bias", 1)
    return d


@pytest.mark.slow
def test_depth_checkpoint_conversion_full_coverage(rng, tmp_path):
    from inklayer_tpu.models.depth import DepthAnythingV2
    from tests.test_depth import TINY as C

    sd = _tiny_depth_torch_state_dict(rng)
    path = str(tmp_path / "depth_tiny.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    model = DepthAnythingV2(C)
    args = (jnp.zeros((1, C.input_size, C.input_size, 3)),)
    params = W.load_depth_params(path, C, model, args)
    got = np.asarray(params["params"]["pretrained"]["blocks_0"]["ls1_gamma"])
    np.testing.assert_allclose(got, sd["pretrained.blocks.0.ls1.gamma"])
    depth = model.apply(params, *args)
    assert np.isfinite(np.asarray(depth)).all()
