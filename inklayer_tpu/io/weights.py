"""PyTorch checkpoint -> JAX pytree converters.

The reference is load-only (SURVEY.md §5): torch.load + clean_state_dict
(GroundingDINO util/inference.py:33-35), strict SAM load
(build_sam.py:103-106), depth map_location="cpu" (depth_sort.py:37-38).
Here: a generic rule-based mapping engine translates the public checkpoints
(sam_vit_h_4b8939.pth, inklayer_gdino.pth, depth_anything_v2_vitb.pth) into
this framework's flax parameter trees, with dtype/layout transforms:

  torch Linear  (out, in)        -> Dense kernel (in, out)
  torch Conv2d  (out, in, kh, kw)-> Conv kernel (kh, kw, in, out)
  torch ConvT2d (in, out, kh, kw)-> ConvTranspose kernel (kh, kw, in, out)
  torch LN/Embedding weight      -> scale / embedding

Conversion happens host-side in numpy; the resulting tree is device_put once.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _t_convT(w: np.ndarray) -> np.ndarray:
    # torch (in, out, kh, kw) -> flax ConvTranspose (kh, kw, in, out) with
    # spatial flip (flax transpose_kernel=False convolves the kernel as-is)
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def _identity(w: np.ndarray) -> np.ndarray:
    return w


TRANSFORMS = {
    "linear": _t_linear,
    "conv": _t_conv,
    "convT": _t_convT,
    "id": _identity,
}


def clean_state_dict(state_dict: dict) -> dict:
    """Strip 'module.'/'model.' prefixes (GroundingDINO util clean_state_dict)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("model."):
            k = k[len("model."):]
        out[k] = v
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        obj = load_file(path)
    else:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model", "state_dict", "module"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    sd = clean_state_dict(obj)
    return {k: np.asarray(v.detach().float().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in sd.items()}


class Rule:
    """Regex rule: torch key pattern -> (flax path template, transform).
    Templates use backrefs \\1 etc.; path segments separated by '/'."""

    def __init__(self, pattern: str, path: str, transform: str = "id"):
        self.pattern = pattern
        self.re = re.compile(pattern + r"\Z")
        self.path = path
        self.transform_name = transform
        self.transform = TRANSFORMS[transform]

    def apply(self, key: str) -> Optional[Tuple[str, Callable]]:
        m = self.re.match(key)
        if m is None:
            return None
        return m.expand(self.path), self.transform


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    rules: Sequence[Rule],
    strict: bool = True,
    ignore: Sequence[str] = (),
) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Returns ({flax 'a/b/c' path: array}, unmatched_keys)."""
    out: Dict[str, np.ndarray] = {}
    unmatched: List[str] = []
    ignore_res = [re.compile(p + r"\Z") for p in ignore]
    for key, val in sd.items():
        if any(r.match(key) for r in ignore_res):
            continue
        for rule in rules:
            hit = rule.apply(key)
            if hit is not None:
                path, transform = hit
                out[path] = transform(val)
                break
        else:
            unmatched.append(key)
    if strict and unmatched:
        raise KeyError(f"unconverted checkpoint keys: {unmatched[:20]}"
                       f"{'...' if len(unmatched) > 20 else ''}")
    return out, unmatched


def tree_from_paths(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, val in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def fill_params(template, converted: dict, strict: bool = True):
    """Overlay converted arrays onto a flax params template (shape-checked).

    Returns a new tree with the same structure as `template`."""
    import jax

    flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    out_leaves = []
    missing = []
    for path, leaf in flat_t:
        keys = [str(getattr(p, "key", p)) for p in path]
        node = converted
        ok = True
        for k in keys:
            if isinstance(node, dict) and k in node:
                node = node[k]
            else:
                ok = False
                break
        if ok and not isinstance(node, dict):
            if tuple(node.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(keys)}: ckpt {node.shape} "
                    f"vs model {leaf.shape}")
            out_leaves.append(np.asarray(node, dtype=np.float32))
        else:
            missing.append("/".join(keys))
            out_leaves.append(leaf)
    if strict and missing:
        raise KeyError(f"params missing from checkpoint: {missing[:20]}"
                       f"{'...' if len(missing) > 20 else ''}")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), out_leaves)


# ---------------------------------------------------------------------------
# SAM rules (official sam_vit_h checkpoint key layout)
# ---------------------------------------------------------------------------

SAM_RULES = [
    Rule(r"image_encoder\.patch_embed\.proj\.weight",
         r"image_encoder/patch_embed/proj/kernel", "conv"),
    Rule(r"image_encoder\.patch_embed\.proj\.bias",
         r"image_encoder/patch_embed/proj/bias"),
    Rule(r"image_encoder\.pos_embed", r"image_encoder/pos_embed"),
    Rule(r"image_encoder\.blocks\.(\d+)\.norm([12])\.weight",
         r"image_encoder/blocks_\1/norm\2/scale"),
    Rule(r"image_encoder\.blocks\.(\d+)\.norm([12])\.bias",
         r"image_encoder/blocks_\1/norm\2/bias"),
    Rule(r"image_encoder\.blocks\.(\d+)\.attn\.qkv\.weight",
         r"image_encoder/blocks_\1/attn/qkv/kernel", "linear"),
    Rule(r"image_encoder\.blocks\.(\d+)\.attn\.qkv\.bias",
         r"image_encoder/blocks_\1/attn/qkv/bias"),
    Rule(r"image_encoder\.blocks\.(\d+)\.attn\.proj\.weight",
         r"image_encoder/blocks_\1/attn/proj/kernel", "linear"),
    Rule(r"image_encoder\.blocks\.(\d+)\.attn\.proj\.bias",
         r"image_encoder/blocks_\1/attn/proj/bias"),
    Rule(r"image_encoder\.blocks\.(\d+)\.attn\.rel_pos_([hw])",
         r"image_encoder/blocks_\1/attn/rel_pos_\2"),
    Rule(r"image_encoder\.blocks\.(\d+)\.mlp\.lin([12])\.weight",
         r"image_encoder/blocks_\1/mlp/fc\2/kernel", "linear"),
    Rule(r"image_encoder\.blocks\.(\d+)\.mlp\.lin([12])\.bias",
         r"image_encoder/blocks_\1/mlp/fc\2/bias"),
    Rule(r"image_encoder\.neck\.0\.weight", r"image_encoder/neck_conv1/kernel", "conv"),
    Rule(r"image_encoder\.neck\.1\.weight", r"image_encoder/neck_ln1/scale"),
    Rule(r"image_encoder\.neck\.1\.bias", r"image_encoder/neck_ln1/bias"),
    Rule(r"image_encoder\.neck\.2\.weight", r"image_encoder/neck_conv2/kernel", "conv"),
    Rule(r"image_encoder\.neck\.3\.weight", r"image_encoder/neck_ln2/scale"),
    Rule(r"image_encoder\.neck\.3\.bias", r"image_encoder/neck_ln2/bias"),
    # prompt encoder
    Rule(r"prompt_encoder\.pe_layer\.positional_encoding_gaussian_matrix",
         r"prompt_encoder/pe_layer/positional_encoding_gaussian_matrix"),
    Rule(r"prompt_encoder\.point_embeddings\.(\d)\.weight",
         r"prompt_encoder/point_embed_\1"),
    Rule(r"prompt_encoder\.not_a_point_embed\.weight",
         r"prompt_encoder/not_a_point_embed"),
    Rule(r"prompt_encoder\.no_mask_embed\.weight",
         r"prompt_encoder/no_mask_embed"),
    Rule(r"prompt_encoder\.mask_downscaling\.0\.weight",
         r"prompt_encoder/mask_conv1/kernel", "conv"),
    Rule(r"prompt_encoder\.mask_downscaling\.0\.bias",
         r"prompt_encoder/mask_conv1/bias"),
    Rule(r"prompt_encoder\.mask_downscaling\.1\.weight",
         r"prompt_encoder/mask_ln1/scale"),
    Rule(r"prompt_encoder\.mask_downscaling\.1\.bias",
         r"prompt_encoder/mask_ln1/bias"),
    Rule(r"prompt_encoder\.mask_downscaling\.3\.weight",
         r"prompt_encoder/mask_conv2/kernel", "conv"),
    Rule(r"prompt_encoder\.mask_downscaling\.3\.bias",
         r"prompt_encoder/mask_conv2/bias"),
    Rule(r"prompt_encoder\.mask_downscaling\.4\.weight",
         r"prompt_encoder/mask_ln2/scale"),
    Rule(r"prompt_encoder\.mask_downscaling\.4\.bias",
         r"prompt_encoder/mask_ln2/bias"),
    Rule(r"prompt_encoder\.mask_downscaling\.6\.weight",
         r"prompt_encoder/mask_conv3/kernel", "conv"),
    Rule(r"prompt_encoder\.mask_downscaling\.6\.bias",
         r"prompt_encoder/mask_conv3/bias"),
    # mask decoder transformer
    Rule(r"mask_decoder\.transformer\.layers\.(\d)\.(self_attn|cross_attn_token_to_image|cross_attn_image_to_token)\.([qkv]_proj|out_proj)\.weight",
         r"mask_decoder/transformer/layers_\1/\2/\3/kernel", "linear"),
    Rule(r"mask_decoder\.transformer\.layers\.(\d)\.(self_attn|cross_attn_token_to_image|cross_attn_image_to_token)\.([qkv]_proj|out_proj)\.bias",
         r"mask_decoder/transformer/layers_\1/\2/\3/bias"),
    Rule(r"mask_decoder\.transformer\.layers\.(\d)\.norm(\d)\.weight",
         r"mask_decoder/transformer/layers_\1/norm\2/scale"),
    Rule(r"mask_decoder\.transformer\.layers\.(\d)\.norm(\d)\.bias",
         r"mask_decoder/transformer/layers_\1/norm\2/bias"),
    Rule(r"mask_decoder\.transformer\.layers\.(\d)\.mlp\.lin([12])\.weight",
         r"mask_decoder/transformer/layers_\1/mlp/layer\g<2>0/kernel", "linear"),
    Rule(r"mask_decoder\.transformer\.layers\.(\d)\.mlp\.lin([12])\.bias",
         r"mask_decoder/transformer/layers_\1/mlp/layer\g<2>0/bias"),
    Rule(r"mask_decoder\.transformer\.final_attn_token_to_image\.([qkv]_proj|out_proj)\.weight",
         r"mask_decoder/transformer/final_attn_token_to_image/\1/kernel", "linear"),
    Rule(r"mask_decoder\.transformer\.final_attn_token_to_image\.([qkv]_proj|out_proj)\.bias",
         r"mask_decoder/transformer/final_attn_token_to_image/\1/bias"),
    Rule(r"mask_decoder\.transformer\.norm_final_attn\.weight",
         r"mask_decoder/transformer/norm_final_attn/scale"),
    Rule(r"mask_decoder\.transformer\.norm_final_attn\.bias",
         r"mask_decoder/transformer/norm_final_attn/bias"),
    # mask decoder heads
    Rule(r"mask_decoder\.iou_token\.weight", r"mask_decoder/iou_token"),
    Rule(r"mask_decoder\.mask_tokens\.weight", r"mask_decoder/mask_tokens"),
    Rule(r"mask_decoder\.output_upscaling\.0\.weight",
         r"mask_decoder/upscale_conv1/kernel", "convT"),
    Rule(r"mask_decoder\.output_upscaling\.0\.bias",
         r"mask_decoder/upscale_conv1/bias"),
    Rule(r"mask_decoder\.output_upscaling\.1\.weight",
         r"mask_decoder/upscale_ln/scale"),
    Rule(r"mask_decoder\.output_upscaling\.1\.bias",
         r"mask_decoder/upscale_ln/bias"),
    Rule(r"mask_decoder\.output_upscaling\.3\.weight",
         r"mask_decoder/upscale_conv2/kernel", "convT"),
    Rule(r"mask_decoder\.output_upscaling\.3\.bias",
         r"mask_decoder/upscale_conv2/bias"),
    Rule(r"mask_decoder\.output_hypernetworks_mlps\.(\d)\.layers\.(\d)\.weight",
         r"mask_decoder/output_hypernetworks_mlps_\1/layer\2/kernel", "linear"),
    Rule(r"mask_decoder\.output_hypernetworks_mlps\.(\d)\.layers\.(\d)\.bias",
         r"mask_decoder/output_hypernetworks_mlps_\1/layer\2/bias"),
    Rule(r"mask_decoder\.iou_prediction_head\.layers\.(\d)\.weight",
         r"mask_decoder/iou_prediction_head/layer\1/kernel", "linear"),
    Rule(r"mask_decoder\.iou_prediction_head\.layers\.(\d)\.bias",
         r"mask_decoder/iou_prediction_head/layer\1/bias"),
]


def _mlp_layer_fixup(path: str) -> str:
    """SAM TwoWayAttentionBlock MLP is lin1/lin2 -> our MLPBlock layer0/layer1."""
    return path


def load_sam_params(path: str, cfg, model, example_args):
    import jax

    sd = load_torch_state_dict(path)
    flat, _ = convert_state_dict(sd, SAM_RULES, strict=True)
    # fix MLPBlock naming: lin1->layer0, lin2->layer1 produced 'layer10/layer20'
    fixed = {}
    for k, v in flat.items():
        k = k.replace("/mlp/layer10/", "/mlp/layer0/")
        k = k.replace("/mlp/layer20/", "/mlp/layer1/")
        fixed[k] = v
    tree = {"params": tree_from_paths(fixed)}
    template = jax.eval_shape(
        lambda k: model.init(k, *example_args), jax.random.key(0))
    return fill_params(template, tree)


# ---------------------------------------------------------------------------
# Depth-Anything-V2 rules
# ---------------------------------------------------------------------------

DEPTH_RULES = [
    Rule(r"pretrained\.cls_token", r"pretrained/cls_token"),
    Rule(r"pretrained\.pos_embed", r"pretrained/pos_embed"),
    Rule(r"pretrained\.patch_embed\.proj\.weight",
         r"pretrained/patch_embed_proj/kernel", "conv"),
    Rule(r"pretrained\.patch_embed\.proj\.bias",
         r"pretrained/patch_embed_proj/bias"),
    Rule(r"pretrained\.blocks\.(\d+)\.norm([12])\.weight",
         r"pretrained/blocks_\1/norm\2/scale"),
    Rule(r"pretrained\.blocks\.(\d+)\.norm([12])\.bias",
         r"pretrained/blocks_\1/norm\2/bias"),
    Rule(r"pretrained\.blocks\.(\d+)\.attn\.qkv\.weight",
         r"pretrained/blocks_\1/attn_qkv/kernel", "linear"),
    Rule(r"pretrained\.blocks\.(\d+)\.attn\.qkv\.bias",
         r"pretrained/blocks_\1/attn_qkv/bias"),
    Rule(r"pretrained\.blocks\.(\d+)\.attn\.proj\.weight",
         r"pretrained/blocks_\1/attn_proj/kernel", "linear"),
    Rule(r"pretrained\.blocks\.(\d+)\.attn\.proj\.bias",
         r"pretrained/blocks_\1/attn_proj/bias"),
    Rule(r"pretrained\.blocks\.(\d+)\.ls([12])\.gamma",
         r"pretrained/blocks_\1/ls\2_gamma"),
    Rule(r"pretrained\.blocks\.(\d+)\.mlp\.fc([12])\.weight",
         r"pretrained/blocks_\1/mlp/fc\2/kernel", "linear"),
    Rule(r"pretrained\.blocks\.(\d+)\.mlp\.fc([12])\.bias",
         r"pretrained/blocks_\1/mlp/fc\2/bias"),
    Rule(r"pretrained\.norm\.weight", r"pretrained/norm/scale"),
    Rule(r"pretrained\.norm\.bias", r"pretrained/norm/bias"),
    # DPT head
    Rule(r"depth_head\.projects\.(\d)\.weight",
         r"depth_head/projects_\1/kernel", "conv"),
    Rule(r"depth_head\.projects\.(\d)\.bias", r"depth_head/projects_\1/bias"),
    Rule(r"depth_head\.resize_layers\.0\.weight",
         r"depth_head/resize_0/kernel", "convT"),
    Rule(r"depth_head\.resize_layers\.0\.bias", r"depth_head/resize_0/bias"),
    Rule(r"depth_head\.resize_layers\.1\.weight",
         r"depth_head/resize_1/kernel", "convT"),
    Rule(r"depth_head\.resize_layers\.1\.bias", r"depth_head/resize_1/bias"),
    Rule(r"depth_head\.resize_layers\.3\.weight",
         r"depth_head/resize_3/kernel", "conv"),
    Rule(r"depth_head\.resize_layers\.3\.bias", r"depth_head/resize_3/bias"),
    Rule(r"depth_head\.scratch\.layer(\d)_rn\.weight",
         r"depth_head/scratch_layer\1_rn/kernel", "conv"),
    Rule(r"depth_head\.scratch\.refinenet(\d)\.out_conv\.weight",
         r"depth_head/refinenet\1/out_conv/kernel", "conv"),
    Rule(r"depth_head\.scratch\.refinenet(\d)\.out_conv\.bias",
         r"depth_head/refinenet\1/out_conv/bias"),
    Rule(r"depth_head\.scratch\.refinenet(\d)\.resConfUnit([12])\.conv([12])\.weight",
         r"depth_head/refinenet\1/resConfUnit\2/conv\3/kernel", "conv"),
    Rule(r"depth_head\.scratch\.refinenet(\d)\.resConfUnit([12])\.conv([12])\.bias",
         r"depth_head/refinenet\1/resConfUnit\2/conv\3/bias"),
    Rule(r"depth_head\.scratch\.output_conv1\.weight",
         r"depth_head/output_conv1/kernel", "conv"),
    Rule(r"depth_head\.scratch\.output_conv1\.bias",
         r"depth_head/output_conv1/bias"),
    Rule(r"depth_head\.scratch\.output_conv2\.0\.weight",
         r"depth_head/output_conv2_0/kernel", "conv"),
    Rule(r"depth_head\.scratch\.output_conv2\.0\.bias",
         r"depth_head/output_conv2_0/bias"),
    Rule(r"depth_head\.scratch\.output_conv2\.2\.weight",
         r"depth_head/output_conv2_2/kernel", "conv"),
    Rule(r"depth_head\.scratch\.output_conv2\.2\.bias",
         r"depth_head/output_conv2_2/bias"),
]


def load_depth_params(path: str, cfg, model, example_args):
    import jax

    sd = load_torch_state_dict(path)
    flat, _ = convert_state_dict(
        sd, DEPTH_RULES, strict=True,
        ignore=[r"pretrained\.mask_token", r"pretrained\.register_tokens"])
    tree = {"params": tree_from_paths(flat)}
    template = jax.eval_shape(
        lambda k: model.init(k, *example_args), jax.random.key(0))
    return fill_params(template, tree)


# ---------------------------------------------------------------------------
# GroundingDINO rules (largest map; see gdino model modules for naming)
# ---------------------------------------------------------------------------


def _swin_block_path(stage: str, blk: str) -> str:
    return f"backbone/layers_{stage}_blocks_{blk}"


GDINO_RULES = [
    # BERT
    Rule(r"bert\.embeddings\.word_embeddings\.weight",
         r"bert/word_embeddings/embedding"),
    Rule(r"bert\.embeddings\.position_embeddings\.weight",
         r"bert/position_embeddings/embedding"),
    Rule(r"bert\.embeddings\.token_type_embeddings\.weight",
         r"bert/token_type_embeddings/embedding"),
    Rule(r"bert\.embeddings\.LayerNorm\.weight", r"bert/embeddings_norm/scale"),
    Rule(r"bert\.embeddings\.LayerNorm\.bias", r"bert/embeddings_norm/bias"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.attention\.self\.(query|key|value)\.weight",
         r"bert/layer_\1/attention_self/\2/kernel", "linear"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.attention\.self\.(query|key|value)\.bias",
         r"bert/layer_\1/attention_self/\2/bias"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.attention\.output\.dense\.weight",
         r"bert/layer_\1/attention_output_dense/kernel", "linear"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.attention\.output\.dense\.bias",
         r"bert/layer_\1/attention_output_dense/bias"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.attention\.output\.LayerNorm\.weight",
         r"bert/layer_\1/attention_output_norm/scale"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.attention\.output\.LayerNorm\.bias",
         r"bert/layer_\1/attention_output_norm/bias"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.intermediate\.dense\.weight",
         r"bert/layer_\1/intermediate_dense/kernel", "linear"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.intermediate\.dense\.bias",
         r"bert/layer_\1/intermediate_dense/bias"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.output\.dense\.weight",
         r"bert/layer_\1/output_dense/kernel", "linear"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.output\.dense\.bias",
         r"bert/layer_\1/output_dense/bias"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.output\.LayerNorm\.weight",
         r"bert/layer_\1/output_norm/scale"),
    Rule(r"bert\.encoder\.layer\.(\d+)\.output\.LayerNorm\.bias",
         r"bert/layer_\1/output_norm/bias"),
    # feat map 768 -> 256
    Rule(r"feat_map\.weight", r"feat_map/kernel", "linear"),
    Rule(r"feat_map\.bias", r"feat_map/bias"),
    # Swin backbone (backbone.0.* in gdino checkpoints)
    Rule(r"backbone\.0\.patch_embed\.proj\.weight",
         r"backbone/patch_embed_proj/kernel", "conv"),
    Rule(r"backbone\.0\.patch_embed\.proj\.bias",
         r"backbone/patch_embed_proj/bias"),
    Rule(r"backbone\.0\.patch_embed\.norm\.weight",
         r"backbone/patch_embed_norm/scale"),
    Rule(r"backbone\.0\.patch_embed\.norm\.bias",
         r"backbone/patch_embed_norm/bias"),
    Rule(r"backbone\.0\.layers\.(\d)\.blocks\.(\d+)\.norm([12])\.weight",
         r"backbone/layers_\1_blocks_\2/norm\3/scale"),
    Rule(r"backbone\.0\.layers\.(\d)\.blocks\.(\d+)\.norm([12])\.bias",
         r"backbone/layers_\1_blocks_\2/norm\3/bias"),
    Rule(r"backbone\.0\.layers\.(\d)\.blocks\.(\d+)\.attn\.relative_position_bias_table",
         r"backbone/layers_\1_blocks_\2/attn/relative_position_bias_table"),
    Rule(r"backbone\.0\.layers\.(\d)\.blocks\.(\d+)\.attn\.qkv\.weight",
         r"backbone/layers_\1_blocks_\2/attn/qkv/kernel", "linear"),
    Rule(r"backbone\.0\.layers\.(\d)\.blocks\.(\d+)\.attn\.qkv\.bias",
         r"backbone/layers_\1_blocks_\2/attn/qkv/bias"),
    Rule(r"backbone\.0\.layers\.(\d)\.blocks\.(\d+)\.attn\.proj\.weight",
         r"backbone/layers_\1_blocks_\2/attn/proj/kernel", "linear"),
    Rule(r"backbone\.0\.layers\.(\d)\.blocks\.(\d+)\.attn\.proj\.bias",
         r"backbone/layers_\1_blocks_\2/attn/proj/bias"),
    Rule(r"backbone\.0\.layers\.(\d)\.blocks\.(\d+)\.mlp\.fc([12])\.weight",
         r"backbone/layers_\1_blocks_\2/mlp/fc\3/kernel", "linear"),
    Rule(r"backbone\.0\.layers\.(\d)\.blocks\.(\d+)\.mlp\.fc([12])\.bias",
         r"backbone/layers_\1_blocks_\2/mlp/fc\3/bias"),
    Rule(r"backbone\.0\.layers\.(\d)\.downsample\.norm\.weight",
         r"backbone/layers_\1_downsample/norm/scale"),
    Rule(r"backbone\.0\.layers\.(\d)\.downsample\.norm\.bias",
         r"backbone/layers_\1_downsample/norm/bias"),
    Rule(r"backbone\.0\.layers\.(\d)\.downsample\.reduction\.weight",
         r"backbone/layers_\1_downsample/reduction/kernel", "linear"),
    Rule(r"backbone\.0\.norm([123])\.weight", r"backbone/out_norm_\1/scale"),
    Rule(r"backbone\.0\.norm([123])\.bias", r"backbone/out_norm_\1/bias"),
    # input projections
    Rule(r"input_proj\.(\d)\.0\.weight", r"input_proj_\1_conv/kernel", "conv"),
    Rule(r"input_proj\.(\d)\.0\.bias", r"input_proj_\1_conv/bias"),
    Rule(r"input_proj\.(\d)\.1\.weight", r"input_proj_\1_norm/scale"),
    Rule(r"input_proj\.(\d)\.1\.bias", r"input_proj_\1_norm/bias"),
    # transformer level embed + enc output
    Rule(r"transformer\.level_embed", r"transformer/level_embed"),
    Rule(r"transformer\.enc_output\.weight", r"transformer/enc_output/kernel",
         "linear"),
    Rule(r"transformer\.enc_output\.bias", r"transformer/enc_output/bias"),
    Rule(r"transformer\.enc_output_norm\.weight",
         r"transformer/enc_output_norm/scale"),
    Rule(r"transformer\.enc_output_norm\.bias",
         r"transformer/enc_output_norm/bias"),
    Rule(r"transformer\.tgt_embed\.weight", r"transformer/tgt_embed"),
    Rule(r"transformer\.enc_out_bbox_embed\.layers\.(\d)\.weight",
         r"transformer/enc_out_bbox_embed/layer\1/kernel", "linear"),
    Rule(r"transformer\.enc_out_bbox_embed\.layers\.(\d)\.bias",
         r"transformer/enc_out_bbox_embed/layer\1/bias"),
    # encoder fusion layers
    Rule(r"transformer\.encoder\.fusion_layers\.(\d)\.layer_norm_([vl])\.weight",
         r"transformer/enc_fusion_\1/layer_norm_\2/scale"),
    Rule(r"transformer\.encoder\.fusion_layers\.(\d)\.layer_norm_([vl])\.bias",
         r"transformer/enc_fusion_\1/layer_norm_\2/bias"),
    Rule(r"transformer\.encoder\.fusion_layers\.(\d)\.attn\.([vl]_proj|values_[vl]_proj|out_[vl]_proj)\.weight",
         r"transformer/enc_fusion_\1/attn/\2/kernel", "linear"),
    Rule(r"transformer\.encoder\.fusion_layers\.(\d)\.attn\.([vl]_proj|values_[vl]_proj|out_[vl]_proj)\.bias",
         r"transformer/enc_fusion_\1/attn/\2/bias"),
    Rule(r"transformer\.encoder\.fusion_layers\.(\d)\.gamma_([vl])",
         r"transformer/enc_fusion_\1/gamma_\2"),
    # encoder text layers
    Rule(r"transformer\.encoder\.text_layers\.(\d)\.self_attn\.in_proj_(weight|bias)",
         r"__special_text_in_proj_\1_\2"),
    Rule(r"transformer\.encoder\.text_layers\.(\d)\.self_attn\.out_proj\.weight",
         r"transformer/enc_text_\1/out_proj/kernel", "linear"),
    Rule(r"transformer\.encoder\.text_layers\.(\d)\.self_attn\.out_proj\.bias",
         r"transformer/enc_text_\1/out_proj/bias"),
    Rule(r"transformer\.encoder\.text_layers\.(\d)\.linear([12])\.weight",
         r"transformer/enc_text_\1/linear\2/kernel", "linear"),
    Rule(r"transformer\.encoder\.text_layers\.(\d)\.linear([12])\.bias",
         r"transformer/enc_text_\1/linear\2/bias"),
    Rule(r"transformer\.encoder\.text_layers\.(\d)\.norm([12])\.weight",
         r"transformer/enc_text_\1/norm\2/scale"),
    Rule(r"transformer\.encoder\.text_layers\.(\d)\.norm([12])\.bias",
         r"transformer/enc_text_\1/norm\2/bias"),
    # encoder deformable layers
    Rule(r"transformer\.encoder\.layers\.(\d)\.self_attn\.(sampling_offsets|attention_weights|value_proj|output_proj)\.weight",
         r"transformer/enc_layer_\1/self_attn/\2/kernel", "linear"),
    Rule(r"transformer\.encoder\.layers\.(\d)\.self_attn\.(sampling_offsets|attention_weights|value_proj|output_proj)\.bias",
         r"transformer/enc_layer_\1/self_attn/\2/bias"),
    Rule(r"transformer\.encoder\.layers\.(\d)\.linear([12])\.weight",
         r"transformer/enc_layer_\1/linear\2/kernel", "linear"),
    Rule(r"transformer\.encoder\.layers\.(\d)\.linear([12])\.bias",
         r"transformer/enc_layer_\1/linear\2/bias"),
    Rule(r"transformer\.encoder\.layers\.(\d)\.norm([12])\.weight",
         r"transformer/enc_layer_\1/norm\2/scale"),
    Rule(r"transformer\.encoder\.layers\.(\d)\.norm([12])\.bias",
         r"transformer/enc_layer_\1/norm\2/bias"),
    # decoder layers: self attn (in_proj special), text ca, deform ca, ffn
    Rule(r"transformer\.decoder\.layers\.(\d)\.self_attn\.in_proj_(weight|bias)",
         r"__special_dec_sa_in_proj_\1_\2"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.self_attn\.out_proj\.weight",
         r"transformer/dec_layer_\1/sa_out/kernel", "linear"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.self_attn\.out_proj\.bias",
         r"transformer/dec_layer_\1/sa_out/bias"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.ca_text\.in_proj_(weight|bias)",
         r"__special_dec_ca_in_proj_\1_\2"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.ca_text\.out_proj\.weight",
         r"transformer/dec_layer_\1/ca_text_out/kernel", "linear"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.ca_text\.out_proj\.bias",
         r"transformer/dec_layer_\1/ca_text_out/bias"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.catext_norm\.weight",
         r"transformer/dec_layer_\1/catext_norm/scale"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.catext_norm\.bias",
         r"transformer/dec_layer_\1/catext_norm/bias"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.cross_attn\.(sampling_offsets|attention_weights|value_proj|output_proj)\.weight",
         r"transformer/dec_layer_\1/cross_attn/\2/kernel", "linear"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.cross_attn\.(sampling_offsets|attention_weights|value_proj|output_proj)\.bias",
         r"transformer/dec_layer_\1/cross_attn/\2/bias"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.linear([12])\.weight",
         r"transformer/dec_layer_\1/linear\2/kernel", "linear"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.linear([12])\.bias",
         r"transformer/dec_layer_\1/linear\2/bias"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.norm([123])\.weight",
         r"transformer/dec_layer_\1/norm\2/scale"),
    Rule(r"transformer\.decoder\.layers\.(\d)\.norm([123])\.bias",
         r"transformer/dec_layer_\1/norm\2/bias"),
    Rule(r"transformer\.decoder\.norm\.weight", r"transformer/dec_norm/scale"),
    Rule(r"transformer\.decoder\.norm\.bias", r"transformer/dec_norm/bias"),
    Rule(r"transformer\.decoder\.ref_point_head\.layers\.(\d)\.weight",
         r"transformer/ref_point_head/layer\1/kernel", "linear"),
    Rule(r"transformer\.decoder\.ref_point_head\.layers\.(\d)\.bias",
         r"transformer/ref_point_head/layer\1/bias"),
    # shared bbox embed (bbox_embed.0 == decoder.bbox_embed[i], shared)
    Rule(r"bbox_embed\.0\.layers\.(\d)\.weight",
         r"transformer/bbox_embed/layer\1/kernel", "linear"),
    Rule(r"bbox_embed\.0\.layers\.(\d)\.bias",
         r"transformer/bbox_embed/layer\1/bias"),
]

GDINO_IGNORE = [
    r"bert\.pooler\..*",
    # recomputed-constant buffers in the Swin checkpoint
    r"backbone\.0\..*relative_position_index",
    r"backbone\.0\..*attn_mask",
    r"bert\.embeddings\.position_ids",
    r"bbox_embed\.[1-9]\..*",  # shared copies of bbox_embed.0
    r"transformer\.decoder\.bbox_embed\..*",  # same shared object
    r"label_enc\..*",  # denoising-training embedding, unused at inference
]


def _split_in_proj(flat: Dict[str, np.ndarray], n_layers: int):
    """nn.MultiheadAttention packed in_proj -> separate q/k/v Dense params."""
    out = dict(flat)
    for i in range(n_layers):
        for tag, base in (("dec_sa", "sa"), ("dec_ca", "ca_text")):
            wkey = f"__special_{tag}_in_proj_{i}_weight"
            bkey = f"__special_{tag}_in_proj_{i}_bias"
            if wkey not in out:
                continue
            w = out.pop(wkey)
            b = out.pop(bkey)
            d = w.shape[0] // 3
            names = ("q", "k", "v")
            for j, nm in enumerate(names):
                out[f"transformer/dec_layer_{i}/{base}_{nm}/kernel"] = \
                    _t_linear(w[j * d:(j + 1) * d])
                out[f"transformer/dec_layer_{i}/{base}_{nm}/bias"] = \
                    b[j * d:(j + 1) * d]
    # text enhancer layers
    for i in range(64):
        wkey = f"__special_text_in_proj_{i}_weight"
        bkey = f"__special_text_in_proj_{i}_bias"
        if wkey not in out:
            continue
        w = out.pop(wkey)
        b = out.pop(bkey)
        d = w.shape[0] // 3
        for j, nm in enumerate(("q", "k", "v")):
            out[f"transformer/enc_text_{i}/{nm}_proj/kernel"] = \
                _t_linear(w[j * d:(j + 1) * d])
            out[f"transformer/enc_text_{i}/{nm}_proj/bias"] = b[j * d:(j + 1) * d]
    return out


def load_gdino_params(path: str, cfg, model, example_args):
    import jax

    sd = load_torch_state_dict(path)
    flat, _ = convert_state_dict(sd, GDINO_RULES, strict=True,
                                 ignore=GDINO_IGNORE)
    flat = _split_in_proj(flat, cfg.dec_layers)
    tree = {"params": tree_from_paths(flat)}
    template = jax.eval_shape(
        lambda k: model.init(k, *example_args), jax.random.key(0))
    return fill_params(template, tree)


# ---------------------------------------------------------------------------
# Diffusion checkpoints (diffusers layout: runwayml/stable-diffusion-
# inpainting unet+vae+text_encoder, lllyasviel/control_v11p_sd15_inpaint)
# ---------------------------------------------------------------------------

_RES = [
    # shared resnet sub-module mapping fragments (diffusers name == ours)
    ("norm1", "norm1", "id"), ("conv1", "conv1", "conv"),
    ("time_emb_proj", "time_emb_proj", "linear"),
    ("norm2", "norm2", "id"), ("conv2", "conv2", "conv"),
    ("conv_shortcut", "conv_shortcut", "conv"),
]


def _resnet_rules(prefix_t: str, prefix_f: str):
    rules = []
    for tname, fname, kind in _RES:
        wkind = "id" if kind == "id" else kind
        rules.append(Rule(rf"{prefix_t}\.{tname}\.weight",
                          rf"{prefix_f}/{fname}/" +
                          ("scale" if kind == "id" else "kernel"), wkind))
        rules.append(Rule(rf"{prefix_t}\.{tname}\.bias",
                          rf"{prefix_f}/{fname}/bias"))
    return rules


def _tx_rules(prefix_t: str, prefix_f: str):
    """Transformer2DModel with one BasicTransformerBlock."""
    tb = rf"{prefix_t}\.transformer_blocks\.0"
    rules = [
        Rule(rf"{prefix_t}\.norm\.weight", rf"{prefix_f}/norm/scale"),
        Rule(rf"{prefix_t}\.norm\.bias", rf"{prefix_f}/norm/bias"),
        Rule(rf"{prefix_t}\.proj_in\.weight", rf"{prefix_f}/proj_in/kernel", "conv"),
        Rule(rf"{prefix_t}\.proj_in\.bias", rf"{prefix_f}/proj_in/bias"),
        Rule(rf"{prefix_t}\.proj_out\.weight", rf"{prefix_f}/proj_out/kernel", "conv"),
        Rule(rf"{prefix_t}\.proj_out\.bias", rf"{prefix_f}/proj_out/bias"),
        Rule(rf"{tb}\.ff\.net\.0\.proj\.weight", rf"{prefix_f}/ff/proj_in/kernel",
             "linear"),
        Rule(rf"{tb}\.ff\.net\.0\.proj\.bias", rf"{prefix_f}/ff/proj_in/bias"),
        Rule(rf"{tb}\.ff\.net\.2\.weight", rf"{prefix_f}/ff/proj_out/kernel",
             "linear"),
        Rule(rf"{tb}\.ff\.net\.2\.bias", rf"{prefix_f}/ff/proj_out/bias"),
    ]
    for a in ("attn1", "attn2"):
        for p in ("to_q", "to_k", "to_v"):
            rules.append(Rule(rf"{tb}\.{a}\.{p}\.weight",
                              rf"{prefix_f}/{a}/{p}/kernel", "linear"))
        rules.append(Rule(rf"{tb}\.{a}\.to_out\.0\.weight",
                          rf"{prefix_f}/{a}/to_out/kernel", "linear"))
        rules.append(Rule(rf"{tb}\.{a}\.to_out\.0\.bias",
                          rf"{prefix_f}/{a}/to_out/bias"))
    for n in ("norm1", "norm2", "norm3"):
        rules.append(Rule(rf"{tb}\.{n}\.weight", rf"{prefix_f}/{n}/scale"))
        rules.append(Rule(rf"{tb}\.{n}\.bias", rf"{prefix_f}/{n}/bias"))
    return rules


def _tx_rules_deep(prefix_t: str, prefix_f: str):
    """Transformer2DModel with SEVERAL BasicTransformerBlocks and LINEAR
    proj_in/proj_out (SDXL, use_linear_projection=True).  Our flax module
    names the inner blocks ``block_{d}`` (unet.py TransformerBlock2D)."""
    tb = rf"{prefix_t}\.transformer_blocks\.(\d+)"
    bf = rf"{prefix_f}/block_\1"
    rules = [
        Rule(rf"{prefix_t}\.norm\.weight", rf"{prefix_f}/norm/scale"),
        Rule(rf"{prefix_t}\.norm\.bias", rf"{prefix_f}/norm/bias"),
        Rule(rf"{prefix_t}\.proj_in\.weight", rf"{prefix_f}/proj_in/kernel",
             "linear"),
        Rule(rf"{prefix_t}\.proj_in\.bias", rf"{prefix_f}/proj_in/bias"),
        Rule(rf"{prefix_t}\.proj_out\.weight", rf"{prefix_f}/proj_out/kernel",
             "linear"),
        Rule(rf"{prefix_t}\.proj_out\.bias", rf"{prefix_f}/proj_out/bias"),
        Rule(rf"{tb}\.ff\.net\.0\.proj\.weight", rf"{bf}/ff/proj_in/kernel",
             "linear"),
        Rule(rf"{tb}\.ff\.net\.0\.proj\.bias", rf"{bf}/ff/proj_in/bias"),
        Rule(rf"{tb}\.ff\.net\.2\.weight", rf"{bf}/ff/proj_out/kernel",
             "linear"),
        Rule(rf"{tb}\.ff\.net\.2\.bias", rf"{bf}/ff/proj_out/bias"),
    ]
    for a in ("attn1", "attn2"):
        for p in ("to_q", "to_k", "to_v"):
            rules.append(Rule(rf"{tb}\.{a}\.{p}\.weight",
                              rf"{bf}/{a}/{p}/kernel", "linear"))
        rules.append(Rule(rf"{tb}\.{a}\.to_out\.0\.weight",
                          rf"{bf}/{a}/to_out/kernel", "linear"))
        rules.append(Rule(rf"{tb}\.{a}\.to_out\.0\.bias",
                          rf"{bf}/{a}/to_out/bias"))
    for n in ("norm1", "norm2", "norm3"):
        rules.append(Rule(rf"{tb}\.{n}\.weight", rf"{bf}/{n}/scale"))
        rules.append(Rule(rf"{tb}\.{n}\.bias", rf"{bf}/{n}/bias"))
    return rules


def _unet_core_rules(out_prefix: str = ""):
    """Rules shared by UNet and ControlNet encoders."""
    p = out_prefix
    rules = [
        Rule(r"conv_in\.weight", rf"{p}conv_in/kernel", "conv"),
        Rule(r"conv_in\.bias", rf"{p}conv_in/bias"),
        Rule(r"time_embedding\.linear_1\.weight",
             rf"{p}time_embedding/linear_1/kernel", "linear"),
        Rule(r"time_embedding\.linear_1\.bias",
             rf"{p}time_embedding/linear_1/bias"),
        Rule(r"time_embedding\.linear_2\.weight",
             rf"{p}time_embedding/linear_2/kernel", "linear"),
        Rule(r"time_embedding\.linear_2\.bias",
             rf"{p}time_embedding/linear_2/bias"),
        Rule(r"down_blocks\.(\d)\.downsamplers\.0\.conv\.weight",
             rf"{p}down_\1_downsample/kernel", "conv"),
        Rule(r"down_blocks\.(\d)\.downsamplers\.0\.conv\.bias",
             rf"{p}down_\1_downsample/bias"),
    ]
    for i in range(4):
        for j in range(3):
            rules += _resnet_rules(rf"down_blocks\.{i}\.resnets\.{j}",
                                   rf"{p}down_{i}_resnet_{j}")
            rules += _tx_rules(rf"down_blocks\.{i}\.attentions\.{j}",
                               rf"{p}down_{i}_attn_{j}")
    rules += _resnet_rules(r"mid_block\.resnets\.0", rf"{p}mid_resnet_0")
    rules += _resnet_rules(r"mid_block\.resnets\.1", rf"{p}mid_resnet_1")
    rules += _tx_rules(r"mid_block\.attentions\.0", rf"{p}mid_attn")
    return rules


UNET_RULES = _unet_core_rules() + [
    Rule(r"up_blocks\.(\d)\.upsamplers\.0\.conv\.weight",
         r"up_\1_upsample/kernel", "conv"),
    Rule(r"up_blocks\.(\d)\.upsamplers\.0\.conv\.bias",
         r"up_\1_upsample/bias"),
    Rule(r"conv_norm_out\.weight", r"conv_norm_out/scale"),
    Rule(r"conv_norm_out\.bias", r"conv_norm_out/bias"),
    Rule(r"conv_out\.weight", r"conv_out/kernel", "conv"),
    Rule(r"conv_out\.bias", r"conv_out/bias"),
]
for _i in range(4):
    for _j in range(3):
        UNET_RULES += _resnet_rules(rf"up_blocks\.{_i}\.resnets\.{_j}",
                                    rf"up_{_i}_resnet_{_j}")
        UNET_RULES += _tx_rules(rf"up_blocks\.{_i}\.attentions\.{_j}",
                                rf"up_{_i}_attn_{_j}")

CONTROLNET_RULES = _unet_core_rules() + [
    Rule(r"controlnet_cond_embedding\.conv_in\.weight",
         r"cond_embedding/conv_in/kernel", "conv"),
    Rule(r"controlnet_cond_embedding\.conv_in\.bias",
         r"cond_embedding/conv_in/bias"),
    Rule(r"controlnet_cond_embedding\.blocks\.(\d)\.weight",
         r"cond_embedding/blocks_\1/kernel", "conv"),
    Rule(r"controlnet_cond_embedding\.blocks\.(\d)\.bias",
         r"cond_embedding/blocks_\1/bias"),
    Rule(r"controlnet_cond_embedding\.conv_out\.weight",
         r"cond_embedding/conv_out/kernel", "conv"),
    Rule(r"controlnet_cond_embedding\.conv_out\.bias",
         r"cond_embedding/conv_out/bias"),
    Rule(r"controlnet_down_blocks\.(\d+)\.weight", r"zero_conv_\1/kernel", "conv"),
    Rule(r"controlnet_down_blocks\.(\d+)\.bias", r"zero_conv_\1/bias"),
    Rule(r"controlnet_mid_block\.weight", r"zero_conv_mid/kernel", "conv"),
    Rule(r"controlnet_mid_block\.bias", r"zero_conv_mid/bias"),
]


def _vae_block_rules(side: str):
    """side: 'encoder' (2 resnets/stage, downsamplers) or 'decoder'
    (3 resnets/stage, upsamplers)."""
    n_res = 2 if side == "encoder" else 3
    rules = [
        Rule(rf"{side}\.conv_in\.weight", rf"{side}/conv_in/kernel", "conv"),
        Rule(rf"{side}\.conv_in\.bias", rf"{side}/conv_in/bias"),
        Rule(rf"{side}\.conv_norm_out\.weight", rf"{side}/conv_norm_out/scale"),
        Rule(rf"{side}\.conv_norm_out\.bias", rf"{side}/conv_norm_out/bias"),
        Rule(rf"{side}\.conv_out\.weight", rf"{side}/conv_out/kernel", "conv"),
        Rule(rf"{side}\.conv_out\.bias", rf"{side}/conv_out/bias"),
        Rule(rf"{side}\.mid_block\.attentions\.0\.group_norm\.weight",
             rf"{side}/mid_attn/group_norm/scale"),
        Rule(rf"{side}\.mid_block\.attentions\.0\.group_norm\.bias",
             rf"{side}/mid_attn/group_norm/bias"),
        Rule(rf"{side}\.mid_block\.attentions\.0\.to_(q|k|v)\.weight",
             rf"{side}/mid_attn/to_\1/kernel", "linear"),
        Rule(rf"{side}\.mid_block\.attentions\.0\.to_(q|k|v)\.bias",
             rf"{side}/mid_attn/to_\1/bias"),
        Rule(rf"{side}\.mid_block\.attentions\.0\.to_out\.0\.weight",
             rf"{side}/mid_attn/to_out/kernel", "linear"),
        Rule(rf"{side}\.mid_block\.attentions\.0\.to_out\.0\.bias",
             rf"{side}/mid_attn/to_out/bias"),
    ]
    rules += _resnet_vae(rf"{side}\.mid_block\.resnets\.0", rf"{side}/mid_resnet_0")
    rules += _resnet_vae(rf"{side}\.mid_block\.resnets\.1", rf"{side}/mid_resnet_1")
    blk = "down_blocks" if side == "encoder" else "up_blocks"
    ours = "down" if side == "encoder" else "up"
    for i in range(4):
        for j in range(n_res):
            rules += _resnet_vae(rf"{side}\.{blk}\.{i}\.resnets\.{j}",
                                 rf"{side}/{ours}_{i}_resnet_{j}")
    if side == "encoder":
        rules.append(Rule(rf"{side}\.down_blocks\.(\d)\.downsamplers\.0\.conv\.weight",
                          rf"{side}/down_\1_downsample/kernel", "conv"))
        rules.append(Rule(rf"{side}\.down_blocks\.(\d)\.downsamplers\.0\.conv\.bias",
                          rf"{side}/down_\1_downsample/bias"))
    else:
        rules.append(Rule(rf"{side}\.up_blocks\.(\d)\.upsamplers\.0\.conv\.weight",
                          rf"{side}/up_\1_upsample/kernel", "conv"))
        rules.append(Rule(rf"{side}\.up_blocks\.(\d)\.upsamplers\.0\.conv\.bias",
                          rf"{side}/up_\1_upsample/bias"))
    return rules


def _resnet_vae(prefix_t: str, prefix_f: str):
    rules = []
    for tname, fname, kind in _RES:
        if tname == "time_emb_proj":
            continue
        rules.append(Rule(rf"{prefix_t}\.{tname}\.weight",
                          rf"{prefix_f}/{fname}/" +
                          ("scale" if kind == "id" else "kernel"),
                          "id" if kind == "id" else kind))
        rules.append(Rule(rf"{prefix_t}\.{tname}\.bias",
                          rf"{prefix_f}/{fname}/bias"))
    return rules


VAE_RULES = (_vae_block_rules("encoder") + _vae_block_rules("decoder") + [
    Rule(r"quant_conv\.weight", r"encoder/quant_conv/kernel", "conv"),
    Rule(r"quant_conv\.bias", r"encoder/quant_conv/bias"),
    Rule(r"post_quant_conv\.weight", r"decoder/post_quant_conv/kernel", "conv"),
    Rule(r"post_quant_conv\.bias", r"decoder/post_quant_conv/bias"),
])

CLIP_TEXT_RULES = [
    Rule(r"text_model\.embeddings\.token_embedding\.weight",
         r"token_embedding/embedding"),
    Rule(r"text_model\.embeddings\.position_embedding\.weight",
         r"position_embedding"),
    Rule(r"text_model\.encoder\.layers\.(\d+)\.self_attn\.(q|k|v|out)_proj\.weight",
         r"layers_\1/\2_proj/kernel", "linear"),
    Rule(r"text_model\.encoder\.layers\.(\d+)\.self_attn\.(q|k|v|out)_proj\.bias",
         r"layers_\1/\2_proj/bias"),
    Rule(r"text_model\.encoder\.layers\.(\d+)\.layer_norm([12])\.weight",
         r"layers_\1/layer_norm\2/scale"),
    Rule(r"text_model\.encoder\.layers\.(\d+)\.layer_norm([12])\.bias",
         r"layers_\1/layer_norm\2/bias"),
    Rule(r"text_model\.encoder\.layers\.(\d+)\.mlp\.fc([12])\.weight",
         r"layers_\1/fc\2/kernel", "linear"),
    Rule(r"text_model\.encoder\.layers\.(\d+)\.mlp\.fc([12])\.bias",
         r"layers_\1/fc\2/bias"),
    Rule(r"text_model\.final_layer_norm\.weight", r"final_layer_norm/scale"),
    Rule(r"text_model\.final_layer_norm\.bias", r"final_layer_norm/bias"),
]

# --------------------------------------------------------------------------
# SDXL inpainting (diffusers/stable-diffusion-xl-1.0-inpainting-0.1; the
# reference's alternative pipeline, inpainting/inpaint_SDXL.py:13-35).
# UNet: blocks (320, 640, 1280), 2 res layers/block, transformer depths
# (0, 2, 10), linear proj, text_time add-embedding.
# --------------------------------------------------------------------------


def _sdxl_unet_rules(tdepths=(0, 2, 10), layers_per_block=2):
    rules = [
        Rule(r"conv_in\.weight", r"conv_in/kernel", "conv"),
        Rule(r"conv_in\.bias", r"conv_in/bias"),
        Rule(r"down_blocks\.(\d)\.downsamplers\.0\.conv\.weight",
             r"down_\1_downsample/kernel", "conv"),
        Rule(r"down_blocks\.(\d)\.downsamplers\.0\.conv\.bias",
             r"down_\1_downsample/bias"),
        Rule(r"up_blocks\.(\d)\.upsamplers\.0\.conv\.weight",
             r"up_\1_upsample/kernel", "conv"),
        Rule(r"up_blocks\.(\d)\.upsamplers\.0\.conv\.bias",
             r"up_\1_upsample/bias"),
        Rule(r"conv_norm_out\.weight", r"conv_norm_out/scale"),
        Rule(r"conv_norm_out\.bias", r"conv_norm_out/bias"),
        Rule(r"conv_out\.weight", r"conv_out/kernel", "conv"),
        Rule(r"conv_out\.bias", r"conv_out/bias"),
    ]
    for emb in ("time_embedding", "add_embedding"):
        for lin in ("linear_1", "linear_2"):
            rules.append(Rule(rf"{emb}\.{lin}\.weight",
                              rf"{emb}/{lin}/kernel", "linear"))
            rules.append(Rule(rf"{emb}\.{lin}\.bias", rf"{emb}/{lin}/bias"))
    for i, d in enumerate(tdepths):
        for j in range(layers_per_block):
            rules += _resnet_rules(rf"down_blocks\.{i}\.resnets\.{j}",
                                   rf"down_{i}_resnet_{j}")
            if d:
                rules += _tx_rules_deep(rf"down_blocks\.{i}\.attentions\.{j}",
                                        rf"down_{i}_attn_{j}")
    rules += _resnet_rules(r"mid_block\.resnets\.0", r"mid_resnet_0")
    rules += _resnet_rules(r"mid_block\.resnets\.1", r"mid_resnet_1")
    rules += _tx_rules_deep(r"mid_block\.attentions\.0", r"mid_attn")
    for i, d in enumerate(reversed(tdepths)):
        for j in range(layers_per_block + 1):
            rules += _resnet_rules(rf"up_blocks\.{i}\.resnets\.{j}",
                                   rf"up_{i}_resnet_{j}")
            if d:
                rules += _tx_rules_deep(rf"up_blocks\.{i}\.attentions\.{j}",
                                        rf"up_{i}_attn_{j}")
    return rules


SDXL_UNET_RULES = _sdxl_unet_rules()

# bigG text tower (text_encoder_2): CLIP layout + pooled text_projection
SDXL_TEXT_RULES = CLIP_TEXT_RULES + [
    Rule(r"text_projection\.weight", r"text_projection/kernel", "linear"),
]

DIFFUSION_IGNORE = [
    r"text_model\.embeddings\.position_ids",
    r".*\.num_batches_tracked",
    r"text_projection\..*",
]


def _load_component(path, rules, model, example_args, ignore=()):
    import jax

    sd = load_torch_state_dict(path)
    flat, _ = convert_state_dict(sd, rules, strict=True,
                                 ignore=list(ignore) + DIFFUSION_IGNORE)
    tree = {"params": tree_from_paths(flat)}
    template = jax.eval_shape(
        lambda k: model.init(k, *example_args), jax.random.key(0))
    return fill_params(template, tree)


def load_unet_params(path, model, example_args):
    return _load_component(path, UNET_RULES, model, example_args)


def load_controlnet_params(path, model, example_args):
    return _load_component(path, CONTROLNET_RULES, model, example_args)


def load_vae_params(path, model, example_args):
    return _load_component(path, VAE_RULES, model, example_args)


def load_clip_text_params(path, model, example_args):
    return _load_component(path, CLIP_TEXT_RULES, model, example_args)


def load_sdxl_unet_params(path, model, example_args):
    return _load_component(path, SDXL_UNET_RULES, model, example_args)


def load_sdxl_text_params(path, model, example_args):
    """bigG tower (text_encoder_2): unlike SD1.5's CLIP-L, text_projection is
    LOADED (it produces the pooled prompt embedding for add_embedding)."""
    import jax

    sd = load_torch_state_dict(path)
    flat, _ = convert_state_dict(
        sd, SDXL_TEXT_RULES, strict=True,
        ignore=[r"text_model\.embeddings\.position_ids",
                r".*\.num_batches_tracked"])
    tree = {"params": tree_from_paths(flat)}
    template = jax.eval_shape(
        lambda k: model.init(k, *example_args), jax.random.key(0))
    return fill_params(template, tree)
