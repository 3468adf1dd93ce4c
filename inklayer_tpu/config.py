"""Typed configuration tree for the whole pipeline.

The reference scatters its configuration across an mmcv-style python config
(models/GroundingDINO_SwinT_OGC.py), argparse flags (main.py:8-14), and
hard-coded constants (box_threshold=0.2 detector/gdino.py:19, sketch NMS iou
0.2 runner.py:71, SKETCH_THRESHOLD=250 refiner.py:17, inpaint seed 3
inpaint_ControlNet.py:141-156).  Here everything lives in one dataclass tree,
serialisable to/from JSON, with per-stage sections.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SwinConfig:
    """Swin-T backbone (reference: GroundingDINO swin_T_224_1k,
    third_party/GroundingDINO/.../backbone/swin_transformer.py:762-790)."""

    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    out_indices: tuple[int, ...] = (1, 2, 3)
    qkv_bias: bool = True
    in_chans: int = 3


@dataclass(frozen=True)
class BertConfig:
    """BERT-base text encoder (reference: bert-base-uncased via HF)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0


@dataclass(frozen=True)
class GDinoConfig:
    """GroundingDINO SwinT-OGC (reference: models/GroundingDINO_SwinT_OGC.py)."""

    hidden_dim: int = 256
    num_queries: int = 900
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    nheads: int = 8
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    max_text_len: int = 256
    pe_temperature_h: float = 20.0
    pe_temperature_w: float = 20.0
    two_stage: bool = True
    text_enhancer_nheads: int = 4
    text_enhancer_ffn: int = 1024
    fusion_embed_dim: int = 1024
    fusion_nheads: int = 4
    swin: SwinConfig = field(default_factory=SwinConfig)
    bert: BertConfig = field(default_factory=BertConfig)
    # inference-time thresholds (reference: detector/gdino.py:19-21)
    box_threshold: float = 0.2
    text_threshold: float = 0.0
    caption: str = "object"
    # static-shape buckets (H, W) the image is padded into, aspect-preserved
    # resize shorter side to 800, cap longer at 1333 (util/inference.py:42)
    resize_short: int = 800
    resize_max: int = 1333
    shape_buckets: tuple[tuple[int, int], ...] = (
        (800, 800),
        (800, 1066),
        (800, 1344),
        (1066, 800),
        (1344, 800),
    )
    max_boxes: int = 64  # fixed-capacity detection frontier (validity-masked)


@dataclass(frozen=True)
class SamConfig:
    """SAM image encoder / prompt encoder / mask decoder.

    Defaults = ViT-H (reference: segment_anything/build_sam.py:14-107).
    """

    encoder_embed_dim: int = 1280
    encoder_depth: int = 32
    encoder_num_heads: int = 16
    encoder_global_attn_indexes: tuple[int, ...] = (7, 15, 23, 31)
    encoder_window_size: int = 14
    image_size: int = 1024
    patch_size: int = 16
    prompt_embed_dim: int = 256
    mask_threshold: float = 0.0
    pixel_mean: tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: tuple[float, float, float] = (58.395, 57.12, 57.375)

    @staticmethod
    def vit_h() -> "SamConfig":
        return SamConfig()

    @staticmethod
    def vit_l() -> "SamConfig":
        return SamConfig(
            encoder_embed_dim=1024,
            encoder_depth=24,
            encoder_num_heads=16,
            encoder_global_attn_indexes=(5, 11, 17, 23),
        )

    @staticmethod
    def vit_b() -> "SamConfig":
        return SamConfig(
            encoder_embed_dim=768,
            encoder_depth=12,
            encoder_num_heads=12,
            encoder_global_attn_indexes=(2, 5, 8, 11),
        )


@dataclass(frozen=True)
class DepthConfig:
    """Depth-Anything-V2 (DINOv2 encoder + DPT head).

    Defaults = vitb used by the reference (refinement/depth_sort.py:20-40).
    """

    encoder: str = "vitb"
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 14
    intermediate_layers: tuple[int, ...] = (2, 5, 8, 11)
    features: int = 128
    out_channels: tuple[int, ...] = (96, 192, 384, 768)
    input_size: int = 518  # resize lower bound, multiple of 14
    layerscale_init: float = 1.0
    interpolate_offset: float = 0.1
    # metric-depth variant (reference metric_depth/depth_anything_v2/dpt.py:
    # 113,160-183): >0 switches the head to sigmoid * max_depth
    max_depth: float = 0.0

    @staticmethod
    def vits() -> "DepthConfig":
        return DepthConfig(
            encoder="vits", embed_dim=384, num_heads=6, features=64,
            out_channels=(48, 96, 192, 384))

    @staticmethod
    def vitl() -> "DepthConfig":
        return DepthConfig(
            encoder="vitl", embed_dim=1024, depth=24, num_heads=16,
            intermediate_layers=(4, 11, 17, 23), features=256,
            out_channels=(256, 512, 1024, 1024))


@dataclass(frozen=True)
class DiffusionConfig:
    """SD1.5-inpaint + ControlNet stage
    (reference: inpainting/inpaint_ControlNet.py:14-47,126-174)."""

    resolution: int = 768
    num_steps: int = 30
    guidance_scale: float = 9.0
    controlnet_scale: float = 1.2
    seed: int = 3
    num_passes: int = 2
    # reference-exact prompt strings (inpaint_ControlNet.py:141-143)
    prompt: str = (
        "high quality black and white line drawing, clean precise lines, "
        "detailed sketch, professional illustration, sharp edges"
    )
    negative_prompt: str = (
        "blurry, smudged, messy lines, low quality, artifacts, noise, "
        "distorted, pixelated"
    )
    # single-layer web edit path (inpaint_single_layer.py:52-61):
    # user prompt, same negative, cfg 7.0, cond 0.6, ONE pass
    single_layer_guidance_scale: float = 7.0
    single_layer_controlnet_scale: float = 0.6
    single_layer_negative_prompt: str = (
        "blurry, smudged, messy lines, low quality, artifacts, noise, "
        "distorted, pixelated"
    )
    # UNet dims (SD1.5)
    unet_block_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    unet_layers_per_block: int = 2
    unet_attention_head_dim: int = 8
    cross_attention_dim: int = 768
    latent_channels: int = 4
    vae_channels: tuple[int, ...] = (128, 256, 512, 512)
    text_maxlen: int = 77


@dataclass(frozen=True)
class RefineConfig:
    """Classical refinement constants, faithful to the reference values."""

    # mask cleaning (refinement/mask_cleaner.py:6-37)
    clean_threshold: int = 127
    clean_kernel_frac: float = 0.025
    min_cc_area: int = 500
    min_cc_aspect: float = 1.1
    # sketch NMS (refinement/nms_sketch.py, runner.py:71)
    nms_iou: float = 0.2
    nms_bbox_iou_kill: float = 0.7
    nms_eps_px_per_kdiag: float = 8.0  # eps = 8px * diag/1000 (nms_sketch.py:7-20)
    nms_max_contained: int = 5
    nms_max_area_frac: float = 0.9
    ink_threshold: int = 250  # SKETCH_THRESHOLD (refiner.py:17)
    # depth sort (refinement/depth_sort.py)
    sample_radius_frac: float = 0.01
    depth_bin: float = 0.1
    containment_eps_frac: float = 0.002
    containment_area_gap: float = 0.02
    overlap_major_frac: float = 0.6
    # refiner (refinement/refiner.py)
    max_ink_cover_frac: float = 0.9
    fragment_merge_frac: float = 0.05
    watershed_iters: int = 256
    distance_iters: int = 64


@dataclass(frozen=True)
class ParallelConfig:
    """Device mesh layout for multi-chip serving / training."""

    dp: int = 1  # data parallel (per-image)
    fsdp: int = 1  # weight sharding axis
    tp: int = 1  # tensor parallel (attention heads / mlp)

    @property
    def mesh_shape(self) -> tuple[int, int, int]:
        return (self.dp, self.fsdp, self.tp)


@dataclass(frozen=True)
class PipelineConfig:
    gdino: GDinoConfig = field(default_factory=GDinoConfig)
    sam: SamConfig = field(default_factory=SamConfig)
    depth: DepthConfig = field(default_factory=DepthConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    refine: RefineConfig = field(default_factory=RefineConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    dtype: str = "bfloat16"  # compute dtype on TPU
    out_dir: str = "./output"
    keep_intermediate: bool = True
    inpaint: bool = False
    # Dispatch the capacity-K mask/clean/NMS front BEFORE the detect
    # readback (zero device idle between stages).  Outputs match the host
    # front on the parity + self-golden suites; the box-corner arithmetic
    # runs in f32 on device vs f64 on host, so a product landing exactly
    # on a pixel boundary can flip a 1-px truncation in rare cases (not
    # guaranteed byte-identical for all inputs).  Default OFF: through a
    # remote-device
    # transport whose readbacks drain the whole queue (the axon tunnel),
    # fronting the dispatch makes the detect readback wait on the entire
    # mask path (measured 505 vs 414 ms/img).  Turn ON for PCIe-local TPU
    # VMs where readbacks complete as their buffers become ready.
    device_front: bool = False
    # run_dir worker threads: concurrent images overlap each other's
    # data-dependent readbacks (the transport completes gets as their
    # dependencies finish and serves parallel gets concurrently).
    # Measured 2026-08-20/21 on 8-image sweeps: workers=1 2.4-2.9,
    # 2: 3.4-3.7, 3: 3.7-4.3, 4: 3.5-4.4, 5-6: plateau/decline — 4 is the
    # pick after the subset-clean cut device busy to ~136 ms/img.
    # NOTE an earlier transport build drained the whole queue on every get
    # and made ANY concurrency lose (r03 measured 0.95 sk/s at workers=2);
    # if sweeps regress hard, set 1 and re-measure.
    sweep_workers: int = 4


# ---------------------------------------------------------------------------
# (De)serialisation
# ---------------------------------------------------------------------------


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_jsonable(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    return obj


def _from_jsonable(cls: type, data: Any) -> Any:
    if dataclasses.is_dataclass(cls) and isinstance(data, dict):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in data:
                continue
            v = data[f.name]
            ftype = f.type if isinstance(f.type, type) else None
            if ftype is not None and dataclasses.is_dataclass(ftype):
                kwargs[f.name] = _from_jsonable(ftype, v)
            elif isinstance(v, list):
                kwargs[f.name] = tuple(tuple(x) if isinstance(x, list) else x for x in v)
            else:
                kwargs[f.name] = v
        return cls(**kwargs)
    return data


def save_config(cfg: PipelineConfig, path: str) -> None:
    with open(path, "w") as f:
        json.dump(_to_jsonable(cfg), f, indent=2)


def load_config_py(path: str) -> PipelineConfig:
    """Execute a python config file that defines `config = PipelineConfig(...)`
    — the reference's SLConfig-style executable-python configuration
    (util/slconfig.py:42-427), without the mmcv dict-attr machinery."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("user_config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg = getattr(mod, "config", None)
    if not isinstance(cfg, PipelineConfig):
        raise ValueError(f"{path} must define `config = PipelineConfig(...)`")
    return cfg


def load_config(path: str) -> PipelineConfig:
    if path.endswith(".py"):
        return load_config_py(path)
    with open(path) as f:
        data = json.load(f)
    # nested dataclass fields need explicit reconstruction
    sub = {
        "gdino": GDinoConfig, "sam": SamConfig, "depth": DepthConfig,
        "diffusion": DiffusionConfig, "refine": RefineConfig,
        "parallel": ParallelConfig,
    }
    kwargs: dict[str, Any] = {}
    for k, v in data.items():
        if k in sub:
            if k == "gdino":
                g = dict(v)
                swin = _from_jsonable(SwinConfig, g.pop("swin", {}))
                bert = _from_jsonable(BertConfig, g.pop("bert", {}))
                kwargs[k] = dataclasses.replace(
                    _from_jsonable(GDinoConfig, g), swin=swin, bert=bert)
            else:
                kwargs[k] = _from_jsonable(sub[k], v)
        else:
            kwargs[k] = v
    return PipelineConfig(**kwargs)
