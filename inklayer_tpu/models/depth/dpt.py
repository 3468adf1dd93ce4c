"""DPT head + DepthAnythingV2 model, TPU-native.

Parity target: Depth_Anything_V2 ``depth_anything_v2/dpt.py:38-221`` (DPTHead
projections / resize layers / scratch / FeatureFusionBlocks / output convs,
DepthAnythingV2.forward + image2tensor) and ``util/blocks.py:4-148``
(ResidualConvUnit, FeatureFusionBlock, _make_scratch).

TPU-first: NHWC; the cv2-based host transform (Resize lower-bound 518,
multiple-of-14, INTER_CUBIC + ImageNet normalise) becomes one on-device op
with static bucketed output shapes; all bilinear upsamples use exact
align_corners=True semantics (ops/image.resize_align_corners) matching the
reference — parity-tested against its torch implementation.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inklayer_tpu.config import DepthConfig
from inklayer_tpu.models.depth.dinov2 import DinoVisionTransformer
from inklayer_tpu.ops.image import resize, resize_align_corners

# [0,1]-scale ImageNet stats (util/transform.py NormalizeImage)
DEPTH_MEAN = (0.485, 0.456, 0.406)
DEPTH_STD = (0.229, 0.224, 0.225)


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, out_hw: Tuple[int, int] = None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype,
                             name="resConfUnit2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        # reference interpolates with align_corners=True (util/blocks.py:144)
        x = resize_align_corners(x, tuple(out_hw))
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class DPTHead(nn.Module):
    cfg: DepthConfig = DepthConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, taps, patch_hw: Tuple[int, int]):
        """taps: list of 4 ((B, N, C) tokens, cls) from the encoder;
        returns (B, 14*ph, 14*pw) relative depth (ReLU'd)."""
        c = self.cfg
        ph, pw = patch_hw
        feats = []
        for i, (tok, _cls) in enumerate(taps):
            b = tok.shape[0]
            x = tok.reshape(b, ph, pw, -1)
            x = nn.Conv(c.out_channels[i], (1, 1), dtype=self.dtype,
                        name=f"projects_{i}")(x)
            # resize layers: 4x, 2x, 1x, 0.5x (dpt.py:63-91)
            if i == 0:
                x = nn.ConvTranspose(c.out_channels[i], (4, 4), strides=(4, 4),
                                     dtype=self.dtype, name="resize_0")(x)
            elif i == 1:
                x = nn.ConvTranspose(c.out_channels[i], (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(c.out_channels[i], (3, 3), strides=(2, 2),
                            padding=1, dtype=self.dtype, name="resize_3")(x)
            # scratch 3x3 convs to the fusion width (no bias)
            x = nn.Conv(c.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"scratch_layer{i + 1}_rn")(x)
            feats.append(x)

        l1, l2, l3, l4 = feats
        p4 = FeatureFusionBlock(c.features, dtype=self.dtype,
                                name="refinenet4")(l4, out_hw=l3.shape[1:3])
        p3 = FeatureFusionBlock(c.features, dtype=self.dtype,
                                name="refinenet3")(p4, l3, out_hw=l2.shape[1:3])
        p2 = FeatureFusionBlock(c.features, dtype=self.dtype,
                                name="refinenet2")(p3, l2, out_hw=l1.shape[1:3])
        p1 = FeatureFusionBlock(c.features, dtype=self.dtype,
                                name="refinenet1")(p2, l1)

        x = nn.Conv(c.features // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="output_conv1")(p1)
        # align_corners=True (dpt.py:147)
        x = resize_align_corners(x, (ph * c.patch_size, pw * c.patch_size))
        x = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                    name="output_conv2_0")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv2_2")(x)
        if self.cfg.max_depth > 0:
            # metric variant: sigmoid head scaled by max_depth
            # (metric_depth/depth_anything_v2/dpt.py:113,183)
            return jax.nn.sigmoid(x[..., 0])
        return nn.relu(x[..., 0])


class DepthAnythingV2(nn.Module):
    cfg: DepthConfig = DepthConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array) -> jax.Array:
        """image: (B, H, W, 3) normalized, H/W multiples of patch_size.
        Returns (B, H, W) relative depth."""
        c = self.cfg
        ph, pw = image.shape[1] // c.patch_size, image.shape[2] // c.patch_size
        taps = DinoVisionTransformer(c, dtype=self.dtype, name="pretrained")(
            image.astype(self.dtype), c.intermediate_layers)
        out = DPTHead(c, dtype=self.dtype, name="depth_head")(
            taps, (ph, pw)).astype(jnp.float32)
        if c.max_depth > 0:
            out = out * c.max_depth
        return out


def depth_bucket(h: int, w: int, cfg: DepthConfig) -> Tuple[int, int]:
    """Reference Resize semantics (util/transform.py:5-157, lower_bound,
    keep_aspect, multiple-of-14): scale so min side >= input_size, round each
    dim to a multiple of 14.  Snapped to a bounded bucket set by capping the
    long side at 2x input_size to keep compile counts low."""
    scale = cfg.input_size / min(h, w)
    nh = int(round(h * scale / cfg.patch_size)) * cfg.patch_size
    nw = int(round(w * scale / cfg.patch_size)) * cfg.patch_size
    cap = 2 * cfg.input_size
    nh, nw = min(nh, cap), min(nw, cap)
    nh = max(nh, cfg.input_size)
    nw = max(nw, cfg.input_size)
    # snap to a coarse grid above the base size to bound bucket count (each
    # new bucket costs a ~30s+ depth-model compile through the tunnel)
    snap = 140  # 10 patches
    nh = cfg.input_size + ((nh - cfg.input_size + snap - 1) // snap) * snap
    nw = cfg.input_size + ((nw - cfg.input_size + snap - 1) // snap) * snap
    return min(nh, cap + snap), min(nw, cap + snap)


class DepthEstimator:
    """Host wrapper mirroring DepthAnythingV2.infer_image (dpt.py:187-221)."""

    def __init__(self, params, cfg: DepthConfig = DepthConfig(),
                 dtype: jnp.dtype = jnp.float32):
        self.cfg = cfg
        self.model = DepthAnythingV2(cfg, dtype=dtype)
        self.params = params
        from inklayer_tpu.io.aotcache import cached_jit

        self._jit = cached_jit(lambda p, x: self.model.apply(p, x),
                               name="depth_infer")
        # ONE jit for normalize+resize+model+resize-back: eager pre/post ops
        # each pay a tunnel dispatch (~0.5s/stage measured); fused they cost
        # one dispatch and the resizes fuse into the surrounding graph
        self._full = cached_jit(self._infer_full, name="depth_infer_full",
                                static_argnames=("bh", "bw"))

    def _infer_full(self, p, image_u8, *, bh: int, bw: int):
        h, w = image_u8.shape[0], image_u8.shape[1]
        x = image_u8.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(DEPTH_MEAN)) / jnp.asarray(DEPTH_STD)
        x = resize(x, (bh, bw), "bicubic", antialias=True)
        depth = self.model.apply(p, x[None])[0]
        # F.interpolate(..., align_corners=True) in infer_image (dpt.py:190)
        out = resize_align_corners(depth[None, ..., None], (h, w))[0]
        return out[..., 0]

    def infer_image_device(self, image) -> jnp.ndarray:
        """image: (H, W, 3) uint8 RGB (host or device) -> (H, W) float32
        relative depth, LEFT ON DEVICE (the depth-sort stage consumes it
        there; quantized readback only for the depth_map.png contract)."""
        h, w = image.shape[:2]
        bh, bw = depth_bucket(h, w, self.cfg)
        return self._full(self.params, jnp.asarray(image), bh=bh, bw=bw)

    def infer_image(self, image: np.ndarray) -> np.ndarray:
        """image: (H, W, 3) uint8 RGB -> (H, W) float32 relative depth."""
        return np.asarray(self.infer_image_device(image))
