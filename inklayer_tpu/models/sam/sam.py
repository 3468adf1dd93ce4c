"""Sam module + box-prompted predictor, TPU-native.

Parity targets: segment-anything ``modeling/sam.py:18-174`` (preprocess /
postprocess_masks / mask_threshold) and ``predictor.py:17-269``
(SamPredictor.set_image / predict_torch).

TPU-first design differences from the reference:
  * the resize->normalise->pad chain is one fused device op with static
    1024x1024 output (ops/image.scale_pad_normalize) — no host preprocessing,
    no recompilation across image sizes;
  * the predictor caches the jitted encoder/decoder; the encoder runs ONCE
    per image (the reference rebuilds SamPredictor and re-uploads the 2.4GB
    checkpoint per image — segmentor/sam.py:23 — a latency bug not replicated);
  * box prompts are padded to a fixed capacity with a validity mask so the
    decoder never recompiles as the number of detections varies.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inklayer_tpu.config import SamConfig
from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT
from inklayer_tpu.models.sam.mask_decoder import MaskDecoder
from inklayer_tpu.models.sam.prompt_encoder import PromptEncoder
from inklayer_tpu.ops.image import resize_scale, scale_pad_normalize


class Sam(nn.Module):
    cfg: SamConfig = SamConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        grid = c.image_size // c.patch_size
        self.image_encoder = ImageEncoderViT(
            img_size=c.image_size,
            patch_size=c.patch_size,
            embed_dim=c.encoder_embed_dim,
            depth=c.encoder_depth,
            num_heads=c.encoder_num_heads,
            out_chans=c.prompt_embed_dim,
            window_size=c.encoder_window_size,
            global_attn_indexes=c.encoder_global_attn_indexes,
            dtype=self.dtype,
        )
        self.prompt_encoder = PromptEncoder(
            embed_dim=c.prompt_embed_dim,
            image_embedding_size=(grid, grid),
            input_image_size=(c.image_size, c.image_size),
            dtype=self.dtype,
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=c.prompt_embed_dim, dtype=self.dtype)

    def encode(self, image: jax.Array) -> jax.Array:
        """Preprocessed (B, S, S, 3) -> (B, S/16, S/16, 256)."""
        return self.image_encoder(image.astype(self.dtype))

    def decode_boxes(
        self,
        embedding: jax.Array,  # (1, G, G, 256)
        boxes: jax.Array,  # (N, 4) xyxy in model (1024) coords
        multimask_output: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (low_res_logits (N, M, 256, 256), iou_pred (N, M))."""
        sparse, dense = self.prompt_encoder(boxes=boxes)
        image_pe = self.prompt_encoder.get_dense_pe()
        n = boxes.shape[0]
        emb = jnp.broadcast_to(embedding, (n,) + embedding.shape[1:])
        return self.mask_decoder(
            emb.astype(self.dtype), image_pe, sparse.astype(self.dtype),
            dense.astype(self.dtype), multimask_output=multimask_output)

    def __call__(self, image: jax.Array, boxes: jax.Array):
        """End-to-end: preprocessed image batch (1, S, S, 3) + (N, 4) boxes
        -> (low_res_logits, iou_pred)."""
        embedding = self.encode(image)
        return self.decode_boxes(embedding, boxes)


class SamPredictor:
    """Stateful convenience wrapper mirroring the reference SamPredictor API,
    with cached jit-compiled encode/decode."""

    def __init__(self, params, cfg: SamConfig = SamConfig(),
                 dtype: jnp.dtype = jnp.float32, box_capacity: int = 64,
                 encode_fn=None):
        """encode_fn: optional override for the image-encoder call, taking
        the preprocessed (S, S, 3) image and returning a (G, G, C) embedding
        — used to route encoding through a serving MicroBatcher so
        concurrent predictors share one batched ViT-H launch."""
        self.cfg = cfg
        self.model = Sam(cfg, dtype=dtype)
        self.params = params
        self.box_capacity = box_capacity
        self.encode_fn = encode_fn
        self._embedding = None
        self._scale = None
        self._input_hw = None  # size of valid (non-pad) region in model space
        self._orig_hw = None

        from inklayer_tpu.io.aotcache import cached_jit

        self._encode = cached_jit(
            lambda p, img: self.model.apply(p, img, method=Sam.encode),
            name="sam_encode")
        self._decode = cached_jit(
            lambda p, emb, boxes: self.model.apply(
                p, emb, boxes, method=Sam.decode_boxes),
            name="sam_decode")

    # -- image ------------------------------------------------------------
    def set_image(self, image: np.ndarray) -> None:
        """image: (H, W, 3) uint8 RGB host array.

        Preprocessing follows reference ResizeLongestSide.get_preprocess_
        shape: resize to the ROUNDED target shape; coords then scale PER
        AXIS by (nh/h, nw/w) (utils/transforms.py:94-102).  A single
        continuous scale drifts the pixel grid by up to half a pixel."""
        self.set_image_state(self.compute_image_state(image))

    # -- batched prefill (directory sweeps / serving) ----------------------
    def _preprocess_meta(self, image: np.ndarray):
        c = self.cfg
        h, w = image.shape[:2]
        s = resize_scale((h, w), (c.image_size, c.image_size), "longest")
        nh, nw = int(h * s + 0.5), int(w * s + 0.5)
        pre = scale_pad_normalize(
            jnp.asarray(image), jnp.asarray([nh / h, nw / w], jnp.float32),
            c.pixel_mean, c.pixel_std, (c.image_size, c.image_size))
        meta = {"scale": np.asarray([nw / w, nh / h], np.float32),
                "orig_hw": (h, w), "input_hw": (nh, nw)}
        return pre, meta

    def precompute_image_states(self, images) -> list:
        """ONE batched ViT-H launch for several images; returns opaque
        states for set_image_state (amortizes dispatch + pipeline overhead
        on directory sweeps — the reference re-encodes per image)."""
        pres, metas = [], []
        for image in images:
            pre, meta = self._preprocess_meta(image)
            pres.append(pre)
            metas.append(meta)
        embs = self._encode(self.params, jnp.stack(pres))
        return [{"embedding": embs[i: i + 1], **metas[i]}
                for i in range(len(images))]

    def set_image_state(self, state: dict) -> None:
        self._embedding = state["embedding"]
        self._scale = state["scale"]
        self._orig_hw = state["orig_hw"]
        self._input_hw = state["input_hw"]

    def compute_image_state(self, image) -> dict:
        """Pure (no predictor mutation) encode: image -> opaque state dict
        for predict_device_state.  Thread-safe — concurrent pipeline workers
        each carry their own state instead of racing on set_image."""
        pre, meta = self._preprocess_meta(image)
        if self.encode_fn is not None:
            emb = jnp.asarray(self.encode_fn(pre))[None]
        else:
            emb = self._encode(self.params, pre[None])
        return {"embedding": emb, **meta}

    def predict_device_state(self, state: dict, boxes_xyxy) -> tuple:
        """Stateless predict_device against an explicit image state."""
        n = boxes_xyxy.shape[0]
        cap = self.box_capacity
        while cap < n:
            cap *= 2
        padded = np.zeros((cap, 4), np.float32)
        padded[:n] = (np.asarray(boxes_xyxy, np.float32)
                      * np.tile(state["scale"], 2))
        logits, iou = self._decode(self.params, state["embedding"],
                                   jnp.asarray(padded))
        full = self._postprocess_device_state(state, logits[:n, 0])
        return full > self.cfg.mask_threshold, np.asarray(iou[:n, 0])

    def decode_lowres_state(self, state: dict, boxes_model) -> tuple:
        """Chained device decode: (cap, 4) DEVICE boxes already in model
        space -> ((cap, 256, 256) low-res logits, (cap,) iou), no host
        sync.  Lets the pipeline run the TwoWayTransformer during the
        detect-readback round-trip; full-resolution postprocessing happens
        later via masks_from_lowres once the valid count is known."""
        logits, iou = self._decode(self.params, state["embedding"],
                                   boxes_model)
        return logits[:, 0], iou[:, 0]

    def masks_from_lowres(self, state: dict, lowres, n: int):
        """(cap, 256, 256) low-res logits -> (n, H, W) bool device masks
        for the first n prompts.

        n is BUCKETED up to the next power of two (then sliced) so the
        fused upsample program compiles once per bucket instead of once
        per detection count; the whole up->crop->resize->threshold chain
        is ONE jit (the eager composition paid ~4 dispatches + repeated
        resize-matrix uploads per image — round-4 itemization,
        scripts/profile_sam_decode.py)."""
        cap = lowres.shape[0]
        b = 1
        while b < n:
            b *= 2
        b = min(b, cap)
        masks = _masks_from_lowres_jit(
            lowres[:b], state["input_hw"], state["orig_hw"],
            self.cfg.image_size, self.cfg.mask_threshold,
            jax.default_backend() == "tpu")
        return masks[:n]

    def _postprocess_device_state(self, state: dict, low_res_logits):
        return _postprocess_resize(
            low_res_logits, state["input_hw"], state["orig_hw"],
            self.cfg.image_size, jax.default_backend() == "tpu")

    # -- prompts ----------------------------------------------------------
    def predict_boxes(
        self, boxes_xyxy: np.ndarray, multimask_output: bool = False,
        return_logits: bool = False,
    ):
        """boxes in original-image pixel coords, (N, 4) xyxy.

        Returns (masks (N, H, W) bool at original size, iou_pred (N,),
        low_res_logits (N, 256, 256)).
        """
        assert self._embedding is not None, "call set_image first"
        n = boxes_xyxy.shape[0]
        cap = self.box_capacity
        while cap < n:
            cap *= 2
        boxes_model = np.asarray(boxes_xyxy, np.float32) * np.tile(self._scale, 2)
        padded = np.zeros((cap, 4), np.float32)
        padded[:n] = boxes_model
        logits, iou = self._decode(self.params, self._embedding,
                                   jnp.asarray(padded))
        logits = logits[:n, 0]  # (n, 256, 256)
        iou = np.asarray(iou[:n, 0])
        full = self._postprocess(logits)  # (n, H, W) float logits
        if return_logits:
            return full, iou, np.asarray(logits)
        return full > self.cfg.mask_threshold, iou, np.asarray(logits)

    def _postprocess(self, low_res_logits: jax.Array) -> np.ndarray:
        """(N, 256, 256) logits -> (N, H_orig, W_orig) float logits (host).

        Mirrors modeling/sam.py postprocess_masks: upsample to model size,
        crop the valid region, resize to the original size."""
        return np.asarray(self._postprocess_device(low_res_logits))

    def _postprocess_device(self, low_res_logits: jax.Array) -> jax.Array:
        c = self.cfg
        n = low_res_logits.shape[0]
        up = jax.image.resize(
            low_res_logits, (n, c.image_size, c.image_size), method="bilinear")
        ih, iw = self._input_hw
        up = up[:, :ih, :iw]
        oh, ow = self._orig_hw
        return jax.image.resize(up, (n, oh, ow), method="bilinear")

    def predict_device(self, boxes_xyxy: np.ndarray) -> tuple:
        """Device-resident predict: returns (masks (N, H, W) bool DEVICE
        array thresholded at mask_threshold, iou (N,) host).  Avoids the
        full-resolution float readback of predict()."""
        assert self._embedding is not None, "call set_image first"
        state = {"embedding": self._embedding, "scale": self._scale,
                 "orig_hw": self._orig_hw, "input_hw": self._input_hw}
        return self.predict_device_state(state, boxes_xyxy)

    def predict(self, boxes: Optional[np.ndarray] = None,
                multimask_output: bool = False):
        """Reference-compatible entry: returns (masks bool, iou, low_res)."""
        logits, iou, low = self.predict_boxes(boxes, multimask_output,
                                              return_logits=True)
        return logits > self.cfg.mask_threshold, iou, low


# ---------------------------------------------------------------------------
# fused mask postprocessing (module level so all predictors share the jit
# cache; shapes are static per (n-bucket, input_hw, orig_hw))
# ---------------------------------------------------------------------------

def _postprocess_resize(low_res_logits, input_hw, orig_hw, image_size,
                        on_tpu):
    """(n, 256, 256) logits -> (n, H_orig, W_orig) logits.  Mirrors
    modeling/sam.py postprocess_masks: bilinear to model size, crop the
    valid region, bilinear to the original size."""
    n = low_res_logits.shape[0]
    ih, iw = input_hw
    oh, ow = orig_hw
    if on_tpu:
        # same linear map on the MXU (ops/image.py resize_batch_matmul);
        # the gather-based resize lowering runs ~20x off roofline here
        from inklayer_tpu.ops.image import resize_batch_matmul
        up = resize_batch_matmul(low_res_logits, (image_size, image_size))
        return resize_batch_matmul(up[:, :ih, :iw], (oh, ow))
    up = jax.image.resize(low_res_logits, (n, image_size, image_size),
                          method="bilinear")
    return jax.image.resize(up[:, :ih, :iw], (n, oh, ow), method="bilinear")


@jax.jit
def _threshold_masks(full, thr):
    return full > thr


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("input_hw", "orig_hw",
                                              "image_size", "on_tpu"))
def _masks_from_lowres_jit(lowres, input_hw, orig_hw, image_size, thr,
                           on_tpu):
    full = _postprocess_resize(lowres, input_hw, orig_hw, image_size, on_tpu)
    return full > thr
