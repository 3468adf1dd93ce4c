"""GroundingDINO top-level model + detector wrapper, TPU-native.

Parity target: GroundingDINO ``groundingdino.py`` forward (:227-365):
tokenize caption -> sub-sentence masks -> BERT -> feat_map 768->256 ->
Swin backbone -> input_proj (1x1 conv + GroupNorm(32), extra 3x3 s2 level)
-> transformer -> per-layer bbox MLP + inverse-sigmoid anchor update ->
ContrastiveEmbed logits; and ``util/inference.py predict`` (:53-97):
sigmoid -> max-over-text-tokens > box_threshold -> boxes cxcywh normalized.

TPU-first: one jitted function takes the padded image + pad mask + tokenized
text and returns a fixed-capacity top-K detection set (scores + boxes +
validity) — dynamic thresholding happens on the tiny (K,) score vector on
host.  Images are bucketed (config.shape_buckets) so the whole detector
compiles once per bucket.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inklayer_tpu.config import GDinoConfig
from inklayer_tpu.models.gdino.bert import BertEncoder, subsentence_masks, text_token_mask
from inklayer_tpu.models.gdino.swin import SwinTransformer
from inklayer_tpu.models.gdino.tokenizer import WordPieceTokenizer
from inklayer_tpu.models.gdino.transformer import (
    ContrastiveEmbed,
    GDinoTransformer,
    sine_pos_embed_hw,
)
from inklayer_tpu.nn.layers import MLPBlock, resize_pad_mask
from inklayer_tpu.ops.image import pick_bucket, resize_scale, scale_pad_normalize

# ImageNet normalisation used by GDINO's load_image (util/inference.py:39-50)
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


class GroundingDINO(nn.Module):
    cfg: GDinoConfig = GDinoConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image: jax.Array,  # (B, H, W, 3) normalized, padded
        pad_mask: jax.Array,  # (B, H, W) bool, True = padding
        input_ids: jax.Array,  # (B, Nt) int32
        text_self_attn_mask: jax.Array,  # (B, Nt, Nt) bool
        position_ids: jax.Array,  # (B, Nt) int32
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (pred_logits (B, nq, max_text_len), pred_boxes (B, nq, 4)
        cxcywh in [0,1])."""
        c = self.cfg

        # ---- text side ---------------------------------------------------
        tok_mask = input_ids != c.bert.pad_token_id
        bert_out = BertEncoder(c.bert, dtype=self.dtype, name="bert")(
            input_ids, text_self_attn_mask, position_ids)
        text = nn.Dense(c.hidden_dim, dtype=self.dtype, name="feat_map")(bert_out)

        # ---- vision side -------------------------------------------------
        feats = SwinTransformer(c.swin, dtype=self.dtype, name="backbone")(
            image.astype(self.dtype), pad_mask)
        srcs, masks, poses = [], [], []
        for i, (feat, m) in enumerate(feats):
            s = nn.Conv(c.hidden_dim, (1, 1), dtype=self.dtype,
                        name=f"input_proj_{i}_conv")(feat)
            s = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"input_proj_{i}_norm")(s)
            srcs.append(s)
            masks.append(m)
        # extra level: 3x3 stride-2 conv on the last backbone feature
        if c.num_feature_levels > len(feats):
            extra = nn.Conv(c.hidden_dim, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name=f"input_proj_{len(feats)}_conv")(
                feats[-1][0])
            extra = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                 name=f"input_proj_{len(feats)}_norm")(extra)
            srcs.append(extra)
            masks.append(resize_pad_mask(
                pad_mask, (extra.shape[1], extra.shape[2])))
        for m in masks:
            poses.append(sine_pos_embed_hw(
                m, c.hidden_dim // 2, c.pe_temperature_h,
                c.pe_temperature_w).astype(self.dtype))

        # ---- transformer + heads ------------------------------------------
        hs_list, ref_list, memory_text = GDinoTransformer(
            c, dtype=self.dtype, name="transformer")(
                srcs, masks, poses, text, tok_mask, text_self_attn_mask,
                position_ids)
        # class head shared across layers (ContrastiveEmbed is param-free)
        class_embed = ContrastiveEmbed(c.max_text_len, name="class_embed")
        logits = class_embed(hs_list[-1], memory_text, tok_mask)
        boxes = ref_list[-1]  # already includes the last layer's delta
        return logits, boxes


def top_detections(logits: jax.Array, boxes: jax.Array, max_boxes: int
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(B, nq, T) logits + (B, nq, 4) boxes -> fixed-capacity top-K:
    scores (B, K), boxes (B, K, 4), token_logits (B, K, T) — sigmoid space.
    Thresholding happens host-side on the tiny K vector."""
    probs = jax.nn.sigmoid(logits)
    scores = jnp.max(jnp.where(jnp.isfinite(logits), probs, 0.0), axis=-1)
    top_scores, idx = jax.lax.top_k(scores, max_boxes)
    top_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    top_logits = jnp.take_along_axis(probs, idx[..., None], axis=1)
    return top_scores, top_boxes, top_logits


class GDinoDetector:
    """Host-side detector wrapper: tokenisation, shape bucketing, jit cache,
    thresholding — mirrors detector/gdino.py run_ft_dino_on_sketch."""

    def __init__(self, params, cfg: GDinoConfig = GDinoConfig(),
                 dtype: jnp.dtype = jnp.float32,
                 vocab_path: Optional[str] = None):
        self.cfg = cfg
        self.params = params
        self.model = GroundingDINO(cfg, dtype=dtype)
        self.tokenizer = WordPieceTokenizer(vocab_path)
        from inklayer_tpu.io.aotcache import cached_jit

        self._jit = cached_jit(self._forward, name="gdino_detect")
        self._text_cache = {}

    def _forward(self, params, image, pad_mask, input_ids, attn_mask, pos_ids):
        logits, boxes = self.model.apply(
            params, image, pad_mask, input_ids, attn_mask, pos_ids)
        return top_detections(logits, boxes, self.cfg.max_boxes)

    def _tokenize(self, caption: str):
        if caption not in self._text_cache:
            ids = np.asarray(
                [self.tokenizer.encode(caption, self.cfg.max_text_len)],
                np.int32)
            attn, pos = subsentence_masks(ids)
            self._text_cache[caption] = (
                jnp.asarray(ids), jnp.asarray(attn), jnp.asarray(pos.astype(np.int32)))
        return self._text_cache[caption]

    def _caption(self, caption: Optional[str]) -> str:
        # GDINO captions are lowercased and end with '.' (util/inference.py)
        cap = (caption if caption is not None else self.cfg.caption)
        cap = cap.lower().strip()
        return cap if cap.endswith(".") else cap + "."

    def _preprocess(self, image: np.ndarray):
        c = self.cfg
        h, w = image.shape[:2]
        bucket = pick_bucket(h, w, c.shape_buckets)
        scale = min(resize_scale((h, w), bucket, "shortest"),
                    min(bucket[0] / h, bucket[1] / w))
        pre = scale_pad_normalize(
            jnp.asarray(image), jnp.float32(scale), IMAGENET_MEAN,
            IMAGENET_STD, bucket)
        vh, vw = int(round(h * scale)), int(round(w * scale))
        pad_mask = np.ones(bucket, bool)
        pad_mask[:vh, :vw] = False
        return bucket, pre, pad_mask

    def _threshold(self, scores, boxes, tok_logits, token_ids, cap,
                   thresh: float):
        keep = scores > thresh
        labels = [self.phrase_from_posmap(tok_logits[i], token_ids,
                                          self.cfg.text_threshold)
                  for i in np.nonzero(keep)[0]]
        # boxes are normalized wrt the VALID region of the bucket canvas:
        # cxcywh in [0,1] of the valid extent — matching the reference's
        # normalized output on the resized image
        return {
            "boxes": boxes[keep],
            "scores": scores[keep],
            "token_logits": tok_logits[keep],
            "labels": labels,
            "caption": cap,
        }

    def detect(self, image: np.ndarray, caption: Optional[str] = None,
               box_threshold: Optional[float] = None):
        """image: (H, W, 3) uint8 RGB.  Returns dict with normalized cxcywh
        'boxes' (N, 4), 'scores' (N,), 'token_logits' (N, T) for detections
        above threshold (N <= max_boxes)."""
        return self.detect_dispatch(image, caption, box_threshold)()

    def detect_dispatch(self, image: np.ndarray,
                        caption: Optional[str] = None,
                        box_threshold: Optional[float] = None):
        """Async half of detect(): enqueues the device forward and returns a
        zero-arg finalizer that blocks on the readback + thresholding.  Used
        for cross-stage pipelining in directory sweeps (dispatch GDINO for
        image i+1 while image i is in SAM / host IO)."""
        return self.detect_dispatch_device(image, caption, box_threshold)[0]

    def detect_dispatch_device(self, image: np.ndarray,
                               caption: Optional[str] = None,
                               box_threshold: Optional[float] = None):
        """detect_dispatch, additionally exposing the DEVICE-resident top-K
        results: returns (finalize, scores_dev (K,), boxes_dev (K, 4)
        normalized cxcywh, score-descending).  Because top-K is score-sorted
        and thresholding keeps scores > t, the surviving detections are a
        PREFIX of the device arrays — downstream consumers (SAM box decode)
        can chain on device and slice [:n] after the host readback."""
        parts, finalize_host, scores0, boxes0 = \
            self.detect_dispatch_device_parts(image, caption, box_threshold)

        def finalize():
            # ONE batched readback (each np.asarray pays a tunnel RTT)
            return finalize_host(jax.device_get(parts))

        return finalize, scores0, boxes0

    def detect_dispatch_device_parts(self, image: np.ndarray,
                                     caption: Optional[str] = None,
                                     box_threshold: Optional[float] = None):
        """Lowest-level async detect: returns (parts, finalize_host,
        scores_dev, boxes_dev) where `parts` is the device tuple a caller
        passes through its OWN (batched) jax.device_get and `finalize_host`
        turns the fetched host tuple into the detect dict.  Lets the
        runner's device-front mode fuse the detect readback with the
        NMS/depth-front readback into ONE transport round-trip."""
        c = self.cfg
        cap = self._caption(caption)
        thresh = c.box_threshold if box_threshold is None else box_threshold
        _, pre, pad_mask = self._preprocess(image)
        ids, attn, pos = self._tokenize(cap)
        scores, boxes, tok_logits = self._jit(
            self.params, pre[None], jnp.asarray(pad_mask[None]), ids, attn,
            pos)
        parts = (scores[0], boxes[0], tok_logits[0], ids[0])

        def finalize_host(host_parts):
            s, b, tl, i = host_parts
            return self._threshold(np.asarray(s), np.asarray(b, np.float64),
                                   np.asarray(tl), np.asarray(i), cap, thresh)

        return parts, finalize_host, scores[0], boxes[0]

    def detect_batch(self, images, caption: Optional[str] = None,
                     box_threshold: Optional[float] = None):
        """Batched detection for directory sweeps / serving: images are
        grouped by shape bucket and each group runs as ONE dispatch
        (amortizing per-dispatch overhead; one compile per (bucket, B)).
        Returns detect()-style dicts in input order."""
        c = self.cfg
        cap = self._caption(caption)
        thresh = c.box_threshold if box_threshold is None else box_threshold
        ids, attn, pos = self._tokenize(cap)
        token_ids = np.asarray(ids[0])

        groups: dict = {}
        prepped = []
        for i, image in enumerate(images):
            bucket, pre, pad = self._preprocess(image)
            prepped.append((pre, pad))
            groups.setdefault(bucket, []).append(i)
        results = [None] * len(images)
        for bucket, idxs in groups.items():
            b = len(idxs)
            pre_b = jnp.stack([prepped[i][0] for i in idxs])
            pad_b = jnp.asarray(np.stack([prepped[i][1] for i in idxs]))
            tile = lambda t: jnp.broadcast_to(t, (b,) + t.shape[1:])
            scores, boxes, tok_logits = self._jit(
                self.params, pre_b, pad_b, tile(ids), tile(attn), tile(pos))
            scores = np.asarray(scores)
            boxes = np.asarray(boxes, np.float64)
            tok_logits = np.asarray(tok_logits)
            for j, i in enumerate(idxs):
                results[i] = self._threshold(
                    scores[j], boxes[j], tok_logits[j], token_ids, cap,
                    thresh)
        return results

    def phrase_from_posmap(self, token_probs: np.ndarray,
                           token_ids: np.ndarray,
                           text_threshold: float) -> str:
        """Decode tokens whose sigmoid logit exceeds text_threshold
        (GroundingDINO util/utils.py get_phrases_from_posmap :599-610).
        The reference strips periods from every phrase
        (util/inference.py:89,92 ``.replace('.', '')``) — labels in
        bboxes.json and the web UI follow that contract."""
        n = len(token_ids)
        posmap = token_probs[:n] > text_threshold
        posmap[0] = False  # [CLS] (left_idx=0 masking, utils.py:604)
        ids = [int(t) for t, p in zip(token_ids, posmap) if p]
        return self.tokenizer.decode(ids).replace(".", "")
