"""Model export (the reference ships a SAM decoder ONNX exporter,
segment-anything utils/onnx.py + scripts/export_onnx_model.py).

TPU-native equivalent: serialize jitted functions to portable StableHLO via
jax.export — the exported artifact runs under any XLA runtime (incl. other
TPU generations, GPU, CPU) without Python model code.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_fn(fn, example_args, path: Optional[str] = None):
    """jit + export `fn` at the example argument shapes; optionally persist
    the serialized StableHLO artifact."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return exported, blob


def load_exported(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def export_sam_decoder(params, cfg, path: Optional[str] = None,
                       box_capacity: int = 16):
    """Export the SAM prompt-encoder + mask-decoder (the part the reference
    exports to ONNX) as one function of (embedding, boxes)."""
    from inklayer_tpu.models.sam import Sam

    model = Sam(cfg)
    grid = cfg.image_size // cfg.patch_size

    def decode(embedding, boxes):
        return model.apply(params, embedding, boxes,
                           method=Sam.decode_boxes)

    example = (
        jnp.zeros((1, grid, grid, cfg.prompt_embed_dim), jnp.float32),
        jnp.zeros((box_capacity, 4), jnp.float32),
    )
    return export_fn(decode, example, path)
