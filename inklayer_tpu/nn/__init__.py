from inklayer_tpu.nn.layers import (
    MLP,
    DropPath,
    LayerNorm,
    PatchEmbed,
    window_partition,
    window_unpartition,
)

__all__ = [
    "MLP",
    "DropPath",
    "LayerNorm",
    "PatchEmbed",
    "window_partition",
    "window_unpartition",
]
