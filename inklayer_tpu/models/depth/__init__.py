from inklayer_tpu.models.depth.dpt import DepthAnythingV2, DepthEstimator, depth_bucket
from inklayer_tpu.models.depth.dinov2 import DinoVisionTransformer

__all__ = ["DepthAnythingV2", "DepthEstimator", "depth_bucket",
           "DinoVisionTransformer"]
