"""inklayer-tpu: a TPU-native scene-sketch segmentation & layering framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of InkLayer
(SIGGRAPH 2025): open-vocabulary detection (GroundingDINO Swin-T + BERT),
box-prompted segmentation (SAM ViT-H), monocular depth layer ordering
(Depth-Anything-V2 ViT-B / DPT), sketch-aware mask refinement, and
diffusion-based occluded-stroke inpainting — all designed TPU-first:
static bucketed shapes, fused on-device pre/post-processing, Pallas
attention kernels, and pjit/mesh sharding for multi-chip serving.
"""

__version__ = "0.1.0"
