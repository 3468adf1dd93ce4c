from inklayer_tpu.models.diffusion.scheduler import DPMSolverMultistepScheduler
from inklayer_tpu.models.diffusion.clip_text import CLIPTextEncoder, CLIPTokenizer
from inklayer_tpu.models.diffusion.vae import AutoencoderKL
from inklayer_tpu.models.diffusion.unet import UNet2DCondition
from inklayer_tpu.models.diffusion.controlnet import ControlNet
from inklayer_tpu.models.diffusion.pipeline import ControlNetInpaintPipeline

__all__ = [
    "DPMSolverMultistepScheduler", "CLIPTextEncoder", "CLIPTokenizer",
    "AutoencoderKL", "UNet2DCondition", "ControlNet",
    "ControlNetInpaintPipeline",
]
