from inklayer_tpu.models.sam.sam import Sam, SamPredictor
from inklayer_tpu.models.sam.image_encoder import ImageEncoderViT
from inklayer_tpu.models.sam.prompt_encoder import PromptEncoder
from inklayer_tpu.models.sam.mask_decoder import MaskDecoder

__all__ = ["Sam", "SamPredictor", "ImageEncoderViT", "PromptEncoder", "MaskDecoder"]
