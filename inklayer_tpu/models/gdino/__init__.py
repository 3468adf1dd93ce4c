from inklayer_tpu.models.gdino.gdino import GDinoDetector, GroundingDINO, top_detections
from inklayer_tpu.models.gdino.swin import SwinTransformer
from inklayer_tpu.models.gdino.bert import BertEncoder, subsentence_masks
from inklayer_tpu.models.gdino.tokenizer import WordPieceTokenizer

__all__ = [
    "GDinoDetector",
    "GroundingDINO",
    "top_detections",
    "SwinTransformer",
    "BertEncoder",
    "subsentence_masks",
    "WordPieceTokenizer",
]
