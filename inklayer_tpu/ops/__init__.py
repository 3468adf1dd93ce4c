from inklayer_tpu.ops.attention import attention, flash_attention, sdpa

__all__ = ["attention", "flash_attention", "sdpa"]
