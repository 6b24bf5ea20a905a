from .attention import fused_attention, reference_attention

__all__ = ["fused_attention", "reference_attention"]
