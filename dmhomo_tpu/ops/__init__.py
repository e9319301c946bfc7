"""Pallas TPU kernels for the hot ops."""

from dmhomo_tpu.ops.linear_attention import fused_linear_attention

__all__ = ["fused_linear_attention"]
