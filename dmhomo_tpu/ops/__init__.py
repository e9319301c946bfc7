"""TPU-tuned hot ops (XLA block-diagonal attention + reference Pallas kernel)."""

from dmhomo_tpu.ops.linear_attention import (
    blockdiag_linear_attention,
    fused_linear_attention,
    pallas_linear_attention,
)

__all__ = [
    "blockdiag_linear_attention",
    "fused_linear_attention",
    "pallas_linear_attention",
]
