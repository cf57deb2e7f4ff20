"""TPU compute ops: additive attention masks, attention cores (XLA + Pallas)."""

from spmm_tpu.ops.masks import (
    MASK_VALUE,
    extend_attention_mask,
    extend_causal_mask,
    invert_encoder_mask,
)
from spmm_tpu.ops.attention import multi_head_attention

__all__ = [
    "MASK_VALUE",
    "extend_attention_mask",
    "extend_causal_mask",
    "invert_encoder_mask",
    "multi_head_attention",
]
