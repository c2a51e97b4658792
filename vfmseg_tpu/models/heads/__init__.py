from vfmseg_tpu.models.heads.linear_head import LinearHead
from vfmseg_tpu.models.heads.transformer import (
    BasicTransformerBlock,
    CrossAttention,
    TransformerDecoder,
)
from vfmseg_tpu.models.heads.vfm_head import VFMHead

__all__ = [
    "LinearHead",
    "BasicTransformerBlock",
    "CrossAttention",
    "TransformerDecoder",
    "VFMHead",
]
