from vfmseg_tpu.models.heads.linear_head import LinearHead
from vfmseg_tpu.models.heads.transformer import (
    BasicTransformerBlock,
    CrossAttention,
    TransformerDecoder,
)
from vfmseg_tpu.models.heads.vfm_head import VFMHead
from vfmseg_tpu.models.heads.attention_head import AttentionHead
from vfmseg_tpu.models.heads.daformer import ASPPModule, DAFormerHead
from vfmseg_tpu.models.heads.dino_head import DINOHead
from vfmseg_tpu.models.heads.mask2former import (
    Mask2FormerHead,
    MSDeformAttnPixelDecoder,
    semantic_inference,
)
from vfmseg_tpu.models.heads.segformer import SegformerHead

__all__ = [
    "LinearHead",
    "BasicTransformerBlock",
    "CrossAttention",
    "TransformerDecoder",
    "VFMHead",
    "AttentionHead",
    "ASPPModule",
    "DAFormerHead",
    "DINOHead",
    "Mask2FormerHead",
    "MSDeformAttnPixelDecoder",
    "semantic_inference",
    "SegformerHead",
]
