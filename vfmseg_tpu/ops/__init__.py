from vfmseg_tpu.ops.attention import multi_head_attention, xla_attention
from vfmseg_tpu.ops.resize import resize, nearest_downsample_2x

__all__ = [
    "multi_head_attention",
    "xla_attention",
    "resize",
    "nearest_downsample_2x",
]
