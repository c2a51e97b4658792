from vfmseg_tpu.models.backbones.adapters import LoRASpec, ReinsSpec, Reins, LoRADense
from vfmseg_tpu.models.backbones.vit import ViTConfig, VisionTransformer
from vfmseg_tpu.models.backbones.dinov2 import (
    build_dinov2,
    build_lora_backbone,
    dinov2_large,
    dinov2_tiny_for_tests,
)

__all__ = [
    "LoRASpec",
    "ReinsSpec",
    "Reins",
    "LoRADense",
    "ViTConfig",
    "VisionTransformer",
    "build_dinov2",
    "build_lora_backbone",
    "dinov2_large",
    "dinov2_tiny_for_tests",
]
