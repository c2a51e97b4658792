from vfmseg_tpu.models.backbones.adapters import LoRASpec, ReinsSpec, Reins, LoRADense
from vfmseg_tpu.models.backbones.vit import ViTConfig, VisionTransformer
from vfmseg_tpu.models.backbones.dinov2 import (
    build_dinov2,
    build_lora_backbone,
    dinov2_large,
    dinov2_tiny_for_tests,
)
from vfmseg_tpu.models.backbones.eva02 import (
    build_eva02,
    eva02_large,
    eva02_tiny_for_tests,
)
from vfmseg_tpu.models.backbones.clip import (
    ClipFPN,
    build_clip,
    clip_large,
    clip_tiny_for_tests,
    normalize_lora_targets,
)
from vfmseg_tpu.models.backbones.sam import (
    build_sam,
    sam_tiny_for_tests,
    sam_vit_h,
)
from vfmseg_tpu.models.backbones.mit import MixVisionTransformer, build_mit
from vfmseg_tpu.models.backbones.resnet import ResNetV1c, build_reins_resnet
from vfmseg_tpu.models.backbones.rein_backbones import (
    build_reins_clip,
    build_reins_dinov2,
    build_reins_eva02,
    build_reins_sam,
    reins_spec_from_config,
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
