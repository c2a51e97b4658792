from vfmseg_tpu.models import backbones, heads, segmentors  # noqa: F401
from vfmseg_tpu.models.losses import cross_entropy_loss, seg_accuracy

__all__ = ["backbones", "heads", "segmentors", "cross_entropy_loss", "seg_accuracy"]
