from vfmseg_tpu.eval.compact import CompactMsSlide
from vfmseg_tpu.eval.evaluator import make_predict_fn
from vfmseg_tpu.eval.metrics import IoUAccumulator, intersect_and_union
from vfmseg_tpu.eval.tta import tta_logits
from vfmseg_tpu.eval.slide import (
    compute_slide_grid,
    ms_slide_inference,
    slide_inference,
    whole_inference,
)

__all__ = [
    "CompactMsSlide",
    "make_predict_fn",
    "tta_logits",
    "IoUAccumulator",
    "intersect_and_union",
    "compute_slide_grid",
    "ms_slide_inference",
    "slide_inference",
    "whole_inference",
]
