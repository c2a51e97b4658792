from vfmseg_tpu.eval.metrics import IoUAccumulator, intersect_and_union
from vfmseg_tpu.eval.slide import (
    compute_slide_grid,
    ms_slide_inference,
    slide_inference,
    whole_inference,
)

__all__ = [
    "IoUAccumulator",
    "intersect_and_union",
    "compute_slide_grid",
    "ms_slide_inference",
    "slide_inference",
    "whole_inference",
]
