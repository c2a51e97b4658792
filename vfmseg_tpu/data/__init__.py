from vfmseg_tpu.data.datasets import (
    DGDataset,
    SegDataset,
    UDADataset,
    rcs_class_probs,
)
from vfmseg_tpu.data.loader import InfiniteLoader, collate
from vfmseg_tpu.data.synthetic import SyntheticDataset, synthetic_sample
from vfmseg_tpu.data.transforms import (
    IGNORE_INDEX,
    TestPipeline,
    TrainPipeline,
    normalize_pad,
    photometric_distortion,
    random_crop,
    random_flip,
    resize_sample,
)

__all__ = [
    "DGDataset",
    "SegDataset",
    "UDADataset",
    "rcs_class_probs",
    "InfiniteLoader",
    "collate",
    "SyntheticDataset",
    "synthetic_sample",
    "IGNORE_INDEX",
    "TestPipeline",
    "TrainPipeline",
    "normalize_pad",
    "photometric_distortion",
    "random_crop",
    "random_flip",
    "resize_sample",
]
