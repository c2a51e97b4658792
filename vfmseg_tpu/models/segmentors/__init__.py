from vfmseg_tpu.models.segmentors.encoder_decoder import EncoderDecoder
from vfmseg_tpu.models.segmentors.hrda import HRDAEncoderDecoder, HRDAHead
from vfmseg_tpu.models.segmentors.maskformer import MaskFormerSegmentor
from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor
from vfmseg_tpu.models.segmentors.multiscale import MultiScaleEncoderDecoder

__all__ = [
    "EncoderDecoder",
    "HRDAEncoderDecoder",
    "HRDAHead",
    "MaskFormerSegmentor",
    "MsVFMSegmentor",
    "MultiScaleEncoderDecoder",
]
