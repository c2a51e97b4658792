from vfmseg_tpu.models.segmentors.encoder_decoder import EncoderDecoder
from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor

__all__ = ["EncoderDecoder", "MsVFMSegmentor"]
