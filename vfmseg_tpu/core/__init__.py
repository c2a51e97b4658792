from vfmseg_tpu.core.registry import Registry, MODELS, DATASETS
from vfmseg_tpu.core.config import Config, load_config

__all__ = ["Registry", "MODELS", "DATASETS", "Config", "load_config"]
