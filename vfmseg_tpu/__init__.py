"""vfmseg_tpu — a TPU-native domain-generalized semantic segmentation framework.

A ground-up JAX/flax/optax/Pallas rebuild of the capabilities of the VFMSeg
(DGVFM) reference stack: vision-foundation-model backbones (DINOv2, EVA02,
CLIP, SAM) with parameter-efficient adapters (LoRA, Rein), lightweight
segmentation heads, two-scale masked-context training and two-stage
coarse-to-fine sliding-window inference, evaluated with per-dataset mIoU.

Design principles (TPU-first, not a port):
  * functional jitted train/eval steps — no mutable module state
  * static shapes everywhere; sliding windows are batched tensor ops
  * Pallas flash-attention kernels on the hot path, XLA elsewhere
  * `jax.sharding.Mesh` + NamedSharding for data/model parallelism
"""

__version__ = "0.2.0"

from vfmseg_tpu.core.registry import Registry, MODELS, DATASETS  # noqa: F401
