"""Device mesh + sharding rules.

The reference's only distributed strategy is NCCL DDP (SURVEY §2.10, §5.8).
TPU-native replacement: a `jax.sharding.Mesh` with a `data` axis (batch/crop
sharding over ICI) and an optional `model` axis for tensor parallelism of the
ViT (qkv/proj/mlp kernels sharded over heads/hidden), left available per
SURVEY §2.10's implication. Gradients all-reduce automatically under jit;
BatchNorm stats reduce over the global batch (SyncBN equivalence).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flax.traverse_util import flatten_dict, unflatten_dict


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(f"mesh {data}x{model} != {len(devices)} devices")
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / crop) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules for ViT param paths (regex -> PartitionSpec).
# qkv output dim splits by head; proj contracts the head dim; MLP splits the
# hidden dim. Everything else replicates.
_TP_RULES = (
    (re.compile(r".*attn/qkv/kernel$"), P(None, "model")),
    (re.compile(r".*attn/qkv/bias$"), P("model")),
    (re.compile(r".*attn/proj/kernel$"), P("model", None)),
    (re.compile(r".*mlp/fc1/kernel$"), P(None, "model")),
    (re.compile(r".*mlp/fc1/bias$"), P("model")),
    (re.compile(r".*mlp/fc2/kernel$"), P("model", None)),
    (re.compile(r".*mlp/w12/kernel$"), P(None, "model")),
    (re.compile(r".*mlp/w3/kernel$"), P("model", None)),
)


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = True):
    """NamedSharding tree for a param tree: TP rules on the model axis where
    they apply (and divide evenly), replicated otherwise."""
    model_size = mesh.shape.get("model", 1)
    flat = flatten_dict(params)
    out = {}
    for key, leaf in flat.items():
        path = "/".join(key)
        spec = P()
        if tensor_parallel and model_size > 1:
            for pat, candidate in _TP_RULES:
                if pat.match(path):
                    axis = list(candidate).index("model")
                    if leaf.shape[axis] % model_size == 0:
                        spec = candidate
                    break
        out[key] = NamedSharding(mesh, spec)
    return unflatten_dict(out)
