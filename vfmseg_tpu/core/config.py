"""Layered config system.

Replaces mmengine ``Config.fromfile`` ergonomics (reference tools/train.py:68,
configs/_base_ inheritance, CLI ``--cfg-options`` dot-key merge at
tools/train.py:36-46) with plain Python:

  * a config is a nested :class:`Config` (dict with attribute access)
  * config *files* are Python modules under ``configs/`` exposing either a
    module-level ``config`` dict or a ``get_config()`` function
  * ``_base_`` entries (list of file paths relative to the config file) are
    deep-merged in order, then the file's own keys override them
  * CLI overrides use dot keys: ``optimizer.lr=3e-4`` (values parsed as
    Python literals when possible)
"""

from __future__ import annotations

import ast
import copy
import importlib.util
import os
from typing import Any, Dict, Iterable, List


class Config(dict):
    """dict with attribute access and recursive wrapping."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            self[k] = _wrap(v)

    def __getattr__(self, key: str):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value):
        self[key] = _wrap(value)

    def __setitem__(self, key, value):
        super().__setitem__(key, _wrap(value))

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> Dict[str, Any]:
        return {k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()}

    def get_path(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, dotted: str, value):
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = value


def _wrap(value):
    if isinstance(value, Config):
        return value
    if isinstance(value, dict):
        return Config(value)
    if isinstance(value, (list, tuple)):
        return type(value)(_wrap(v) for v in value)
    return value


def deep_merge(base: Dict, override: Dict) -> Config:
    """Recursively merge `override` into a copy of `base` (override wins).

    Matches mmengine merge semantics: dicts merge recursively, any other type
    (including lists) replaces wholesale. A ``{"_delete_": True}`` marker in an
    override dict discards the base value first.
    """
    out = Config(copy.deepcopy(dict(base)))
    for k, v in override.items():
        if isinstance(v, dict) and v.get("_delete_"):
            v = {kk: vv for kk, vv in v.items() if kk != "_delete_"}
            out[k] = Config(copy.deepcopy(v))
        elif k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _load_module(path: str):
    spec = importlib.util.spec_from_file_location(
        "_vfmseg_cfg_" + os.path.basename(path).replace(".", "_"), path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # type: ignore[union-attr]
    return mod


# Default search root for bare config names ("dg_lora_dinov2_ms_masked").
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CONFIG_DIRS = [os.path.join(_REPO_ROOT, "configs")]


def _resolve(name_or_path: str, relative_to: str | None = None) -> str:
    if os.path.isfile(name_or_path):
        return os.path.abspath(name_or_path)
    candidates: List[str] = []
    if relative_to is not None:
        candidates.append(os.path.join(os.path.dirname(relative_to), name_or_path))
    for d in CONFIG_DIRS:
        candidates.append(os.path.join(d, name_or_path))
        candidates.append(os.path.join(d, name_or_path + ".py"))
        # allow bare names to match anywhere under configs/
        for root, _dirs, files in os.walk(d):
            if name_or_path + ".py" in files:
                candidates.append(os.path.join(root, name_or_path + ".py"))
    for c in candidates:
        if os.path.isfile(c):
            return os.path.abspath(c)
    raise FileNotFoundError(f"config {name_or_path!r} not found (tried {candidates})")


def load_config(name_or_path: str, overrides: Iterable[str] = ()) -> Config:
    """Load a config file, resolving `_base_` inheritance and CLI overrides."""
    path = _resolve(name_or_path)
    cfg = _load_file(path)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} must look like key.path=value")
        key, raw = item.split("=", 1)
        cfg.set_path(key.strip(), parse_value(raw.strip()))
    if "name" not in cfg:
        cfg["name"] = os.path.splitext(os.path.basename(path))[0]
    return cfg


def _load_file(path: str) -> Config:
    mod = _load_module(path)
    if hasattr(mod, "get_config"):
        own = mod.get_config()
    elif hasattr(mod, "config"):
        own = mod.config
    else:
        # fall back: every public module-level variable is a config key
        own = {
            k: v
            for k, v in vars(mod).items()
            if not k.startswith("_") and not callable(v) and not isinstance(v, type(os))
        }
    own = Config(copy.deepcopy(dict(own)))
    bases = own.pop("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    merged = Config()
    for b in bases:
        merged = deep_merge(merged, _load_file(_resolve(b, relative_to=path)))
    return deep_merge(merged, own)


def parse_value(raw: str):
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw
