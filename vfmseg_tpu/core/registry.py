"""Minimal string-keyed component registry.

Replaces the mmengine MODELS/DATASETS registries the reference relies on
(components registered via ``@register_module()`` and built from config
``type=`` strings; see reference rein/__init__.py:1-6). Here a registry maps
a name to a *builder callable* (usually a flax module class or a factory).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._registry: Dict[str, Callable] = {}

    def register(self, name: Optional[str] = None, *, force: bool = False):
        """Decorator: register a class/function under `name` (default: its __name__)."""

        def _do_register(obj):
            key = name or obj.__name__
            if not force and key in self._registry:
                raise KeyError(f"{key!r} already registered in {self.name}")
            self._registry[key] = obj
            return obj

        return _do_register

    def get(self, key: str) -> Callable:
        if key not in self._registry:
            raise KeyError(
                f"{key!r} not found in registry {self.name!r}. "
                f"Available: {sorted(self._registry)}"
            )
        return self._registry[key]

    def build(self, cfg: Dict[str, Any], **extra):
        """Build a component from a dict with a `type` key (reference config idiom)."""
        if "type" not in cfg:
            raise KeyError(f"config for {self.name} registry has no 'type': {cfg}")
        cfg = dict(cfg)
        kind = cfg.pop("type")
        builder = self.get(kind)
        cfg.update(extra)
        return builder(**cfg)

    def __contains__(self, key: str) -> bool:
        return key in self._registry

    def keys(self):
        return self._registry.keys()


MODELS = Registry("models")
DATASETS = Registry("datasets")
