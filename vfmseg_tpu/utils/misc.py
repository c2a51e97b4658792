"""Small utilities shared across the framework."""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Mapping

import jax


def add_prefix(inputs: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Prefix every key of a loss/metric dict (reference rein/utils/misc.py:4-20)."""
    return {f"{prefix}.{k}": v for k, v in inputs.items()}


def flatten_tree_paths(tree) -> Dict[str, Any]:
    """Flatten a pytree into {'a/b/c': leaf} using dict-key path strings."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_part(p) for p in path)
        flat[key] = leaf
    return flat


def _path_part(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def path_matches(path: str, keywords: Iterable[str]) -> bool:
    """True if any keyword is a substring of the path (reference freezing
    semantics: rein/models/backbones/utils.py:9-32 matches by substring)."""
    return any(k in path for k in keywords)


def tree_map_with_path_str(fn: Callable[[str, Any], Any], tree):
    """Map fn(path_string, leaf) over a pytree preserving structure."""

    def _fn(path, leaf):
        key = "/".join(_path_part(p) for p in path)
        return fn(key, leaf)

    return jax.tree_util.tree_map_with_path(_fn, tree)
