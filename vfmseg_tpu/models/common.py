"""Shared model helpers."""

from __future__ import annotations


def gn_groups(channels: int, preferred: int = 32) -> int:
    """GroupNorm group count: the reference always uses 32 groups (channels
    are multiples of 32 in all real configs); for small test widths fall back
    to the largest divisor of `channels` that is <= preferred."""
    g = min(preferred, channels)
    while channels % g:
        g -= 1
    return g
