"""Correlation ops: volume pyramid + window lookup (XLA formulations and the
Pallas kernel)."""

from . import corr

__all__ = ["corr"]
