"""Pure-JAX Lie groups (SE3 / Sim3) — TPU replacement for lietorch."""

from . import se3, sim3

__all__ = ["se3", "sim3"]
