"""Projective geometry + frame-distance ops (pure JAX)."""

from . import distance, projective

__all__ = ["projective", "distance"]
