"""Evaluation: ATE/RPE/KITTI metrics, reconstruction visualization."""

from . import ate, kitti

__all__ = ["ate", "kitti"]
