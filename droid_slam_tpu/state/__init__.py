"""SLAM state: padded DepthVideo + slot-stable FactorGraph."""

from .graph import FactorGraph
from .video import DepthVideo

__all__ = ["DepthVideo", "FactorGraph"]
