"""Network family: encoders, ConvGRU update operator, DroidNet forward,
checkpoint interop."""

from . import droidnet, layers, nets, weights

__all__ = ["droidnet", "layers", "nets", "weights"]
