"""Bundle adjustment: shared edge linearization, training-time dense BA,
inference-time windowed BA, damped Cholesky solver."""

from . import dense, edge_terms, inference, solver

__all__ = ["dense", "edge_terms", "inference", "solver"]
