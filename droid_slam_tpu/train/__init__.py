"""Training: losses, data-parallel trainer, logging."""

from . import losses, trainer

__all__ = ["losses", "trainer"]
