"""SLAM orchestration: motion filter, frontend, backend, trajectory filler,
Droid facade."""

from .droid import Droid  # noqa: F401
