"""Configuration surface: every knob of the reference's argparse CLIs
(SURVEY.md §2.4) as a dataclass, plus the tuned per-dataset presets."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class DroidConfig:
    # capacity / resolution
    buffer: int = 512
    image_size: Tuple[int, int] = (240, 320)
    stereo: bool = False
    depth: bool = False
    upsample: bool = False

    # motion filter
    filter_thresh: float = 2.4

    # frontend (droid_frontend.py + demo.py:81-108 defaults)
    beta: float = 0.3
    warmup: int = 8
    keyframe_thresh: float = 4.0
    frontend_thresh: float = 16.0
    frontend_window: int = 25
    frontend_radius: int = 2
    frontend_nms: int = 1
    motion_damping: float = 0.0

    # backend
    backend_thresh: float = 22.0
    backend_radius: int = 2
    backend_nms: int = 3

    # edge-parallel frontend (parallel/frontend.py): shard the update
    # operator's edge dimension over this many devices (0 = serial).
    # Uses the classic per-call dispatch path (not the A/B speculative
    # frame split, which is a single-chip tunnel-latency optimization).
    edge_parallel: int = 0

    # visualization / io
    enable_vis: bool = False
    weights: Optional[str] = None
    t0: int = 0
    stride: int = 1
    asynchronous: bool = False
    reconstruction_path: Optional[str] = None


# per-dataset tuned defaults (SURVEY.md §2.4 table; the eval scripts'
# argparse defaults ARE the tuned hyperparameters)
PRESETS = {
    "demo": DroidConfig(),
    "tartanair": DroidConfig(
        buffer=1000, image_size=(384, 512), beta=0.3, filter_thresh=2.5,
        warmup=12, keyframe_thresh=3.0, frontend_thresh=15.0,
        frontend_window=20, frontend_radius=1, frontend_nms=1,
        backend_thresh=20.0, backend_radius=2, backend_nms=3,
        motion_damping=0.5),
    "euroc": DroidConfig(
        buffer=512, image_size=(320, 512), beta=0.3, filter_thresh=2.4,
        warmup=15, keyframe_thresh=3.0, frontend_thresh=17.5,
        frontend_window=20, frontend_radius=2, frontend_nms=1,
        backend_thresh=24.0, backend_radius=2, backend_nms=2),
    "tum": DroidConfig(
        buffer=512, image_size=(240, 320), beta=0.3, filter_thresh=1.5,
        warmup=12, keyframe_thresh=2.0, frontend_thresh=12.0,
        frontend_window=25, frontend_radius=2, frontend_nms=1,
        backend_thresh=20.0, backend_radius=2, backend_nms=3,
        motion_damping=0.5),
    # eth3d: the reference argparse default is [240,320] but the stream
    # ignores it and resizes every sequence to ~sqrt(384*512) area
    # (test_eth3d.py:36-41); evaluation_scripts/test_eth3d.py here does the
    # same, overriding image_size per sequence.
    "eth3d": DroidConfig(
        buffer=1024, beta=0.5, filter_thresh=2.0, warmup=8,
        keyframe_thresh=3.5, frontend_thresh=16.0, frontend_window=20,
        frontend_radius=2, frontend_nms=1, backend_thresh=22.0,
        backend_radius=2, backend_nms=3, motion_damping=0.5),
}

STEREO_SCALE_FACTOR = 2.5  # test_tartanair.py:22,122
EUROC_SCALE_FACTOR = 1.10  # test_euroc.py:142-143
