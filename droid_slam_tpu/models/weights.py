"""Checkpoint interop: load the reference's droid.pth into our param dict.

Reproduces the loading surgery of /root/reference/droid_slam/droid.py:45-59:
``module.`` prefix stripping and slicing the update weight/delta heads from 3
to 2 output channels. Conv tensors are transposed OIHW -> HWIO for NHWC
convolutions. Also supports saving/loading native .npz checkpoints.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_HEAD_SLICE = ("update.weight.2", "update.delta.2")


def load_torch_checkpoint(path: str, dtype=jnp.float32) -> dict:
    """Load a torch droid.pth (CPU) into a flat JAX param dict."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    state = {k.replace("module.", ""): v for k, v in state.items()}

    for head in _HEAD_SLICE:  # droid.py:53-56
        if head + ".weight" in state and state[head + ".weight"].shape[0] == 3:
            state[head + ".weight"] = state[head + ".weight"][:2]
            state[head + ".bias"] = state[head + ".bias"][:2]

    params = {}
    for k, v in state.items():
        arr = v.numpy()
        if arr.ndim == 4:  # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        params[k] = jnp.asarray(arr, dtype)
    return params


def save_npz(path: str, params: dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_npz(path: str, dtype=jnp.float32) -> dict:
    data = np.load(path)
    return {k: jnp.asarray(data[k], dtype) for k in data.files}


def load(path: str, dtype=jnp.float32) -> dict:
    if path.endswith(".npz"):
        return load_npz(path, dtype)
    return load_torch_checkpoint(path, dtype)
