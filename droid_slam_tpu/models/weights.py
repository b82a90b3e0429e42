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
    if path.endswith(".pkl"):
        return load_train_state(path)[0]
    return load_torch_checkpoint(path, dtype)


def save_train_state(path: str, params, opt_state, step: int) -> None:
    """Full resumable training state (params + optimizer pytree + step).

    Written atomically (tmp + rename) so a crash mid-write — e.g. the
    training process dying on a lost TPU tunnel — never corrupts the last
    good checkpoint."""
    import os
    import pickle

    import jax

    payload = {
        "params": {k: np.asarray(v) for k, v in params.items()},
        "opt_state": jax.tree.map(np.asarray, opt_state),
        "step": int(step),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_train_state(path: str):
    """Returns (params, opt_state, step) saved by `save_train_state`."""
    import pickle

    import jax

    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = {k: jnp.asarray(v) for k, v in payload["params"].items()}
    opt_state = jax.tree.map(jnp.asarray, payload["opt_state"])
    return params, opt_state, payload["step"]
