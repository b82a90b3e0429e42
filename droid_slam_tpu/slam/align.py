"""Trajectory fragment alignment (scale + SE3 geometric mean).

Parity with /root/reference/droid_slam/align.py:3-24: least-squares relative
scale from pairwise translation magnitudes, then a 3-iteration SE3 mean of
the residual transforms.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lie import se3


def align_pose_fragments(pose0, pose1):
    """Returns (dG [1,7], s) such that pose1 ≈ dG ∘ (s * pose0)."""
    P0 = jnp.asarray(pose0)
    P1 = jnp.asarray(pose1)

    dP1 = se3.mul(se3.inv(P0[None, :]), P0[:, None])
    dP2 = se3.mul(se3.inv(P1[None, :]), P1[:, None])

    dt1 = dP1[..., :3].reshape(-1, 3)
    dt2 = dP2[..., :3].reshape(-1, 3)
    s = jnp.sum(dt1 * dt2) / jnp.maximum(jnp.sum(dt1 * dt1), 1e-12)

    P0s = P0.at[..., :3].multiply(s)

    dP = se3.mul(P1, se3.inv(P0s))
    dG = dP[:1]
    for _ in range(3):
        e = se3.log(se3.mul(P1, se3.inv(se3.mul(dG, P0s))))
        dG = se3.mul(se3.exp(jnp.mean(e, axis=0, keepdims=True)), dG)
    return dG, s
