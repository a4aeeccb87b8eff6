"""Completion masks over flat pose vectors (ref ``lib/utils/misc.py:27-55``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..body_model.part_indices import BodyPartIndices
from ..data.amass import N_POSES


def part_mask_indices(part: str, rot_n: int) -> np.ndarray:
    """Flat-dim indices masked out (to be completed) for a body part."""
    joints = np.asarray(getattr(BodyPartIndices, part))
    return (joints[:, None] * rot_n + np.arange(rot_n)[None, :]).reshape(-1)


def create_mask(key: jax.Array, body_poses: jnp.ndarray, part: str = "legs",
                observation_type: str = "noise",
                mean_observation: jnp.ndarray | None = None):
    """Build (mask, observation) for completion.

    mask==1 marks *observed* dims; masked (to-complete) dims of the
    observation are filled with N(0,1) noise or a supplied mean pose
    (ref misc.py:27-55). Functional: noise comes from ``key``.
    """
    assert body_poses.ndim == 2 and body_poses.shape[1] % N_POSES == 0
    rot_n = body_poses.shape[1] // N_POSES
    assert rot_n in (3, 6)
    idx = part_mask_indices(part, rot_n)

    mask = jnp.ones_like(body_poses).at[:, idx].set(0.0)
    observation = body_poses
    if observation_type == "noise":
        fill = jax.random.normal(key, (body_poses.shape[0], len(idx)), body_poses.dtype)
    elif observation_type == "mean":
        if mean_observation is None:
            raise ValueError("mean_observation required for observation_type='mean'")
        fill = jnp.broadcast_to(mean_observation[idx], (body_poses.shape[0], len(idx)))
    else:
        raise NotImplementedError(observation_type)
    observation = observation.at[:, idx].set(fill)
    return mask, observation
