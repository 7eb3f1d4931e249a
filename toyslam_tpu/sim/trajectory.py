"""Scripted robot motion and noisy odometry.

The reference drives the robot through a piecewise-constant control schedule
keyed on the pose counter (python/slam_main.py:104-123) and corrupts each
step's transform with additive Gaussian noise on (dx, dy, dtheta)
(slam_main.py:137-142).  Vectorized here: the whole control tape is built up
front and both the ground-truth and dead-reckoned trajectories are one
``lax.scan`` (associative compose — could be a parallel scan; trajectories
are tiny next to optimization, so a plain scan is fine).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from toyslam_tpu.config import NoiseConfig
from toyslam_tpu.ops import se2

# (pose-id upper bound, forward step, turn degrees) — slam_main.py:104-123.
_SCHEDULE = [
    (10, 2.0, 3.0),
    (20, 0.9, 6.0),
    (40, 0.9, -6.0),
    (60, 0.8, 5.0),
    (10**9, 0.7, 3.0),
]


def scripted_controls(num_steps: int) -> np.ndarray:
    """``[num_steps, 3]`` relative motions (dx, dy=0, dtheta) for steps taken
    at pose ids ``0 .. num_steps-1``."""
    out = np.zeros((num_steps, 3), np.float32)
    for k in range(num_steps):
        for bound, dx, deg in _SCHEDULE:
            if k < bound:
                out[k] = (dx, 0.0, math.radians(deg))
                break
    return out


def integrate(start: jax.Array, controls: jax.Array) -> jax.Array:
    """Compose a control tape into a trajectory: ``[T+1, 3]`` poses."""

    def step(carry, u):
        nxt = se2.compose(carry, u)
        return nxt, nxt

    _, rest = jax.lax.scan(step, start, controls)
    return jnp.concatenate([start[None, :], rest], axis=0)


def noisy_controls(
    key: jax.Array, controls: jax.Array, noise: NoiseConfig
) -> jax.Array:
    """Additive Gaussian noise on each control's (dx, dy, dtheta).

    Matches the reference's corruption of the transform in its own frame
    (slam_main.py:137-142), including the variance-as-std quirk when
    ``noise.variance_as_std`` is set (see NoiseConfig).
    """
    _, pos_scale, ang_scale = noise.sample_scales()
    scales = jnp.asarray([pos_scale, pos_scale, ang_scale], controls.dtype)
    eps = jax.random.normal(key, controls.shape, controls.dtype) * scales
    out = controls + eps
    return out.at[:, 2].set(se2.wrap_angle(out[:, 2]))
