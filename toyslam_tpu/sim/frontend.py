"""SLAM frontend: run the simulated robot and build the factor graph.

Replaces the reference's per-frame ``step()`` accumulation into ``Graph2d``
and its later conversion to the optimization graph
(python/slam_main.py:99-187, python/slam/slam_helper.py:4-19): the simulation
(trajectory integration, all scans, all noise) runs as fused JAX computations
up front; the host then assembles the structs-of-arrays graph in one pass.

Noise semantics matched to the reference:

* odometry: additive Gaussian on each step transform's (dx, dy, dtheta)
  (slam_main.py:137-142);
* landmarks: noise is added to the *body-frame euclidean* point, which is
  then re-encoded as (range, bearing) for the measurement and pushed through
  the *dead-reckoned* (noisy) pose for the landmark's first-seen global
  estimate (slam_helper.py:4-16);
* the first pose is gauge-fixed (slam_main.py:87: ``is_fixed=True``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from toyslam_tpu.config import SimConfig, SlamConfig
from toyslam_tpu.models.graph import FactorGraph2D, GraphBuilder2D
from toyslam_tpu.ops import se2
from toyslam_tpu.sim import environment as env_mod
from toyslam_tpu.sim import lidar, trajectory


class SimulationResult(NamedTuple):
    poses_gt: jax.Array    # f32[T,3] ground-truth trajectory
    poses_dr: jax.Array    # f32[T,3] dead-reckoned (noisy odometry) trajectory
    odom_gt: jax.Array     # f32[T-1,3] scripted controls
    odom_meas: jax.Array   # f32[T-1,3] noisy odometry measurements
    meas: jax.Array        # f32[T,R,2] noisy (range, bearing) per ray
    meas_gt: jax.Array     # f32[T,R,2] noise-free measurements
    lm_global: jax.Array   # f32[T,R,2] first-seen candidate world estimates
    ids: jax.Array         # i32[T,R] ground-truth obstacle id (-1 invalid)
    valid: jax.Array       # bool[T,R]
    env: jax.Array         # f32[P,2]
    radius: float


@functools.partial(jax.jit, static_argnames=("ray_count", "num_steps"))
def _simulate_core(
    key: jax.Array,
    start: jax.Array,
    controls: jax.Array,
    env: jax.Array,
    radius: float,
    fov: float,
    ray_count: int,
    lidar_scale: float,
    pos_scale: float,
    ang_scale: float,
    num_steps: int,
):
    poses_gt = trajectory.integrate(start, controls)

    meas_gt, ids, valid = lidar.scan_trajectory(
        poses_gt, env, radius, fov, ray_count
    )

    k_odom, k_lm = jax.random.split(key)
    scales = jnp.asarray([pos_scale, pos_scale, ang_scale], controls.dtype)
    odom_meas = controls + jax.random.normal(
        k_odom, controls.shape, controls.dtype
    ) * scales
    odom_meas = odom_meas.at[:, 2].set(se2.wrap_angle(odom_meas[:, 2]))
    poses_dr = trajectory.integrate(start, odom_meas)

    local = se2.radial_to_euclidean(meas_gt)                 # [T,R,2]
    local = local + jax.random.normal(k_lm, local.shape) * lidar_scale
    meas = se2.euclidean_to_radial(local)
    lm_global = se2.transform_point(poses_dr[:, None, :], local)
    return poses_gt, poses_dr, odom_meas, meas, meas_gt, lm_global, ids, valid


def simulate(
    config: SimConfig, key: Optional[jax.Array] = None
) -> SimulationResult:
    if key is None:
        key = jax.random.PRNGKey(config.seed)
    env, radius = env_mod.load_environment()
    env = jnp.asarray(env)
    controls = jnp.asarray(
        trajectory.scripted_controls(config.robot_steps - 1)
    )
    start = jnp.asarray(
        [config.start_xy[0], config.start_xy[1], config.start_theta],
        jnp.float32,
    )
    lidar_scale, pos_scale, ang_scale = config.noise.sample_scales()
    (
        poses_gt,
        poses_dr,
        odom_meas,
        meas,
        meas_gt,
        lm_global,
        ids,
        valid,
    ) = _simulate_core(
        key,
        start,
        controls,
        env,
        radius,
        config.lidar.fov,
        config.lidar.ray_count,
        lidar_scale,
        pos_scale,
        ang_scale,
        config.robot_steps,
    )
    return SimulationResult(
        poses_gt=poses_gt,
        poses_dr=poses_dr,
        odom_gt=controls,
        odom_meas=odom_meas,
        meas=meas,
        meas_gt=meas_gt,
        lm_global=lm_global,
        ids=ids,
        valid=valid,
        env=env,
        radius=radius,
    )


def build_graph(
    sim: SimulationResult,
    config: SlamConfig,
) -> tuple[FactorGraph2D, dict[int, int]]:
    """Assemble the optimization problem from a simulation run.

    Mirrors construct_optimizer_graph (slam_main.py:157-187): pose vertices
    are the dead-reckoned states, odometry edges carry the noisy step
    transforms with the odometry information matrix, landmark edges carry the
    noisy (range, bearing) measurements with the LiDAR information matrix,
    and landmark vertices are initialized at their first-seen global
    estimate.  Returns the graph and the obstacle-id -> landmark-index map.
    """
    noise = config.sim.noise
    odom_info = np.diag(noise.odom_information_diag()).astype(np.float32)
    lm_info = np.diag(noise.lidar_information_diag()).astype(np.float32)

    poses_dr = np.asarray(sim.poses_dr)
    odom_meas = np.asarray(sim.odom_meas)
    meas = np.asarray(sim.meas)
    lm_global = np.asarray(sim.lm_global)
    ids = np.asarray(sim.ids)
    valid = np.asarray(sim.valid)

    b = GraphBuilder2D(
        pose_bucket=config.pose_bucket,
        landmark_bucket=config.landmark_bucket,
        edge_bucket=config.edge_bucket,
    )
    T = poses_dr.shape[0]
    for t in range(T):
        b.add_pose(poses_dr[t], fixed=(t == 0))
    for t in range(T - 1):
        b.add_odom_edge(t, t + 1, odom_meas[t], odom_info)
    for t in range(T):
        for r in np.nonzero(valid[t])[0]:
            oid = int(ids[t, r])
            b.add_landmark(oid, lm_global[t, r])  # first-seen estimate wins
            b.add_landmark_edge(t, oid, meas[t, r], lm_info)
    return b.build(), b.landmark_id_map


def ate_rmse(poses_est: np.ndarray, poses_gt: np.ndarray) -> float:
    """Absolute trajectory error (RMSE over xy), the headline metric."""
    d = np.asarray(poses_est)[:, :2] - np.asarray(poses_gt)[:, :2]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))
