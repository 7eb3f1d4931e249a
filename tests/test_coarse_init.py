"""Initialization for large graphs (optimizer/coarse_init.py):
decimation consistency + the incremental prefix sweep's basin property."""

import numpy as np
import pytest

from toyslam_tpu.config import NoiseConfig, OptimizerConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.optimizer.coarse_init import (
    coarse_to_fine_init, decimate, incremental_init, prolong,
)
from toyslam_tpu.sim import frontend, synthetic


def _zero_noise():
    # exact sensors: DR == GT, so decimation must be residual-free; the
    # absurd information scale (1/std^2) is neutralized by evaluating
    # with identity information below
    return NoiseConfig(lidar_std=1e-9, position_std=1e-9,
                       orientation_std=1e-9, variance_as_std=False)


def test_decimate_consistent_at_ground_truth():
    """With zero sensor noise the trajectory IS ground truth; the
    decimated problem evaluated at the decimated state must be (near)
    zero-residual — i.e. re-targeting observations through the DR
    relative pose is exact when odometry is exact."""
    import jax

    from toyslam_tpu.ops import assemble

    graph, gt, _ = synthetic.make_large_problem(
        num_poses=512, num_landmarks=256, obs_per_pose=4, seed=3,
        noise=_zero_noise(),
    )
    coarse, rel_dr = decimate(graph, factor=8)
    # residual consistency independent of the (huge) information scale:
    # identity-information chi^2 per edge ~ squared residual in units^2
    import dataclasses

    eye2 = np.broadcast_to(
        np.eye(2, dtype=np.float32), coarse.lm_edges.info.shape
    ).copy()
    eye3 = np.broadcast_to(
        np.eye(3, dtype=np.float32), coarse.odom.info.shape
    ).copy()
    coarse_id = dataclasses.replace(
        coarse,
        lm_edges=dataclasses.replace(coarse.lm_edges, info=eye2),
        odom=dataclasses.replace(coarse.odom, info=eye3),
    )
    err = float(assemble.total_error(
        jax.device_put(coarse_id), huber_delta=1e9,
        exact_odom_jacobians=True,
    ))
    n_e = int(np.asarray(coarse.lm_edges.mask).sum())
    assert err / max(n_e, 1) < 1e-3, err
    # prolongation at the coarse solution state == original state
    fine = prolong(graph, coarse, rel_dr, 8)
    n = int(np.asarray(graph.pose_mask).sum())
    np.testing.assert_allclose(
        np.asarray(fine.poses)[:n, :2], np.asarray(graph.poses)[:n, :2],
        atol=1e-3,
    )


@pytest.mark.slow
def test_incremental_init_recovers_at_high_drift():
    """Honest-noise workload whose TOTAL drift (sqrt(N) * sigma_theta ~
    4.5 rad) is outside the GN basin while one WINDOW of drift
    (~1 rad) is inside: the incremental prefix sweep plus one batch
    solve recovers the trajectory (measured on this config: DR ATE ~98,
    init ~4.4, full ~2.5 — the scale-100k failure mode, reproduced
    small)."""
    noise = NoiseConfig(position_std=0.25,
                        orientation_std=np.radians(4.0),
                        variance_as_std=False)
    graph, gt, _ = synthetic.make_large_problem(
        num_poses=4096, num_landmarks=2048, obs_per_pose=6, seed=0,
        laps=2, noise=noise,
    )
    n = gt.shape[0]
    cfg = OptimizerConfig(
        iterations=20, lr=1.0, solver="schur",
        exact_odom_jacobians=True, pcg_tol=1e-2, pcg_max_iters=40,
        pcg_restart_every=40, pcg_precond="tridiag+coarse",
        pcg_coarse_group=32, pcg_precond_refresh=5,
    )
    ate_dr = frontend.ate_rmse(np.asarray(graph.poses)[:n], gt)
    g_init = incremental_init(graph, window=512, iters_per_prefix=5)
    ate_init = frontend.ate_rmse(np.asarray(g_init.poses)[:n], gt)
    gn = GaussNewton(cfg)
    r1 = gn.optimize(gn._prepare(g_init))
    ate = frontend.ate_rmse(np.asarray(r1.graph.poses)[:n], gt)

    assert ate_init < 0.15 * ate_dr, (ate_init, ate_dr)
    assert ate < 0.08 * ate_dr, (ate, ate_dr)


@pytest.mark.slow
def test_coarse_to_fine_reduces_ate():
    noise = NoiseConfig(position_std=0.6,
                        orientation_std=np.radians(8.0),
                        variance_as_std=False)
    graph, gt, _ = synthetic.make_large_problem(
        num_poses=1024, num_landmarks=512, obs_per_pose=5, seed=1,
        laps=2, noise=noise,
    )
    n = gt.shape[0]
    g_init = coarse_to_fine_init(graph, factor=8)
    ate_dr = frontend.ate_rmse(np.asarray(graph.poses)[:n], gt)
    ate_init = frontend.ate_rmse(np.asarray(g_init.poses)[:n], gt)
    assert ate_init < 0.5 * ate_dr, (ate_init, ate_dr)
