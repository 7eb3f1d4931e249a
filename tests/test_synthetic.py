"""Scale-up generators: multi-loop closures and the large sparse problem."""

import numpy as np
import pytest

from toyslam_tpu.config import OptimizerConfig, SimConfig, SlamConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend, synthetic


def test_multi_loop_revisits_landmarks():
    cfg = SlamConfig(sim=SimConfig(robot_steps=300, seed=0))
    controls = synthetic.multi_loop_controls(299, loop_steps=150)
    sim = frontend.simulate(cfg.sim, controls=controls)
    graph, lm_map = frontend.build_graph(sim, cfg)
    # two laps over the same circuit: landmarks seen on lap 1 are re-observed
    # on lap 2 -> loop closures.  Count landmarks observed from both laps.
    ids = np.asarray(sim.ids)
    valid = np.asarray(sim.valid)
    lap1 = set(ids[:150][valid[:150]].tolist())
    lap2 = set(ids[150:][valid[150:]].tolist())
    assert len(lap1 & lap2) > 20


def test_multi_loop_optimization_improves():
    cfg = SlamConfig(
        sim=SimConfig(robot_steps=300, seed=0),
        optimizer=OptimizerConfig(iterations=15, solver="schur"),
    )
    controls = synthetic.multi_loop_controls(299, loop_steps=150)
    sim = frontend.simulate(cfg.sim, controls=controls)
    graph, _ = frontend.build_graph(sim, cfg)
    r = GaussNewton(cfg.optimizer).optimize(graph)
    est = np.asarray(r.graph.poses)[:300]
    ate_dr = frontend.ate_rmse(sim.poses_dr, sim.poses_gt)
    ate = frontend.ate_rmse(est, sim.poses_gt)
    assert ate < 0.5 * ate_dr


def test_large_problem_shapes():
    graph, poses_gt, lms_gt = synthetic.make_large_problem(
        num_poses=400, num_landmarks=300, obs_per_pose=4, seed=1,
        pose_bucket=64, landmark_bucket=64, edge_bucket=256,
    )
    assert int(np.asarray(graph.pose_mask).sum()) == 400
    assert int(np.asarray(graph.odom.mask).sum()) == 399
    assert int(np.asarray(graph.lm_edges.mask).sum()) == 400 * 4
    # every observed landmark became a vertex with its GT nearby-ish
    m = int(np.asarray(graph.lm_mask).sum())
    assert m == lms_gt.shape[0]
    init_err = np.linalg.norm(
        np.asarray(graph.landmarks)[:m] - lms_gt, axis=1
    )
    assert np.median(init_err) < 5.0


@pytest.mark.slow
def test_large_problem_optimizes():
    graph, poses_gt, lms_gt = synthetic.make_large_problem(
        num_poses=600, num_landmarks=400, obs_per_pose=5, seed=2,
        pose_bucket=64, landmark_bucket=64, edge_bucket=256,
    )
    # exact SE(2) odometry Jacobians: the reference's +/-I approximation
    # (edges2d.py:75-77) diverges on rotation-heavy serpentine trajectories
    cfg = OptimizerConfig(iterations=30, lr=1.0, solver="schur",
                          pcg_tol=1e-7, pcg_max_iters=400,
                          exact_odom_jacobians=True)
    r = GaussNewton(cfg).optimize(graph)
    n = 600
    est = np.asarray(r.graph.poses)[:n]
    dr0 = np.asarray(graph.poses)[:n]
    ate0 = frontend.ate_rmse(dr0, poses_gt)
    ate1 = frontend.ate_rmse(est, poses_gt)
    assert ate1 < 0.5 * ate0
    errs = np.asarray(r.errors)
    errs = errs[~np.isnan(errs)]
    assert errs[-1] < errs[0]


@pytest.mark.slow
def test_large_problem_truncated_newton_quality_gate():
    """Acceptance bound for the scale-up config (VERDICT r1 item 8): the
    TPU-tuned truncated-Newton budget (tight PCG cap + periodic
    preconditioner refresh, exp_budget10k.py) must reach a robust chi^2 at
    or below the chi^2 of the GROUND-TRUTH state.  The workload is
    drift-limited (odometry noise integrates to tens of units), so ATE of
    any max-likelihood solution plateaus — chi2-vs-GT is the honest
    quality gate.  CPU-sized replica of the large-sparse-10k config."""
    import dataclasses

    import jax.numpy as jnp

    from toyslam_tpu.config import OptimizerConfig
    from toyslam_tpu.ops import assemble
    from toyslam_tpu.optimizer import GaussNewton
    from toyslam_tpu.sim import synthetic

    graph, poses_gt, lms_gt = synthetic.make_large_problem(
        num_poses=1500, num_landmarks=1500, obs_per_pose=6, seed=0,
    )
    cfg = OptimizerConfig(
        iterations=15, lr=1.0, solver="schur",
        exact_odom_jacobians=True, pcg_tol=1e-2,
        pcg_max_iters=15, pcg_restart_every=15,
        pcg_precond="tridiag+coarse",
        pcg_coarse_group=32,
        pcg_precond_refresh=5,
    )
    gn = GaussNewton(cfg)
    r = gn.optimize(graph)
    errs = np.asarray(r.errors)
    chi2_last = errs[~np.isnan(errs)][-1]

    # chi^2 of the ground-truth state on the same graph
    n, m = poses_gt.shape[0], lms_gt.shape[0]
    poses_pad = np.asarray(graph.poses).copy()
    lms_pad = np.asarray(graph.landmarks).copy()
    poses_pad[:n] = poses_gt
    lms_pad[:m] = lms_gt
    g_gt = graph.with_state(jnp.asarray(poses_pad), jnp.asarray(lms_pad))
    chi2_gt = float(assemble.total_error(
        g_gt, huber_delta=cfg.huber_delta,
        exact_odom_jacobians=cfg.exact_odom_jacobians,
    ))

    assert chi2_last <= chi2_gt * 1.001, (chi2_last, chi2_gt)


@pytest.mark.slow
def test_revisit_workload_ate_gate():
    """The scale config with loop closures (laps=2): revisits anchor
    drift, so ATE becomes a real acceptance gate alongside chi^2
    (VERDICT r2 item 6).  CPU-sized replica of large-sparse-10k-revisit
    (scripts/bench_suite.py), same truncated-Newton budget."""
    from toyslam_tpu.config import OptimizerConfig
    from toyslam_tpu.optimizer import GaussNewton
    from toyslam_tpu.sim import frontend, synthetic

    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=1200, num_landmarks=500, obs_per_pose=5, seed=2,
        pose_bucket=64, landmark_bucket=64, edge_bucket=256, laps=2,
    )
    n = poses_gt.shape[0]
    cfg = OptimizerConfig(
        iterations=30, lr=1.0, solver="schur",
        exact_odom_jacobians=True, pcg_tol=1e-7, pcg_max_iters=400,
        pcg_precond="tridiag+coarse",
    )
    r = GaussNewton(cfg).optimize(graph)
    est = np.asarray(r.graph.poses)[:n]
    ate0 = frontend.ate_rmse(np.asarray(graph.poses)[:n], poses_gt)
    ate1 = frontend.ate_rmse(est, poses_gt)
    # measured: 14.63 -> 0.079; gate with margin.  This is the multi-loop
    # ATE regime (0.068 on multi-loop-1k), unreachable without revisits.
    assert ate0 > 5.0
    assert ate1 < 0.2, ate1


def test_knn_cells_matches_brute():
    """The cell-hash candidate search (used >20k landmarks) finds the same
    K-nearest sets as the brute-force path."""
    import numpy as np

    from toyslam_tpu.sim.synthetic import _knn_obs_brute, _knn_obs_cells

    rng = np.random.default_rng(3)
    m = 2500
    g = int(np.ceil(np.sqrt(m)))
    lo = np.array([0.0, 0.0])
    hi = np.array([100.0, 100.0])
    gx, gy = np.meshgrid(np.linspace(0, 100, g), np.linspace(0, 100, g))
    lms = np.stack([gx.ravel(), gy.ravel()], axis=1)[:m]
    lms = lms + rng.normal(0, 0.3, lms.shape)
    poses = rng.uniform(12, 88, size=(400, 2))

    bp, bl = _knn_obs_brute(poses, lms, 6)
    cp, cl = _knn_obs_cells(poses, lms, 6, lo, hi)
    assert np.array_equal(bp, cp)
    for t in range(400):
        assert set(bl[t * 6 : t * 6 + 6]) == set(cl[t * 6 : t * 6 + 6]), t
