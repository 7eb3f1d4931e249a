"""End-to-end: simulate -> build graph -> optimize -> trajectory recovered.

This is the array-native equivalent of the reference's full run
(slam_main.py: 150 steps then one batch optimization), scaled down for CI
speed; the full-size run is the benchmark (bench.py)."""

import numpy as np
import pytest

from toyslam_tpu.config import SlamConfig, SimConfig, OptimizerConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend


@pytest.fixture(scope="module")
def pipeline():
    cfg = SlamConfig(
        sim=SimConfig(robot_steps=60, seed=0),
        optimizer=OptimizerConfig(iterations=10, lr=0.2),
    )
    sim = frontend.simulate(cfg.sim)
    graph, lm_map = frontend.build_graph(sim, cfg)
    return cfg, sim, graph, lm_map


def test_graph_shape_sanity(pipeline):
    cfg, sim, graph, lm_map = pipeline
    T = cfg.sim.robot_steps
    n_real = int(np.asarray(graph.pose_mask).sum())
    assert n_real == T
    # odometry chain: T-1 edges
    assert int(np.asarray(graph.odom.mask).sum()) == T - 1
    # every valid ray became a landmark edge
    assert int(np.asarray(graph.lm_edges.mask).sum()) == int(
        np.asarray(sim.valid).sum()
    )
    # landmark vertices = distinct observed obstacle ids
    obs_ids = np.asarray(sim.ids)[np.asarray(sim.valid)]
    assert len(lm_map) == len(np.unique(obs_ids))
    # first pose gauge-fixed
    assert np.asarray(graph.pose_fixed)[0] == 1.0
    assert np.asarray(graph.pose_fixed)[1:].sum() == 0.0


def test_optimization_recovers_trajectory(pipeline):
    cfg, sim, graph, lm_map = pipeline
    T = cfg.sim.robot_steps
    gt = np.asarray(sim.poses_gt)
    dr = np.asarray(sim.poses_dr)

    ate_dr = frontend.ate_rmse(dr, gt)
    result = GaussNewton(cfg.optimizer).optimize(graph)
    est = np.asarray(result.graph.poses)[:T]
    ate_opt = frontend.ate_rmse(est, gt)

    errors = np.asarray(result.errors)
    errors = errors[~np.isnan(errors)]
    assert errors[-1] < errors[0]
    # the optimized trajectory must be much better than dead reckoning
    assert ate_opt < 0.5 * ate_dr
    assert ate_opt < 1.0


def test_landmark_estimates_improve(pipeline):
    cfg, sim, graph, lm_map = pipeline
    env = np.asarray(sim.env)
    result = GaussNewton(cfg.optimizer).optimize(graph)

    lms0 = np.asarray(graph.landmarks)
    lms1 = np.asarray(result.graph.landmarks)
    err0, err1 = [], []
    for oid, idx in lm_map.items():
        err0.append(np.linalg.norm(lms0[idx] - env[oid]))
        err1.append(np.linalg.norm(lms1[idx] - env[oid]))
    assert np.mean(err1) < np.mean(err0)
