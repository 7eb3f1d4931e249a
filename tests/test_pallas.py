"""Pallas fused edge-linearization kernels vs the batched XLA oracle.

Runs on CPU in Pallas interpreter mode (tests/conftest.py pins the CPU
backend); the kernels themselves are written for TPU (component-major
[channels, E] layout, ops/pallas_edges.py).  The reference has no tests at
all (SURVEY.md §4); the oracle here is our own XLA path, which is itself
checked against autodiff and the reference formulas in test_residuals.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from toyslam_tpu.config import OptimizerConfig, SimConfig, SlamConfig
from toyslam_tpu.ops import edge_blocks
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend

HUBER = 1.5


def _random_lm_edges(rng, n=37, m=19, e=301):
    poses = rng.normal(size=(n, 3)).astype(np.float32)
    lms = rng.normal(size=(m, 2)).astype(np.float32)
    pose_idx = rng.integers(0, n, size=e).astype(np.int32)
    lm_idx = rng.integers(0, m, size=e).astype(np.int32)
    meas = np.abs(rng.normal(size=(e, 2))).astype(np.float32) + 0.1
    a = rng.normal(size=(e, 2, 2)).astype(np.float32)
    info = a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(2, dtype=np.float32)
    mask = (rng.random(e) > 0.2).astype(np.float32)
    return poses, lms, pose_idx, lm_idx, meas, info, mask


def _random_odom_edges(rng, n=37, e=53):
    poses = rng.normal(size=(n, 3)).astype(np.float32)
    i = rng.integers(0, n, size=e).astype(np.int32)
    j = rng.integers(0, n, size=e).astype(np.int32)
    meas = rng.normal(size=(e, 3)).astype(np.float32)
    a = rng.normal(size=(e, 3, 3)).astype(np.float32)
    info = a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(3, dtype=np.float32)
    mask = (rng.random(e) > 0.2).astype(np.float32)
    return poses, i, j, meas, info, mask


def test_lm_blocks_match_oracle():
    rng = np.random.default_rng(3)
    args = _random_lm_edges(rng)
    ref = edge_blocks.lm_edge_blocks(*args, HUBER, backend="xla")
    got = edge_blocks.lm_edge_blocks(*args, HUBER, backend="pallas")
    for name, a, b in zip(ref._fields, ref, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
            err_msg=f"LmBlocks.{name}",
        )


def test_odom_blocks_match_oracle():
    rng = np.random.default_rng(4)
    args = _random_odom_edges(rng)
    ref = edge_blocks.odom_edge_blocks(*args, HUBER, backend="xla")
    got = edge_blocks.odom_edge_blocks(*args, HUBER, backend="pallas")
    for name, a, b in zip(ref._fields, ref, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
            err_msg=f"OdomBlocks.{name}",
        )


def test_exact_odom_mode_rejected():
    rng = np.random.default_rng(5)
    args = _random_odom_edges(rng, n=8, e=9)
    with pytest.raises(ValueError):
        edge_blocks.odom_edge_blocks(*args, HUBER, exact=True)


def test_optimize_with_pallas_backend_matches_xla():
    """Full 10-iteration schur optimize: pallas and xla backends converge to
    the same trajectory on the seeded sim graph."""
    cfg = SlamConfig(
        sim=SimConfig(robot_steps=40, seed=0),
        optimizer=OptimizerConfig(iterations=10, solver="schur"),
    )
    sim = frontend.simulate(cfg.sim)
    graph, _ = frontend.build_graph(sim, cfg)

    res_xla = GaussNewton(cfg.optimizer).optimize(graph)
    cfg_p = OptimizerConfig(
        iterations=10, solver="schur", edge_backend="pallas"
    )
    res_pal = GaussNewton(cfg_p).optimize(graph)

    np.testing.assert_allclose(
        np.asarray(res_xla.graph.poses),
        np.asarray(res_pal.graph.poses),
        rtol=1e-4, atol=1e-4,
    )
    err_x = np.asarray(res_xla.errors)
    err_p = np.asarray(res_pal.errors)
    valid = ~np.isnan(err_x)
    np.testing.assert_allclose(err_x[valid], err_p[valid], rtol=1e-4)


# --- SE(3) reprojection kernel ------------------------------------------------


def _random_reproj_edges(rng, n=23, m=41, e=207):
    from toyslam_tpu.sim import synthetic3d

    # valid rotations via the BA generator's exp map
    w = rng.normal(scale=0.4, size=(n, 3))
    rots = np.stack([synthetic3d._exp_so3(wi) for wi in w])
    t = rng.normal(scale=2.0, size=(n, 3))
    poses = np.concatenate(
        [rots.reshape(n, 9), t], axis=1
    ).astype(np.float32)
    # landmarks safely in front of most cameras
    lms = rng.normal(scale=1.0, size=(m, 3)).astype(np.float32)
    lms[:, 2] += 8.0
    intr = np.array([320.0, 320.0, 160.0, 120.0], np.float32)
    pose_idx = rng.integers(0, n, size=e).astype(np.int32)
    lm_idx = rng.integers(0, m, size=e).astype(np.int32)
    meas = rng.normal(scale=50.0, size=(e, 2)).astype(np.float32) + 160.0
    a = rng.normal(size=(e, 2, 2)).astype(np.float32)
    info = (a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(2)).astype(np.float32)
    mask = (rng.random(e) > 0.2).astype(np.float32)
    return poses, lms, intr, pose_idx, lm_idx, meas, info, mask


def test_reproj_blocks_match_oracle():
    from toyslam_tpu.ops import edge_blocks3d

    rng = np.random.default_rng(7)
    args = _random_reproj_edges(rng)
    ref = edge_blocks3d.reproj_edge_blocks(*args, HUBER, backend="xla")
    got = edge_blocks3d.reproj_edge_blocks(*args, HUBER, backend="pallas")
    for name, a, b in zip(ref._fields, ref, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-3,
            err_msg=f"ReprojBlocks.{name}",
        )


@pytest.mark.slow
def test_ba3d_solve_with_pallas_backend_matches_xla():
    """One SE(3) BA linearize-solve: pallas and xla reprojection
    linearization produce the same Newton step.

    (A full multi-iteration optimize is NOT a stable equivalence oracle
    here: the BA test problem is loosely constrained and
    reject_worse_steps makes the trajectory chaotic in the last f32 bit —
    per-edge differences of ~3e-4 can flip an accept decision and fork the
    whole trajectory.  The single solve is the deterministic contract; a
    loose both-converge check covers the end-to-end path.)"""
    from toyslam_tpu.ops.schur3d import assemble_blocks_3d
    from toyslam_tpu.sim import synthetic3d

    graph, poses_gt, _ = synthetic3d.make_ba_problem(
        num_poses=16, num_landmarks=64, obs_per_pose=10, seed=2
    )
    base = dict(
        iterations=10, lr=1.0, solver="schur3d",
        exact_odom_jacobians=True, huber_delta=1e9,
        pcg_tol=1e-8, pcg_max_iters=200, convergence_eps=1e-8,
    )

    sys_x = assemble_blocks_3d(graph, huber_delta=1e9, edge_backend="xla")
    sys_p = assemble_blocks_3d(graph, huber_delta=1e9,
                               edge_backend="pallas")
    for name, a, b in zip(sys_x._fields, sys_x, sys_p):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(
            b, a, atol=5e-4 * scale, err_msg=f"BlockSystem.{name}"
        )
    # (dx itself is NOT a stable oracle: the BA Schur complement has
    # cond ~3e6, so in f32 the solve output legitimately differs by
    # O(cond * eps * per-edge delta) between backends.)

    # end-to-end: both backends must converge (loose gate)
    run = dict(base, reject_worse_steps=True)
    res_xla = GaussNewton(OptimizerConfig(**run)).optimize(graph)
    res_pal = GaussNewton(
        OptimizerConfig(edge_backend="pallas", **run)
    ).optimize(graph)
    for res in (res_xla, res_pal):
        errs = np.asarray(res.errors)
        valid = errs[~np.isnan(errs)]
        assert valid[-1] < 0.05 * valid[0], valid
