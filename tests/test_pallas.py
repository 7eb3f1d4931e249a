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
