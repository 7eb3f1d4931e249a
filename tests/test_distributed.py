"""Distributed (8 fake CPU devices) vs single-device equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.ops import schur
from toyslam_tpu.parallel import (
    distributed_linearize_solve,
    make_mesh,
    pad_edges_for_mesh,
)

import oracle


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(9)
    prob = oracle.make_random_problem(rng, n_poses=25, n_lms=14, n_lm_edges=120)
    builder = oracle.problem_to_builder(prob)
    graph = builder.build()
    return prob, builder, graph


def test_eight_fake_devices_available():
    assert len(jax.devices()) == 8


def test_distributed_solve_matches_single_device(setup):
    _, _, graph = setup
    cfg = OptimizerConfig(solver="schur", pcg_tol=1e-8, pcg_max_iters=500)
    mesh = make_mesh()
    lam = jnp.asarray(1e-3)

    dist_solve = distributed_linearize_solve(cfg, mesh)
    dxp_d, dxl_d, err_d, _ = jax.jit(dist_solve)(graph, lam)

    local_solve = schur.schur_linearize_solve(cfg)
    dxp_s, dxl_s, err_s, _ = jax.jit(local_solve)(graph, lam)

    np.testing.assert_allclose(float(err_d), float(err_s), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dxp_d), np.asarray(dxp_s), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dxl_d), np.asarray(dxl_s), rtol=1e-3, atol=1e-5
    )


def test_distributed_gauss_newton_end_to_end(setup):
    _, builder, graph = setup
    n = builder.num_poses
    cfg = OptimizerConfig(
        iterations=8, solver="schur", pcg_tol=1e-8, pcg_max_iters=500
    )
    mesh = make_mesh()
    gn_dist = GaussNewton(cfg, solve=distributed_linearize_solve(cfg, mesh))
    gn_local = GaussNewton(cfg)

    r_d = gn_dist.optimize(graph)
    r_l = gn_local.optimize(graph)
    np.testing.assert_allclose(
        np.asarray(r_d.graph.poses[:n]),
        np.asarray(r_l.graph.poses[:n]),
        atol=5e-3,
    )


def test_pad_edges_for_mesh_is_inert(setup):
    _, _, graph = setup
    cfg = OptimizerConfig(solver="schur", pcg_tol=1e-8, pcg_max_iters=500)
    lam = jnp.asarray(1e-3)
    padded = pad_edges_for_mesh(graph, 7)  # deliberately non-power-of-two
    assert padded.odom.count % 7 == 0
    solve = schur.schur_linearize_solve(cfg)
    a = jax.jit(solve)(graph, lam)
    b = jax.jit(solve)(padded, lam)
    np.testing.assert_allclose(
        np.asarray(a[0]), np.asarray(b[0]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(float(a[2]), float(b[2]), rtol=1e-6)


def test_distributed_sharded_plan_matches_single_device(setup):
    """The per-shard gather-table path (prepare() attaches
    gather_plan.build_sharded_plan tables; the PCG matvec runs on the
    dual-layout PlanOperator with psum'd edge partials) must match the
    single-device plan-operator solve."""
    _, _, graph = setup
    cfg = OptimizerConfig(solver="schur", pcg_tol=1e-8, pcg_max_iters=500)
    mesh = make_mesh()
    lam = jnp.asarray(1e-3)

    dist_solve = distributed_linearize_solve(cfg, mesh)
    gprep = dist_solve.prepare(graph)
    assert gprep.plan is not None
    assert gprep.plan.lm_by_pose.idx.ndim == 3  # [D, V, K]
    dxp_d, dxl_d, err_d, _ = jax.jit(dist_solve)(gprep, lam)

    from toyslam_tpu.ops.gather_plan import attach_plan

    local_solve = schur.schur_linearize_solve(cfg)
    dxp_s, dxl_s, err_s, _ = jax.jit(local_solve)(attach_plan(graph), lam)

    np.testing.assert_allclose(float(err_d), float(err_s), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dxp_d), np.asarray(dxp_s), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dxl_d), np.asarray(dxl_s), rtol=1e-3, atol=1e-5
    )


def test_distributed_gauss_newton_with_sharded_plan(setup):
    """End-to-end distributed GN through GaussNewton._prepare's prepare
    hook (sharded tables attached automatically)."""
    _, builder, graph = setup
    n = builder.num_poses
    cfg = OptimizerConfig(
        iterations=8, solver="schur", pcg_tol=1e-8, pcg_max_iters=500
    )
    mesh = make_mesh()
    gn_dist = GaussNewton(cfg, solve=distributed_linearize_solve(cfg, mesh))
    gn_local = GaussNewton(cfg)

    r_d = gn_dist.optimize(graph)
    r_l = gn_local.optimize(graph)
    np.testing.assert_allclose(
        np.asarray(r_d.graph.poses[:n]),
        np.asarray(r_l.graph.poses[:n]),
        atol=5e-3,
    )
