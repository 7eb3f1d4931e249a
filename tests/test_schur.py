"""Schur + PCG path must reproduce the dense direct solve."""

import numpy as np
import jax.numpy as jnp
import pytest

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.models.graph import FactorGraph2D
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.ops import assemble, schur

import oracle


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    prob = oracle.make_random_problem(rng, n_poses=15, n_lms=10, n_lm_edges=60)
    builder = oracle.problem_to_builder(prob)
    graph = builder.build()
    return prob, builder, graph


def _dense_hb(graph: FactorGraph2D):
    sys = assemble.assemble_dense(graph, huber_delta=1.5)
    return np.asarray(sys.H, np.float64), np.asarray(sys.b, np.float64)


def _blocks_to_dense(sys: schur.BlockSystem, graph: FactorGraph2D):
    n, m = graph.num_poses, graph.num_landmarks
    D = 3 * n + 2 * m
    H = np.zeros((D, D))
    for p in range(n):
        H[3 * p : 3 * p + 3, 3 * p : 3 * p + 3] = np.asarray(sys.hpp_diag[p])
    oi = np.asarray(graph.odom.i)
    oj = np.asarray(graph.odom.j)
    off = np.asarray(sys.hpp_off)
    mask1 = np.asarray(graph.odom.mask)
    for e in range(len(oi)):
        if not mask1[e]:
            continue
        i, j = oi[e], oj[e]
        H[3 * i : 3 * i + 3, 3 * j : 3 * j + 3] += off[e]
        H[3 * j : 3 * j + 3, 3 * i : 3 * i + 3] += off[e].T
    for k in range(m):
        o = 3 * n + 2 * k
        H[o : o + 2, o : o + 2] = np.asarray(sys.hll[k])
    lp = np.asarray(graph.lm_edges.pose)
    ll = np.asarray(graph.lm_edges.lm)
    hpl = np.asarray(sys.hpl)
    mask2 = np.asarray(graph.lm_edges.mask)
    for e in range(len(lp)):
        if not mask2[e]:
            continue
        p, k = lp[e], ll[e]
        o1, o2 = 3 * p, 3 * n + 2 * k
        H[o1 : o1 + 3, o2 : o2 + 2] += hpl[e]
        H[o2 : o2 + 2, o1 : o1 + 3] += hpl[e].T
    b = np.concatenate(
        [np.asarray(sys.bp).ravel(), np.asarray(sys.bl).ravel()]
    )
    return H, b


def test_block_assembly_matches_dense(setup):
    _, _, graph = setup
    sys = schur.assemble_blocks(graph, huber_delta=1.5)
    H_blk, b_blk = _blocks_to_dense(sys, graph)
    H_dense, b_dense = _dense_hb(graph)
    np.testing.assert_allclose(H_blk, H_dense, rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(b_blk, b_dense, rtol=2e-3, atol=2e-3)


def test_schur_matvec_matches_dense(setup):
    _, builder, graph = setup
    n, m = graph.num_poses, graph.num_landmarks
    lam = jnp.asarray(1e-3)
    sys = schur.damp(schur.assemble_blocks(graph, huber_delta=1.5), lam)
    hll_inv = schur.inv2x2(sys.hll)
    H, _ = _blocks_to_dense(sys, graph)
    Hpp = H[: 3 * n, : 3 * n]
    Hpl = H[: 3 * n, 3 * n :]
    Hll = H[3 * n :, 3 * n :]
    S = Hpp - Hpl @ np.linalg.inv(Hll) @ Hpl.T

    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    got = np.asarray(
        schur.schur_matvec(sys, hll_inv, graph, jnp.asarray(x))
    ).ravel()
    want = S @ x.ravel()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_schur_solve_matches_dense_solve(setup):
    _, builder, graph = setup
    n, m = graph.num_poses, graph.num_landmarks
    lam = jnp.asarray(1e-3)
    sys = schur.assemble_blocks(graph, huber_delta=1.5)
    dx_p, dx_l = schur.schur_solve(sys, graph, lam, tol=1e-8, max_iters=500)

    H, b = _dense_hb(graph)
    D = H.shape[0]
    dx_dense = np.linalg.solve(H + float(lam) * np.eye(D), -b)
    np.testing.assert_allclose(
        np.asarray(dx_p).ravel(), dx_dense[: 3 * n], rtol=1e-2, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(dx_l).ravel(), dx_dense[3 * n :], rtol=1e-2, atol=1e-3
    )


def test_gauss_newton_with_schur_solver(setup):
    prob, builder, graph = setup
    n = builder.num_poses
    r_dense = GaussNewton(OptimizerConfig(iterations=10)).optimize(graph)
    r_schur = GaussNewton(
        OptimizerConfig(iterations=10, solver="schur", pcg_tol=1e-8,
                        pcg_max_iters=500)
    ).optimize(graph)
    np.testing.assert_allclose(
        np.asarray(r_schur.graph.poses[:n]),
        np.asarray(r_dense.graph.poses[:n]),
        atol=5e-3,
    )
    errs_d = np.asarray(r_dense.errors)
    errs_s = np.asarray(r_schur.errors)
    valid = ~np.isnan(errs_d) & ~np.isnan(errs_s)
    np.testing.assert_allclose(errs_s[valid], errs_d[valid], rtol=1e-2)
