"""End-to-end Gauss-Newton behaviour on synthetic problems."""

import numpy as np
import pytest

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.ops import assemble

import oracle


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    return oracle.make_random_problem(rng, n_poses=20, n_lms=12, n_lm_edges=90)


def _ate(poses_est, poses_gt):
    return float(
        np.sqrt(np.mean(np.sum((poses_est[:, :2] - poses_gt[:, :2]) ** 2, 1)))
    )


def test_error_decreases_and_estimate_improves(problem):
    builder = oracle.problem_to_builder(problem)
    graph = builder.build()
    n = builder.num_poses

    cfg = OptimizerConfig(iterations=25, lr=0.5)
    result = GaussNewton(cfg).optimize(graph)

    errors = np.asarray(result.errors)
    errors = errors[~np.isnan(errors)]
    assert errors.shape[0] >= 2
    assert errors[-1] < errors[0] * 0.5

    ate0 = _ate(problem["poses0"], problem["poses_gt"])
    ate1 = _ate(
        np.asarray(result.graph.poses[:n]), problem["poses_gt"]
    )
    assert ate1 < ate0 * 0.7


def test_lu_and_cholesky_agree(problem):
    builder = oracle.problem_to_builder(problem)
    graph = builder.build()
    r_chol = GaussNewton(
        OptimizerConfig(iterations=5, dense_factorization="cholesky")
    ).optimize(graph)
    r_lu = GaussNewton(
        OptimizerConfig(iterations=5, dense_factorization="lu")
    ).optimize(graph)
    np.testing.assert_allclose(
        np.asarray(r_chol.graph.poses),
        np.asarray(r_lu.graph.poses),
        atol=5e-3,
    )


def test_fixed_pose_stays_put(problem):
    builder = oracle.problem_to_builder(problem)
    graph = builder.build()
    result = GaussNewton(OptimizerConfig(iterations=15)).optimize(graph)
    np.testing.assert_allclose(
        np.asarray(result.graph.poses[0]),
        problem["poses0"][0],
        atol=1e-3,
    )


def test_converged_flag_on_noise_free_problem():
    rng = np.random.default_rng(11)
    prob = oracle.make_random_problem(rng, n_poses=8, n_lms=6, n_lm_edges=30)
    # start exactly at a self-consistent optimum: measurements regenerated
    # noise-free from the initial state
    prob2 = dict(prob)
    prob2["poses0"] = prob["poses_gt"].copy()
    prob2["lms0"] = prob["lms_gt"].copy()
    # rebuild noise-free measurements
    odo = []
    for i, j, _, info in prob["odom_edges"]:
        r = oracle.rot(prob["poses_gt"][i, 2])
        rel_t = r.T @ (prob["poses_gt"][j, :2] - prob["poses_gt"][i, :2])
        rel_th = oracle.wrap(prob["poses_gt"][j, 2] - prob["poses_gt"][i, 2])
        odo.append((i, j, np.array([rel_t[0], rel_t[1], rel_th]), info))
    lms = []
    for p, k, _, info in prob["lm_edges"]:
        r = oracle.rot(prob["poses_gt"][p, 2])
        local = r.T @ (prob["lms_gt"][k] - prob["poses_gt"][p, :2])
        lms.append(
            (
                p,
                k,
                np.array([np.linalg.norm(local), np.arctan2(local[1], local[0])]),
                info,
            )
        )
    prob2["odom_edges"] = odo
    prob2["lm_edges"] = lms
    builder = oracle.problem_to_builder(prob2)
    graph = builder.build()
    result = GaussNewton(OptimizerConfig(iterations=10)).optimize(graph)
    assert bool(result.converged)
    assert int(result.iterations_run) < 10


def test_total_error_matches_assembly(problem):
    builder = oracle.problem_to_builder(problem)
    graph = builder.build()
    sys = assemble.assemble_dense(graph, huber_delta=1.5)
    err = assemble.total_error(graph, huber_delta=1.5)
    np.testing.assert_allclose(
        np.asarray(err), np.asarray(sys.err), rtol=1e-6
    )
