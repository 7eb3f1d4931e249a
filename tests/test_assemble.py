"""Dense H/b assembly vs the independent numpy oracle, including padding."""

import numpy as np
import pytest

from toyslam_tpu.ops import assemble

import oracle


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(42)
    return oracle.make_random_problem(rng)


def test_dense_assembly_matches_oracle(problem):
    builder = oracle.problem_to_builder(problem)
    graph = builder.build()
    n, m = builder.num_poses, builder.num_landmarks

    sys = assemble.assemble_dense(graph, huber_delta=1.5, fixed_prior=1e6)

    H_ref, b_ref, err_ref = oracle.assemble_dense(
        problem["poses0"],
        problem["lms0"],
        problem["odom_edges"],
        problem["lm_edges"],
        problem["pose_fixed"],
        problem["lm_fixed"],
    )

    # Extract the real (non-padded) sub-blocks: [poses*3 | landmarks*2] with
    # padded poses/landmarks interleaved at the end of each section.
    Np = graph.num_poses
    H = np.asarray(sys.H)
    b = np.asarray(sys.b)
    idx = np.concatenate(
        [np.arange(3 * n), 3 * Np + np.arange(2 * m)]
    )
    H_real = H[np.ix_(idx, idx)]
    b_real = b[idx]

    np.testing.assert_allclose(
        np.asarray(sys.err), err_ref, rtol=1e-4
    )
    np.testing.assert_allclose(b_real, b_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(H_real, H_ref, rtol=2e-3, atol=2e-2)


def test_padding_entries_are_inert(problem):
    builder = oracle.problem_to_builder(problem)
    graph = builder.build()
    n, m = builder.num_poses, builder.num_landmarks
    Np, Mp = graph.num_poses, graph.num_landmarks

    sys = assemble.assemble_dense(graph, huber_delta=1.5)
    H = np.asarray(sys.H)
    b = np.asarray(sys.b)

    pad_idx = np.concatenate(
        [np.arange(3 * n, 3 * Np), 3 * Np + np.arange(2 * m, 2 * Mp)]
    )
    real_idx = np.concatenate(
        [np.arange(3 * n), 3 * Np + np.arange(2 * m)]
    )
    # Padded rows/cols: zero coupling, unit diagonal, zero gradient.
    np.testing.assert_allclose(H[np.ix_(pad_idx, real_idx)], 0.0)
    np.testing.assert_allclose(H[np.ix_(real_idx, pad_idx)], 0.0)
    np.testing.assert_allclose(
        H[pad_idx, pad_idx], 1.0
    )
    np.testing.assert_allclose(b[pad_idx], 0.0)


def test_fixed_vertex_semantics(problem):
    builder = oracle.problem_to_builder(problem)
    graph = builder.build()
    sys = assemble.assemble_dense(graph, huber_delta=1.5, fixed_prior=1e6)
    H = np.asarray(sys.H)
    b = np.asarray(sys.b)
    # pose 0 is fixed: diagonal dominated by the 1e6 prior, gradient zeroed
    assert np.all(H[np.arange(3), np.arange(3)] >= 1e6)
    np.testing.assert_allclose(b[:3], 0.0)
