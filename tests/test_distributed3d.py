"""Distributed SE(3) BA (8 fake CPU devices) vs single-device equivalence.

Same strategy as test_distributed.py for the 2D path: the distributed solve
is the single-chip solve plus psum collectives, so the two must agree to
float tolerance on identical inputs, and a full multi-device optimization
must reach the single-device trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.ops import schur3d, schur, se3
from toyslam_tpu.parallel import distributed_linearize_solve_3d, make_mesh
from toyslam_tpu.sim import synthetic3d


@pytest.fixture(scope="module")
def problem():
    return synthetic3d.make_ba_problem(
        num_poses=24, num_landmarks=96, obs_per_pose=12, seed=1
    )


def _cfg(**kw):
    base = dict(
        iterations=15, lr=1.0, solver="schur3d",
        exact_odom_jacobians=True, huber_delta=1e9,
        pcg_tol=1e-8, pcg_max_iters=300, convergence_eps=1e-8,
        reject_worse_steps=True,
    )
    base.update(kw)
    return OptimizerConfig(**base)


def test_distributed3d_assembly_matches_single_device(problem):
    """The edge-sharded + psum assembly must reproduce the single-device
    block system to f32 reduction tolerance.

    dx-level equivalence is deliberately NOT asserted: the SE(3) BA Schur
    complement has cond ~3e6 (f64 oracle), so f32 reduction-order noise
    (~1e-5 relative, from XLA reassociating sums differently under jit and
    across shards) is amplified by ~cond into O(1) differences in the
    low-curvature components of dx.  Both solutions are equally valid
    inexact-Newton steps — the meaningful end-to-end invariant is the
    convergence test below.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from toyslam_tpu.parallel.distributed import graph3d_shard_specs
    from toyslam_tpu.parallel.mesh import EDGE_AXIS, pad_edges_for_mesh

    graph, _, _ = problem
    cfg = _cfg()

    def blocks(g, axis):
        sys = schur3d.assemble_blocks_3d(
            g, cfg.huber_delta, fixed_prior=cfg.fixed_prior,
            exact_odom_jacobians=cfg.exact_odom_jacobians, axis_name=axis,
        )
        return sys.hpp_diag, sys.hll, sys.bp, sys.bl, sys.err

    ref = blocks(graph, None)
    mesh = make_mesh()
    g2 = pad_edges_for_mesh(graph, mesh.shape[EDGE_AXIS])
    got = jax.jit(
        shard_map(
            lambda g: blocks(g, EDGE_AXIS),
            mesh=mesh,
            in_specs=(graph3d_shard_specs(),),
            out_specs=(P(),) * 5,
        )
    )(g2)

    for name, a, b in zip(
        ("hpp_diag", "hll", "bp", "bl", "err"), ref, got
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=1e-4, err_msg=name
        )


@pytest.mark.slow
def test_distributed3d_full_optimize_converges(problem):
    graph, poses_gt, _ = problem
    n = poses_gt.shape[0]
    cfg = _cfg()
    mesh = make_mesh()
    gn = GaussNewton(
        cfg,
        solve=distributed_linearize_solve_3d(cfg, mesh),
        retract=se3.retract,
    )
    res = gn.optimize(graph)
    errors = np.asarray(res.errors)
    valid = errors[~np.isnan(errors)]
    assert valid[-1] < valid[0] * 0.05, (valid[0], valid[-1])
    # quality gate is chi^2 PARITY with the single-device optimizer, not
    # absolute ATE: this tiny single-gauge BA problem has near-equivalent
    # chi^2 minima whose unaligned ATE spreads ~4x across numerically
    # equivalent optimizers (f32 rounding flips reject_worse_steps
    # branches); well-posed ATE recovery is gated in test_se3 /
    # test_partition3d instead
    res_s = GaussNewton(cfg).optimize(graph)
    err_s = np.asarray(res_s.errors)
    chi_s = err_s[~np.isnan(err_s)][-1]
    assert valid[-1] < 2.0 * chi_s + 1e-6, (valid[-1], chi_s)
    ate0 = synthetic3d.pose_ate_rmse(np.asarray(graph.poses)[:n], poses_gt)
    ate1 = synthetic3d.pose_ate_rmse(
        np.asarray(res.graph.poses)[:n], poses_gt
    )
    assert ate1 < 2.0 * ate0, (ate0, ate1)
