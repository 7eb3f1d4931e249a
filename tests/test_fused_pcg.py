"""Fused Pallas PCG (ops/fused_pcg.py) vs the XLA Schur path (ops/schur.py).

The fused kernel re-expresses the damped Schur complement as
``T - V V^T`` and runs the whole CG loop on-chip; these tests pin down that
the re-expression is EXACT (operator equivalence to the oracle matvec),
that the solve agrees with the XLA PCG for every supported preconditioner,
that loop-closure odometry edges fold in exactly, and that the trace-time
gate falls back where the kernel does not apply.  On CPU the kernel runs in
Pallas interpreter mode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.models.graph import FactorGraph2D
from toyslam_tpu.ops import fused_pcg as fp
from toyslam_tpu.ops import schur
from toyslam_tpu.ops.gather_plan import attach_plan
from toyslam_tpu.optimizer.gauss_newton import GaussNewton
from toyslam_tpu.sim import synthetic


@pytest.fixture(scope="module")
def small_graph() -> FactorGraph2D:
    graph, _, _ = synthetic.make_large_problem(
        num_poses=200, num_landmarks=150, obs_per_pose=5, seed=0,
        pose_bucket=64, landmark_bucket=64, edge_bucket=256,
    )
    return attach_plan(graph)


@pytest.fixture(scope="module")
def closure_graph(small_graph) -> FactorGraph2D:
    """small_graph plus two genuine loop-closure odometry edges written
    into padded slots."""
    odom = small_graph.odom
    i = np.asarray(odom.i).copy()
    j = np.asarray(odom.j).copy()
    mask = np.asarray(odom.mask).copy()
    meas = np.asarray(odom.meas).copy()
    info = np.asarray(odom.info).copy()
    slots = np.nonzero(mask == 0)[0][:2]
    for k, (a, b) in zip(slots, [(10, 120), (30, 180)]):
        i[k], j[k], mask[k] = a, b, 1.0
        meas[k] = [0.1, 0.05, 0.02]
        info[k] = np.diag([4.0, 4.0, 20.0])
    g = dataclasses.replace(
        small_graph,
        odom=dataclasses.replace(
            odom, i=i, j=j, mask=mask, meas=meas, info=info
        ),
        plan=None,
    )
    return attach_plan(g)


def _sys(graph):
    sys_b = schur.assemble_blocks(graph, 1.5)
    lam = jnp.asarray(1e-3, jnp.float32)
    d = schur.damp(sys_b, lam)
    return sys_b, d, schur.inv_blocks(d.hll), lam


def test_fused_operator_matches_schur_matvec(small_graph):
    """T - V V^T must be the EXACT damped Schur operator."""
    _, d, hll_inv, _ = _sys(small_graph)
    op = fp.build_fused_operator(d, hll_inv, small_graph)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(small_graph.num_poses, 3)), jnp.float32)
    y_ref = schur.schur_matvec(d, hll_inv, small_graph, x)

    xc = x.T
    y = fp._bmv(op.tdiag, xc)
    y = y + fp._bmv(op.tupper, fp._shift(xc, -1))
    y = y + fp._bmv(op.tlower, fp._shift(xc, 1))
    urow = sum(
        fp._dot(xc[a:a + 1, :], op.u[a], fp._DN_STD) for a in range(3)
    )
    w = jnp.concatenate(
        [fp._dot(urow, op.u[a], fp._DN_T) for a in range(3)], axis=0
    )
    y_fused = (y - w).T
    rel = float(jnp.max(jnp.abs(y_fused - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < 1e-5


def test_fused_operator_closure_edges_exact(closure_graph):
    """Non-chain odometry edges fold into V exactly (S[i,j] = -W)."""
    assert closure_graph.plan.fused.closure_e.shape[0] == 2
    _, d, hll_inv, _ = _sys(closure_graph)
    op = fp.build_fused_operator(d, hll_inv, closure_graph)
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.normal(size=(closure_graph.num_poses, 3)), jnp.float32
    )
    y_ref = schur.schur_matvec(d, hll_inv, closure_graph, x)
    xc = x.T
    y = fp._bmv(op.tdiag, xc)
    y = y + fp._bmv(op.tupper, fp._shift(xc, -1))
    y = y + fp._bmv(op.tlower, fp._shift(xc, 1))
    urow = sum(
        fp._dot(xc[a:a + 1, :], op.u[a], fp._DN_STD) for a in range(3)
    )
    w = jnp.concatenate(
        [fp._dot(urow, op.u[a], fp._DN_T) for a in range(3)], axis=0
    )
    rel = float(
        jnp.max(jnp.abs((y - w).T - y_ref)) / jnp.max(jnp.abs(y_ref))
    )
    assert rel < 1e-5


@pytest.mark.parametrize(
    "precond", ["jacobi", "tridiag", "jacobi+coarse", "tridiag+coarse"]
)
def test_fused_solve_matches_xla(small_graph, precond):
    sys_b, _, _, lam = _sys(small_graph)
    dxp0, dxl0, st0 = schur.schur_solve(
        sys_b, small_graph, lam, 1e-6, 400, None, 64, precond, 64
    )
    dxp1, dxl1, st1 = fp.fused_schur_solve(
        sys_b, small_graph, lam, 1e-6, 400, precond, 64, 16, 64
    )
    scale = float(jnp.max(jnp.abs(dxp0)))
    assert float(jnp.max(jnp.abs(dxp0 - dxp1))) / scale < 1e-3
    scale_l = float(jnp.max(jnp.abs(dxl0)))
    assert float(jnp.max(jnp.abs(dxl0 - dxl1))) / scale_l < 1e-3
    # both converged (neither capped)
    assert int(st0.pcg_iters) < 400
    assert int(st1.pcg_iters) < 400


def test_fused_solve_closure_graph(closure_graph):
    sys_b, _, _, lam = _sys(closure_graph)
    dxp0, _, _ = schur.schur_solve(
        sys_b, closure_graph, lam, 1e-6, 400, None, 64, "tridiag+coarse", 64
    )
    dxp1, _, st1 = fp.fused_schur_solve(
        sys_b, closure_graph, lam, 1e-6, 400, "tridiag+coarse", 64, 16, 64
    )
    scale = float(jnp.max(jnp.abs(dxp0)))
    assert float(jnp.max(jnp.abs(dxp0 - dxp1))) / scale < 1e-3
    assert int(st1.pcg_iters) < 400


def test_gate_static_properties(small_graph):
    cfg = OptimizerConfig(solver="schur", pcg_precond="tridiag+coarse")
    assert fp.fused_supported(cfg, small_graph, None)
    # chunk preconditioner: not in-kernel -> fallback
    cfg_chunk = dataclasses.replace(cfg, pcg_precond="chunk+coarse")
    assert not fp.fused_supported(cfg_chunk, small_graph, None)
    # forced off
    cfg_xla = dataclasses.replace(cfg, pcg_backend="xla")
    assert not fp.fused_supported(cfg_xla, small_graph, None)
    # distributed (axis_name set): no
    assert not fp.fused_supported(cfg, small_graph, "dev")
    # no plan: no
    bare = dataclasses.replace(small_graph, plan=None)
    assert not fp.fused_supported(cfg, bare, None)
    # coarse group must divide the padded pose count
    cfg_bad_g = dataclasses.replace(cfg, pcg_coarse_group=7)
    assert not fp.fused_supported(cfg_bad_g, small_graph, None)
    # VMEM budget: a huge virtual graph is rejected (shape-only check)
    class FakeShaped:
        num_poses = 20_000
        num_landmarks = 20_000
        plan = small_graph.plan
    assert not fp.fused_supported(cfg, FakeShaped(), None)


def test_gauss_newton_end_to_end_parity(small_graph):
    """Full optimize() through the auto-gated fused path matches the XLA
    path: same per-iteration chi^2 trajectory, same final state."""
    base = OptimizerConfig(
        solver="schur", pcg_precond="tridiag+coarse", iterations=8,
    )
    res_x = GaussNewton(
        config=dataclasses.replace(base, pcg_backend="xla")
    ).optimize(small_graph)
    res_f = GaussNewton(
        config=dataclasses.replace(base, pcg_backend="fused")
    ).optimize(small_graph)
    ex = np.asarray(res_x.errors)
    ef = np.asarray(res_f.errors)
    valid = ~np.isnan(ex)
    np.testing.assert_allclose(ef[valid], ex[valid], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res_f.graph.poses),
        np.asarray(res_x.graph.poses),
        atol=1e-3,
    )


def test_fused_backend_raises_when_unsupported(small_graph):
    cfg = OptimizerConfig(
        solver="schur", pcg_precond="chunk+coarse", pcg_backend="fused",
    )
    gn = GaussNewton(config=cfg)
    with pytest.raises(ValueError, match="fused"):
        gn.optimize(small_graph)


# --- SE(3) (schur3d, 6/3 blocks) ------------------------------------------


@pytest.fixture(scope="module")
def ba_graph():
    from toyslam_tpu.sim import synthetic3d

    graph, _, _ = synthetic3d.make_ba_problem(
        num_poses=96, num_landmarks=300, seed=0
    )
    return attach_plan(graph)


@pytest.mark.slow
def test_fused_solve_matches_xla_se3(ba_graph):
    from toyslam_tpu.ops import schur3d

    sys_b = schur3d.assemble_blocks_3d(ba_graph, 1.5)
    lam = jnp.asarray(1e-3, jnp.float32)
    dxp0, dxl0, st0 = schur.schur_solve(
        sys_b, ba_graph, lam, 1e-6, 300, None, 64, "tridiag", 64
    )
    dxp1, dxl1, st1 = fp.fused_schur_solve(
        sys_b, ba_graph, lam, 1e-6, 300, "tridiag", 64, 16, 64
    )
    scale = float(jnp.max(jnp.abs(dxp0)))
    assert float(jnp.max(jnp.abs(dxp0 - dxp1))) / scale < 1e-3
    assert int(st1.pcg_iters) < 300


@pytest.mark.slow
def test_gauss_newton_se3_parity(ba_graph):
    base = OptimizerConfig(
        solver="schur3d", pcg_precond="tridiag", iterations=6,
        reject_worse_steps=True,
    )
    rx = GaussNewton(
        config=dataclasses.replace(base, pcg_backend="xla")
    ).optimize(ba_graph)
    rf = GaussNewton(
        config=dataclasses.replace(base, pcg_backend="fused")
    ).optimize(ba_graph)
    ex, ef = np.asarray(rx.errors), np.asarray(rf.errors)
    valid = ~np.isnan(ex)
    np.testing.assert_allclose(ef[valid], ex[valid], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(rf.graph.poses), np.asarray(rx.graph.poses), atol=1e-3
    )
