"""Phase-level profile of the tuned 10k grid path (scripts/bench_suite.py
config 2) on TPU — decides where the round-4 attack goes."""

import json
import sys

import _bootstrap  # noqa: F401,E402

import jax
import jax.numpy as jnp

from tputime import report, rtt

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.ops import blockmath as bm, grid_schur, schur
from toyslam_tpu.sim import synthetic


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=n_poses, num_landmarks=n_poses, obs_per_pose=6, seed=0,
    )
    cfg = OptimizerConfig(
        iterations=15, lr=1.0, solver="schur_grid",
        exact_odom_jacobians=True, pcg_tol=1e-2,
        pcg_max_iters=15, pcg_restart_every=15,
        pcg_precond="tridiag+coarse", pcg_coarse_group=32,
        pcg_precond_refresh=5,
    )
    gp = grid_schur.build_grid_plan(graph)
    import dataclasses
    graph = jax.device_put(dataclasses.replace(graph, plan=gp))
    gp = graph.plan
    lam = jnp.asarray(1e-3, jnp.float32)
    n, m = graph.num_poses, graph.num_landmarks
    print(f"poses={n} lms={m} kl={gp.L_pose.shape[0]//m} "
          f"kp={gp.P_pose.shape[0]//n} rtt={rtt()*1e3:.1f} ms")
    results = {}

    def _asm_tuple(g):
        s = grid_schur._assemble(g, g.plan, cfg)
        return (s.hpp_diag, s.tupper, s.hll, s.bp, s.bl, s.err,
                s.hpl_L, s.hpl_P)

    asm = jax.jit(_asm_tuple)
    results["assemble_ms"] = report("grid assemble", asm, graph) * 1e3
    sys_g = grid_schur._assemble(graph, graph.plan, cfg)
    d = grid_schur._damp(sys_g, lam)
    hll_inv = schur.inv_blocks(d.hll)
    matvec, s_diag_fn = grid_schur._matvec_factory(d, hll_inv, gp, n, m)
    s_diag = s_diag_fn()

    results["precond_build_ms"] = report(
        "precond build (tridiag+coarse)",
        jax.jit(lambda: grid_schur._build_precond(
            cfg, d, hll_inv, s_diag, graph, gp))) * 1e3
    pre = grid_schur._build_precond(cfg, d, hll_inv, s_diag, graph, gp)

    x0 = jnp.ones((n, 3), jnp.float32)
    results["matvec_ms"] = report(
        "grid matvec", jax.jit(matvec), x0, reps=30) * 1e3
    papply = grid_schur._precond_apply(cfg, pre, n)
    results["precond_apply_ms"] = report(
        "precond apply", jax.jit(papply), x0, reps=30) * 1e3
    # matvec sub-pieces
    pose_L = gp.L_pose.reshape(m, d.kl)
    lm_P = gp.P_lm.reshape(n, d.kp)
    results["gather_xL_ms"] = report(
        "gather x[pose_L]", jax.jit(lambda x: x[pose_L]), x0, reps=30) * 1e3
    u0 = jnp.ones((m, 2), jnp.float32)
    results["gather_vP_ms"] = report(
        "gather v[lm_P]", jax.jit(lambda v: v[lm_P]), u0, reps=30) * 1e3
    results["u_leg_ms"] = report(
        "u-leg (gather+mtv+sum)",
        jax.jit(lambda x: jnp.sum(bm.mtv(d.hpl_L, x[pose_L]), axis=1)),
        x0, reps=30) * 1e3

    # full stateful solve (refresh path) — one GN-equivalent linearize+solve
    sol = jax.jit(lambda g, l: grid_schur._solve_once(cfg, g, g.plan, l)[:2])
    results["solve_once_ms"] = report(
        "solve_once (build incl.)", sol, graph, lam, reps=5) * 1e3
    solf = jax.jit(
        lambda g, l: grid_schur._solve_once(cfg, g, g.plan, l, pre=pre)[:2])
    results["solve_once_frozen_ms"] = report(
        "solve_once (pre frozen)", solf, graph, lam, reps=5) * 1e3

    results["platform"] = jax.devices()[0].platform
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
