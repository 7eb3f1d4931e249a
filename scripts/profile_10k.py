"""Phase-level profiling of the large-sparse-10k Schur/PCG path on TPU.

Uses the fetch-based timing harness (scripts/tputime.py) — block_until_ready
does not block through the remote-TPU tunnel, so round-1 style pipelined
timings measured enqueue cost, not device time.
"""

import sys, os, json

import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax
import jax.numpy as jnp
import numpy as np

from tputime import report, rtt

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.ops import schur, blockmath as bm
from toyslam_tpu.ops.gather_plan import attach_plan
from toyslam_tpu.sim import synthetic


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=n_poses, num_landmarks=n_poses, obs_per_pose=6, seed=0,
    )
    graph = jax.device_put(attach_plan(graph))
    plan = graph.plan
    print(f"poses={graph.num_poses} lms={graph.num_landmarks} "
          f"odom={graph.odom.count} lmE={graph.lm_edges.count} "
          f"rtt={rtt()*1e3:.1f} ms")
    lam = jnp.asarray(1e-3, jnp.float32)

    results = {}

    # --- assemble ---------------------------------------------------------
    ab = jax.jit(lambda g: schur.assemble_blocks(
        g, 1.5, exact_odom_jacobians=True))
    results["assemble_ms"] = report("assemble_blocks (exact odom)", ab, graph) * 1e3
    sysb = ab(graph)

    d = jax.jit(schur.damp)(sysb, lam)
    hll_inv = jax.jit(schur.inv_blocks)(d.hll)

    # --- plan relayout + preconditioners ----------------------------------
    mko = jax.jit(lambda dd, hi: schur.make_plan_operator(dd, hi, graph))
    results["make_plan_operator_ms"] = report(
        "make_plan_operator", mko, d, hll_inv) * 1e3
    op = mko(d, hll_inv)
    s_diag = jax.jit(schur.plan_s_diag)(op)

    results["jacobi_build_ms"] = report(
        "jacobi build (inv s_diag)", jax.jit(jnp.linalg.inv), s_diag) * 1e3
    cu = jax.jit(lambda dd: schur.chain_upper(
        dd, graph.odom.i, graph.odom.j, graph.num_poses))
    upper = cu(d)
    results["tridiag_build_ms"] = report(
        "tridiag build (PCR factor)",
        jax.jit(schur.build_tridiag_precond), s_diag, upper) * 1e3
    pre = schur.build_tridiag_precond(s_diag, upper)
    m_inv = jnp.linalg.inv(s_diag)

    # --- per-iteration pieces ----------------------------------------------
    x0 = jnp.ones((graph.num_poses, 3), jnp.float32)
    results["plan_matvec_ms"] = report(
        "plan_matvec", jax.jit(schur.plan_matvec), op, x0, reps=30) * 1e3
    results["jacobi_apply_ms"] = report(
        "jacobi apply", jax.jit(bm.mv), m_inv, x0, reps=30) * 1e3
    results["tridiag_apply_ms"] = report(
        "tridiag apply (PCR)", jax.jit(schur.tridiag_apply), pre, x0,
        reps=30) * 1e3

    import dataclasses
    g_noplan = dataclasses.replace(graph, plan=None)
    results["seg_matvec_ms"] = report(
        "schur_matvec segment_sum",
        jax.jit(lambda dd, hi, x: schur.schur_matvec(dd, hi, g_noplan, x)),
        d, hll_inv, x0, reps=30) * 1e3

    # --- full solves -------------------------------------------------------
    for name, tol, mi, pc in [
        ("solve jacobi tol=1e-6 cap300", 1e-6, 300, "jacobi"),
        ("solve tridiag tol=1e-3 cap300", 1e-3, 300, "tridiag"),
        ("solve tridiag tol=1e-2 cap300", 1e-2, 300, "tridiag"),
    ]:
        sol = jax.jit(lambda g, l, tol=tol, mi=mi, pc=pc: schur.schur_solve(
            schur.assemble_blocks(g, 1.5, exact_odom_jacobians=True),
            g, l, tol, mi, precond=pc))
        results[name] = report(name, sol, graph, lam, reps=3) * 1e3

    # PCG iteration counts
    rhs = -d.bp + schur.hpl_matvec(
        d, graph.lm_edges.pose, graph.lm_edges.lm,
        bm.mv(hll_inv, d.bl), graph.num_poses, None, graph.plan)
    for name, pc_apply, tol in [
        ("jacobi", lambda r: bm.mv(m_inv, r), 1e-3),
        ("tridiag", lambda r: schur.tridiag_apply(pre, r), 1e-3),
        ("tridiag", lambda r: schur.tridiag_apply(pre, r), 1e-2),
    ]:
        res = schur.pcg(lambda x: schur.plan_matvec(op, x), pc_apply,
                        rhs, tol, 1000)
        print(f"pcg[{name} tol={tol}]: {int(res.iterations)} iters, "
              f"resnorm {float(res.residual_norm):.3e}")
        results[f"pcg_iters_{name}_{tol}"] = int(res.iterations)

    results["platform"] = jax.devices()[0].platform
    print(json.dumps(results))


if __name__ == "__main__":
    main()
