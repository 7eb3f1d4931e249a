"""End-to-end tuning matrix for the large-sparse-10k workload on TPU:
preconditioner x tolerance x GN budget -> (GN-iter/s, ATE)."""

import sys, os, time, json

import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax
import jax.numpy as jnp
import numpy as np

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.ops.gather_plan import attach_plan
from toyslam_tpu.sim import frontend, synthetic


def run(name, graph, poses_gt, cfg, reps=2):
    gn = GaussNewton(cfg)
    g = gn._prepare(graph)
    g = jax.device_put(g)
    r = gn.optimize(g)
    est = np.asarray(r.graph.poses)[:poses_gt.shape[0]]  # fetch = fence
    t0 = time.perf_counter()
    for _ in range(reps):
        r = gn.optimize(g)
    est = np.asarray(r.graph.poses)[:poses_gt.shape[0]]
    dt = (time.perf_counter() - t0) / reps
    iters = int(r.iterations_run)
    ate = frontend.ate_rmse(est, poses_gt)
    errs = np.asarray(r.errors)
    valid = errs[~np.isnan(errs)]
    print(json.dumps({
        "name": name, "iters": iters, "wall_s": round(dt, 3),
        "gn_iters_per_s": round(iters / dt, 2), "ate": round(float(ate), 3),
        "chi2_first": float(valid[0]) if valid.size else None,
        "chi2_last": float(valid[-1]) if valid.size else None,
        "converged": bool(r.converged), "diverged": bool(r.diverged),
    }), flush=True)


def main():
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    base = dict(lr=1.0, solver="schur", exact_odom_jacobians=True)

    # r1 baseline config (jacobi, tol 1e-6): ATE 11.2, 2.32 iter/s
    run("r1-baseline", graph, poses_gt, OptimizerConfig(
        iterations=15, pcg_tol=1e-6, pcg_max_iters=300,
        pcg_precond="jacobi", **base), reps=1)

    for pc, grp in [("tridiag+coarse", 64), ("tridiag+coarse", 32),
                    ("jacobi+coarse", 64)]:
        run(f"{pc}-g{grp}-tol1e-2", graph, poses_gt, OptimizerConfig(
            iterations=15, pcg_tol=1e-2, pcg_max_iters=100,
            pcg_precond=pc, pcg_coarse_group=grp, **base))

    run("tridiag+coarse-g64-tol1e-3", graph, poses_gt, OptimizerConfig(
        iterations=15, pcg_tol=1e-3, pcg_max_iters=150,
        pcg_precond="tridiag+coarse", pcg_coarse_group=64, **base))

    # more GN iterations with loose solves + step rejection
    run("tc-g64-tol1e-2-it30-reject", graph, poses_gt, OptimizerConfig(
        iterations=30, pcg_tol=1e-2, pcg_max_iters=100,
        pcg_precond="tridiag+coarse", pcg_coarse_group=64,
        reject_worse_steps=True, **base))


if __name__ == "__main__":
    main()
