"""10k workload: truncated-Newton budget tuning (PCG cap x refresh) on TPU.

Quality gates: chi2_last <= 6700 (chi2 at ground truth = 7937 — the workload
is drift-limited, so beating GT chi2 is the bar) and ATE comparable to the
reference-quality run (~9.9).
"""

import sys, os, time, json

import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax
import numpy as np

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend, synthetic


def run(name, graph, poses_gt, cfg, reps=3):
    gn = GaussNewton(cfg)
    g = jax.device_put(gn._prepare(graph))
    r = gn.optimize(g)
    est = np.asarray(r.graph.poses)[:poses_gt.shape[0]]
    t0 = time.perf_counter()
    for _ in range(reps):
        r = gn.optimize(g)
    est = np.asarray(r.graph.poses)[:poses_gt.shape[0]]
    dt = (time.perf_counter() - t0) / reps
    iters = int(r.iterations_run)
    errs = np.asarray(r.errors)
    valid = errs[~np.isnan(errs)]
    print(json.dumps({
        "name": name, "iters": iters, "wall_s": round(dt, 3),
        "gn_iters_per_s": round(iters / dt, 2),
        "ate": round(float(frontend.ate_rmse(est, poses_gt)), 3),
        "chi2_last": round(float(valid[-1]), 1) if valid.size else None,
        "pcg_iters": np.asarray(r.pcg_iters)[:iters].tolist(),
    }), flush=True)


def main():
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    base = dict(iterations=15, lr=1.0, solver="schur",
                exact_odom_jacobians=True, pcg_tol=1e-2,
                pcg_precond="tridiag+coarse", pcg_coarse_group=64)
    for name, kw in [
        ("cap20-r3-g32", dict(pcg_max_iters=20, pcg_restart_every=20,
                              pcg_precond_refresh=3, pcg_coarse_group=32)),
        ("cap15-r3-g32", dict(pcg_max_iters=15, pcg_restart_every=15,
                              pcg_precond_refresh=3, pcg_coarse_group=32)),
        ("cap20-r5-g32", dict(pcg_max_iters=20, pcg_restart_every=20,
                              pcg_precond_refresh=5, pcg_coarse_group=32)),
        ("cap15-r5-g32", dict(pcg_max_iters=15, pcg_restart_every=15,
                              pcg_precond_refresh=5, pcg_coarse_group=32)),
    ]:
        run(name, graph, poses_gt, OptimizerConfig(**{**base, **kw}))


if __name__ == "__main__":
    main()
