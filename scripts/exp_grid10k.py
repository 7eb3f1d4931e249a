"""A/B: grid-order Schur (ops/grid_schur.py) vs the general path at 10k.

Runs the exact tuned large-sparse-10k configuration from bench_suite.py
under both solvers and reports GN iterations/s (fetch-fenced).  The grid
path replaces gather-based assembly reductions, the PlanOperator relayout,
and chain-neighbor matvec gathers with dense slot-axis sums and shifts.
"""

import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402

import numpy as np


def main():
    import dataclasses

    import jax

    from tputime import report, rtt

    from toyslam_tpu.config import OptimizerConfig
    from toyslam_tpu.optimizer import GaussNewton
    from toyslam_tpu.sim import synthetic

    laps = int(os.environ.get("TOYSLAM_GRID_LAPS", "1"))
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000 // max(laps, 1),
        obs_per_pose=6, seed=0, laps=laps,
    )
    print(f"platform={jax.devices()[0].platform} rtt={rtt()*1e3:.2f} ms "
          f"N={graph.num_poses} M={graph.num_landmarks}", flush=True)

    base = OptimizerConfig(
        iterations=15, lr=1.0, solver="schur",
        exact_odom_jacobians=True, pcg_tol=1e-2,
        pcg_max_iters=15, pcg_restart_every=15,
        pcg_precond="tridiag+coarse", pcg_coarse_group=32,
        pcg_precond_refresh=5, pcg_backend="xla",
    )
    results = []
    for sv in ("schur", "schur_grid"):
        cfg = dataclasses.replace(base, solver=sv)
        gn = GaussNewton(cfg)
        gd = jax.device_put(gn._prepare(graph))
        res = gn.optimize(gd)                      # compile + warm
        iters_run = int(res.iterations_run)
        errs = np.asarray(res.errors)
        t = report(f"10k {sv:11s}",
                   lambda g=gd, gn=gn: gn.optimize(g).graph.poses, reps=5)
        rec = {
            "solver": sv, "laps": laps,
            "gn_iters_per_s": round(iters_run / t, 2),
            "wall_s": round(t, 5),
            "iters_run": iters_run,
            "chi2_first": round(float(errs[0]), 1),
            "chi2_last": round(float(errs[~np.isnan(errs)][-1]), 1),
            "pcg_iters": np.asarray(res.pcg_iters).tolist(),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    out = {
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "device": str(jax.devices()[0]),
        "results": results,
    }
    with open(os.path.join(REPO, "BENCH_GRID.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_GRID.json")


if __name__ == "__main__":
    main()
