"""A/B at 10k on TPU: grid XLA path (round-3 champion) vs the streamed
band fused kernel (round 4), identical workload and truncation budget."""

import json
import time

import _bootstrap  # noqa: F401,E402

import jax
import numpy as np

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend, synthetic


def bench(name, graph, gt, opt, n_real, reps=3, rounds=3):
    gn = GaussNewton(opt)
    g = jax.device_put(gn._prepare(graph))
    t0 = time.time()
    r = gn.optimize(g)
    est = np.asarray(r.graph.poses)[:n_real]
    print(f"[{name}] compile+first: {time.time()-t0:.1f}s", flush=True)
    iters = int(r.iterations_run)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = gn.optimize(g)
        np.asarray(r.graph.poses)
        best = min(best, (time.perf_counter() - t0) / reps)
    est = np.asarray(r.graph.poses)[:n_real]
    errs = np.asarray(r.errors)
    valid = errs[~np.isnan(errs)]
    out = {
        "config": name,
        "iters_per_s": round(iters / best, 2),
        "iters": iters,
        "wall_s": round(best, 4),
        "ate": round(frontend.ate_rmse(est, gt), 4),
        "chi2_first": round(float(valid[0]), 1),
        "chi2_last": round(float(valid[-1]), 1),
        "pcg_iters": np.asarray(r.pcg_iters)[:iters].tolist(),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    import os

    # identical-trajectory A/B: both sides run the SAME preconditioner
    # (coarse_group=160 — the in-kernel coarse size the band kernel
    # supports, see fused_mode) and the same truncation budget, so the
    # chi^2 trajectories must agree and iters/s isolates the solver
    common = dict(
        iterations=15, lr=1.0, exact_odom_jacobians=True,
        pcg_tol=1e-2, pcg_max_iters=80, pcg_restart_every=40,
        pcg_precond="tridiag+coarse", pcg_coarse_group=160,
        pcg_precond_refresh=5,
    )
    grid = OptimizerConfig(solver="schur_grid", **common)
    band = OptimizerConfig(
        solver="schur", pcg_backend="fused",
        pcg_fused_chunk=int(os.environ.get("BAND_CHUNK", "10")), **common,
    )
    # tuned round-3 reference point (different precond/budget — context row)
    grid32 = OptimizerConfig(
        solver="schur_grid", iterations=15, lr=1.0,
        exact_odom_jacobians=True, pcg_tol=1e-2, pcg_max_iters=15,
        pcg_restart_every=15, pcg_precond="tridiag+coarse",
        pcg_coarse_group=32, pcg_precond_refresh=5,
    )
    r_grid32 = bench("grid-10k-tuned-cg32", graph, poses_gt, grid32, 10_000)
    r_grid = bench("grid-10k-cg160", graph, poses_gt, grid, 10_000)
    r_band = bench("band-10k-cg160", graph, poses_gt, band, 10_000)
    print(json.dumps({
        "speedup_same_traj": round(
            r_band["iters_per_s"] / r_grid["iters_per_s"], 2),
        "speedup_vs_tuned": round(
            r_band["iters_per_s"] / r_grid32["iters_per_s"], 2),
        "chi2_match": abs(r_band["chi2_last"] - r_grid["chi2_last"])
        / max(r_grid["chi2_last"], 1.0),
    }))


if __name__ == "__main__":
    main()
