"""A/B at 10k on TPU: the band kernel with the STREAMED FOLD COARSE
(group=32 — the tuned grid config's coarse, previously impossible
in-kernel) vs the tuned grid config at the SAME preconditioner family
and truncation budget."""

import json
import os
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
        "chi2_last": round(float(valid[-1]), 1),
        "pcg_iters": np.asarray(r.pcg_iters)[:iters].tolist(),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    # tuned budget: cg32 coarse, cap 15 — IDENTICAL config both sides;
    # the band side's coarse rides bf16 (streamed c2t), so trajectories
    # may differ in the last bits — compare endpoint quality + speed
    tuned = dict(
        iterations=15, lr=1.0, exact_odom_jacobians=True,
        pcg_tol=1e-2, pcg_max_iters=15, pcg_restart_every=15,
        pcg_precond="tridiag+coarse", pcg_coarse_group=32,
        pcg_precond_refresh=5,
    )
    grid32 = OptimizerConfig(solver="schur_grid", **tuned)
    band32 = OptimizerConfig(
        solver="schur", pcg_backend="fused",
        pcg_fused_chunk=int(os.environ.get("BAND_CHUNK", "8")), **tuned,
    )
    # band kernel fed straight from the grid assembly (grid_schur
    # _band_mode): grid-layout blk, GridBandAux scatter, positional
    # tupper — the BlockSystem-layer costs of the schur-path band gone
    gband32 = OptimizerConfig(
        solver="schur_grid", pcg_backend="fused",
        pcg_fused_chunk=int(os.environ.get("BAND_CHUNK", "8")), **tuned,
    )
    rows = [
        bench("grid-10k-tuned-cg32", graph, poses_gt, grid32, 10_000),
        bench("band-10k-fold-cg32", graph, poses_gt, band32, 10_000),
        bench("gridband-10k-fold-cg32", graph, poses_gt, gband32, 10_000),
    ]
    print(json.dumps({
        "speedup_vs_tuned": round(
            rows[1]["iters_per_s"] / rows[0]["iters_per_s"], 2),
        "gridband_speedup_vs_tuned": round(
            rows[2]["iters_per_s"] / rows[0]["iters_per_s"], 2),
        "chi2_rel_dev": abs(rows[2]["chi2_last"] - rows[0]["chi2_last"])
        / max(rows[0]["chi2_last"], 1.0),
        "ate": [r["ate"] for r in rows],
    }))


if __name__ == "__main__":
    main()
