"""Round-5 A/B at 10k after the landmark-chunked relayout: single-lap and
laps=2 workloads, band vs grid XLA loop, identical preconditioner+budget
(chi2-match discipline).  Calibrates the auto band-vs-grid gate."""

import dataclasses
import json
import statistics
import time

import _bootstrap  # noqa: F401,E402

import jax
import numpy as np

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.ops import grid_schur
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend, synthetic


def bench(name, graph, gt, opt, n_real, reps=3, rounds=3):
    gn = GaussNewton(opt)
    g = jax.device_put(gn._prepare(graph))
    t0 = time.time()
    r = gn.optimize(g)
    np.asarray(r.graph.poses)
    print(f"[{name}] compile+first: {time.time()-t0:.1f}s", flush=True)
    iters = int(r.iterations_run)
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = gn.optimize(g)
        np.asarray(r.graph.poses)
        times.append((time.perf_counter() - t0) / reps)
    med = statistics.median(times)
    est = np.asarray(r.graph.poses)[:n_real]
    errs = np.asarray(r.errors)
    valid = errs[~np.isnan(errs)]
    out = {
        "config": name,
        "iters_per_s": round(iters / med, 2),
        "iters_per_s_best": round(iters / min(times), 2),
        "iters": iters,
        "wall_s": round(med, 4),
        "ate": round(frontend.ate_rmse(est, gt), 4),
        "chi2_last": round(float(valid[-1]), 1),
        "pcg_iters_per_gn": int(np.asarray(r.pcg_iters)[:iters].max()),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    rows = []
    # tuned champion config (BENCH_SUITE config 2 class)
    base = OptimizerConfig(
        iterations=15, lr=1.0, solver="schur_grid",
        exact_odom_jacobians=True, pcg_tol=1e-2,
        pcg_max_iters=15, pcg_restart_every=15,
        pcg_precond="tridiag+coarse", pcg_coarse_group=32,
        pcg_precond_refresh=5, pcg_fused_chunk=15,
    )
    g1, gt1, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    gp = grid_schur.build_grid_plan(g1)
    b = gp.band
    print(f"10k layout: B={b.chunk_b} K={b.k_windows} W={b.w_row} "
          f"wide={b.n_wide} stack={b.n_chunks*b.k_windows*3*b.w_row*b.chunk_b*2*4/1e6:.0f} MB",
          flush=True)
    rows.append(bench("band-10k-r5", g1, gt1,
                      dataclasses.replace(base, pcg_backend="fused"),
                      10_000))
    rows.append(bench("grid-10k-r5", g1, gt1,
                      dataclasses.replace(base, pcg_backend="xla"),
                      10_000))

    g2, gt2, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=5_000, obs_per_pose=6, seed=0,
        laps=2,
    )
    gp2 = grid_schur.build_grid_plan(g2)
    b2 = gp2.band
    print(f"laps2 layout: B={b2.chunk_b} K={b2.k_windows} W={b2.w_row} "
          f"wide={b2.n_wide}", flush=True)
    base2 = dataclasses.replace(base, iterations=20)
    rows.append(bench("band-10k-laps2-r5", g2, gt2,
                      dataclasses.replace(base2, pcg_backend="fused"),
                      gt2.shape[0]))
    rows.append(bench("grid-10k-laps2-r5", g2, gt2,
                      dataclasses.replace(base2, pcg_backend="xla"),
                      gt2.shape[0]))
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
