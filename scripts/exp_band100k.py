"""100k A/B on TPU (round-5 item 2): jacobi+fold-coarse streamed band
kernel vs the XLA grid loop, identical preconditioner and truncation
budget both sides (the BENCH_BAND chi2-match discipline).

Round 4 left 100k at parity (1.244 vs 1.196 GN-iter/s): the tridiag PCR
plane working set fails the band VMEM gate at 100k.  jacobi+fold-coarse
passes the gate (no PCR planes), and the 4.7 GB tile stack streams at
~870 GB/s (~5.4 ms/matvec) against an XLA grid loop iteration measured
~14 ms — the per-iteration advantage the 10k rows already demonstrate,
now at the scale where the reference's dense-equivalent would need
~720 GB (BENCH_HUGE note; reference caps at O(N^2) dense memory,
/root/reference/python/optimizer/graph_optimizer.py:105).

Workload: the 100k-revisit LOWNOISE config (the converging one — the
BENCH_PLATEAU quality gate; default-noise initialization is item 4's
separate fix).
"""

import dataclasses
import json
import math
import os
import time

import _bootstrap  # noqa: F401,E402

import jax
import numpy as np

from toyslam_tpu.config import NoiseConfig, OptimizerConfig
from toyslam_tpu.ops import grid_schur
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend, synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench(name, graph, gt, opt, n_real, reps=1, rounds=3):
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
    import statistics

    med = statistics.median(times)
    est = np.asarray(r.graph.poses)[:n_real]
    errs = np.asarray(r.errors)
    valid = errs[~np.isnan(errs)]
    out = {
        "config": name,
        "iters_per_s": round(iters / med, 3),
        "iters_per_s_best": round(iters / min(times), 3),
        "iters": iters,
        "wall_s": round(med, 3),
        "wall_s_rounds": [round(t, 3) for t in times],
        "ate": round(frontend.ate_rmse(est, gt), 4),
        "chi2_first": round(float(valid[0]), 1),
        "chi2_last": round(float(valid[-1]), 1),
        "chi2_curve": [round(float(v), 1) for v in valid],
        "pcg_iters": np.asarray(r.pcg_iters)[:iters].tolist(),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    low = NoiseConfig(position_std=0.05,
                      orientation_std=math.radians(0.2))
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=100_000, num_landmarks=50_000, obs_per_pose=6,
        seed=0, laps=2, noise=low,
        pose_bucket=1024, landmark_bucket=1024, edge_bucket=8192,
    )
    n_real = poses_gt.shape[0]

    # cg128 (nc=784): the cg64 coarse build (S_c fill product + a
    # dim-4704 Newton-Schulz inverse) measured 654 ms — 131 ms/GN
    # amortized; nc=784 is 4-8x cheaper and 128 still divides 128 (the
    # in-kernel fold-coarse group constraint)
    common = dict(
        iterations=10, lr=1.0, exact_odom_jacobians=True,
        pcg_tol=1e-3, pcg_max_iters=60, pcg_restart_every=30,
        pcg_precond="jacobi+coarse", pcg_coarse_group=128,
        pcg_precond_refresh=5,
    )
    grid = OptimizerConfig(solver="schur_grid", pcg_backend="xla",
                           **common)
    band = OptimizerConfig(
        solver="schur_grid", pcg_backend="fused",
        pcg_fused_chunk=int(os.environ.get("BAND_CHUNK", "15")), **common,
    )
    # gate sanity before burning a compile
    gp = grid_schur.build_grid_plan(graph)
    assert gp.band is not None, "no band layout found at 100k"
    b = gp.band
    stack_gb = (b.n_chunks * b.k_windows * 3 * b.w_row * b.chunk_b * 2
                * 4) / 1e9
    print(f"band layout: B={b.chunk_b} K={b.k_windows} W={b.w_row} "
          f"wide={b.n_wide} stack={stack_gb:.2f} GB", flush=True)
    assert grid_schur._band_mode(band, gp, graph.num_poses), \
        "band VMEM gate rejected jacobi+fold-coarse at 100k"

    rows = [
        bench("grid-100k-jacobi-cg128", graph, poses_gt, grid, n_real),
        bench("band-100k-jacobi-cg128", graph, poses_gt, band, n_real),
        bench("band-100k-jacobi-cg128-cap30", graph, poses_gt,
              dataclasses.replace(
                  band, pcg_max_iters=30, pcg_restart_every=30,
                  pcg_fused_chunk=15, iterations=20,
              ), n_real),
        # budget scan (all plateau at the same chi^2; wall-to-plateau is
        # the config-robust metric): cap-20 maximizes GN-iter/s, cap-40
        # minimizes wall-to-plateau
        bench("band-100k-jacobi-cg128-cap20", graph, poses_gt,
              dataclasses.replace(
                  band, pcg_max_iters=20, pcg_restart_every=20,
                  pcg_fused_chunk=10, iterations=24,
              ), n_real),
        bench("band-100k-jacobi-cg128-cap40", graph, poses_gt,
              dataclasses.replace(
                  band, pcg_max_iters=40, pcg_restart_every=40,
                  pcg_fused_chunk=20, iterations=14,
              ), n_real),
    ]
    # the round-4 parity row used tridiag+coarse on the grid loop —
    # re-run it same-session as the strongest XLA opponent
    tricfg = OptimizerConfig(
        solver="schur_grid", pcg_backend="xla",
        **{**common, "pcg_precond": "tridiag+coarse"},
    )
    rows.append(bench("grid-100k-tridiag-cg128", graph, poses_gt, tricfg,
                      n_real))

    chi_match = abs(rows[0]["chi2_last"] - rows[1]["chi2_last"]) / max(
        rows[0]["chi2_last"], 1.0
    )
    out = {
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "device": str(jax.devices()[0]),
        "note": (
            "100k jacobi+fold-coarse band kernel vs XLA grid loop, "
            "identical preconditioner+budget (chi2-match discipline); "
            "lownoise revisit workload (the converging config)"
        ),
        "band_layout": {
            "chunk_b": b.chunk_b, "k_windows": b.k_windows,
            "w_row": b.w_row, "n_wide": b.n_wide,
            "tile_stack_gb": round(stack_gb, 2),
        },
        "chi2_match_rel": round(chi_match, 6),
        "speedup_vs_grid_jacobi": round(
            rows[1]["iters_per_s"] / rows[0]["iters_per_s"], 2
        ),
        "speedup_vs_grid_tridiag": round(
            rows[1]["iters_per_s"] / rows[3]["iters_per_s"], 2
        ),
        "configs": rows,
    }
    path = os.path.join(REPO, "BENCH_BAND100K.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
