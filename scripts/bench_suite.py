"""Full benchmark suite over BASELINE.json's workload configs.

Prints one JSON line per config.  bench.py remains the single-line headline
benchmark; this suite covers the scale-up matrix:

  0. reference workload  — 150 poses   (parity vs BASELINE_MEASURED.json)
  1. multi-loop closures — ~1k poses
  2. large sparse        — ~10k poses / ~10k landmarks (Schur + PCG)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

from toyslam_tpu.config import OptimizerConfig, SimConfig, SlamConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend, synthetic


def bench_one(name, graph, gt, opt_cfg, n_real, reps=5):
    gn = GaussNewton(opt_cfg)
    r = gn.optimize(graph)
    jax.block_until_ready(r.graph.poses)
    # pipelined: enqueue all reps, block once (amortizes dispatch RTT)
    t0 = time.perf_counter()
    rs = [gn.optimize(graph) for _ in range(reps)]
    jax.block_until_ready(rs)
    best = (time.perf_counter() - t0) / reps
    iters = int(r.iterations_run)
    est = np.asarray(r.graph.poses)[:n_real]
    out = {
        "config": name,
        "poses": n_real,
        "landmarks": int(np.asarray(graph.lm_mask).sum()),
        "lm_edges": int(np.asarray(graph.lm_edges.mask).sum()),
        "iters_per_s": round(iters / best, 2),
        "iters_run": iters,
        "wall_s": round(best, 4),
        "ate_rmse": round(frontend.ate_rmse(est, gt), 4),
        "ate_dead_reckoning": round(
            frontend.ate_rmse(np.asarray(graph.poses)[:n_real], gt), 4
        ),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))
    return out


def main():
    # 0. reference workload (parity config: reference-equivalent settings)
    cfg = SlamConfig(sim=SimConfig(robot_steps=150, seed=0))
    sim = frontend.simulate(cfg.sim)
    graph, _ = frontend.build_graph(sim, cfg)
    bench_one(
        "reference-150",
        graph,
        sim.poses_gt,
        OptimizerConfig(iterations=10, lr=0.2, solver="schur"),
        150,
    )

    # 1. multi-loop ~1k poses with loop closures
    cfg = SlamConfig(sim=SimConfig(robot_steps=1050, seed=0))
    controls = synthetic.multi_loop_controls(1049, loop_steps=150)
    sim = frontend.simulate(cfg.sim, controls=controls)
    graph, _ = frontend.build_graph(sim, cfg)
    bench_one(
        "multi-loop-1k",
        graph,
        sim.poses_gt,
        OptimizerConfig(
            iterations=15, lr=0.5, solver="schur",
            exact_odom_jacobians=True, pcg_max_iters=300,
        ),
        1050,
    )

    # 2. large sparse ~10k x ~10k
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    bench_one(
        "large-sparse-10k",
        graph,
        poses_gt,
        OptimizerConfig(
            iterations=15, lr=1.0, solver="schur",
            exact_odom_jacobians=True, pcg_tol=1e-6, pcg_max_iters=300,
        ),
        10_000,
    )


if __name__ == "__main__":
    main()
