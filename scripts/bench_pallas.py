"""A/B benchmark: per-edge linearization backend xla vs pallas (schur path).

Run on the real TPU. Prints one JSON line per (config, backend).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from toyslam_tpu.config import OptimizerConfig, SimConfig, SlamConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend, synthetic


def bench(name, graph, opt_cfg, reps=10):
    gn = GaussNewton(opt_cfg)
    r = gn.optimize(graph)
    jax.block_until_ready(r.graph.poses)
    t0 = time.perf_counter()
    rs = [gn.optimize(graph) for _ in range(reps)]
    jax.block_until_ready(rs)
    dt = (time.perf_counter() - t0) / reps
    iters = int(r.iterations_run)
    print(json.dumps({
        "config": name,
        "backend": opt_cfg.edge_backend,
        "iters_per_s": round(iters / dt, 2),
        "wall_s": round(dt, 4),
        "platform": jax.devices()[0].platform,
    }), flush=True)


def main():
    cfg = SlamConfig(sim=SimConfig(robot_steps=150, seed=0))
    sim = frontend.simulate(cfg.sim)
    graph_ref, _ = frontend.build_graph(sim, cfg)

    graph_big, _, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )

    for backend in ("xla", "pallas"):
        bench(
            "reference-150",
            graph_ref,
            OptimizerConfig(
                iterations=10, lr=0.2, solver="schur", edge_backend=backend
            ),
        )
        bench(
            "large-sparse-10k",
            graph_big,
            OptimizerConfig(
                iterations=15, lr=1.0, solver="schur",
                exact_odom_jacobians=False, pcg_tol=1e-6, pcg_max_iters=300,
                edge_backend=backend,
            ),
            reps=3,
        )


if __name__ == "__main__":
    main()
