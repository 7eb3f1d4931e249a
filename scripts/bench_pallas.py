"""A/B benchmark: per-edge linearization backend xla vs pallas (schur path).

Run on the real TPU.  Prints one JSON line per (config, backend) and writes
the matrix to ``BENCH_PALLAS.json``.  Timing is fetch-fenced
(scripts/tputime.py) — block_until_ready does not block through the
remote-TPU tunnel.
"""

import json
import os
import sys
import time

import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax
import numpy as np

from toyslam_tpu.config import OptimizerConfig, SimConfig, SlamConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend, synthetic


def bench(name, graph, opt_cfg, reps=10, rounds=2):
    gn = GaussNewton(opt_cfg)
    g = jax.device_put(gn._prepare(graph))
    r = gn.optimize(g)
    np.asarray(r.graph.poses)  # fence + warmup
    iters = int(r.iterations_run)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = gn.optimize(g)
        np.asarray(r.graph.poses)
        best = min(best, (time.perf_counter() - t0) / reps)
    out = {
        "config": name,
        "backend": opt_cfg.edge_backend,
        "iters_per_s": round(iters / best, 2),
        "wall_s": round(best, 5),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    cfg = SlamConfig(sim=SimConfig(robot_steps=150, seed=0))
    sim = frontend.simulate(cfg.sim)
    graph_ref, _ = frontend.build_graph(sim, cfg)

    graph_big, _, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )

    results = []
    for backend in ("xla", "pallas"):
        results.append(bench(
            "reference-150",
            graph_ref,
            OptimizerConfig(
                iterations=10, lr=0.2, solver="schur", edge_backend=backend
            ),
            reps=15,
        ))
        # tuned 10k config (scripts/exp_budget10k.py); the pallas kernels
        # only accelerate the per-linearization edge pass, so the PCG-heavy
        # loop bounds the possible delta here
        results.append(bench(
            "large-sparse-10k",
            graph_big,
            OptimizerConfig(
                iterations=15, lr=1.0, solver="schur",
                exact_odom_jacobians=False, pcg_tol=1e-2,
                pcg_max_iters=15, pcg_restart_every=15,
                pcg_precond="tridiag+coarse", pcg_coarse_group=32,
                pcg_precond_refresh=5,
                edge_backend=backend,
            ),
            reps=2,
        ))

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "BENCH_PALLAS.json",
    )
    with open(path, "w") as f:
        json.dump({
            "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
            "device": str(jax.devices()[0]),
            "results": results,
        }, f, indent=2)
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
