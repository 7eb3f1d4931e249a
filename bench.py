"""Headline benchmark: BA iterations/s on the reference workload.

Runs the flagship pipeline (150-pose seeded sim 2D LiDAR graph, 10-iteration
damped Gauss-Newton, Schur+PCG solver) on the default JAX platform (TPU when
available) and prints ONE JSON line comparing against the measured reference
baseline (BASELINE_MEASURED.json — the reference's own Python optimizer run
on identical graph data; see scripts/measure_reference_baseline.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from toyslam_tpu.config import OptimizerConfig, SimConfig, SlamConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend


def _load_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def main():
    cfg = SlamConfig(
        sim=SimConfig(robot_steps=150, seed=0),
        optimizer=OptimizerConfig(
            iterations=10, lr=0.2, solver="schur", pcg_tol=1e-6,
            pcg_max_iters=200,
        ),
    )
    sim = frontend.simulate(cfg.sim)
    graph, _ = frontend.build_graph(sim, cfg)
    gt = np.asarray(sim.poses_gt)
    n_real = gt.shape[0]

    gn = GaussNewton(cfg.optimizer)

    # warmup / compile
    result = gn.optimize(graph)
    jax.block_until_ready(result.graph.poses)
    iters_run = int(result.iterations_run)

    # Pipelined timing: enqueue all reps, block once.  The per-call host
    # dispatch round-trip (~70 ms through the remote-TPU tunnel) would
    # otherwise swamp the ~1 ms device time of the small workload; device
    # execution is serialized per queue so total/reps is honest device time.
    # The first round(s) after compile still pay one-time remote-executable
    # cache warming (measured: 80 ms/opt on round 0 vs ~1 ms steady state),
    # and the tunnel adds multi-ms jitter per round — so run several rounds
    # and report the best (steady-state device throughput).
    reps, rounds = 20, 5
    wall = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        results = [gn.optimize(graph) for _ in range(reps)]
        jax.block_until_ready(results)
        wall = min(wall, (time.perf_counter() - t0) / reps)

    # single-call latency (includes one dispatch round-trip)
    t0 = time.perf_counter()
    jax.block_until_ready(gn.optimize(graph).graph.poses)
    latency = time.perf_counter() - t0

    best = wall
    iters_per_s = iters_run / best
    ate = frontend.ate_rmse(np.asarray(result.graph.poses)[:n_real], gt)
    ate_dr = frontend.ate_rmse(np.asarray(sim.poses_dr), gt)

    baseline = _load_baseline()
    vs = None
    if baseline and baseline.get("iters_per_s"):
        vs = iters_per_s / baseline["iters_per_s"]

    out = {
        "metric": "BA iterations/s (sim 2D LiDAR, 150 poses, damped GN, Schur+PCG)",
        "value": round(iters_per_s, 2),
        "unit": "iter/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "ate_rmse": round(ate, 4),
        "baseline_ate_rmse": round(baseline["final_ate_rmse"], 4)
        if baseline else None,
        "dead_reckoning_ate_rmse": round(ate_dr, 4),
        "iterations": iters_run,
        "wall_s_per_opt": round(best, 5),
        "latency_s_single_call": round(latency, 5),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
