"""A/B: chunked-MXU vs tridiag-PCR local preconditioner on TPU.

Measures full GaussNewton optimize wall time (fetch-fenced) and PCG
iteration counts on the multi-loop-1k and large-sparse-10k configs for
``pcg_precond`` in {tridiag+coarse, chunk+coarse} at several chunk sizes.
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


def run(name, graph, opt_cfg, reps=5, rounds=3):
    gn = GaussNewton(opt_cfg)
    g = jax.device_put(gn._prepare(graph))
    r = gn.optimize(g)
    np.asarray(r.graph.poses)
    iters = int(r.iterations_run)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = gn.optimize(g)
        np.asarray(r.graph.poses)
        best = min(best, (time.perf_counter() - t0) / reps)
    out = {
        "name": name,
        "iters_per_s": round(iters / best, 2),
        "wall_s": round(best, 4),
        "pcg_iters": np.asarray(r.pcg_iters)[:iters].tolist(),
        "chi2_last": round(float(np.asarray(r.errors)[iters - 1]), 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    results = []

    # multi-loop-1k
    cfg = SlamConfig(sim=SimConfig(robot_steps=1050, seed=0))
    controls = synthetic.multi_loop_controls(1049, loop_steps=150)
    sim = frontend.simulate(cfg.sim, controls=controls)
    graph1k, _ = frontend.build_graph(sim, cfg)
    base1k = dict(iterations=15, lr=0.5, solver="schur",
                  exact_odom_jacobians=True, pcg_max_iters=300)
    for pc, chunk in [("tridiag", 0), ("chunk", 64), ("chunk", 128),
                      ("tridiag+coarse", 0), ("chunk+coarse", 64)]:
        opt = OptimizerConfig(pcg_precond=pc, pcg_coarse_group=32,
                              pcg_chunk=chunk or 64, **base1k)
        results.append(run(f"1k/{pc}/c{chunk}", graph1k, opt))

    # large-sparse-10k (tuned budget)
    graph10k, _, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    base10k = dict(iterations=15, lr=1.0, solver="schur",
                   exact_odom_jacobians=True, pcg_tol=1e-2,
                   pcg_max_iters=15, pcg_restart_every=15,
                   pcg_precond_refresh=5, pcg_coarse_group=32)
    for pc, chunk in [("tridiag+coarse", 0), ("chunk+coarse", 32),
                      ("chunk+coarse", 64), ("chunk+coarse", 128)]:
        opt = OptimizerConfig(pcg_precond=pc, pcg_chunk=chunk or 64,
                              **base10k)
        results.append(run(f"10k/{pc}/c{chunk}", graph10k, opt, reps=3))

    print(json.dumps({"platform": jax.devices()[0].platform,
                      "results": results}))


if __name__ == "__main__":
    main()
