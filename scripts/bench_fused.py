"""A/B: fused Pallas PCG vs XLA PCG vs dense Cholesky on real TPU.

Measures GN iterations/s (fetch-fenced, scripts/tputime.py methodology) on
the headline configs, per solver backend:

  dense        — one MXU Cholesky per iteration (round-2 headline winner
                 at 150 poses: 403 iter/s)
  schur-xla    — Schur + XLA while_loop PCG (op-latency bound)
  schur-fused  — Schur + whole-PCG-chunk Pallas kernel (ops/fused_pcg.py)

Writes BENCH_FUSED.json; used to pick the bench.py headline solver.
"""

import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402

import numpy as np


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    from tputime import report, rtt

    from toyslam_tpu.config import OptimizerConfig, SimConfig, SlamConfig
    from toyslam_tpu.optimizer import GaussNewton
    from toyslam_tpu.sim import frontend, synthetic

    print(f"platform={jax.devices()[0].platform} rtt={rtt()*1e3:.2f} ms",
          flush=True)

    # --- workloads --------------------------------------------------------
    # identical workload construction to scripts/bench_suite.py
    cfg_sim = SlamConfig(sim=SimConfig(robot_steps=150, seed=0))
    sim = frontend.simulate(cfg_sim.sim)
    g150, _ = frontend.build_graph(sim, cfg_sim)
    gt150 = np.asarray(sim.poses_gt)

    cfg1k = SlamConfig(sim=SimConfig(robot_steps=1050, seed=0))
    controls = synthetic.multi_loop_controls(1049, loop_steps=150)
    sim1k = frontend.simulate(cfg1k.sim, controls=controls)
    g1k, _ = frontend.build_graph(sim1k, cfg1k)
    gt1k = np.asarray(sim1k.poses_gt)

    workloads = [
        ("reference-150", g150, gt150,
         dict(iterations=10, lr=0.2)),
        ("multi-loop-1k", g1k, gt1k,
         dict(iterations=15, lr=0.5, exact_odom_jacobians=True,
              pcg_max_iters=300)),
    ]

    def variants(kw):
        return {
            "dense": OptimizerConfig(
                iterations=kw["iterations"], lr=kw["lr"], solver="dense"),
            "schur-xla-tridiag": OptimizerConfig(
                solver="schur", pcg_backend="xla", **kw),
            "schur-fused-tridiag": OptimizerConfig(
                solver="schur", pcg_backend="fused", **kw),
            "schur-fused-tridiag+coarse": OptimizerConfig(
                solver="schur", pcg_backend="fused",
                pcg_precond="tridiag+coarse", **kw),
            "schur-fused-jacobi+coarse": OptimizerConfig(
                solver="schur", pcg_backend="fused",
                pcg_precond="jacobi+coarse", **kw),
        }

    results = []
    for name, graph, gt, kw in workloads:
        n_real = gt.shape[0]
        for vname, ocfg in variants(kw).items():
            gn = GaussNewton(ocfg)
            try:
                gd = jax.device_put(gn._prepare(graph))
                res = gn.optimize(gd)           # compile + warm
                est = np.asarray(res.graph.poses)[:n_real]
                iters_run = int(res.iterations_run)
                t = report(
                    f"{name:16s} {vname:26s}",
                    lambda g=gd, gn=gn: gn.optimize(g).graph.poses,
                    reps=10,
                )
                ate = frontend.ate_rmse(est, gt)
                results.append({
                    "config": name, "solver": vname,
                    "gn_iters_per_s": round(iters_run / t, 2),
                    "wall_s": round(t, 5),
                    "iters_run": iters_run,
                    "ate_rmse": round(float(ate), 4),
                    "pcg_iters": np.asarray(res.pcg_iters).tolist(),
                })
            except Exception as e:  # keep the sweep alive per variant
                results.append({
                    "config": name, "solver": vname,
                    "error": f"{type(e).__name__}: {e}"[:200],
                })
            print(json.dumps(results[-1]), flush=True)

    out = {
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "device": str(jax.devices()[0]),
        "results": results,
    }
    with open(os.path.join(REPO, "BENCH_FUSED.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_FUSED.json")


if __name__ == "__main__":
    main()
