"""SE(3)/BA at 512 poses x 4096 points (round-5 item 8): the fused path
must hold its win beyond toy size.  At this scale the resident fused
mode's dense V slabs (151 MB) exceed the 24 MB VMEM budget, so fused_mode
selects the round-5 DENSE-STREAMED band layout (one full-height window,
landmark-chunked columns — ring-camera BA has no run-local structure);
the XLA Schur loop is the opponent.  Both the convergence-policy pair and
a matched-PCG-budget pair (tol 0, fixed cap) are recorded."""

import dataclasses
import json
import os
import statistics
import time

import _bootstrap  # noqa: F401,E402

import jax
import numpy as np

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.ops import fused_pcg
from toyslam_tpu.ops.gather_plan import attach_plan
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import synthetic3d

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench(name, graph, gt, opt, n, reps=3, rounds=3):
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
    errs = np.asarray(r.errors)
    valid = errs[~np.isnan(errs)]
    rec = {
        "config": name,
        "iters_per_s": round(iters / med, 2),
        "iters_per_s_best": round(iters / min(times), 2),
        "iters_run": iters,
        "wall_s": round(med, 4),
        "ate_rmse": round(synthetic3d.pose_ate_rmse(
            np.asarray(r.graph.poses)[:n], gt), 4),
        "chi2_last": round(float(valid[-1]), 1) if valid.size else None,
        "pcg_iters": np.asarray(r.pcg_iters)[:iters].tolist(),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    graph, poses_gt, _ = synthetic3d.make_ba_problem(
        num_poses=512, num_landmarks=4096, obs_per_pose=24, seed=0,
    )
    n = poses_gt.shape[0]
    gchk = attach_plan(graph)
    b = gchk.plan.band
    assert b is not None and (b.dp, b.dl) == (6, 3)
    cfg_probe = OptimizerConfig(
        solver="schur3d", exact_odom_jacobians=True,
        pcg_precond="tridiag", pcg_backend="auto", pcg_fused_chunk=16,
    )
    mode = fused_pcg.fused_mode(cfg_probe, gchk, None)
    print(f"band: B={b.chunk_b} K={b.k_windows} W={b.w_row} "
          f"chunks={b.n_chunks} tile_mb={b.tile_bytes/1e6:.0f} "
          f"mode={mode}", flush=True)
    assert mode == "band"

    rows = []
    for backend in ("fused", "xla"):
        cfg = OptimizerConfig(
            iterations=20, lr=1.0, solver="schur3d",
            exact_odom_jacobians=True, huber_delta=4.0,
            pcg_tol=1e-6, pcg_max_iters=200, convergence_eps=1e-8,
            reject_worse_steps=True, pcg_backend=backend,
            pcg_precond="tridiag", pcg_fused_chunk=16,
        )
        rows.append(bench(f"ba3d-512x4096-{backend}", graph, poses_gt,
                          cfg, n))
    for backend in ("fused", "xla"):
        cfg = OptimizerConfig(
            iterations=20, lr=1.0, solver="schur3d",
            exact_odom_jacobians=True, huber_delta=4.0,
            pcg_tol=0.0, pcg_max_iters=64, pcg_restart_every=64,
            convergence_eps=1e-8,
            reject_worse_steps=True, pcg_backend=backend,
            pcg_precond="tridiag", pcg_fused_chunk=16,
        )
        rows.append(bench(f"ba3d-512x4096-{backend}-matched64", graph,
                          poses_gt, cfg, n))
    out = {
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "device": str(jax.devices()[0]),
        "note": (
            "512x4096 BA: dense-streamed band fused kernel vs XLA Schur "
            "loop; convergence-policy pair + matched-PCG-budget pair "
            "(tol 0 / cap 64 both sides isolates kernel speed)"
        ),
        "band_layout": {
            "chunk_b": b.chunk_b, "k_windows": b.k_windows,
            "w_row": b.w_row, "tile_mb": round(b.tile_bytes / 1e6, 1),
        },
        "speedup_matched": round(
            rows[2]["iters_per_s"] / rows[3]["iters_per_s"], 2),
        "speedup_policy": round(
            rows[0]["iters_per_s"] / rows[1]["iters_per_s"], 2),
        "configs": rows,
    }
    path = os.path.join(REPO, "BENCH_BA512.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
