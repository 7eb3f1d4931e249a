"""Scale demonstration: 100k-pose / 100k-landmark BA on one chip.

The reference caps out at O(N^2) dense-H memory (python/optimizer/
graph_optimizer.py:105 materializes the full H; 100k poses would need
~720 GB).  The Schur+PCG path here is linear in graph size, so one v5e
chip holds and solves a 100k x 100k problem (~700k edges) directly — the
"scaling axis" SURVEY §5 names.  Writes ``BENCH_HUGE.json``.

Settings are the tuned large-sparse-10k truncated-Newton budget
(scripts/exp_budget10k.py) with the coarse grid rescaled to keep the
coarse system ~1000-dim (group = poses // 320; ragged tail supported).
"""

import json
import os
import sys
import time

import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax

from bench_suite import bench_one, _flop_byte_model_10k  # noqa: E402

from toyslam_tpu.config import OptimizerConfig  # noqa: E402
from toyslam_tpu.sim import synthetic  # noqa: E402


def main():
    poses = int(os.environ.get("TOYSLAM_HUGE_POSES", 100_000))
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=poses, num_landmarks=poses, obs_per_pose=6, seed=0,
    )
    group = max(8, poses // 320)
    opt = OptimizerConfig(
        iterations=15, lr=1.0, solver="schur_grid",
        exact_odom_jacobians=True, pcg_tol=1e-2,
        pcg_max_iters=15, pcg_restart_every=15,
        pcg_precond="tridiag+coarse", pcg_coarse_group=group,
        pcg_precond_refresh=5,
    )
    n, m = graph.num_poses, graph.num_landmarks
    flops, bytes_ = _flop_byte_model_10k(
        n, m, graph.odom.count, graph.lm_edges.count,
        pcg_iters=opt.pcg_max_iters, nc=-(-n // group),
    )
    row = bench_one(
        f"huge-{poses // 1000}k", graph, poses_gt, opt, poses,
        reps=1, rounds=3, flops_per_iter=flops, bytes_per_iter=bytes_,
    )
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_HUGE.json"
    )
    with open(path, "w") as f:
        json.dump({
            "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
            "device": str(jax.devices()[0]),
            "note": "single-chip 100k-scale BA; linear-memory Schur+PCG "
                    "(dense reference equivalent would need ~720 GB)",
            "config": row,
        }, f, indent=2)
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
