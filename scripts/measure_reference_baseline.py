"""Measure the reference Python optimizer on the canonical workload.

Runs the *reference's own code* (imported read-only from /root/reference,
never copied) on the exact same 150-pose simulated graph our framework
optimizes, and records BA iterations/s + final ATE into
BASELINE_MEASURED.json.  bench.py reports our numbers relative to these.

Usage:  python scripts/measure_reference_baseline.py
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time

os.environ["MPLBACKEND"] = "Agg"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import _bootstrap  # noqa: F401,E402  (source-checkout shim)
sys.path.insert(0, "/root/reference/python")

import jax

jax.config.update("jax_platforms", "cpu")

from toyslam_tpu.config import SlamConfig, SimConfig
from toyslam_tpu.sim import frontend


def build_reference_graph(graph, lm_map, cfg):
    """Convert our FactorGraph2D into the reference's OptGraph objects."""
    from optimizer.opt_graph import OptGraph
    from optimizer.vertices import VertexPose2d, Vertex2d
    from optimizer.edges2d import EdgeOdometry2d, EdgeLandmark2d

    n_real = int(np.asarray(graph.pose_mask).sum())
    m_real = int(np.asarray(graph.lm_mask).sum())
    poses = np.asarray(graph.poses, np.float64)
    lms = np.asarray(graph.landmarks, np.float64)

    def pose_mat(p):
        c, s = np.cos(p[2]), np.sin(p[2])
        return np.array([[c, -s, p[0]], [s, c, p[1]], [0, 0, 1.0]])

    g = OptGraph()
    for i in range(n_real):
        g.add_vertex(i, VertexPose2d(pose_mat(poses[i])),
                     bool(np.asarray(graph.pose_fixed)[i]))

    om = np.asarray(graph.odom.mask) > 0
    for k in np.nonzero(om)[0]:
        g.add_edge(
            EdgeOdometry2d(
                int(graph.odom.i[k]),
                int(graph.odom.j[k]),
                pose_mat(np.asarray(graph.odom.meas[k], np.float64)),
                np.asarray(graph.odom.info[k], np.float64),
            )
        )
    lmm = np.asarray(graph.lm_edges.mask) > 0
    for k in np.nonzero(lmm)[0]:
        g.add_edge(
            EdgeLandmark2d(
                int(graph.lm_edges.pose[k]),
                n_real + int(graph.lm_edges.lm[k]),
                np.asarray(graph.lm_edges.meas[k], np.float64),
                np.asarray(graph.lm_edges.info[k], np.float64),
            )
        )
    for j in range(m_real):
        g.add_vertex(n_real + j, Vertex2d(lms[j].copy()), False)
    return g


def main():
    from optimizer.graph_optimizer import GraphOptimizer

    cfg = SlamConfig(sim=SimConfig(robot_steps=150, seed=0))
    sim = frontend.simulate(cfg.sim)
    graph, lm_map = frontend.build_graph(sim, cfg)
    n_real = int(np.asarray(graph.pose_mask).sum())
    gt = np.asarray(sim.poses_gt)

    iters = 10
    ref_graph = build_reference_graph(graph, lm_map, cfg)
    opt = GraphOptimizer(ref_graph)
    t0 = time.perf_counter()
    opt.optimize(iters, 0.2)
    t1 = time.perf_counter()

    est = np.array(
        [
            [
                ref_graph.vertices[i].position[0, 2],
                ref_graph.vertices[i].position[1, 2],
            ]
            for i in range(n_real)
        ]
    )
    ate = float(np.sqrt(np.mean(np.sum((est - gt[:, :2]) ** 2, axis=1))))
    ate_dr = frontend.ate_rmse(np.asarray(sim.poses_dr), gt)

    wall = t1 - t0
    out = {
        "workload": "sim 2D LiDAR, 150 poses, seed 0 (reference default config)",
        "pipeline": "reference Python optimizer (numpy/scipy dense GN), "
                    "run from /root/reference/python on identical graph data",
        "iterations": iters,
        "wall_s": wall,
        "iters_per_s": iters / wall,
        "final_ate_rmse": ate,
        "dead_reckoning_ate_rmse": ate_dr,
        "num_poses": n_real,
        "num_landmarks": int(np.asarray(graph.lm_mask).sum()),
        "num_lm_edges": int(np.asarray(graph.lm_edges.mask).sum()),
        "host": platform.processor() or platform.machine(),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
