"""Bisect the lm-edge eval cost: gathers vs math vs output materialization."""

import sys, os, time

import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax
import jax.numpy as jnp

from toyslam_tpu.ops import residuals as res_ops, edge_blocks, schur
from toyslam_tpu.ops import gather_plan as gp
from toyslam_tpu.sim import synthetic


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:56s} {best*1e3:9.3f} ms")
    return out


def main():
    graph, _, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0)
    graph = gp.attach_plan(graph)
    g = graph
    e2 = g.lm_edges.pose.shape[0]

    # 1. gathers only
    timeit("gathers poses[idx], lms[idx] -> sums", jax.jit(
        lambda g: (g.poses[g.lm_edges.pose].sum()
                   + g.landmarks[g.lm_edges.lm].sum())), g)

    # 2. eval with gathers, scalar output
    def eval_scalar(g):
        lme = res_ops.eval_landmark_edges(
            g.poses, g.landmarks, g.lm_edges.pose, g.lm_edges.lm,
            g.lm_edges.meas, g.lm_edges.info, g.lm_edges.mask, 1.5)
        return (lme.r.sum() + lme.JA.sum() + lme.JB.sum()
                + lme.robust_err.sum())
    timeit("eval lm edges -> scalar", jax.jit(eval_scalar), g)

    # 3. full blocks, scalar output
    def blocks_scalar(g):
        lb = edge_blocks.lm_edge_blocks(
            g.poses, g.landmarks, g.lm_edges.pose, g.lm_edges.lm,
            g.lm_edges.meas, g.lm_edges.info, g.lm_edges.mask, 1.5)
        return (lb.w_ata.sum() + lb.w_btb.sum() + lb.w_hpl.sum()
                + lb.bp_c.sum() + lb.bl_c.sum())
    timeit("lm blocks -> scalar", jax.jit(blocks_scalar), g)

    # 4. full blocks, materialized outputs
    def blocks_full(g):
        return edge_blocks.lm_edge_blocks(
            g.poses, g.landmarks, g.lm_edges.pose, g.lm_edges.lm,
            g.lm_edges.meas, g.lm_edges.info, g.lm_edges.mask, 1.5)
    timeit("lm blocks -> materialized", jax.jit(blocks_full), g)

    # 5. pallas backend
    def blocks_pallas(g):
        return edge_blocks.lm_edge_blocks(
            g.poses, g.landmarks, g.lm_edges.pose, g.lm_edges.lm,
            g.lm_edges.meas, g.lm_edges.info, g.lm_edges.mask, 1.5,
            backend="pallas")
    timeit("lm blocks pallas -> materialized", jax.jit(blocks_pallas), g)

    def blocks_pallas_scalar(g):
        lb = blocks_pallas(g)
        return (lb.w_ata.sum() + lb.w_btb.sum() + lb.w_hpl.sum()
                + lb.bp_c.sum() + lb.bl_c.sum())
    timeit("lm blocks pallas -> scalar", jax.jit(blocks_pallas_scalar), g)

    # 6. full assembly with pallas backend
    timeit("assemble_blocks backend=pallas (plan)", jax.jit(
        lambda g: schur.assemble_blocks(g, 1.5, edge_backend="pallas")), g)
    timeit("assemble_blocks backend=xla    (plan)", jax.jit(
        lambda g: schur.assemble_blocks(g, 1.5)), g)


if __name__ == "__main__":
    main()
