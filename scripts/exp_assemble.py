"""Experiments: where do assemble_blocks' 8.4 ms go, and does channel
packing (one gather per vertex-table) fix it?"""

import sys, os, time, dataclasses

import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax
import jax.numpy as jnp
import numpy as np

from toyslam_tpu.ops import schur, edge_blocks, residuals as res_ops
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
    print(f"{name:52s} {best*1e3:9.3f} ms")
    return out


def main():
    graph, _, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0)
    graph = gp.attach_plan(graph)
    g_noplan = dataclasses.replace(graph, plan=None)
    n, m = graph.num_poses, graph.num_landmarks

    timeit("assemble exact=True  (plan)", jax.jit(
        lambda g: schur.assemble_blocks(g, 1.5, exact_odom_jacobians=True)), graph)
    timeit("assemble exact=False (plan)", jax.jit(
        lambda g: schur.assemble_blocks(g, 1.5)), graph)
    timeit("assemble exact=False (segsum)", jax.jit(
        lambda g: schur.assemble_blocks(g, 1.5)), g_noplan)

    # just the edge evals, no reductions
    timeit("eval lm edges only", jax.jit(lambda g: edge_blocks.lm_edge_blocks(
        g.poses, g.landmarks, g.lm_edges.pose, g.lm_edges.lm,
        g.lm_edges.meas, g.lm_edges.info, g.lm_edges.mask, 1.5)), graph)
    timeit("eval odom exact", jax.jit(lambda g: res_ops.eval_odom_edges(
        g.poses, g.odom.i, g.odom.j, g.odom.meas, g.odom.info, g.odom.mask,
        1.5, exact=True)), graph)

    # table_sum: separate vs packed channels
    lb = edge_blocks.lm_edge_blocks(
        graph.poses, graph.landmarks, graph.lm_edges.pose, graph.lm_edges.lm,
        graph.lm_edges.meas, graph.lm_edges.info, graph.lm_edges.mask, 1.5)
    t_lp = graph.plan.lm_by_pose
    e2 = graph.lm_edges.pose.shape[0]

    def two_sums(w_ata, bp_c):
        return (gp.table_sum(w_ata, t_lp), gp.table_sum(bp_c, t_lp))
    timeit("table_sum separate (9ch + 3ch by pose)", jax.jit(two_sums),
           lb.w_ata, lb.bp_c)

    def packed(w_ata, bp_c):
        packed = jnp.concatenate(
            [w_ata.reshape(e2, 9), bp_c], axis=1)
        out = gp.table_sum(packed, t_lp)
        return out[:, :9].reshape(n, 3, 3), out[:, 9:]
    timeit("table_sum packed   (12ch by pose)", jax.jit(packed),
           lb.w_ata, lb.bp_c)

    def one_sum(w_ata):
        return gp.table_sum(w_ata, t_lp)
    timeit("table_sum single   (9ch by pose)", jax.jit(one_sum), lb.w_ata)
    timeit("table_sum single   (3ch by pose)", jax.jit(one_sum), lb.bp_c)

    # chain shortcut for odometry reductions: shift instead of gather
    ob = edge_blocks.odom_edge_blocks(
        graph.poses, graph.odom.i, graph.odom.j, graph.odom.meas,
        graph.odom.info, graph.odom.mask, 1.5)

    def odom_tables(w_info, wr):
        a = gp.table_sum(w_info, graph.plan.odom_by_i)
        b = gp.table_sum(w_info, graph.plan.odom_by_j)
        return a, b
    timeit("odom reductions via tables (2x 9ch)", jax.jit(odom_tables),
           ob.w_info, ob.wr)

    def odom_chain(w_info, wr):
        # by_i[v] = value[v] (edge v starts at pose v); by_j[v] = value[v-1]
        by_i = w_info[:n]
        by_j = jnp.concatenate([jnp.zeros_like(w_info[:1]), w_info[: n - 1]])
        return by_i, by_j
    timeit("odom reductions via chain shift", jax.jit(odom_chain),
           ob.w_info, ob.wr)

    # is it the gather or the multiply+reduce?
    vals12 = jnp.ones((e2, 12), jnp.float32)
    timeit("raw gather [E2,12] by [N,8]", jax.jit(
        lambda v: v[t_lp.idx]), vals12)
    timeit("raw gather+mask+sum [E2,12] by [N,8]", jax.jit(
        lambda v: (v[t_lp.idx] * t_lp.mask[..., None]).sum(1)), vals12)


if __name__ == "__main__":
    main()
