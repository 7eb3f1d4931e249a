"""Probe where band_operator's 5.6 ms and the 3.3 ms control overhead go
(round-5 item 3).  Sub-piece timing of build_band_operator_grid + GN-loop
variants."""

import dataclasses
import sys

import _bootstrap  # noqa: F401,E402

import jax
import jax.numpy as jnp
import numpy as np

from tputime import report, rtt

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.ops import blockmath as bm, fused_pcg, grid_schur, schur
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import synthetic


def main():
    n_poses = 10_000
    graph, _, _ = synthetic.make_large_problem(
        num_poses=n_poses, num_landmarks=n_poses, obs_per_pose=6, seed=0,
    )
    cfg = OptimizerConfig(
        iterations=15, lr=1.0, solver="schur_grid",
        exact_odom_jacobians=True, pcg_tol=1e-2,
        pcg_max_iters=15, pcg_restart_every=15,
        pcg_precond="tridiag+coarse", pcg_coarse_group=32,
        pcg_precond_refresh=5, pcg_backend="fused", pcg_fused_chunk=15,
    )
    gp = grid_schur.build_grid_plan(graph)
    graph = jax.device_put(dataclasses.replace(graph, plan=gp))
    gp = graph.plan
    lam = jnp.asarray(1e-3, jnp.float32)
    n, m = graph.num_poses, graph.num_landmarks
    gb = gp.band
    print(f"rtt={rtt()*1e3:.1f} ms")

    sys_g = grid_schur._assemble(graph, gp, cfg)
    d = grid_schur._damp(sys_g, lam)
    dev = jax.device_put
    hll, hpl_p, hpp_diag = dev(d.hll), dev(d.hpl_P), dev(d.hpp_diag)
    upper = dev(d.tupper * gp.C_mask[:, None, None])
    lm_p = dev(gp.P_lm.reshape(n, d.kp))

    # -- sub-pieces of build_band_operator_grid -------------------------
    def piece_blk(hll, hpl_p):
        lh = fused_pcg._chol_spd(hll)
        el = jnp.swapaxes(fused_pcg._tri_inv_lower(lh), -1, -2)
        return bm.mm(hpl_p, el[lm_p])

    blk = jax.jit(piece_blk)(hll, hpl_p)
    blk = dev(blk)
    report("blk = mm(hpl_P, el[lm])", jax.jit(
        lambda a, b: jnp.sum(piece_blk(a, b))), hll, hpl_p, reps=20)

    def piece_gather_row(blk):
        return jnp.sum(blk.reshape(-1, 6)[gb.src_rows])

    report("gather vals (row ids)", jax.jit(piece_gather_row), blk,
           reps=20)

    n_tiles = gb.n_chunks * gb.k_windows
    stride_a = gb.w_row * gb.chunk_b * 2
    flat_size = n_tiles * 3 * stride_a

    def piece_scatter(blk):
        rows = blk.reshape(-1, 6)[gb.src_rows]
        flat = jnp.zeros((flat_size,), jnp.float32)
        flat = flat.at[gb.elem_ids].set(rows.reshape(-1),
                                        unique_indices=True)
        return jnp.sum(flat)

    report("row gather + unsorted scatter (full)", jax.jit(piece_scatter),
           blk, reps=10)

    def piece_zeros():
        return jnp.sum(jnp.zeros((flat_size,), jnp.float32) + 1.0)

    report("zeros materialize (bound)", jax.jit(piece_zeros), reps=10)

    def full_op(hll, hpl_p, hpp_diag, upper):
        op = fused_pcg.build_band_operator_grid(
            hll, hpl_p, lm_p, hpp_diag, upper, gb, n,
        )
        return jnp.sum(op.tiles) + jnp.sum(op.tdiag)

    report("build_band_operator_grid (all)", jax.jit(full_op),
           hll, hpl_p, hpp_diag, upper, reps=10)

    # -- GN control-loop variants ---------------------------------------
    import time as _time

    def wall_per_gn(c):
        gn = GaussNewton(c)
        r = gn.optimize(graph)
        np.asarray(r.graph.poses)
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            r = gn.optimize(graph)
            np.asarray(r.graph.poses)
            best = min(best, _time.perf_counter() - t0)
        return best / int(r.iterations_run) * 1e3, int(r.iterations_run)

    w_frozen, it0 = wall_per_gn(
        dataclasses.replace(cfg, pcg_precond_refresh=0))
    print(f"optimize wall/GN refresh=0 (frozen): {w_frozen:.3f} ms "
          f"({it0} iters)")
    w_r5, it5 = wall_per_gn(cfg)
    print(f"optimize wall/GN refresh=5:          {w_r5:.3f} ms "
          f"({it5} iters)")
    w_r1, it1 = wall_per_gn(
        dataclasses.replace(cfg, pcg_precond_refresh=1))
    print(f"optimize wall/GN refresh=1:          {w_r1:.3f} ms "
          f"({it1} iters)")


if __name__ == "__main__":
    main()
