"""Phase breakdown of the round-4 champion 10k config (grid assembly +
streamed band fused PCG, BENCH_SUITE config 2) — VERDICT r4 next-step 3:
the kernel solve is ~6.5 ms of a 17 ms GN iteration; this script pins
where the other ~60% goes so the attack is aimed, not guessed.

Subtractive prefix timing: each jitted prefix runs phase 1..k and returns
a scalar probe; phase k's cost = t(prefix k) - t(prefix k-1).  Robust to
XLA fusing differently inside a prefix, honest through the axon tunnel
(fetch-fenced, scripts/tputime.py).
"""

import dataclasses
import json
import sys

import _bootstrap  # noqa: F401,E402

import jax
import jax.numpy as jnp

from tputime import report, rtt

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.ops import blockmath as bm, fused_pcg, grid_schur, schur
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import synthetic


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    precond = sys.argv[2] if len(sys.argv) > 2 else "tridiag+coarse"
    cg = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 15
    if n_poses >= 50_000:
        import math
        from toyslam_tpu.config import NoiseConfig
        noise = NoiseConfig(position_std=0.05,
                            orientation_std=math.radians(0.2))
        graph, poses_gt, _ = synthetic.make_large_problem(
            num_poses=n_poses, num_landmarks=n_poses // 2,
            obs_per_pose=6, seed=0, laps=2, noise=noise,
            pose_bucket=1024, landmark_bucket=1024, edge_bucket=8192,
        )
    else:
        graph, poses_gt, _ = synthetic.make_large_problem(
            num_poses=n_poses, num_landmarks=n_poses, obs_per_pose=6,
            seed=0,
        )
    cfg = OptimizerConfig(
        iterations=15, lr=1.0, solver="schur_grid",
        exact_odom_jacobians=True, pcg_tol=1e-2,
        pcg_max_iters=cap, pcg_restart_every=cap,
        pcg_precond=precond, pcg_coarse_group=cg,
        pcg_precond_refresh=5, pcg_backend="fused", pcg_fused_chunk=cap,
    )
    gp = grid_schur.build_grid_plan(graph)
    graph = jax.device_put(dataclasses.replace(graph, plan=gp))
    gp = graph.plan
    lam = jnp.asarray(1e-3, jnp.float32)
    n, m = graph.num_poses, graph.num_landmarks
    band = gp.band
    assert band is not None and grid_schur._band_mode(cfg, gp, n)
    tile_mb = (band.n_chunks * band.k_windows * 3 * band.w_row
               * band.chunk_b * 2 * 4) / 1e6
    print(f"poses={n} lms={m} band B={band.chunk_b} K={band.k_windows} "
          f"W={band.w_row} tiles={tile_mb:.0f} MB rtt={rtt()*1e3:.1f} ms")
    results = {"tile_stack_mb": round(tile_mb, 1)}

    def _probe(*xs):
        return sum(jnp.sum(x) for x in xs)

    # ---- prefixes ------------------------------------------------------
    def p0_assemble(g, l):
        s = grid_schur._assemble(g, g.plan, cfg)
        return _probe(s.hpp_diag, s.tupper, s.hll, s.bp, s.bl, s.err,
                      s.hpl_L, s.hpl_P)

    def _upto_damp(g, l):
        s = grid_schur._assemble(g, g.plan, cfg)
        d = grid_schur._damp(s, l)
        hll_inv = schur.inv_blocks(d.hll)
        return s, d, hll_inv

    def p1_damp(g, l):
        s, d, hll_inv = _upto_damp(g, l)
        return _probe(d.hpp_diag, hll_inv)

    def _bandop(d, g):
        upper = d.tupper * g.plan.C_mask[:, None, None]
        lm_p = g.plan.P_lm.reshape(n, d.kp)
        return fused_pcg.build_band_operator_grid(
            d.hll, d.hpl_P, lm_p, d.hpp_diag, upper, g.plan.band, n,
        )

    def p2_bandop(g, l):
        s, d, hll_inv = _upto_damp(g, l)
        op = _bandop(d, g)
        return _probe(op.tiles, op.tdiag)

    def _rhs(d, hll_inv, g):
        lm_p = g.plan.P_lm.reshape(n, d.kp)
        v0 = bm.mv(hll_inv, d.bl)
        return -d.bp + jnp.sum(bm.mv(d.hpl_P, v0[lm_p]), axis=1), lm_p

    def p3_rhs(g, l):
        s, d, hll_inv = _upto_damp(g, l)
        op = _bandop(d, g)
        rhs, _ = _rhs(d, hll_inv, g)
        return _probe(op.tiles, op.tdiag, rhs)

    # precond built once outside (the refresh path amortizes it)
    sys_g = grid_schur._assemble(graph, gp, cfg)
    d0 = grid_schur._damp(sys_g, lam)
    hll_inv0 = schur.inv_blocks(d0.hll)
    _, s_diag_fn = grid_schur._matvec_factory(d0, hll_inv0, gp, n, m)
    pre = grid_schur._build_precond(cfg, d0, hll_inv0, s_diag_fn(),
                                    graph, gp)
    pre = jax.device_put(jax.tree.map(lambda x: x, pre))

    def p4_solve(g, l, pr):
        s, d, hll_inv = _upto_damp(g, l)
        op = _bandop(d, g)
        rhs, _ = _rhs(d, hll_inv, g)
        res = fused_pcg.band_fused_pcg(
            op, pr, rhs.T, cfg.pcg_tol, cfg.pcg_max_iters,
            cfg.pcg_fused_chunk, cfg.pcg_restart_every,
        )
        return _probe(res.x) + res.residual_norm

    def p5_full(g, l, pr):
        dx_p, dx_l, err, stats, _ = grid_schur._solve_once(
            cfg, g, g.plan, l, pre=pr
        )
        return _probe(dx_p, dx_l) + err

    t0 = report("P0 grid assemble (both orders)",
                jax.jit(p0_assemble), graph, lam)
    t1 = report("P1 + damp + hll inverse", jax.jit(p1_damp), graph, lam)
    t2 = report("P2 + band operator (tile scatter)",
                jax.jit(p2_bandop), graph, lam)
    t3 = report("P3 + schur rhs", jax.jit(p3_rhs), graph, lam)
    t4 = report(f"P4 + band kernel solve ({cap} it)",
                jax.jit(p4_solve), graph, lam, pre, reps=5)
    t5 = report("P5 solve_once frozen (backsub incl)",
                jax.jit(p5_full), graph, lam, pre, reps=5)

    results.update(
        assemble_ms=round(t0 * 1e3, 3),
        damp_hllinv_ms=round((t1 - t0) * 1e3, 3),
        band_operator_ms=round((t2 - t1) * 1e3, 3),
        rhs_ms=round((t3 - t2) * 1e3, 3),
        kernel_solve_ms=round((t4 - t3) * 1e3, 3),
        backsub_ms=round((t5 - t4) * 1e3, 3),
        solve_once_frozen_ms=round(t5 * 1e3, 3),
    )

    # precond build, amortized across the refresh window
    def pbuild(g, l):
        s, d, hll_inv = _upto_damp(g, l)
        _, sdf = grid_schur._matvec_factory(d, hll_inv, g.plan, n, m)
        pr = grid_schur._build_precond(cfg, d, hll_inv, sdf(), g, g.plan)
        return _probe(*jax.tree_util.tree_leaves(pr))

    tp = report("precond build (tridiag+coarse+relayout)",
                jax.jit(pbuild), graph, lam, reps=5)
    results["precond_build_ms"] = round(tp * 1e3, 3)
    results["precond_amortized_ms"] = round(
        tp * 1e3 / cfg.pcg_precond_refresh, 3)

    # whole optimize(): wall per GN iteration, the headline denominator
    import time as _time
    import numpy as _np

    gn = GaussNewton(cfg)
    r = gn.optimize(graph)
    _np.asarray(r.graph.poses)  # warm + fence
    best = float("inf")
    for _ in range(3):
        tw = _time.perf_counter()
        r = gn.optimize(graph)
        _np.asarray(r.graph.poses)
        best = min(best, _time.perf_counter() - tw)
    iters = int(r.iterations_run)
    results["optimize_wall_ms_per_gn"] = round(best / iters * 1e3, 3)
    results["gn_iters_per_s"] = round(iters / best, 2)
    results["iters_run"] = iters

    # implied GN-control overhead = wall - (solve_once + amortized precond)
    results["control_overhead_ms"] = round(
        results["optimize_wall_ms_per_gn"]
        - results["solve_once_frozen_ms"]
        - results["precond_amortized_ms"], 3)
    results["platform"] = jax.devices()[0].platform
    print(json.dumps(results))
    # committed phase-breakdown artifact (VERDICT r4 next-step 3)
    import os as _os
    import time as _t
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    path = _os.path.join(repo, "PROFILE_BAND10K.json")
    results["config"] = dict(
        n_poses=n_poses, precond=precond, coarse_group=cg, pcg_cap=cap)
    results["measured_at"] = _t.strftime("%Y-%m-%d %H:%M:%S")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
