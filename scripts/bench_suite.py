"""Full benchmark suite over BASELINE.json's workload configs.

Prints one JSON line per config and writes the combined matrix to
``BENCH_SUITE.json`` at the repo root (the recorded perf artifact).
bench.py remains the single-line headline benchmark; this suite covers the
scale-up matrix:

  0. reference workload  — 150 poses   (parity vs BASELINE_MEASURED.json)
  1. multi-loop closures — ~1k poses
  2. large sparse        — ~10k poses / ~10k landmarks (Schur + PCG,
     truncated-Newton budget tuned on TPU: see scripts/exp_budget10k.py)

Timing is fetch-fenced (scripts/tputime.py): ``jax.block_until_ready``
does NOT block through the remote-TPU tunnel, so timings that relied on it
(round-1 artifacts) measured enqueue cost, not device time.

For the large config the output also carries a roofline/speed-of-light
estimate: a FLOP and HBM-byte model of one GN iteration, achieved GFLOP/s
and GB/s, and the fraction of the v5e peaks — the honest accounting the
north star asks for (the workload is latency-bound: ~40 small [10k,3]-sized
ops per PCG iteration, each touching ~0.1-10 MB).
"""

import dataclasses
import json
import os
import statistics
import sys
import time

import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax
import numpy as np

from toyslam_tpu.config import OptimizerConfig, SimConfig, SlamConfig
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend, synthetic

# v5e single-chip peaks (public: jax-ml.github.io/scaling-book): HBM BW
# ~819 GB/s; VPU f32 ~ (8, 128) x 4 ALUs x ~0.94 GHz x 2 ~ 7.5 TFLOP/s
# upper bound (elementwise FMA); we quote the HBM bound as the relevant
# ceiling — this op mix never feeds the MXU.
V5E_HBM_GBPS = 819.0
V5E_VPU_TFLOPS = 7.5


def _fetch(x):
    return np.asarray(x)


def bench_one(name, graph, gt, opt_cfg, n_real, reps=5, rounds=3,
              flops_per_iter=None, bytes_per_iter=None):
    gn = GaussNewton(opt_cfg)
    g = jax.device_put(gn._prepare(graph))
    r = gn.optimize(g)
    est = _fetch(r.graph.poses)[:n_real]  # fetch = fence + warmup
    iters = int(r.iterations_run)

    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = gn.optimize(g)
        _fetch(r.graph.poses)
        times.append((time.perf_counter() - t0) / reps)
    est = _fetch(r.graph.poses)[:n_real]

    # median-of-rounds headline (VERDICT r4 weak #3: ±10-20% device
    # day-drift makes best-of-rounds inflate); spread recorded alongside
    med = statistics.median(times)
    errs = np.asarray(r.errors)
    valid = errs[~np.isnan(errs)]
    out = {
        "config": name,
        "poses": n_real,
        "landmarks": int(np.asarray(graph.lm_mask).sum()),
        "lm_edges": int(np.asarray(graph.lm_edges.mask).sum()),
        "iters_per_s": round(iters / med, 2),
        "iters_per_s_best": round(iters / min(times), 2),
        "headline_stat": "median of rounds",
        "iters_run": iters,
        "wall_s": round(med, 4),
        "wall_s_rounds": [round(t, 4) for t in times],
        "ate_rmse": round(frontend.ate_rmse(est, gt), 4),
        "ate_dead_reckoning": round(
            frontend.ate_rmse(np.asarray(graph.poses)[:n_real], gt), 4
        ),
        "chi2_first": round(float(valid[0]), 1) if valid.size else None,
        "chi2_last": round(float(valid[-1]), 1) if valid.size else None,
        "pcg_iters": np.asarray(r.pcg_iters)[:iters].tolist(),
        "edge_backend": opt_cfg.edge_backend,
        "platform": jax.devices()[0].platform,
    }
    if flops_per_iter:
        t_iter = med / iters
        out["flops_per_gn_iter_model"] = int(flops_per_iter)
        out["achieved_gflops"] = round(flops_per_iter / t_iter / 1e9, 2)
        out["vpu_peak_fraction"] = round(
            flops_per_iter / t_iter / (V5E_VPU_TFLOPS * 1e12), 5
        )
    if bytes_per_iter:
        t_iter = med / iters
        out["hbm_bytes_per_gn_iter_model"] = int(bytes_per_iter)
        out["achieved_gbps"] = round(bytes_per_iter / t_iter / 1e9, 2)
        out["hbm_peak_fraction"] = round(
            bytes_per_iter / t_iter / (V5E_HBM_GBPS * 1e9), 4
        )
    print(json.dumps(out), flush=True)
    return out


def _flop_byte_model_10k(n, m, e1, e2, pcg_iters, levels=14, nc=320):
    """Rough per-GN-iteration FLOP / HBM-byte model for the Schur path.

    FLOPs: linearization ~350/edge; per PCG iteration the plan matvec
    (~48 flops per lm edge twice + block diagonals), the PCR tridiag apply
    (levels x 2 block-matvecs over N), the coarse solve (2 (3 nc)^2) and
    ~6 axpy/dot passes.  Bytes: every PCG iteration re-reads the dual-layout
    grids (~4.5 MB), the PCR factors (2 levels x N x 9 f32) and the coarse
    factor.  Latency, not these, is the measured bound — the model gives
    the speed-of-light distance.
    """
    lin = 350 * (e1 + e2)
    matvec = 48 * 2 * e2 + 8 * m + 18 * n + 36 * e1
    tri = levels * 40 * n
    coarse = 2 * (3 * nc) ** 2
    axpy = 8 * 3 * n
    flops = lin + pcg_iters * (matvec + tri + coarse + axpy)

    grids = (e2 * 6 * 2 + n * 9 + m * 4 + e1 * 9 * 2) * 4
    pcr = (2 * levels + 1) * n * 9 * 4
    coarse_b = (3 * nc) ** 2 * 4
    state = 6 * n * 3 * 4
    bytes_ = (e1 + e2) * 30 * 4 + pcg_iters * (
        grids + pcr + coarse_b + state
    )
    return flops, bytes_


def bench_ba3d(reps=5, rounds=3, num_poses=128, num_landmarks=512,
               matched_budget=False):
    """fused-vs-XLA SE(3)/BA A/B.  ``matched_budget=True`` pins BOTH
    sides to an identical fixed PCG budget (tol 0, cap 64) so the ratio
    isolates kernel speed — the convergence-policy rows alone conflate
    the fused true-residual exit with per-iteration speed (VERDICT r4
    weak #4: the XLA leg stalls at the 200-iteration cap on early GN
    iterations where the fused exit does not)."""
    import jax.numpy as jnp

    from toyslam_tpu.config import OptimizerConfig
    from toyslam_tpu.ops import residuals3d
    from toyslam_tpu.optimizer import GaussNewton
    from toyslam_tpu.sim import synthetic3d

    graph, poses_gt, _ = synthetic3d.make_ba_problem(
        num_poses=num_poses, num_landmarks=num_landmarks,
        obs_per_pose=24, seed=0,
    )
    n = poses_gt.shape[0]

    def reproj_rmse(g):
        ev = residuals3d.eval_reproj_edges(
            g.poses, g.landmarks, g.intrinsics, g.lm_edges.pose,
            g.lm_edges.lm, g.lm_edges.meas, g.lm_edges.info,
            g.lm_edges.mask, huber_delta=1e9,
        )
        r2 = np.sum(np.asarray(ev.r) ** 2, axis=-1)
        msk = np.asarray(g.lm_edges.mask) > 0
        return float(np.sqrt(r2[msk].mean()))

    out = []
    for backend in ("fused", "xla"):
        if matched_budget:
            cfg = OptimizerConfig(
                iterations=20, lr=1.0, solver="schur3d",
                exact_odom_jacobians=True, huber_delta=4.0,
                pcg_tol=0.0, pcg_max_iters=64, pcg_restart_every=64,
                convergence_eps=1e-8,
                reject_worse_steps=True, pcg_backend=backend,
                pcg_precond="tridiag", pcg_fused_chunk=16,
            )
        else:
            cfg = OptimizerConfig(
                iterations=20, lr=1.0, solver="schur3d",
                exact_odom_jacobians=True, huber_delta=4.0,
                pcg_tol=1e-6, pcg_max_iters=200, convergence_eps=1e-8,
                reject_worse_steps=True, pcg_backend=backend,
                pcg_precond="tridiag", pcg_fused_chunk=16,
            )
        gn = GaussNewton(cfg)
        g = jax.device_put(gn._prepare(graph))
        r = gn.optimize(g)
        est = _fetch(r.graph.poses)[:n]
        iters = int(r.iterations_run)
        times = []
        for _ in range(rounds):
            t0 = time.time()
            for _ in range(reps):
                r = gn.optimize(g)
            _fetch(r.graph.poses)
            times.append((time.time() - t0) / reps)
        med = statistics.median(times)
        est = _fetch(r.graph.poses)[:n]
        errs = np.asarray(r.errors)
        valid = errs[~np.isnan(errs)]
        rec = {
            "config": (
                f"ba3d-{num_poses}x{num_landmarks}-{backend}"
                + ("-matched64" if matched_budget else "")
            ),
            "poses": n,
            "landmarks": int(np.asarray(graph.lm_mask).sum()),
            "lm_edges": int(np.asarray(graph.lm_edges.mask).sum()),
            "iters_per_s": round(iters / med, 2),
            "iters_per_s_best": round(iters / min(times), 2),
            "headline_stat": "median of rounds",
            "iters_run": iters,
            "wall_s": round(med, 4),
            "wall_s_rounds": [round(t, 4) for t in times],
            "ate_rmse": round(
                synthetic3d.pose_ate_rmse(est, poses_gt), 4
            ),
            "ate_initial": round(synthetic3d.pose_ate_rmse(
                np.asarray(graph.poses)[:n], poses_gt), 4),
            "reproj_rmse_px": round(reproj_rmse(r.graph), 4),
            "chi2_first": round(float(valid[0]), 1) if valid.size else None,
            "chi2_last": round(float(valid[-1]), 1) if valid.size else None,
            "pcg_iters": np.asarray(r.pcg_iters)[:iters].tolist(),
            "platform": jax.devices()[0].platform,
        }
        print(json.dumps(rec), flush=True)
        out.append(rec)
    return out


def main():
    results = []

    # 0. reference workload (parity config: reference-equivalent settings)
    cfg = SlamConfig(sim=SimConfig(robot_steps=150, seed=0))
    sim = frontend.simulate(cfg.sim)
    graph, _ = frontend.build_graph(sim, cfg)
    results.append(bench_one(
        "reference-150",
        graph,
        sim.poses_gt,
        OptimizerConfig(iterations=10, lr=0.2, solver="schur"),
        150,
        reps=20,
    ))

    # 1. multi-loop ~1k poses with loop closures
    cfg = SlamConfig(sim=SimConfig(robot_steps=1050, seed=0))
    controls = synthetic.multi_loop_controls(1049, loop_steps=150)
    sim = frontend.simulate(cfg.sim, controls=controls)
    graph, _ = frontend.build_graph(sim, cfg)
    results.append(bench_one(
        "multi-loop-1k",
        graph,
        sim.poses_gt,
        OptimizerConfig(
            iterations=15, lr=0.5, solver="schur",
            exact_odom_jacobians=True, pcg_max_iters=300,
        ),
        1050,
        reps=10,
    ))

    # 2. large sparse ~10k x ~10k — truncated-Newton budget tuned on TPU
    # (exp_budget10k.py): chi2_last 6650 == the fully-converged value, well
    # below chi2(ground truth) = 7937 (the workload is drift-limited, so
    # GT-chi2 is the quality gate, not ATE).
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    # solver="schur_grid": dual-order grid storage (ops/grid_schur.py) —
    # measured 54.3 vs 37.4 GN-iter/s against the general path on this
    # exact config at identical chi2/pcg trajectories (BENCH_GRID.json).
    # pcg_backend="auto": the framework's measured cost gate
    # (grid_schur._band_cost_wins, round 5 — no per-workload solver
    # override) selects the streamed band kernel here: 60.1 vs 50.3
    # GN-iter/s same-session at chi^2 rel dev 3e-4 (exp_band10k_r5)
    opt = OptimizerConfig(
        iterations=15, lr=1.0, solver="schur_grid",
        exact_odom_jacobians=True, pcg_tol=1e-2,
        pcg_max_iters=15, pcg_restart_every=15,
        pcg_precond="tridiag+coarse", pcg_coarse_group=32,
        pcg_precond_refresh=5, pcg_backend="auto", pcg_fused_chunk=15,
    )
    n, m = graph.num_poses, graph.num_landmarks
    flops, bytes_ = _flop_byte_model_10k(
        n, m, graph.odom.count, graph.lm_edges.count,
        pcg_iters=opt.pcg_max_iters, nc=n // opt.pcg_coarse_group,
    )
    results.append(bench_one(
        "large-sparse-10k",
        graph,
        poses_gt,
        opt,
        10_000,
        reps=3,
        flops_per_iter=flops,
        bytes_per_iter=bytes_,
    ))

    # 3. large sparse 10k with REVISITS (laps=2): every lap re-observes the
    # map, so ATE is observable — the trajectory-recovery gate the
    # no-loop-closure workload above cannot provide (VERDICT r2 weak #4).
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=5_000, obs_per_pose=6, seed=0,
        laps=2,
    )
    # pcg_backend stays "auto": with the round-5 landmark-chunked
    # relayout the laps=2 stack shrank 377 -> 179 MB and the measured
    # winner FLIPPED to the band kernel (70.8 vs 63.5 GN-iter/s,
    # exp_band10k_r5) — the cost gate selects it
    results.append(bench_one(
        "large-sparse-10k-revisit",
        graph,
        poses_gt,
        dataclasses.replace(opt, iterations=20, pcg_backend="auto"),
        poses_gt.shape[0],
        reps=3,
    ))

    # 4. SE(3)/BA — BASELINE configs[3], the reference's "further
    # development" roadmap (reference README.md:52-56).  Records
    # reprojection RMSE + translation ATE + iter/s, and the fused(dp=6)
    # vs XLA PCG A/B on the identical problem (VERDICT r3 missing #2).
    results.extend(bench_ba3d())
    # matched-PCG-budget pair: isolates kernel speed from exit policy
    results.extend(bench_ba3d(matched_budget=True))

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_SUITE.json"
    )
    with open(path, "w") as f:
        json.dump({
            "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
            "device": str(jax.devices()[0]),
            "note": "fetch-fenced timing (scripts/tputime.py); "
                    "median-of-rounds headline, all rounds recorded",
            "configs": results,
        }, f, indent=2)
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
