"""Per-phase strong-scaling decomposition (VERDICT r2 item #3).

Round 2's SCALING.json reported only end-to-end fake-mesh wall times, which
conflate the sharded work (constant total on a fake mesh) with the
replicated work (total multiplies by D) — the curve could not say WHICH
part bounds scaling.  This harness separates the phases per design and per
device count with configuration algebra instead of internal surgery:

  T_build(pc)      = solve with max_iters=0           (linearize + rhs +
                     preconditioner build + back-substitution)
  T_iter(pc)       = [solve(tol=0, max_iters=k2) - solve(tol=0, k1)]
                     / (k2 - k1)                      (one PCG iteration:
                     matvec + preconditioner apply + axpys/dots)
  build/apply split: jacobi vs tridiag+coarse deltas of the above.

On the fake CPU mesh (--xla_force_host_platform_device_count) every
"device" is a thread on the same cores, so measured wall time is TOTAL
work: a phase that is perfectly edge/state-sharded has W(D) ~ const, a
replicated phase has W(D) ~ D * W(1).  Fitting

    W_phase(D) = a + b * D          (a = sharded, b = replicated+collective)

per phase yields the model-backed real-chip efficiency prediction

    eff(D) = (a + b) / (a + D * b)  (per-device time a/D + b; ICI comm not
                                     modellable on a fake mesh and excluded,
                                     so this is an upper bound)

for BOTH designs: the edge-sharded solve (states fully replicated,
parallel/distributed.py) and the keyframe/map-block partitioned solve
(states sharded, parallel/partition.py).  Writes SCALING.json (version 2).

The reference has no distributed story to compare against — its scaling
axis caps at one GPU and O(N^2) dense memory (reference
python/optimizer/graph_optimizer.py:105).
"""

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402  (source-checkout shim)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--poses", type=int, default=2048)
    ap.add_argument("--landmarks", type=int, default=2048)
    ap.add_argument("--obs", type=int, default=6)
    ap.add_argument("--laps", type=int, default=1)
    ap.add_argument("--k1", type=int, default=8)
    ap.add_argument("--k2", type=int, default=40)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.json"))
    args = ap.parse_args()

    if not os.environ.get("TOYSLAM_REAL_DEVICES"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={max(args.devices)}"
        )

    import jax

    if not os.environ.get("TOYSLAM_REAL_DEVICES"):
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from toyslam_tpu.config import OptimizerConfig
    from toyslam_tpu.parallel import distributed, partition
    from toyslam_tpu.sim import synthetic

    graph0, _, _ = synthetic.make_large_problem(
        num_poses=args.poses, num_landmarks=args.landmarks,
        obs_per_pose=args.obs, seed=0, laps=args.laps,
        pose_bucket=256, landmark_bucket=256, edge_bucket=1024,
    )
    lam = jnp.asarray(1e-3, jnp.float32)

    def cfg_for(pc, max_iters, tol):
        # pcg_restart_every = max_iters so the inner fixed-trip chunk runs
        # exactly max_iters iterations — the XLA pcg masks (but still
        # executes) trips beyond max_iters inside a chunk, which would make
        # the k1/k2 walls identical and the per-iteration delta zero.
        return OptimizerConfig(
            solver="schur", pcg_precond=pc, pcg_max_iters=max_iters,
            pcg_tol=tol, pcg_backend="xla", pcg_coarse_group=64,
            pcg_restart_every=max(max_iters, 1),
        )

    def timed(fn, *a):
        out = jax.block_until_ready(fn(*a))  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        del out
        return best

    def measure_design(design, d):
        mesh = Mesh(np.array(jax.devices()[:d]), ("dev",))
        rows = {}
        mem_bytes = None
        for pc in ("jacobi", "tridiag+coarse"):
            variants = {
                "build": cfg_for(pc, 0, 1e-6),
                "k1": cfg_for(pc, args.k1, 0.0),
                "k2": cfg_for(pc, args.k2, 0.0),
            }
            walls = {}
            for name, cfg in variants.items():
                if design == "edge_sharded":
                    solve = distributed.distributed_linearize_solve(
                        cfg, mesh, axis="dev"
                    )
                else:
                    solve = partition.partitioned_linearize_solve(
                        cfg, mesh, axis="dev"
                    )
                gd = solve.prepare(
                    dataclasses.replace(graph0, plan=None)
                )
                g = gd
                if mem_bytes is None:
                    total = sum(
                        np.prod(a.shape) * a.dtype.itemsize
                        for a in jax.tree_util.tree_leaves(g)
                    )
                    # per-device bytes: edge-sharded replicates states and
                    # shards only edges; the partitioned layout shards
                    # every leading axis
                    mem_bytes = int(total)
                fn = jax.jit(lambda gg, ll, s=solve: s(gg, ll)[0])
                walls[name] = timed(fn, gd, lam)
            per_iter = (walls["k2"] - walls["k1"]) / (args.k2 - args.k1)
            rows[pc] = {
                "build_s": round(walls["build"], 5),
                "per_pcg_iter_s": round(per_iter, 6),
                "solve_k2_s": round(walls["k2"], 5),
            }
        return rows, mem_bytes

    def fit_phase(by_d):
        """Least-squares a + b*D over measured device counts."""
        ds = np.array(sorted(by_d), float)
        w = np.array([by_d[int(x)] for x in ds], float)
        A = np.stack([np.ones_like(ds), ds], axis=1)
        (a, b), *_ = np.linalg.lstsq(A, w, rcond=None)
        a, b = max(a, 0.0), max(b, 0.0)
        return a, b

    out = {
        "version": 2,
        "note": (
            "fake CPU mesh: wall time = TOTAL work over devices; "
            "W(D)=a+b*D fit separates sharded (a) from replicated+"
            "collective (b) work; pred_eff = (a+b)/(a+D*b) is the "
            "real-chip upper bound (ICI comm excluded)"
        ),
        "workload": {
            "poses": args.poses, "landmarks": args.landmarks,
            "obs_per_pose": args.obs, "laps": args.laps,
            "k1": args.k1, "k2": args.k2, "reps": args.reps,
            "actual_padded_poses": graph0.num_poses,
            "actual_padded_landmarks": graph0.num_landmarks,
        },
        "designs": {},
    }
    for design in ("edge_sharded", "partitioned"):
        rows_by_d = {}
        mem_by_d = {}
        for d in args.devices:
            rows, mem = measure_design(design, d)
            rows_by_d[d] = rows
            mem_by_d[d] = mem
            print(f"{design} D={d}: {json.dumps(rows)}", flush=True)
        phases = {}
        for pc in ("jacobi", "tridiag+coarse"):
            for phase in ("build_s", "per_pcg_iter_s"):
                key = f"{pc}:{phase}"
                by_d = {d: rows_by_d[d][pc][phase] for d in args.devices}
                a, b = fit_phase(by_d)
                tot = a + b
                phases[key] = {
                    "wall_by_D": {str(d): by_d[d] for d in by_d},
                    "sharded_s": round(a, 6),
                    "replicated_s": round(b, 6),
                    "replicated_fraction": round(b / tot, 4) if tot else None,
                    "pred_eff": {
                        str(d): round((a + b) / (a + d * b), 3)
                        for d in args.devices
                    },
                }
        out["designs"][design] = {
            "phases": phases,
            "graph_bytes_total_by_D": {
                str(d): mem_by_d[d] for d in mem_by_d
            },
        }

    # headline conclusion: full-solve efficiency prediction at max D for
    # the tuned preconditioner, both designs
    dmax = max(args.devices)

    def eff_full(design):
        ph = out["designs"][design]["phases"]
        b_ = ph["tridiag+coarse:build_s"]
        i_ = ph["tridiag+coarse:per_pcg_iter_s"]
        iters = 30.0
        a = b_["sharded_s"] + iters * i_["sharded_s"]
        b = b_["replicated_s"] + iters * i_["replicated_s"]
        return round((a + b) / (a + dmax * b), 3), round(b / (a + b), 4)

    eff_e, frac_e = eff_full("edge_sharded")
    eff_p, frac_p = eff_full("partitioned")
    out["conclusion"] = {
        "pred_eff_at_max_D_edge_sharded": eff_e,
        "pred_eff_at_max_D_partitioned": eff_p,
        "replicated_fraction_edge_sharded": frac_e,
        "replicated_fraction_partitioned": frac_p,
        "statement": (
            f"edge-sharding replicates {frac_e:.0%} of the solve and "
            f"cannot exceed eff {eff_e} at D={dmax}; the partitioned "
            f"design replicates {frac_p:.0%} and predicts eff {eff_p} "
            "(comm excluded) — state partitioning is the scaling path"
            if frac_e > frac_p else
            "measured replicated fractions do not separate the designs"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["conclusion"]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
