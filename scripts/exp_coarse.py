"""Measure the two-level preconditioner pieces on the 10k config (TPU)."""

import sys, os

import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax
import jax.numpy as jnp

from tputime import report, rtt
from toyslam_tpu.ops import schur, blockmath as bm
from toyslam_tpu.sim import synthetic


def main():
    graph, poses_gt, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    graph = jax.device_put(graph)
    lam = jnp.asarray(1e-3, jnp.float32)
    print(f"rtt={rtt()*1e3:.1f} ms")

    ab = jax.jit(lambda g: schur.assemble_blocks(
        g, 1.5, exact_odom_jacobians=True))
    sysb = ab(graph)
    d = jax.jit(schur.damp)(sysb, lam)
    hll_inv = jax.jit(schur.inv_blocks)(d.hll)

    for grp in (32, 64, 128):
        cb = jax.jit(lambda dd, hi, grp=grp: schur.build_coarse_precond(
            dd, hi, graph, grp))
        report(f"coarse build g={grp}", cb, d, hll_inv)
        chol = cb(d, hll_inv)
        r = jnp.ones((graph.num_poses, 3), jnp.float32)
        ca = jax.jit(lambda c, r, grp=grp: schur.coarse_apply(c, grp, r))
        report(f"coarse apply (explicit inverse) g={grp}", ca, chol, r,
               reps=30)

        # inverse-matmul variant
        def apply_inv(sci, r, grp=grp):
            n, dp = r.shape
            nc = n // grp
            rc = r.reshape(nc, grp, dp).sum(axis=1).reshape(-1)
            zc = sci @ rc
            return jnp.broadcast_to(
                zc.reshape(nc, 1, dp), (nc, grp, dp)).reshape(n, dp)

        inv = jnp.linalg.inv(chol @ chol.T)
        report(f"coarse apply (inv matmul) g={grp}",
               jax.jit(apply_inv), inv, r, reps=30)

    # closed-form vs lapack batched 3x3 inverse
    op = schur.make_plan_operator(d, hll_inv, graph)
    s_diag = jax.jit(schur.plan_s_diag)(op)
    report("inv3x3 closed form", jax.jit(schur.inv_blocks), s_diag, reps=10)
    report("jnp.linalg.inv 3x3", jax.jit(jnp.linalg.inv), s_diag, reps=10)


if __name__ == "__main__":
    main()
