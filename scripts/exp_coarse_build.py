"""Sub-profile of the 10k tridiag+coarse preconditioner build (round 4):
where do the 23 ms go?"""

import json

import _bootstrap  # noqa: F401,E402

import jax
import jax.numpy as jnp

from tputime import report

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.ops import grid_schur, schur
from toyslam_tpu.sim import synthetic


def main():
    graph, _, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    cfg = OptimizerConfig(
        solver="schur_grid", exact_odom_jacobians=True,
        pcg_precond="tridiag+coarse", pcg_coarse_group=32,
    )
    import dataclasses
    graph = jax.device_put(
        dataclasses.replace(graph, plan=grid_schur.build_grid_plan(graph)))
    gp = graph.plan
    lam = jnp.asarray(1e-3, jnp.float32)
    n, m = graph.num_poses, graph.num_landmarks

    sys_g = grid_schur._assemble(graph, gp, cfg)
    d = grid_schur._damp(sys_g, lam)
    hll_inv = schur.inv_blocks(d.hll)
    _, s_diag_fn = grid_schur._matvec_factory(d, hll_inv, gp, n, m)
    s_diag = jax.jit(s_diag_fn)()
    upper = d.tupper * gp.C_mask[:, None, None]

    r = {}
    r["pcr_build_ms"] = report(
        "PCR tridiag build", jax.jit(schur.build_tridiag_precond),
        s_diag, upper) * 1e3
    r["chunk_build_ms"] = report(
        "chunk build (64)", jax.jit(
            lambda sd, up: schur.build_chunk_precond(sd, up, 64)),
        s_diag, upper) * 1e3

    fs = grid_schur._flat_system(d, graph, gp)
    fv = grid_schur._FlatGraphView(graph, gp)
    cb = jax.jit(lambda: schur.build_coarse_precond(
        fs, hll_inv, fv, cfg.pcg_coarse_group))
    r["coarse_build_ms"] = report(
        "coarse build -> NS explicit inverse", cb) * 1e3
    cinv = cb()
    dim = cinv.shape[0]
    r["dim"] = dim
    # primitive comparison on a same-size SPD matrix (band + gauge spike)
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (dim, dim)) * 0.1
    sc = g @ g.T + jnp.eye(dim)
    sc = sc.at[0, 0].add(1e6)
    eye = jnp.eye(dim, dtype=sc.dtype)
    r["chol_only_ms"] = report(
        "jnp.linalg.cholesky(sc)", jax.jit(jnp.linalg.cholesky), sc) * 1e3
    c = jnp.linalg.cholesky(sc)
    r["cho_solve_eye_ms"] = report(
        "cho_solve(chol, eye)",
        jax.jit(lambda cc: jax.scipy.linalg.cho_solve((cc, True), eye)),
        c) * 1e3
    r["linalg_inv_ms"] = report(
        "jnp.linalg.inv(sc)", jax.jit(jnp.linalg.inv), sc) * 1e3
    r["spd_inverse_ms"] = report(
        "spd_inverse (Newton-Schulz)", jax.jit(schur.spd_inverse), sc) * 1e3
    x = schur.spd_inverse(sc)
    resid = jnp.linalg.norm(x @ sc - eye) / (dim ** 0.5)
    r["ns_resid"] = float(resid)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in r.items()}))


if __name__ == "__main__":
    main()
