"""Phase-level timing of one GN iteration on the current platform."""

import sys, os, time
import _bootstrap  # noqa: F401,E402  (source-checkout shim)

import jax
import jax.numpy as jnp
import numpy as np

from toyslam_tpu.config import *
from toyslam_tpu.sim import frontend
from toyslam_tpu.ops import schur, assemble

def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return out

def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    cfg = SlamConfig(sim=SimConfig(robot_steps=steps))
    sim = frontend.simulate(cfg.sim)
    graph, _ = frontend.build_graph(sim, cfg)
    print(f"poses={graph.num_poses} lms={graph.num_landmarks} "
          f"odom={graph.odom.count} lmE={graph.lm_edges.count} "
          f"D={graph.state_dim}")
    lam = jnp.asarray(1e-3)

    ab = jax.jit(lambda g: schur.assemble_blocks(g, 1.5))
    sys_blocks = timeit("assemble_blocks", ab, graph)

    dampen = jax.jit(lambda s, l: schur.damp(s, l))
    d = dampen(sys_blocks, lam)
    hll_inv = jax.jit(schur.inv2x2)(d.hll)

    mv = jax.jit(lambda s, hi, x: schur.schur_matvec(s, hi, graph, x))
    x0 = jnp.ones((graph.num_poses, 3), jnp.float32)
    timeit("schur_matvec (1x)", mv, d, hll_inv, x0)

    prec = jax.jit(lambda s, hi: schur.schur_preconditioner(s, hi, graph))
    timeit("schur_preconditioner", prec, d, hll_inv)

    for tol, mi in [(1e-6, 200)]:
        sol = jax.jit(lambda g, l: schur.schur_solve(
            schur.assemble_blocks(g, 1.5), g, l, tol, mi))
        timeit(f"full schur_solve tol={tol}", sol, graph, lam)

    # PCG iteration count
    dd = schur.damp(schur.assemble_blocks(graph, 1.5), lam)
    hi = schur.inv2x2(dd.hll)
    rhs = -dd.bp + schur.hpl_matvec(
        dd, graph.lm_edges.pose, graph.lm_edges.lm,
        jnp.einsum("mab,mb->ma", hi, dd.bl), graph.num_poses)
    m_inv = schur.schur_preconditioner(dd, hi, graph)
    res = schur.pcg(
        lambda x: schur.schur_matvec(dd, hi, graph, x),
        lambda r: jnp.einsum("nab,nb->na", m_inv, r),
        rhs, 1e-6, 200)
    print("pcg iterations:", int(res.iterations), "resnorm:", float(res.residual_norm))

    ad = jax.jit(lambda g: assemble.assemble_dense(g, 1.5))
    ds = timeit("assemble_dense", ad, graph)

    solve_chol = jax.jit(lambda H, b, l: jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(H + l * jnp.eye(H.shape[0])), True), -b))
    timeit("dense cholesky solve", solve_chol, ds.H, ds.b, lam)

if __name__ == "__main__":
    main()
