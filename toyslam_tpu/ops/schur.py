"""Block-sparse normal equations with Schur-complement landmark elimination.

The reference always materializes a dense ``D x D`` Hessian and solves it
with dense QR/LU (python/optimizer/graph_optimizer.py:105,64; CUDA dense QR
remote/cuda/solver/SolverCudaQr.h:44-81) — O(D^2) memory caps it at small
graphs.  SLAM Hessians are block-sparse with an arrowhead structure: the
landmark-landmark block ``Hll`` is block-diagonal (2x2 per landmark), so
landmarks can be eliminated locally and the reduced pose system

    S = Hpp - Hpl Hll^-1 Hlp,     S dx_p = -b_p + Hpl Hll^-1 b_l

solved by preconditioned conjugate gradients with a *matrix-free* matvec:
``S x`` only needs per-edge 3x3/3x2 block products and deterministic
``segment_sum`` scatters — never a dense matrix.  This is the scaling path
for the ~10k-pose configs and the unit of distribution (each device owns a
shard of edges/landmarks; ``S x`` partials reduce over the mesh — see
``parallel/distributed.py``).

Memory: O(N·9 + M·4 + E1·9 + E2·6) floats — linear in the graph.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.models.graph import FactorGraph2D
from toyslam_tpu.ops import edge_blocks
from toyslam_tpu.ops import gather_plan as gp
from toyslam_tpu.ops import blockmath as bm
from toyslam_tpu.ops.precision import einsum
from toyslam_tpu.ops import residuals as res_ops


def _vertex_sum(values, ids, num, table):
    """Per-vertex reduction of per-edge values.

    Uses the scatter-free gather table when the graph carries a GatherPlan
    (ops/gather_plan.py) — TPU scatters serialize, gathers don't — and falls
    back to segment_sum (needed under shard_map, where tables would index
    sharded edge arrays).
    """
    if table is not None:
        return gp.table_sum(values, table)
    return jax.ops.segment_sum(values, ids, num)


def _maybe_psum(x, axis_name):
    """psum when running inside shard_map; identity single-device.

    Every reduction in this module that crosses the edge/landmark shard
    boundary funnels through here, so the identical code path serves one
    chip or a whole mesh (parallel/distributed.py).
    """
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


class BlockSystem(NamedTuple):
    """Undamped block-sparse normal equations (gauge priors included)."""

    hpp_diag: jax.Array   # f32[N,3,3] pose diagonal blocks
    hpp_off: jax.Array    # f32[E1,3,3] odometry off-diagonal block at (i, j)
    hll: jax.Array        # f32[M,2,2] landmark diagonal blocks
    hpl: jax.Array        # f32[E2,3,2] pose-landmark coupling block per edge
    bp: jax.Array         # f32[N,3] pose gradient
    bl: jax.Array         # f32[M,2] landmark gradient
    err: jax.Array        # f32[] robust chi^2


def assemble_blocks(
    graph: FactorGraph2D,
    huber_delta: float,
    fixed_prior: float = 1e6,
    exact_odom_jacobians: bool = False,
    axis_name: str | None = None,
    edge_backend: str = "xla",
) -> BlockSystem:
    """Same math as ops/assemble.py but materializing only the sparse blocks.

    Per-edge linearization goes through ops/edge_blocks.py — ``edge_backend``
    selects the fused Pallas kernels ("pallas", ops/pallas_edges.py) or the
    batched XLA oracle ("xla").  With ``axis_name`` set (inside shard_map,
    edge arrays sharded), the per-vertex reductions are psum'd so every
    device holds the complete diagonal blocks/gradients while the
    off-diagonal per-edge blocks (``hpp_off``, ``hpl``) stay shard-local.
    """
    n, m = graph.num_poses, graph.num_landmarks

    plan = graph.plan
    t_oi = plan.odom_by_i if plan is not None else None
    t_oj = plan.odom_by_j if plan is not None else None
    t_lp = plan.lm_by_pose if plan is not None else None
    t_ll = plan.lm_by_lm if plan is not None else None

    # --- odometry contributions --------------------------------------
    if exact_odom_jacobians:
        # General Jacobians: keep the full-formula path (non-default mode;
        # the A=-I/B=I structure below does not apply).
        od = res_ops.eval_odom_edges(
            graph.poses,
            graph.odom.i,
            graph.odom.j,
            graph.odom.meas,
            graph.odom.info,
            graph.odom.mask,
            huber_delta,
            exact=True,
        )
        w_od = od.w[:, None, None] * graph.odom.info      # [E1,3,3]
        ata = bm.quad(od.JA, w_od)
        btb = bm.quad(od.JB, w_od)
        atb = bm.mtm(od.JA, bm.mm(w_od, od.JB))
        wr_i = bm.mtv(od.JA, bm.mv(w_od, od.r))
        wr_j = bm.mtv(od.JB, bm.mv(w_od, od.r))
        odom_err = jnp.sum(od.robust_err)
    else:
        ob = edge_blocks.odom_edge_blocks(
            graph.poses,
            graph.odom.i,
            graph.odom.j,
            graph.odom.meas,
            graph.odom.info,
            graph.odom.mask,
            huber_delta,
            backend=edge_backend,
        )
        # A=-I, B=I collapses every product to ±W' (KernelSe2.cu exploits
        # the same structure on the reference's CUDA path).
        ata = ob.w_info
        btb = ob.w_info
        atb = -ob.w_info
        wr_i = -ob.wr
        wr_j = ob.wr
        odom_err = jnp.sum(ob.robust_err)

    bp = _vertex_sum(wr_i, graph.odom.i, n, t_oi)
    bp = bp + _vertex_sum(wr_j, graph.odom.j, n, t_oj)
    hpp_diag = _vertex_sum(ata, graph.odom.i, n, t_oi)
    hpp_diag = hpp_diag + _vertex_sum(btb, graph.odom.j, n, t_oj)
    hpp_off = atb

    # --- landmark contributions --------------------------------------
    lb = edge_blocks.lm_edge_blocks(
        graph.poses,
        graph.landmarks,
        graph.lm_edges.pose,
        graph.lm_edges.lm,
        graph.lm_edges.meas,
        graph.lm_edges.info,
        graph.lm_edges.mask,
        huber_delta,
        backend=edge_backend,
    )
    hpl = lb.w_hpl                                                # [E2,3,2]
    hpp_diag = hpp_diag + _vertex_sum(lb.w_ata, graph.lm_edges.pose, n, t_lp)
    hll = _vertex_sum(lb.w_btb, graph.lm_edges.lm, m, t_ll)
    bp = bp + _vertex_sum(lb.bp_c, graph.lm_edges.pose, n, t_lp)
    bl = _vertex_sum(lb.bl_c, graph.lm_edges.lm, m, t_ll)

    # Cross-shard reduction of everything indexed per-vertex; per-edge
    # blocks stay local to their shard.
    hpp_diag = _maybe_psum(hpp_diag, axis_name)
    hll = _maybe_psum(hll, axis_name)
    bp = _maybe_psum(bp, axis_name)
    bl = _maybe_psum(bl, axis_name)

    # --- gauge priors + padding regularization -----------------------
    eye3 = jnp.eye(3, dtype=hpp_diag.dtype)
    eye2 = jnp.eye(2, dtype=hll.dtype)
    pose_reg = fixed_prior * graph.pose_fixed + (1.0 - graph.pose_mask)
    lm_reg = fixed_prior * graph.lm_fixed + (1.0 - graph.lm_mask)
    hpp_diag = hpp_diag + pose_reg[:, None, None] * eye3
    hll = hll + lm_reg[:, None, None] * eye2
    bp = bp * (1.0 - graph.pose_fixed)[:, None]
    bl = bl * (1.0 - graph.lm_fixed)[:, None]

    err = _maybe_psum(odom_err + jnp.sum(lb.robust_err), axis_name)
    return BlockSystem(
        hpp_diag=hpp_diag, hpp_off=hpp_off, hll=hll, hpl=hpl,
        bp=bp, bl=bl, err=err,
    )


def damp(sys: BlockSystem, lam: jax.Array) -> BlockSystem:
    """Add ``lam I`` to every diagonal, matching the dense path's
    ``H + lam*eye(D)`` (graph_optimizer.py:43).  Block sizes are read off
    the arrays, so the same code damps 3/2 (SE(2)) and 6/3 (SE(3)) systems.
    """
    eye_p = jnp.eye(sys.hpp_diag.shape[-1], dtype=sys.hpp_diag.dtype)
    eye_l = jnp.eye(sys.hll.shape[-1], dtype=sys.hll.dtype)
    return sys._replace(
        hpp_diag=sys.hpp_diag + lam * eye_p,
        hll=sys.hll + lam * eye_l,
    )


def inv2x2(blocks: jax.Array) -> jax.Array:
    """Closed-form batched 2x2 inverse — the Schur pivot."""
    a = blocks[..., 0, 0]
    b = blocks[..., 0, 1]
    c = blocks[..., 1, 0]
    d = blocks[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    row0 = jnp.stack([d * inv_det, -b * inv_det], axis=-1)
    row1 = jnp.stack([-c * inv_det, a * inv_det], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def inv3x3(blocks: jax.Array) -> jax.Array:
    """Closed-form batched 3x3 inverse via the adjugate (VPU-friendly —
    no LAPACK-style factorization for tiny blocks)."""
    m = blocks
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    det = (
        m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02
    )
    inv_det = 1.0 / det
    rows = [
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2) * inv_det[..., None, None]


def inv_blocks(blocks: jax.Array) -> jax.Array:
    """Batched small-block inverse: closed forms for 2x2/3x3 (the SE(2) and
    SE(3) landmark pivots), generic solve otherwise."""
    k = blocks.shape[-1]
    if k == 2:
        return inv2x2(blocks)
    if k == 3:
        return inv3x3(blocks)
    return jnp.linalg.inv(blocks)


def hpp_matvec(
    sys: BlockSystem, odom_i: jax.Array, odom_j: jax.Array, x: jax.Array,
    axis_name: str | None = None, plan=None,
) -> jax.Array:
    """``Hpp @ x`` for ``x [N, 3]`` using only blocks.

    ``sys.hpp_diag`` is replicated-complete; the off-diagonal products run
    over the local edge shard and reduce across the mesh.
    """
    n = x.shape[0]
    t_oi = plan.odom_by_i if plan is not None else None
    t_oj = plan.odom_by_j if plan is not None else None
    off = _vertex_sum(
        bm.mv(sys.hpp_off, x[odom_j]), odom_i, n, t_oi
    )
    off = off + _vertex_sum(
        bm.mtv(sys.hpp_off, x[odom_i]), odom_j, n, t_oj
    )
    return bm.mv(sys.hpp_diag, x) + _maybe_psum(
        off, axis_name
    )


def hlp_matvec(
    sys: BlockSystem, lm_pose: jax.Array, lm_lm: jax.Array, x: jax.Array,
    num_landmarks: int,
    axis_name: str | None = None,
    plan=None,
) -> jax.Array:
    """``Hlp @ x = Hpl^T @ x`` -> [M, 2]."""
    t_ll = plan.lm_by_lm if plan is not None else None
    return _maybe_psum(
        _vertex_sum(
            bm.mtv(sys.hpl, x[lm_pose]), lm_lm,
            num_landmarks, t_ll,
        ),
        axis_name,
    )


def hpl_matvec(
    sys: BlockSystem, lm_pose: jax.Array, lm_lm: jax.Array, y: jax.Array,
    num_poses: int,
    axis_name: str | None = None,
    plan=None,
) -> jax.Array:
    """``Hpl @ y`` for ``y [M, 2]`` -> [N, 3]."""
    t_lp = plan.lm_by_pose if plan is not None else None
    return _maybe_psum(
        _vertex_sum(
            bm.mv(sys.hpl, y[lm_lm]), lm_pose, num_poses, t_lp
        ),
        axis_name,
    )


def schur_matvec(
    sys: BlockSystem,
    hll_inv: jax.Array,
    graph: FactorGraph2D,
    x: jax.Array,
    axis_name: str | None = None,
) -> jax.Array:
    """``S @ x`` without materializing S."""
    u = hlp_matvec(sys, graph.lm_edges.pose, graph.lm_edges.lm, x,
                   graph.num_landmarks, axis_name, graph.plan)
    v = bm.mv(hll_inv, u)
    w = hpl_matvec(sys, graph.lm_edges.pose, graph.lm_edges.lm, v,
                   graph.num_poses, axis_name, graph.plan)
    return hpp_matvec(sys, graph.odom.i, graph.odom.j, x, axis_name,
                      graph.plan) - w


def schur_preconditioner(
    sys: BlockSystem, hll_inv: jax.Array, graph: FactorGraph2D,
    axis_name: str | None = None,
) -> jax.Array:
    """Inverse block-Jacobi of S: ``[N, 3, 3]``.

    Exact S diagonal blocks when each (pose, landmark) pair is observed by a
    single edge (true for the per-frame frontend); an approximation (and a
    perfectly valid preconditioner) otherwise.
    """
    contrib = bm.mm(bm.mm(sys.hpl, hll_inv[graph.lm_edges.lm]),
                    jnp.swapaxes(sys.hpl, -1, -2))
    t_lp = graph.plan.lm_by_pose if graph.plan is not None else None
    s_diag = sys.hpp_diag - _maybe_psum(
        _vertex_sum(contrib, graph.lm_edges.pose, graph.num_poses, t_lp),
        axis_name,
    )
    return jnp.linalg.inv(s_diag)


class PlanOperator(NamedTuple):
    """Damped Schur operator in dual per-vertex layout — zero per-edge
    gathers inside the PCG loop.

    The per-edge blocks (recomputed every linearization) are re-materialized
    once into landmark-major ``[M, Kl, ...]`` and pose-major ``[N, Kp, ...]``
    grids; a PCG matvec then reads only dense grids plus gathers of rows of
    the small state vectors ``x [N,3]`` / ``v [M,2]``.  Random row gathers
    over the big edge arrays were the PCG bottleneck (~1.4 ms/iter at 60k
    edges); this layout amortizes them into one relayout per GN iteration.
    """

    hpp_diag: jax.Array   # [N,3,3] damped
    hll_inv: jax.Array    # [M,2,2]
    hpl_L: jax.Array      # [M,Kl,3,2] masked blocks, landmark-major
    pose_L: jax.Array     # i32[M,Kl] observing pose per slot
    hpl_P: jax.Array      # [N,Kp,3,2] masked blocks, pose-major
    lm_P: jax.Array       # i32[N,Kp]
    off_I: jax.Array      # [N,Ko,3,3] odometry off-diag blocks at (i,.)
    j_I: jax.Array        # i32[N,Ko]
    off_J: jax.Array      # [N,Ko,3,3] blocks at (.,j) (transposed use)
    i_J: jax.Array        # i32[N,Ko]


def make_plan_operator(
    d: BlockSystem, hll_inv: jax.Array, graph: FactorGraph2D
) -> PlanOperator:
    plan = graph.plan
    lb, pb = plan.lm_by_lm, plan.lm_by_pose
    oi, oj = plan.odom_by_i, plan.odom_by_j
    return PlanOperator(
        hpp_diag=d.hpp_diag,
        hll_inv=hll_inv,
        hpl_L=d.hpl[lb.idx] * lb.mask[..., None, None],
        pose_L=graph.lm_edges.pose[lb.idx],
        hpl_P=d.hpl[pb.idx] * pb.mask[..., None, None],
        lm_P=graph.lm_edges.lm[pb.idx],
        off_I=d.hpp_off[oi.idx] * oi.mask[..., None, None],
        j_I=graph.odom.j[oi.idx],
        off_J=d.hpp_off[oj.idx] * oj.mask[..., None, None],
        i_J=graph.odom.i[oj.idx],
    )


def plan_matvec(op: PlanOperator, x: jax.Array) -> jax.Array:
    """``S @ x`` on the dual layout: dense grids + small state gathers."""
    u = jnp.sum(bm.mtv(op.hpl_L, x[op.pose_L]), axis=1)
    v = bm.mv(op.hll_inv, u)
    w = jnp.sum(bm.mv(op.hpl_P, v[op.lm_P]), axis=1)
    hp = (
        bm.mv(op.hpp_diag, x)
        + jnp.sum(bm.mv(op.off_I, x[op.j_I]), axis=1)
        + jnp.sum(bm.mtv(op.off_J, x[op.i_J]), axis=1)
    )
    return hp - w


def plan_preconditioner(op: PlanOperator) -> jax.Array:
    """Inverse block-Jacobi of S from the pose-major grid."""
    hi = op.hll_inv[op.lm_P]
    contrib = jnp.sum(
        bm.mm(bm.mm(op.hpl_P, hi), jnp.swapaxes(op.hpl_P, -1, -2)), axis=1
    )
    return jnp.linalg.inv(op.hpp_diag - contrib)


class PCGResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_norm: jax.Array


def pcg(
    matvec, precond_apply, rhs: jax.Array, tol: float, max_iters: int,
    restart_every: int = 64,
) -> PCGResult:
    """Preconditioned conjugate gradients over pose-space ``[N, d]`` arrays.

    Every operation is a fused batched block product or a reduction, so the
    loop jits to a tight on-device while_loop.

    **Residual replacement**: in float32 the recurrence residual drifts away
    from the true residual on ill-conditioned systems (measured on the SE(3)
    BA Schur complement, cond ~3e6: the recurrence "converges" while the
    true relative residual stalls at ~4e-2).  Every ``restart_every``
    iterations the true residual ``rhs - S x`` is recomputed and the search
    direction reset — one extra matvec per restart, bounding the drift.

    The loop is *chunked*: an inner fixed-trip loop of ``restart_every``
    plain PCG iterations, then one unconditional true-residual replacement
    between chunks.  The replacement must NOT live under ``lax.cond`` — the
    matvec carries a ``psum`` when distributed, and a collective inside a
    conditional silently mis-lowers under shard_map (observed: bitwise-
    correct matvec/rhs, garbage PCG iterates).  Unconditional structure
    keeps the collective schedule identical on every device.
    """

    def dot(a, b):
        return jnp.vdot(a, b)

    rhs_norm = jnp.sqrt(dot(rhs, rhs))
    atol2 = (tol * rhs_norm) ** 2
    n_chunks = -(-max_iters // restart_every)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond_apply(r0)
    p0 = z0
    rz0 = dot(r0, z0)

    def inner(_, st):
        x, r, p, rz, it, stop = st
        ap = matvec(p)
        pap = dot(p, ap)
        # stop flags fold into a no-op update (alpha = beta = 0) so the
        # fixed-trip chunk is harmless after convergence/breakdown;
        # breakdown = f32 curvature lost positivity near the accuracy floor
        breakdown = ~(pap > 0.0) | ~jnp.isfinite(pap)
        done = stop | breakdown | (dot(r, r) <= atol2) | (it >= max_iters)
        alpha = jnp.where(done, jnp.zeros_like(rz), rz / pap)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond_apply(r)
        rz_new = dot(r, z)
        safe_rz = jnp.where(rz == 0.0, jnp.ones_like(rz), rz)
        beta = jnp.where(done, jnp.zeros_like(rz), rz_new / safe_rz)
        p = jnp.where(done, p, z + beta * p)
        rz = jnp.where(done, rz, rz_new)
        return (x, r, p, rz, it + jnp.where(done, 0, 1), stop | breakdown)

    def cond(st):
        x, r, p, rz, it, stop, chunk = st
        return (chunk < n_chunks) & (dot(r, r) > atol2) & ~stop

    def chunk_body(st):
        x, r, p, rz, it, stop, chunk = st
        x, r, p, rz, it, stop = jax.lax.fori_loop(
            0, restart_every, inner, (x, r, p, rz, it, stop)
        )
        # unconditional residual replacement + direction restart: bounds
        # the f32 recurrence drift (true residual recomputed), and keeps
        # the matvec's collectives outside any conditional
        r = rhs - matvec(x)
        z = precond_apply(r)
        rz = dot(r, z)
        p = z
        return (x, r, p, rz, it, stop, chunk + 1)

    x, r, p, rz, it, stop, _ = jax.lax.while_loop(
        cond,
        chunk_body,
        (
            x0, r0, p0, rz0,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
        ),
    )
    return PCGResult(x=x, iterations=it, residual_norm=jnp.sqrt(dot(r, r)))


def schur_solve(
    sys: BlockSystem,
    graph: FactorGraph2D,
    lam: jax.Array,
    tol: float,
    max_iters: int,
    axis_name: str | None = None,
    restart_every: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Solve ``(H + lam I) dx = -b`` via Schur elimination + PCG.

    Returns ``(dx_poses [N,3], dx_landmarks [M,2])``.  Under shard_map the
    PCG state lives replicated on every device; only the matvec partials
    cross the mesh (one [N,3] psum per iteration — rides ICI).
    """
    d = damp(sys, lam)
    hll_inv = inv_blocks(d.hll)

    rhs = -d.bp + hpl_matvec(
        d, graph.lm_edges.pose, graph.lm_edges.lm,
        bm.mv(hll_inv, d.bl), graph.num_poses, axis_name,
        graph.plan,
    )
    if graph.plan is not None and axis_name is None:
        # dual-layout operator: no per-edge gathers inside the PCG loop
        op = make_plan_operator(d, hll_inv, graph)
        m_inv = plan_preconditioner(op)
        matvec = lambda x: plan_matvec(op, x)  # noqa: E731
    else:
        m_inv = schur_preconditioner(d, hll_inv, graph, axis_name)
        matvec = lambda x: schur_matvec(  # noqa: E731
            d, hll_inv, graph, x, axis_name
        )

    res = pcg(
        matvec=matvec,
        precond_apply=lambda r: bm.mv(m_inv, r),
        rhs=rhs,
        tol=tol,
        max_iters=max_iters,
        restart_every=restart_every,
    )
    dx_p = res.x
    u = hlp_matvec(
        d, graph.lm_edges.pose, graph.lm_edges.lm, dx_p,
        graph.num_landmarks, axis_name, graph.plan,
    )
    dx_l = bm.mv(hll_inv, -d.bl - u)
    return dx_p, dx_l


def schur_linearize_solve(cfg: OptimizerConfig, axis_name: str | None = None):
    """LinearizeSolve implementation plugging into GaussNewton."""

    def solve(graph: FactorGraph2D, lam: jax.Array):
        sys = assemble_blocks(
            graph,
            huber_delta=cfg.huber_delta,
            fixed_prior=cfg.fixed_prior,
            exact_odom_jacobians=cfg.exact_odom_jacobians,
            axis_name=axis_name,
            edge_backend=cfg.edge_backend,
        )
        dx_p, dx_l = schur_solve(
            sys, graph, lam, cfg.pcg_tol, cfg.pcg_max_iters, axis_name,
            cfg.pcg_restart_every,
        )
        return dx_p, dx_l, sys.err

    return solve
