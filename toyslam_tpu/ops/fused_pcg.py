"""Fused Schur/PCG: the whole conjugate-gradient hot loop inside one
Pallas TPU kernel.

Why.  The XLA Schur/PCG path (ops/schur.py) is numerically tight but
*op-latency bound*: every PCG iteration is ~40-100 separate fused XLA
kernels (matvec gathers, block products, preconditioner levels, dots,
axpys), and on TPU each kernel launch inside the compiled program costs a
few microseconds — measured 185 us/iteration on the 150-pose reference
workload whose actual arithmetic is ~0.1 MFLOP (BENCH_SUITE r2: 0.095% of
VPU peak, honestly labeled latency-bound).  The reference hits the same
wall differently: its CUDA path launches discrete kernels per edge type and
a cuSOLVER dense QR per iteration (reference
remote/cuda/optimizer/kernels/OptimizerGpu.cu:54-115,
remote/cuda/solver/SolverCudaQr.h:44-81).

Design.  For graphs whose low-rank factor fits in VMEM, the damped Schur
complement is re-expressed as

    S = T - V V^T,   T  = block-tridiagonal part of Hpp (odometry chain),
                     V  = Hpl * chol(Hll^{-1})        (landmark fill-in)
                          [+ chol(W) columns for loop-closure odometry]

which is EXACT (no approximation): the landmark elimination term
``Hpl Hll^-1 Hlp`` *is* ``V V^T``, and non-chain odometry edges (j != i+1,
off-diagonal block -W with W = huber_w * info PSD) fold in exactly as two
``+chol(W)`` column blocks at rows i and j plus a ``+W`` diagonal
compensation on T (then ``(V V^T)[i,j] = +W`` so ``S[i,j] = -W``).

The kernel keeps PCG state component-major ``[3, Np]`` (full VPU lane
utilization), applies T with lane shifts, both V products as MXU
row-vector x matrix contractions against a single stored ``U[a] =
V^T``-slab per component (``q @ k^T``-style dot_general — no transposes or
relayouts in-kernel), the block-tridiagonal PCR preconditioner as L
unrolled shift-multiply levels (L=0 degenerates to block-Jacobi), and the
additive Galerkin coarse correction as two small MXU products against a
0/1 restriction matrix.  One ``pallas_call`` executes ``chunk_iters`` PCG
iterations; an outer ``lax.while_loop`` re-launches chunks until
convergence.  The TRUE residual ``rhs - S x`` is recomputed at every chunk
end (one matvec per launch) and is what the outer loop's exit test reads —
the kernel can never report convergence on a drifted f32 recurrence
residual; every ``restart_every`` iterations it also REPLACES the
recurrence residual and resets the search direction, the same
replacement structure as ops/schur.py::pcg.

Cost model: per-chunk launch overhead amortizes over ``chunk_iters``
iterations; the per-iteration critical path is 2 MXU matvecs + O(30)
vector ops on ``[3, Np]`` — about 10 kernel-internal ops instead of ~100
XLA kernel launches.

Scale.  Past the VMEM budget the dense V slabs give way to the STREAMED
BANDED operator (``BandOperator`` + ops/band_plan.py): landmark columns
live in K fixed-width 128-aligned pose windows per base chunk, stored as
an HBM tile stack that one matvec streams once through a double-buffered
VMEM window (measured 855-916 GB/s) with two MXU dots per (chunk,
window) — same math, same chunked-loop/true-residual-exit control flow.

Gating.  Everything the gate needs is static at trace time (array shapes,
config, and the presence of plan.fused / plan.band — pytree-structural
properties), so ``fused_mode`` ("resident" | "band" | None) is safely
evaluated inside jit tracing; unsupported configurations fall back to the
XLA path with identical semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toyslam_tpu.ops import blockmath as bm
from toyslam_tpu.ops import schur

_f32 = jnp.float32
_i32 = jnp.int32

# Operand budget for the gate (what build_fused_operator will resident in
# VMEM) and the Mosaic scoped-VMEM ceiling requested for the kernel —
# Mosaic's 16 MB default is a conservative scoped limit, not the physical
# VMEM size; the kernel additionally needs working-set headroom (state
# copies, dot temporaries), so the gate budget stays well under the limit.
VMEM_BUDGET_BYTES = 24 * 2**20
# 96 MB of the v5e's 128 MB physical VMEM: the 64 MB default rejected
# the 100k band kernel at a 69.5 MB scoped allocation (the gate's
# accounted working set stays <= 48 MB; the headroom covers Mosaic's
# unaccounted staging/spill reservations)
VMEM_LIMIT_BYTES = 96 * 2**20

_DN_STD = (((1,), (0,)), ((), ()))   # [1,K] @ [K,J]   -> [1,J]
_DN_T = (((1,), (1,)), ((), ()))     # [1,J] @ [K,J]^T -> [1,K]


def _dot(a, b, dn):
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn,
        preferred_element_type=_f32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot_bf16(a, b, dn):
    """bf16 x bf16 -> f32 dot.  No precision override: HIGHEST on bf16
    operands requests multi-pass emulation Mosaic rejects for some shapes;
    native bf16 MXU passes are exactly what the fold coarse wants."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn, preferred_element_type=_f32,
    )


class FoldCoarse(NamedTuple):
    """Static layout of the in-kernel streamed Galerkin coarse.

    Mosaic's register allocator reserves a ~operand-sized spill slot per
    dot SITE, which capped the resident ``rmat`` in-kernel coarse at
    nc~64 (the tuned 10k config wants nc=320).  The fold path removes the
    large operands entirely:

    * restriction: ``reshape([1,Np] -> [Np/128,128])`` (a relayout Mosaic
      supports — probed) then one tiny 0/1 segment-sum dot per component,
      giving group sums for ``group | 128`` in a [nr, 128] slot layout
      (slot ``u = a*16 + j``, ``j`` = group-within-row);
    * coarse matvec: the reordered explicit inverse ``c2t`` is STREAMED
      from HBM in double-buffered [dp, ncp, cw] chunks (the band tile
      machinery's pattern) — dot operands are ~1 MB chunk buffers;
    * prolongation: per 128-row block, ``(asel * v) @ bsel`` with tiny
      0/1 selectors reads the compact coarse solution back to pose lanes
      without any unsupported compaction reshape.
    """

    nr: int          # Np / 128 fold rows
    ncp: int         # nc padded to a multiple of 128
    cw: int          # stream chunk width (lanes of the t axis)
    n_cc: int        # Np / cw stream chunks
    nblk: int        # ncp / 128 prolongation blocks
    rows_last: int   # fold rows covered by the last block
    group: int       # coarse group size (divides 128)


def _fold_layout(np_: int, dp: int, nc: int) -> FoldCoarse | None:
    """Static fold-coarse layout, or None when the shape doesn't admit
    one (Np not lane-aligned, or the group doesn't divide a lane row)."""
    if nc == 0 or np_ % 128 or np_ % nc:
        return None
    group = np_ // nc
    if group not in (8, 16, 32, 64, 128) or dp > 8:
        return None
    ncp = 128 * (-(-nc // 128))
    cw = None
    for k in range(np_ // 128, 0, -1):
        c = 128 * k
        if np_ % c:
            continue
        if dp * ncp * c * 2 <= 4 * 2**20 and np_ // c >= 2:
            cw = c
            break
    if cw is None:          # tiny graphs: single-chunk stream
        cw = np_
    nr = np_ // 128
    rho = group             # fold rows per prolongation block (128/gamma)
    nblk = ncp // 128
    return FoldCoarse(
        nr=nr, ncp=ncp, cw=cw, n_cc=np_ // cw, nblk=nblk,
        rows_last=nr - (nblk - 1) * rho, group=group,
    )


def _fold_selectors(fold: FoldCoarse, dp: int):
    """Static 0/1 operands: sseg [dp,128,128] restriction, asel
    [group,128] / bsel [128,128] prolongation selectors.  The selector
    product picks, for output pose lane l of fold-row c' within a block,
    exactly ``m = gamma*c' + l//group`` of the coarse row v:
    asel[c',m]=1 iff m//gamma==c', bsel[m,l]=1 iff m%gamma==l//group."""
    import numpy as np

    g = fold.group
    gamma = 128 // g
    sseg = np.zeros((dp, 128, 128), np.float32)
    lanes = np.arange(128)
    for a in range(dp):
        sseg[a, lanes, a * 16 + lanes // g] = 1.0
    asel = np.zeros((g, 128), np.float32)
    for c in range(g):
        asel[c, gamma * c: gamma * (c + 1)] = 1.0
    bsel = np.zeros((128, 128), np.float32)
    for m in range(128):
        bsel[m, (m % gamma) * g: (m % gamma + 1) * g] = 1.0
    return jnp.asarray(sseg), jnp.asarray(asel), jnp.asarray(bsel)


def _fold_c2t(cinv_b: jax.Array, fold: FoldCoarse, dp: int,
              np_: int) -> jax.Array:
    """Reorder the explicit coarse inverse [dp,dp,nc,nc] into the
    streamed bf16 stack [n_cc, dp, ncp, cw]:

        c2t[a2, g2, t = 128c + 16a + j] = cinv[a2, a, g2, gamma*c + j]

    so the coarse matvec is a lane-contraction of the restricted residual
    (slot layout above) against per-chunk [ncp, cw] tiles.  Built as a
    pure GATHER over the t axis (a scatter formulation measured 162 ms on
    TPU at nc=320/n=10240; the gather is ~2 orders faster) — rebuilt only
    at preconditioner refresh (cached on FusedPrecond.c2t)."""
    import numpy as np

    nc = cinv_b.shape[-1]
    gamma = 128 // fold.group
    u = np.arange(128)
    asrc = np.minimum(u // 16, dp - 1)
    jsrc = np.minimum(u % 16, gamma - 1)
    valid = ((u // 16) < dp) & ((u % 16) < gamma)
    c = np.arange(fold.nr)
    gsrc = gamma * c[:, None] + jsrc[None, :]          # [nr, 128]
    asrc2 = np.broadcast_to(asrc, (fold.nr, 128))
    cb = cinv_b.astype(jnp.bfloat16)
    vals = cb[:, asrc2, :, gsrc]             # [nr, 128, dp(a2), nc(g2)]
    vals = vals * jnp.asarray(
        valid, jnp.bfloat16)[None, :, None, None]
    c2t = jnp.transpose(vals, (2, 3, 0, 1))  # [dp, nc, nr, 128]
    c2t = jnp.pad(c2t, ((0, 0), (0, fold.ncp - nc), (0, 0), (0, 0)))
    return jnp.transpose(
        c2t.reshape(dp, fold.ncp, fold.n_cc, fold.cw), (2, 0, 1, 3)
    )


class FusedOperator(NamedTuple):
    """The damped Schur operator in fused ``T - V V^T`` form."""

    u: jax.Array        # f32[dp, Np, Mw] per-component V rows (U[a][p, :]
    #                      = V[(a,p), :]); Mw = dl*M + dp*C closure columns
    tdiag: jax.Array    # f32[dp, dp, Np] T diagonal blocks, component planes
    tupper: jax.Array   # f32[dp, dp, Np] T (v, v+1) blocks
    tlower: jax.Array   # f32[dp, dp, Np] T (v, v-1) blocks = upper[v-1]^T


class FusedPrecond(NamedTuple):
    """PCR block-tridiagonal (+ optional Galerkin coarse) preconditioner in
    the kernel's plane layout.  ``alphas.shape[0] == 0`` means block-Jacobi
    (PCR with zero levels — ``binv`` is then the inverse S diagonal)."""

    alphas: jax.Array   # f32[L, dp, dp, Np]
    gammas: jax.Array   # f32[L, dp, dp, Np]
    binv: jax.Array     # f32[dp, dp, Np]
    cinv: jax.Array | None   # f32[dp, dp, nc, nc] coarse inverse blocks
    rmat: jax.Array | None   # f32[Np, nc] 0/1 restriction matrix
    # streamed fold-coarse stack bf16[n_cc, dp, ncp, cw] (_fold_c2t) —
    # prebuilt at refresh so the frozen-precond solves skip the reorder
    c2t: jax.Array | None = None


def _planes(blocks: jax.Array) -> jax.Array:
    """[N, a, b] block array -> [a, b, N] component planes."""
    return jnp.transpose(blocks, (1, 2, 0))


def _chol_spd(a: jax.Array) -> jax.Array:
    """Batched closed-form Cholesky of tiny SPD blocks with clamped pivots.

    ``jnp.linalg.cholesky`` NaNs on a pivot that f32 rounding pushes
    negative (observed on ill-conditioned BA landmark blocks); the closed
    forms clamp every pivot at a tiny positive floor instead — the factor
    of a nearby SPD matrix, which is all the V-slab needs.
    """
    k = a.shape[-1]
    tiny = 1e-30
    if k == 2:
        l00 = jnp.sqrt(jnp.maximum(a[..., 0, 0], tiny))
        l10 = a[..., 1, 0] / l00
        l11 = jnp.sqrt(jnp.maximum(a[..., 1, 1] - l10 * l10, tiny))
        z = jnp.zeros_like(l00)
        return jnp.stack([
            jnp.stack([l00, z], -1),
            jnp.stack([l10, l11], -1),
        ], -2)
    if k == 3:
        l00 = jnp.sqrt(jnp.maximum(a[..., 0, 0], tiny))
        l10 = a[..., 1, 0] / l00
        l20 = a[..., 2, 0] / l00
        l11 = jnp.sqrt(jnp.maximum(a[..., 1, 1] - l10 * l10, tiny))
        l21 = (a[..., 2, 1] - l20 * l10) / l11
        l22 = jnp.sqrt(
            jnp.maximum(a[..., 2, 2] - l20 * l20 - l21 * l21, tiny)
        )
        z = jnp.zeros_like(l00)
        return jnp.stack([
            jnp.stack([l00, z, z], -1),
            jnp.stack([l10, l11, z], -1),
            jnp.stack([l20, l21, l22], -1),
        ], -2)
    return jnp.linalg.cholesky(a)


def _tri_inv_lower(l: jax.Array) -> jax.Array:
    """Closed-form inverse of batched lower-triangular 2x2/3x3 blocks."""
    k = l.shape[-1]
    if k == 2:
        m00 = 1.0 / l[..., 0, 0]
        m11 = 1.0 / l[..., 1, 1]
        m10 = -l[..., 1, 0] * m00 * m11
        z = jnp.zeros_like(m00)
        return jnp.stack([
            jnp.stack([m00, z], -1),
            jnp.stack([m10, m11], -1),
        ], -2)
    if k == 3:
        m00 = 1.0 / l[..., 0, 0]
        m11 = 1.0 / l[..., 1, 1]
        m22 = 1.0 / l[..., 2, 2]
        m10 = -l[..., 1, 0] * m00 * m11
        m21 = -l[..., 2, 1] * m11 * m22
        m20 = -(l[..., 2, 0] * m00 + l[..., 2, 1] * m10) * m22
        z = jnp.zeros_like(m00)
        return jnp.stack([
            jnp.stack([m00, z, z], -1),
            jnp.stack([m10, m11, z], -1),
            jnp.stack([m20, m21, m22], -1),
        ], -2)
    raise ValueError(f"unsupported block size {k}")


def _shift(x: jax.Array, s: int) -> jax.Array:
    """Circular lane shift of ``x [3, Np]``: ``y[:, p] = x[:, p - s]``.

    Wraparound entries are always multiplied by zero coefficients (the
    operator/preconditioner coefficient planes vanish at the boundaries by
    construction), so no masking is needed.  Static concatenation of lane
    slices lowers on both Mosaic and the interpreter.
    """
    if s == 0:
        return x
    n = x.shape[-1]
    s = s % n
    if s == 0:
        return x
    return jnp.concatenate([x[:, n - s:], x[:, : n - s]], axis=1)


def _bmv(planes, x):
    """Block matvec on component planes: [3,3,Np] x [3,Np] -> [3,Np]."""
    return jnp.sum(planes * x[None, :, :], axis=1)


def _make_kernel(nlevels: int, has_coarse: bool, chunk_iters: int,
                 dp: int):
    """The chunk kernel body (closure over static structure).

    The V slabs arrive as ``dp`` SEPARATE refs: indexing one stacked
    ``[dp, Np, Mw]`` ref inside the kernel materializes a full slab copy
    per component on the Mosaic value stack (measured 41 MB scoped-VMEM at
    the 1k config — 2.5x over budget); separate refs are read in place.
    """

    def kernel(*refs):
        (atol2_ref, maxit_ref, restart_ref, it_ref, rz_ref, stop_ref,
         rhs_ref, x_ref, r_ref, p_ref, rt_ref) = refs[:11]
        u_refs = refs[11:11 + dp]
        (td_ref, tu_ref, tl_ref) = refs[11 + dp:14 + dp]
        rest = refs[14 + dp:]
        if nlevels:
            al_ref, ga_ref = rest[0], rest[1]
            rest = rest[2:]
        else:
            al_ref = ga_ref = None
        binv_ref = rest[0]
        rest = rest[1:]
        if has_coarse:
            cinv_ref, rmat_ref = rest[0], rest[1]
            rest = rest[2:]
        (x_out_ref, r_out_ref, p_out_ref, rt_out_ref, it_out_ref,
         rz_out_ref, stop_out_ref, rr_out_ref) = rest

        # Hoist EVERY ref read out of the iteration loop: the fori body is
        # unrolled by the Mosaic pipeline, and an in-body ``ref[:]`` read
        # gets a fresh value-stack slot per unrolled trip (measured 82 MB
        # scoped-VMEM at the 1k config with in-body slab reads).  Hoisted
        # values are single SSA values every trip reuses.
        td = td_ref[:]
        tu = tu_ref[:]
        tl = tl_ref[:]
        binv = binv_ref[:]
        us = [r[:] for r in u_refs]
        if nlevels:
            als = [al_ref[l] for l in range(nlevels)]
            gas = [ga_ref[l] for l in range(nlevels)]
        if has_coarse:
            rmat = rmat_ref[:]
            cinvs = [
                [cinv_ref[a, b] for b in range(dp)] for a in range(dp)
            ]

        def matvec(x):
            y = _bmv(td, x)
            y = y + _bmv(tu, _shift(x, -1))   # upper[v] @ x[v+1]
            y = y + _bmv(tl, _shift(x, 1))    # upper[v-1]^T @ x[v-1]
            urow = _dot(x[0:1, :], us[0], _DN_STD)
            for a in range(1, dp):
                urow = urow + _dot(x[a:a + 1, :], us[a], _DN_STD)
            # urow [1, Mw] = V^T x
            w = jnp.concatenate(
                [_dot(urow, us[a], _DN_T) for a in range(dp)],
                axis=0,
            )                                  # [dp, Np] = V (V^T x)
            return y - w

        def precond(r):
            t = r
            s = 1
            for l in range(nlevels):          # static unroll (PCR levels)
                t = (
                    t
                    + _bmv(als[l], _shift(t, s))
                    + _bmv(gas[l], _shift(t, -s))
                )
                s *= 2
            z = _bmv(binv, t)
            if has_coarse:
                rc = [_dot(r[b:b + 1, :], rmat, _DN_STD)
                      for b in range(dp)]
                rows = []
                for a in range(dp):
                    za = rc[0] * 0.0
                    for b in range(dp):
                        za = za + _dot(rc[b], cinvs[a][b], _DN_T)
                    rows.append(_dot(za, rmat, _DN_T))   # prolong [1, Np]
                z = z + jnp.concatenate(rows, axis=0)
            return z

        atol2 = atol2_ref[0, 0]
        maxit = maxit_ref[0, 0]
        it0 = it_ref[0, 0]

        # chunk entry: when the restart flag is set (every
        # ``restart_every`` iterations, and always on the first chunk),
        # replace the recurrence residual with the TRUE residual computed
        # at the END of the previous chunk (carried in via rt_ref; the
        # first chunk's carry is rhs — the true residual at x=0) and reset
        # the search direction — same replacement semantics as
        # ops/schur.py::pcg chunk_body.  Between restarts the (r, p, rz)
        # recurrence state is carried across chunk launches so CG's
        # direction history survives the convergence-check granularity.
        x = x_ref[:]
        restart = restart_ref[0, 0] > 0
        r = jnp.where(restart, rt_ref[:], r_ref[:])
        z = precond(r)
        rz_true = jnp.sum(r * z)
        p = jnp.where(restart, z, p_ref[:])
        rz = jnp.where(restart, rz_true, rz_ref[0, 0])
        rr = jnp.sum(r * r)
        # sticky f32-breakdown flag: once curvature loses positivity at the
        # accuracy floor the iterate must FREEZE for good (restarting and
        # iterating past the floor makes CG semiconvergence *grow* the
        # error) — mirrors the XLA pcg's persistent `stop`
        stop0 = stop_ref[0, 0] > 0

        def body(_, carry):
            x, r, p, rz, rr, stop, it = carry
            ap = matvec(p)
            pap = jnp.sum(p * ap)
            breakdown = ~(pap > 0.0) | ~jnp.isfinite(pap)
            stop = stop | breakdown
            done = stop | (rr <= atol2) | (it >= maxit)
            alpha = jnp.where(done, 0.0, rz / jnp.where(done, 1.0, pap))
            x = x + alpha * p
            r = r - alpha * ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            rr = jnp.sum(r * r)
            safe_rz = jnp.where(rz == 0.0, 1.0, rz)
            beta = jnp.where(done, 0.0, rz_new / safe_rz)
            p = jnp.where(done, p, z + beta * p)
            rz = jnp.where(done, rz, rz_new)
            it = it + jnp.where(done, 0, 1)
            return (x, r, p, rz, rr, stop, it)

        x, r, p, rz, rr, stop, it = jax.lax.fori_loop(
            0, chunk_iters, body, (x, r, p, rz, rr, stop0, it0)
        )
        # chunk exit: recompute the TRUE residual ``rhs - S x`` (one matvec
        # per launch — the same count as the old entry-side replacement)
        # and expose its norm as the convergence value: the outer
        # while_loop therefore never exits on a drifted f32 recurrence
        # residual (ADVICE r3 medium — observed on BA systems at cond~3e6:
        # recurrence "converges" while the true residual stalls).  The
        # vector itself carries to the next chunk's restart replacement.
        r_true = rhs_ref[:] - matvec(x)
        x_out_ref[:] = x
        r_out_ref[:] = r
        p_out_ref[:] = p
        rt_out_ref[:] = r_true
        it_out_ref[0, 0] = it
        rz_out_ref[0, 0] = rz
        stop_out_ref[0, 0] = stop.astype(_i32)
        rr_out_ref[0, 0] = jnp.sum(r_true * r_true)

    return kernel


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class BandOperator(NamedTuple):
    """The damped Schur operator in streamed banded form (large graphs).

    ``tiles`` stays in HBM; one PCG matvec streams it once through a
    double-buffered VMEM window and does two MXU dots per (chunk, window)
    — the banded analogue of the VMEM-resident ``FusedOperator.u`` slabs.
    Layout/semantics come from ops/band_plan.py.
    """

    tiles: jax.Array     # f32[n_chunks, K, dp, Wrow, B*dl] (HBM-resident)
    win_off: jax.Array   # i32[n_chunks, K] window start pose (SMEM)
    # wide + closure full columns, TRANSPOSED [dp, Mw, Np]: the lane dim
    # must be the long aligned axis — as [Np, Mw] each materialized use
    # padded Mw up to 128 lanes (5.3x at Mw=24), a large slice of the
    # kernel's 263 MB register-spill OOM
    u: jax.Array | None  # f32[dp, Mw, Np]
    tdiag: jax.Array     # f32[dp, dp, Np]
    tupper: jax.Array
    tlower: jax.Array


def _make_band_kernel(nlevels: int, has_coarse: bool, chunk_iters: int,
                      dp: int, n_bchunks: int, k_win: int, w_row: int,
                      b_dl: int, mw: int, fold: FoldCoarse | None = None):
    """Chunk kernel for the banded/streamed operator.

    Identical PCG control flow to ``_make_kernel``; only the ``V V^T``
    leg differs — instead of resident U slabs it double-buffer-streams
    the band tile stack from HBM, one base-CHUNK (all K windows of its
    landmark columns) at a time:

        t         = sum_{k,a} xw_{k,a} @ D[k,a]  ([1,Wrow] @ [Wrow,B*dl])
        wacc[k,a] += t @ D[k,a]^T                (same resident tiles)

    The t accumulation MUST span the whole chunk (all K windows) before
    the w-pass: a landmark observed in several windows has ONE column
    split across them, and applying per-window would drop the
    V_k V_k'^T cross terms (this was a real bug caught by
    tests/test_band_fused.py's scatter oracle).  ``xw`` is a dynamic
    window row-slice of the zero-tail-padded state scratch; all tile
    dims are (8, 128)-aligned by construction (ops/band_plan.py
    restricts B*dl to multiples of 128).
    """

    def kernel(*refs):
        (atol2_ref, maxit_ref, restart_ref, it_ref, rz_ref, stop_ref,
         win_ref, rhs_ref, x_ref, r_ref, p_ref, rt_ref) = refs[:12]
        idx = 12
        u_refs = refs[idx:idx + (dp if mw else 0)]
        idx += dp if mw else 0
        (td_ref, tu_ref, tl_ref) = refs[idx:idx + 3]
        idx += 3
        rest = refs[idx:]
        if nlevels:
            al_ref, ga_ref = rest[0], rest[1]
            rest = rest[2:]
        else:
            al_ref = ga_ref = None
        binv_ref = rest[0]
        rest = rest[1:]
        if has_coarse and fold is not None:
            sseg_ref, asel_ref, bsel_ref = rest[0], rest[1], rest[2]
            rest = rest[3:]
        elif has_coarse:
            cinv_ref, rmat_ref = rest[0], rest[1]
            rest = rest[2:]
        tiles_hbm = rest[0]
        rest = rest[1:]
        if has_coarse and fold is not None:
            c2t_hbm = rest[0]
            rest = rest[1:]
        (x_out_ref, r_out_ref, p_out_ref, rt_out_ref, it_out_ref,
         rz_out_ref, stop_out_ref, rr_out_ref) = rest[:8]
        rest = rest[8:]
        (xext, wacc, buf, sem) = rest[:4]
        if has_coarse and fold is not None:
            rcv_ref, zacc, cbuf, csem = rest[4:]

        np_ = x_ref.shape[1]

        # NO ref-read hoisting here, unlike _make_kernel: this kernel's
        # loops are while_loops (compile-once bodies, nothing unrolls), so
        # in-body reads are transient — hoisted [d,d,N]/[N,nc] planes were
        # long-lived vector registers the allocator spilled (263 MB of
        # spill slots, vmem OOM at the 10k config)

        def dma(slot, ti):
            return pltpu.make_async_copy(
                tiles_hbm.at[ti], buf.at[slot], sem.at[slot]
            )

        def matvec(x):
            y = _bmv(td_ref[:], x)
            y = y + _bmv(tu_ref[:], _shift(x, -1))
            y = y + _bmv(tl_ref[:], _shift(x, 1))
            if mw:
                # u stored [mw, Np]: contract over the aligned Np lanes
                urow = _dot(x[0:1, :], u_refs[0][:], _DN_T)
                for a in range(1, dp):
                    urow = urow + _dot(x[a:a + 1, :], u_refs[a][:],
                                       _DN_T)
                y = y - jnp.concatenate(
                    [_dot(urow, u_refs[a][:], _DN_STD) for a in range(dp)],
                    axis=0,
                )
            # banded leg: stream the tile stack once, chunk by chunk
            xext[:, :np_] = x
            xext[:, np_:] = jnp.zeros((dp, w_row), _f32)
            wacc[:] = jnp.zeros((dp, np_ + w_row), _f32)
            dma(0, 0).start()

            def chunk_cond(c):
                return c < n_bchunks

            def chunk_body(c):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < n_bchunks)
                def _():
                    dma(jax.lax.rem(c + 1, 2), c + 1).start()

                dma(slot, c).wait()
                # t-pass over ALL windows of the chunk (shared columns);
                # window anchors are 128-aligned by construction
                # (band_plan quantizes) — the hint lets Mosaic vectorize
                # the dynamic lane slice
                t = None
                for k in range(k_win):
                    off = pl.multiple_of(win_ref[c, k], 128)
                    for a in range(dp):
                        d_ = _dot(
                            xext[a:a + 1, pl.ds(off, w_row)],
                            buf[slot, k, a], _DN_STD,
                        )
                        t = d_ if t is None else t + d_
                # w-pass with the completed chunk t
                for k in range(k_win):
                    off = pl.multiple_of(win_ref[c, k], 128)
                    for a in range(dp):
                        wacc[a:a + 1, pl.ds(off, w_row)] += _dot(
                            t, buf[slot, k, a], _DN_T
                        )
                return c + 1

            # while_loop, NOT fori_loop: Mosaic fully unrolls static-trip
            # fori bodies, and an unrolled 160-chunk DMA loop gets fresh
            # value slots per trip — measured 263 MB of register-allocator
            # spill slots (vmem OOM) at the 10k config, independent of
            # chunk_iters.  A while body compiles once.
            jax.lax.while_loop(chunk_cond, chunk_body,
                               jnp.asarray(0, _i32))
            return y - wacc[:, :np_]

        def precond(r):
            t = r
            s = 1
            for l in range(nlevels):
                t = (
                    t
                    + _bmv(al_ref[l], _shift(t, s))
                    + _bmv(ga_ref[l], _shift(t, -s))
                )
                s *= 2
            z = _bmv(binv_ref[:], t)
            if has_coarse and fold is not None:
                # streamed fold coarse (see FoldCoarse): no large dot
                # operands anywhere — the explicit inverse rides the same
                # double-buffered HBM stream as the band tiles
                rc = None
                for a in range(dp):
                    fa = jnp.reshape(r[a:a + 1, :], (fold.nr, 128))
                    d_ = _dot(fa, sseg_ref[a], _DN_STD)
                    rc = d_ if rc is None else rc + d_
                rcv_ref[...] = jnp.reshape(
                    rc, (1, np_)).astype(jnp.bfloat16)

                def cdma(slot, ci):
                    return pltpu.make_async_copy(
                        c2t_hbm.at[ci], cbuf.at[slot], csem.at[slot]
                    )

                zacc[...] = jnp.zeros((dp, fold.ncp), _f32)
                cdma(0, 0).start()

                def ccond(c):
                    return c < fold.n_cc

                def cbody(c):
                    slot = jax.lax.rem(c, 2)

                    @pl.when(c + 1 < fold.n_cc)
                    def _():
                        cdma(jax.lax.rem(c + 1, 2), c + 1).start()

                    cdma(slot, c).wait()
                    off = pl.multiple_of(c * fold.cw, 128)
                    xc = rcv_ref[:, pl.ds(off, fold.cw)]
                    for a in range(dp):
                        zacc[a:a + 1, :] += _dot_bf16(
                            xc, cbuf[slot, a], _DN_T
                        )
                    return c + 1

                jax.lax.while_loop(ccond, cbody, jnp.asarray(0, _i32))
                asel = asel_ref[:]
                bsel = bsel_ref[:]
                rows = []
                for a in range(dp):
                    zf = jnp.reshape(
                        zacc[a:a + 1, :], (fold.nblk, 128)
                    )
                    blocks = []
                    for k2 in range(fold.nblk):
                        v = zf[k2: k2 + 1, :]
                        blk = _dot(asel * v, bsel, _DN_STD)
                        if k2 == fold.nblk - 1:
                            blk = blk[: fold.rows_last]
                        blocks.append(blk)
                    rows.append(jnp.reshape(
                        jnp.concatenate(blocks, axis=0), (1, np_)
                    ))
                z = z + jnp.concatenate(rows, axis=0)
            elif has_coarse:
                # row-wise [1, N] dots — the resident kernel's PROVEN
                # pattern (a batched [dp, Np] variant crashed Mosaic).
                # The restriction matrix arrives TRANSPOSED [nc, Np] (lane
                # dim must be the long aligned axis — as [Np, nc] every
                # dot staged an internally-relayouted copy on the value
                # stack).  NOTE the coarse size cap in fused_mode: every
                # dot SITE against the [nc, Np] operand reserves its own
                # ~operand-sized spill slot (measured: 6 row-dot sites
                # kept ~100 MB reserved at nc=320 regardless of dtype,
                # hoisting, or chunking; multi-row batched lhs crashes
                # Mosaic outright), so the in-kernel coarse must stay
                # small enough that 6 staged copies fit.
                rmat_t = rmat_ref[:]
                rc = [_dot(r[b:b + 1, :], rmat_t, _DN_T)
                      for b in range(dp)]
                rows = []
                for a in range(dp):
                    za = rc[0] * 0.0
                    for b in range(dp):
                        za = za + _dot(rc[b], cinv_ref[a, b], _DN_T)
                    rows.append(_dot(za, rmat_t, _DN_STD))
                z = z + jnp.concatenate(rows, axis=0)
            return z

        atol2 = atol2_ref[0, 0]
        maxit = maxit_ref[0, 0]
        it0 = it_ref[0, 0]
        x = x_ref[:]
        restart = restart_ref[0, 0] > 0
        r = jnp.where(restart, rt_ref[:], r_ref[:])
        z = precond(r)
        rz_true = jnp.sum(r * z)
        p = jnp.where(restart, z, p_ref[:])
        rz = jnp.where(restart, rz_true, rz_ref[0, 0])
        rr = jnp.sum(r * r)
        stop0 = stop_ref[0, 0] > 0

        def cond(carry):
            # chunk_iters PCG trips + ONE extra trip that reuses the same
            # inlined matvec (on x instead of p) for the end-of-chunk TRUE
            # residual — a second standalone matvec(x) call doubled the
            # kernel's inlined stream machinery and with it the register
            # allocator's spill reservation
            return carry[0] < chunk_iters + 1

        def body(carry):
            i, x, r, p, rz, rr, stop, it, rt = carry
            last = i >= chunk_iters
            av = matvec(jnp.where(last, x, p))
            rt = jnp.where(last, rhs_ref[:] - av, rt)
            ap = av
            pap = jnp.sum(p * ap)
            breakdown = (~(pap > 0.0) | ~jnp.isfinite(pap)) & ~last
            stop = stop | breakdown
            done = last | stop | (rr <= atol2) | (it >= maxit)
            alpha = jnp.where(done, 0.0, rz / jnp.where(done, 1.0, pap))
            x = x + alpha * p
            r = r - alpha * ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            rr = jnp.where(last, rr, jnp.sum(r * r))
            safe_rz = jnp.where(rz == 0.0, 1.0, rz)
            beta = jnp.where(done, 0.0, rz_new / safe_rz)
            p = jnp.where(done, p, z + beta * p)
            rz = jnp.where(done, rz, rz_new)
            it = it + jnp.where(done, 0, 1)
            return (i + 1, x, r, p, rz, rr, stop, it, rt)

        # while_loop, not fori: compile-once body (see hoisting note)
        _, x, r, p, rz, rr, stop, it, r_true = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, _i32), x, r, p, rz, rr, stop0, it0,
             jnp.zeros_like(x)),
        )
        x_out_ref[:] = x
        r_out_ref[:] = r
        p_out_ref[:] = p
        rt_out_ref[:] = r_true
        it_out_ref[0, 0] = it
        rz_out_ref[0, 0] = rz
        stop_out_ref[0, 0] = stop.astype(_i32)
        rr_out_ref[0, 0] = jnp.sum(r_true * r_true)

    return kernel


def band_fused_pcg(
    op: BandOperator,
    pre: FusedPrecond,
    rhs2: jax.Array,          # f32[dp, Np]
    tol: float,
    max_iters: int,
    chunk_iters: int,
    restart_every: int = 64,
) -> schur.PCGResult:
    """fused_pcg over the streamed banded operator — same chunked
    while_loop/true-residual-exit semantics."""
    nlevels = int(pre.alphas.shape[0])
    has_coarse = pre.cinv is not None
    dp, np_ = rhs2.shape
    n_bchunks, k_win, _, w_row, b_dl = op.tiles.shape
    mw = 0 if op.u is None else op.u.shape[1]
    fold = (
        _fold_layout(np_, dp, pre.cinv.shape[-1]) if has_coarse else None
    )

    rhs_norm2 = jnp.sum(rhs2 * rhs2)
    atol2 = (tol ** 2) * rhs_norm2
    n_chunks = -(-max_iters // chunk_iters)
    restart_chunks = max(1, restart_every // chunk_iters)

    kernel = _make_band_kernel(
        nlevels, has_coarse, chunk_iters, dp, n_bchunks, k_win, w_row,
        b_dl, mw, fold,
    )

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    in_specs = (
        [smem()] * 6 + [smem()]            # scalars + win_off
        + [vmem()] * (5 + (dp if mw else 0) + 3)
        + ([vmem()] * 2 if nlevels else [])
        + [vmem()]
        + ([vmem()] * (3 if fold is not None else 2)
           if has_coarse else [])
        + [pl.BlockSpec(memory_space=pltpu.HBM)]   # tiles stay in HBM
        + ([pl.BlockSpec(memory_space=pltpu.HBM)]  # streamed coarse c2t
           if fold is not None else [])
    )
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((dp, np_), _f32),  # x
            jax.ShapeDtypeStruct((dp, np_), _f32),  # r
            jax.ShapeDtypeStruct((dp, np_), _f32),  # p
            jax.ShapeDtypeStruct((dp, np_), _f32),  # r_true
            jax.ShapeDtypeStruct((1, 1), _i32),     # it
            jax.ShapeDtypeStruct((1, 1), _f32),     # rz
            jax.ShapeDtypeStruct((1, 1), _i32),     # stop
            jax.ShapeDtypeStruct((1, 1), _f32),     # rr (true)
        ),
        in_specs=in_specs,
        out_specs=(vmem(), vmem(), vmem(), vmem(), smem(), smem(),
                   smem(), smem()),
        scratch_shapes=[
            pltpu.VMEM((dp, np_ + w_row), _f32),            # xext
            pltpu.VMEM((dp, np_ + w_row), _f32),            # wacc
            pltpu.VMEM((2, k_win, dp, w_row, b_dl), _f32),  # tile buffers
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([
            pltpu.VMEM((1, np_), jnp.bfloat16),             # rcv
            pltpu.VMEM((dp, fold.ncp), _f32),               # zacc
            pltpu.VMEM((2, dp, fold.ncp, fold.cw),
                       jnp.bfloat16),                       # coarse buffers
            pltpu.SemaphoreType.DMA((2,)),
        ] if fold is not None else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=_interpret(),
    )

    atol2_s = jnp.reshape(atol2, (1, 1)).astype(_f32)
    maxit_s = jnp.full((1, 1), max_iters, _i32)
    # PCR coefficient planes ride in bf16 for the band kernel: their apply
    # is elementwise (mixed bf16*f32 promotes to f32, no dot dtype
    # restrictions), the factorization is a fixed linear operator with
    # bf16-rounded entries — preconditioner-grade — and the 10.3 MB of
    # f32 planes were half the remaining VMEM overshoot at 10k
    pcr = (
        (pre.alphas.astype(jnp.bfloat16),
         pre.gammas.astype(jnp.bfloat16))
        if nlevels else ()
    )
    extra = pcr + (pre.binv,)
    tail = (op.tiles,)
    if has_coarse and fold is not None:
        sseg, asel, bsel = _fold_selectors(fold, dp)
        extra = extra + (sseg, asel, bsel)
        c2t = pre.c2t if pre.c2t is not None else _fold_c2t(
            pre.cinv, fold, dp, np_)
        tail = tail + (c2t,)
    elif has_coarse:
        # rmat transposed for the band kernel (lane dim = Np, see kernel)
        extra = extra + (pre.cinv, pre.rmat.T)
    u_args = tuple(op.u[a] for a in range(dp)) if mw else ()

    def cond(st):
        x, r, p, rt, it, rz, stop, rr, k = st
        return (
            (k < n_chunks) & (rr[0, 0] > atol2) & (stop[0, 0] == 0)
        )

    def body(st):
        x, r, p, rt, it, rz, stop, rr, k = st
        restart = ((k % restart_chunks) == 0).astype(_i32)
        args = (
            atol2_s, maxit_s, jnp.reshape(restart, (1, 1)), it, rz, stop,
            op.win_off, rhs2, x, r, p, rt,
        ) + u_args + (
            op.tdiag, op.tupper, op.tlower,
        ) + extra + tail
        x, r, p, rt, it, rz, stop, rr = call(*args)
        return (x, r, p, rt, it, rz, stop, rr, k + 1)

    zeros = jnp.zeros_like(rhs2)
    st = jax.lax.while_loop(
        cond,
        body,
        (
            zeros, zeros, zeros,
            rhs2,
            jnp.zeros((1, 1), _i32),
            jnp.zeros((1, 1), _f32),
            jnp.zeros((1, 1), _i32),
            jnp.full((1, 1), rhs_norm2, _f32),
            jnp.asarray(0, _i32),
        ),
    )
    return schur.PCGResult(
        x=st[0], iterations=st[4][0, 0],
        residual_norm=jnp.sqrt(st[7][0, 0]),
    )


def fused_pcg(
    op: FusedOperator,
    pre: FusedPrecond,
    rhs2: jax.Array,          # f32[3, Np]
    tol: float,
    max_iters: int,
    chunk_iters: int,
    restart_every: int = 64,
) -> schur.PCGResult:
    """PCG on the fused operator; numerics match ops/schur.py::pcg —
    true-residual replacement + direction restart every ``restart_every``
    iterations, masked no-op iterations after convergence/breakdown.  The
    convergence check runs every ``chunk_iters`` iterations (per kernel
    launch); the CG recurrence state is carried across launches."""
    nlevels = int(pre.alphas.shape[0])
    has_coarse = pre.cinv is not None
    dp, np_ = rhs2.shape

    rhs_norm2 = jnp.sum(rhs2 * rhs2)
    atol2 = (tol ** 2) * rhs_norm2
    n_chunks = -(-max_iters // chunk_iters)
    # restart period in whole chunks (>= 1)
    restart_chunks = max(1, restart_every // chunk_iters)

    kernel = _make_kernel(nlevels, has_coarse, chunk_iters, dp)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    # VMEM operands: rhs, x, r, p, r_true, u x dp, tdiag, tupper, tlower,
    # binv (9 + dp) [+ alphas, gammas] [+ cinv, rmat]
    in_specs = [smem()] * 6 + [vmem()] * (
        9 + dp + (2 if nlevels else 0) + (2 if has_coarse else 0)
    )
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((dp, np_), _f32),  # x
            jax.ShapeDtypeStruct((dp, np_), _f32),  # r
            jax.ShapeDtypeStruct((dp, np_), _f32),  # p
            jax.ShapeDtypeStruct((dp, np_), _f32),  # r_true at chunk end
            jax.ShapeDtypeStruct((1, 1), _i32),     # it
            jax.ShapeDtypeStruct((1, 1), _f32),     # rz
            jax.ShapeDtypeStruct((1, 1), _i32),     # stop (sticky breakdown)
            jax.ShapeDtypeStruct((1, 1), _f32),     # rr (TRUE residual^2)
        ),
        in_specs=in_specs,
        out_specs=(vmem(), vmem(), vmem(), vmem(), smem(), smem(),
                   smem(), smem()),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=_interpret(),
    )

    atol2_s = jnp.reshape(atol2, (1, 1)).astype(_f32)
    maxit_s = jnp.full((1, 1), max_iters, _i32)
    pcr = (pre.alphas, pre.gammas) if nlevels else ()
    extra = pcr + (pre.binv,)
    if has_coarse:
        extra = extra + (pre.cinv, pre.rmat)

    def cond(st):
        x, r, p, rt, it, rz, stop, rr, k = st
        return (
            (k < n_chunks) & (rr[0, 0] > atol2) & (stop[0, 0] == 0)
        )

    def body(st):
        x, r, p, rt, it, rz, stop, rr, k = st
        restart = ((k % restart_chunks) == 0).astype(_i32)
        args = (
            atol2_s, maxit_s, jnp.reshape(restart, (1, 1)), it, rz, stop,
            rhs2, x, r, p, rt,
        ) + tuple(op.u[a] for a in range(dp)) + (
            op.tdiag, op.tupper, op.tlower,
        ) + extra
        x, r, p, rt, it, rz, stop, rr = call(*args)
        return (x, r, p, rt, it, rz, stop, rr, k + 1)

    zeros = jnp.zeros_like(rhs2)
    st = jax.lax.while_loop(
        cond,
        body,
        (
            zeros, zeros, zeros,
            rhs2,  # true residual at x=0
            jnp.zeros((1, 1), _i32),
            jnp.zeros((1, 1), _f32),
            jnp.zeros((1, 1), _i32),
            jnp.full((1, 1), rhs_norm2, _f32),
            jnp.asarray(0, _i32),
        ),
    )
    return schur.PCGResult(
        x=st[0], iterations=st[4][0, 0],
        residual_norm=jnp.sqrt(st[7][0, 0]),
    )


def _closure_columns(d: schur.BlockSystem, aux, n: int, dp: int):
    """Loop-closure odometry as full-height +chol(W) column pairs, plus
    the +W diagonal compensation on T (see build_fused_operator)."""
    c = aux.closure_e.shape[0]
    if not c:
        return None, None
    wcl = -d.hpp_off[aux.closure_e]                   # [C, dp, dp] PSD
    lcl = jnp.linalg.cholesky(wcl)
    cid = jnp.arange(c)
    ue = jnp.zeros((n, c, dp, dp), _f32)
    ue = ue.at[aux.closure_i, cid].add(lcl)
    ue = ue.at[aux.closure_j, cid].add(lcl)
    ucols = jnp.transpose(ue, (2, 0, 1, 3)).reshape(dp, n, dp * c)
    extra = jax.ops.segment_sum(wcl, aux.closure_i, n)
    extra = extra + jax.ops.segment_sum(wcl, aux.closure_j, n)
    return ucols, extra


def build_band_operator(
    d: schur.BlockSystem, hll_inv: jax.Array, graph
) -> BandOperator:
    """Materialize the streamed banded operator (ops/band_plan.py layout).

    The per-edge low-rank blocks ``Hpl L^{-T}`` scatter into the
    [n_chunks*K, dp, Wrow, B*dl] tile stack with ONE precomputed-index
    segment-sum; wide landmarks and loop closures become full-height
    columns exactly like the resident path's U slabs."""
    n = graph.num_poses
    dp = d.hpp_diag.shape[-1]
    dl = d.hll.shape[-1]
    band = graph.plan.band
    aux = graph.plan.fused
    w_row, b_dl = band.w_row, band.chunk_b * dl
    n_tiles = band.n_chunks * band.k_windows

    lh = _chol_spd(d.hll)
    el = jnp.swapaxes(_tri_inv_lower(lh), -1, -2)          # L^{-T}
    blk = bm.mm(d.hpl, el[graph.lm_edges.lm])              # [E, dp, dl]

    # one row gather + one unsorted unique-indices scatter-SET (see
    # band_plan.BandAux: measured best at both 10k and 100k — TPU
    # scatter cost scales with destination size, so one call wins)
    stride_a = w_row * b_dl
    vals = blk[band.src_edges].reshape(-1)
    flat = jnp.zeros((n_tiles * dp * stride_a,), _f32)
    flat = flat.at[band.elem_ids].set(vals, unique_indices=True)
    tiles = flat.reshape(
        band.n_chunks, band.k_windows, dp, w_row, b_dl
    )

    ucols = []
    if band.n_wide:
        # segment over just the static wide-edge subset (band_plan):
        # masking all E edges put a full-width segment_sum on the build
        # path (~7 ms at 10k) for a few dozen live values
        nw = band.n_wide
        we = band.wide_edges                                # [Ew_pad]
        ew_ok = (we < blk.shape[0]).astype(_f32)
        wej = jnp.minimum(we, blk.shape[0] - 1)
        wvals = blk[wej] * ew_ok[:, None, None]
        wid = jnp.where(
            ew_ok > 0,
            graph.lm_edges.pose[wej] * nw + band.wide_idx[wej],
            n * nw,
        )
        uw = jax.ops.segment_sum(wvals, wid, n * nw)       # [n*nw, dp, dl]
        ucols.append(
            uw.reshape(n, nw, dp, dl).transpose(2, 1, 3, 0).reshape(
                dp, nw * dl, n
            )
        )
    tdiag = d.hpp_diag
    ccols, extra = _closure_columns(d, aux, n, dp)
    if ccols is not None:
        ucols.append(jnp.swapaxes(ccols, 1, 2))
        tdiag = tdiag + extra
    u = jnp.concatenate(ucols, axis=1) if ucols else None

    upper = schur.chain_upper(d, graph.odom.i, graph.odom.j, n)
    lower = jnp.swapaxes(schur._shift_down(upper, 1), -1, -2)
    return BandOperator(
        tiles=tiles,
        win_off=band.win_off,
        u=u,
        tdiag=_planes(tdiag),
        tupper=_planes(upper),
        tlower=_planes(lower),
    )


def build_band_operator_grid(
    hll_d: jax.Array,        # f32[M, dl, dl] damped landmark blocks
    hpl_p: jax.Array,        # f32[N, Kp, dp, dl] pose-major hpl grid
    lm_p: jax.Array,         # i32[N, Kp] landmark of each grid slot
    hpp_diag: jax.Array,     # f32[N, dp, dp] damped pose diagonal
    tupper: jax.Array,       # f32[N, dp, dp] chain superdiagonal (masked)
    gband, n: int,
) -> BandOperator:
    """Band operator straight from the GRID assembly (ops/grid_schur.py).

    Identical math to :func:`build_band_operator`, minus the
    BlockSystem-layer costs it existed to avoid: the low-rank blocks are
    computed in the pose-major grid layout (no per-edge gathers), the
    tile scatter sources grid slots (band_plan.GridBandAux), the chain
    superdiagonal is read positionally (no chain_upper segment-sum), and
    loop closures cannot occur (build_grid_plan rejects non-chain
    odometry)."""
    dp, dl = hpl_p.shape[-2], hpl_p.shape[-1]
    w_row, b_dl = gband.w_row, gband.chunk_b * dl
    n_tiles = gband.n_chunks * gband.k_windows
    stride_a = w_row * b_dl

    lh = _chol_spd(hll_d)
    el = jnp.swapaxes(_tri_inv_lower(lh), -1, -2)           # L^{-T}
    blk = bm.mm(hpl_p, el[lm_p])                            # [N, Kp, dp, dl]

    # one dd-wide ROW gather (4.5x the element-gather rate) + ONE
    # unsorted unique-indices element scatter-SET in edge-major order —
    # measured best at both 10k (3.3 ms) and 100k (38 ms): TPU scatter
    # cost scales with the destination size, so one scatter call beats
    # three per-plane sorted ones (band_plan.GridBandAux,
    # scripts/exp_scatter_variants.py)
    rows = blk.reshape(-1, dp * dl)[gband.src_rows]
    flat = jnp.zeros((n_tiles * dp * stride_a,), _f32)
    flat = flat.at[gband.elem_ids].set(
        rows.reshape(-1), unique_indices=True,
    )
    tiles = flat.reshape(
        gband.n_chunks, gband.k_windows, dp, w_row, b_dl
    )

    u = None
    if gband.n_wide:
        nw = gband.n_wide
        blk_flat = blk.reshape(-1, dp, dl)
        ws = gband.wide_slots
        ok = (ws < blk_flat.shape[0]).astype(_f32)
        wvals = blk_flat[jnp.minimum(ws, blk_flat.shape[0] - 1)]
        uw = jax.ops.segment_sum(
            wvals * ok[:, None, None], gband.wide_ids, n * nw
        )
        u = uw.reshape(n, nw, dp, dl).transpose(2, 1, 3, 0).reshape(
            dp, nw * dl, n
        )

    lower = jnp.swapaxes(schur._shift_down(tupper, 1), -1, -2)
    return BandOperator(
        tiles=tiles,
        win_off=gband.win_off,
        u=u,
        tdiag=_planes(hpp_diag),
        tupper=_planes(tupper),
        tlower=_planes(lower),
    )


def build_fused_operator(
    d: schur.BlockSystem, hll_inv: jax.Array, graph
) -> FusedOperator:
    """Materialize ``T`` and the per-component ``V`` slabs.

    The dense V build is scatter-free: the pose-major gather table
    (plan.lm_by_pose) turns the per-edge ``Hpl chol(Hll^-1)`` blocks into a
    ``[Np, Kp, 3, 2]`` grid, and a one-hot batched contraction over the
    slot axis places them into landmark columns — one MXU einsum instead
    of a serialized TPU scatter (the CUDA reference scatters with
    atomicAdd, KernelSe2Point2.cu:122-154).
    """
    n, m = graph.num_poses, graph.num_landmarks
    dp = d.hpp_diag.shape[-1]
    dl = d.hll.shape[-1]
    aux = graph.plan.fused
    # V = Hpl L^{-T} with hll = L L^T — factoring the SPD damped hll
    # directly (clamped closed-form Cholesky + triangular inversion) is
    # stable where chol(inv(hll)) NaNs on ill-conditioned BA blocks:
    # V V^T = Hpl L^{-T} L^{-1} Hpl^T = Hpl Hll^{-1} Hlp exactly.
    lh = _chol_spd(d.hll)                                 # [M, dl, dl]
    el = jnp.swapaxes(_tri_inv_lower(lh), -1, -2)         # L^{-T} upper
    blk = bm.mm(d.hpl, el[graph.lm_edges.lm])             # [E, dp, dl]
    tbl = graph.plan.lm_by_pose
    grid = blk[tbl.idx] * tbl.mask[..., None, None]       # [Np, Kp, dp, dl]
    lmg = graph.lm_edges.lm[tbl.idx]                      # [Np, Kp]
    onehot = (
        (lmg[..., None] == jnp.arange(m, dtype=lmg.dtype)[None, None, :])
        .astype(_f32)
        * tbl.mask[..., None]
    )                                                     # [Np, Kp, M]
    z = jnp.einsum(
        "pkm,pkab->pmab", onehot, grid.astype(_f32),
        precision=jax.lax.Precision.HIGHEST,
    )                                                     # [Np, M, dp, dl]
    u = jnp.transpose(z, (2, 0, 1, 3)).reshape(dp, n, dl * m)

    tdiag = d.hpp_diag
    # loop-closure odometry: S[i,j] must be -W (A=-I/B=I structure,
    # hpp_off = -W); +chol(W) columns at rows i AND j give
    # (V V^T)[i,j] = +W, and the +W they add on the (i,i)/(j,j)
    # diagonals is compensated on T.
    ccols, extra = _closure_columns(d, aux, n, dp)
    if ccols is not None:
        u = jnp.concatenate([u, ccols], axis=2)
        tdiag = tdiag + extra

    upper = schur.chain_upper(d, graph.odom.i, graph.odom.j, n)
    lower = jnp.swapaxes(schur._shift_down(upper, 1), -1, -2)
    return FusedOperator(
        u=u,
        tdiag=_planes(tdiag),
        tupper=_planes(upper),
        tlower=_planes(lower),
    )


def build_fused_precond(
    d: schur.BlockSystem,
    hll_inv: jax.Array,
    graph,
    s_diag: jax.Array,
    precond: str,
    coarse_group: int,
) -> FusedPrecond:
    """Reuses the XLA preconditioner factorizations (ops/schur.py) and
    re-lays them out for the kernel; the coarse level arrives as the
    explicit Jacobi-equilibrated Newton-Schulz inverse
    (schur.build_coarse_precond -> spd_inverse — triangular solves don't
    exist in-kernel, and TPU Cholesky is a sequential panel loop)."""
    n = graph.num_poses
    dp = d.hpp_diag.shape[-1]
    local_kind, _, coarse_kind = precond.partition("+")
    if local_kind == "tridiag":
        upper = schur.chain_upper(d, graph.odom.i, graph.odom.j, n)
        pcr = schur.build_tridiag_precond(s_diag, upper)
        alphas = jnp.transpose(pcr.alphas, (0, 2, 3, 1))
        gammas = jnp.transpose(pcr.gammas, (0, 2, 3, 1))
        binv = _planes(pcr.binv)
    else:  # jacobi
        alphas = jnp.zeros((0, dp, dp, n), _f32)
        gammas = alphas
        binv = _planes(schur.inv_blocks(s_diag))
    if coarse_kind == "coarse":
        cinv = schur.build_coarse_precond(d, hll_inv, graph, coarse_group)
        dim = cinv.shape[0]
        nc = dim // dp
        # comp-major rows/cols (a*nc + c) -> [a, b, nc, nc] blocks
        cinv_b = jnp.transpose(
            cinv.reshape(dp, nc, dp, nc), (0, 2, 1, 3)
        )
        rmat = (
            (jnp.arange(n) // coarse_group)[:, None]
            == jnp.arange(nc)[None, :]
        ).astype(_f32)
        fold = _fold_layout(n, dp, nc)
        c2t = (
            _fold_c2t(cinv_b, fold, dp, n) if fold is not None else None
        )
        return FusedPrecond(alphas, gammas, binv, cinv_b, rmat, c2t)
    return FusedPrecond(alphas, gammas, binv, None, None)


def fused_precond_from_parts(
    local_kind: str,
    local,                     # schur PCR pytree (tridiag) or inv blocks
    coarse_inv: jax.Array | None,   # [nc*dp, nc*dp] comp-major, or None
    n: int,
    dp: int,
) -> FusedPrecond:
    """Re-lay an XLA-path preconditioner (e.g. the grid solver's
    ``(local, coarse)``) into the kernel plane layout.  The coarse level,
    when present, must admit the streamed fold layout (callers gate on
    :func:`_fold_layout`) — no resident restriction matrix is built."""
    if local_kind == "tridiag":
        alphas = jnp.transpose(local.alphas, (0, 2, 3, 1))
        gammas = jnp.transpose(local.gammas, (0, 2, 3, 1))
        binv = _planes(local.binv)
    else:
        alphas = jnp.zeros((0, dp, dp, n), _f32)
        gammas = alphas
        binv = _planes(local)
    if coarse_inv is None:
        return FusedPrecond(alphas, gammas, binv, None, None)
    dim = coarse_inv.shape[0]
    nc = dim // dp
    cinv_b = jnp.transpose(
        coarse_inv.reshape(dp, nc, dp, nc), (0, 2, 1, 3)
    )
    fold = _fold_layout(n, dp, nc)
    c2t = _fold_c2t(cinv_b, fold, dp, n) if fold is not None else None
    return FusedPrecond(alphas, gammas, binv, cinv_b, None, c2t)


def fused_mode(cfg, graph, axis_name) -> str | None:
    """Trace-time static gate: shapes, config, and plan aux presence only.

    Returns "resident" (whole V in VMEM — small graphs), "band" (streamed
    banded tiles, ops/band_plan.py — large graphs with run-local
    observations), or None (XLA fallback)."""
    if getattr(cfg, "pcg_backend", "auto") == "xla":
        return None
    if getattr(cfg, "pcg_unroll", False):
        return None
    if axis_name is not None or graph.plan is None:
        return None
    aux = getattr(graph.plan, "fused", None)
    if aux is None:
        return None
    local_kind, _, coarse_kind = cfg.pcg_precond.partition("+")
    if local_kind not in ("jacobi", "tridiag"):
        return None
    dp, dl = (6, 3) if cfg.solver == "schur3d" else (3, 2)
    n, m = graph.num_poses, graph.num_landmarks
    c = aux.closure_e.shape[0]
    if c and (cfg.exact_odom_jacobians or dp != 3):
        # the closure fold-in needs the 2D A=-I/B=I block structure
        # (off-diagonal = -W PSD); SE(3) odometry blocks are general
        return None
    if coarse_kind == "coarse" and n % cfg.pcg_coarse_group:
        return None
    nlevels = max(1, (n - 1).bit_length()) if local_kind == "tridiag" else 0
    nc = -(-n // cfg.pcg_coarse_group) if coarse_kind == "coarse" else 0
    dd = dp * dp
    shared_base = (
        4 * dd * n                 # T planes + binv
        + 2 * nlevels * dd * n     # PCR coefficient planes
        + 8 * dp * n               # state vectors + temps
    )
    # resident path keeps the coarse inverse + restriction in VMEM
    shared = shared_base + dd * nc * nc + n * nc
    mw = dl * m + dp * c
    if 4 * (dp * n * mw + shared) <= VMEM_BUDGET_BYTES:
        return "resident"
    band = getattr(graph.plan, "band", None)
    if band is None or getattr(band, "dp", 3) != dp \
            or getattr(band, "dl", 2) != dl:
        return None
    mwb = band.n_wide * dl + dp * c
    b_dl = band.chunk_b * dl
    fold = _fold_layout(n, dp, nc) if nc else None
    if fold is not None:
        # streamed fold coarse (FoldCoarse): only the double-buffered
        # bf16 chunk windows + small selectors live in VMEM — no nc cap
        coarse_words = (
            fold.ncp * fold.cw * dp      # 2x bf16 buffers at 2B each
            + n // 2 + dp * fold.ncp     # rcv (bf16) + zacc
            + (dp + 2) * 128 * 32        # selector operands
        )
    else:
        # resident rmat coarse: every dot SITE against the [nc, Np]
        # restriction operand reserves a ~operand-sized register-spill
        # slot (2*dp sites per precond call; measured ~100 MB at
        # nc=320/n=10240, vmem OOM) — larger groups that don't admit a
        # fold layout must keep the in-kernel coarse small
        coarse_words = dd * nc * nc + n * nc + (6 * nc * n if nc else 0)
    band_vmem = 4 * (
        dp * n * mwb                                 # wide+closure columns
        + 2 * band.k_windows * dp * band.w_row * b_dl  # 2x chunk buffers
        + 2 * dp * (n + band.w_row)                  # xext + wacc scratch
        + coarse_words
        + shared_base
    )
    if band_vmem <= 2 * VMEM_BUDGET_BYTES:
        return "band"
    return None


def fused_supported(cfg, graph, axis_name) -> bool:
    """Back-compat boolean over :func:`fused_mode`."""
    return fused_mode(cfg, graph, axis_name) is not None


def fused_precond_from_graph(cfg, graph, lam) -> FusedPrecond:
    """Assemble + build the fused preconditioner at (graph, lam) — the
    init/refresh step of the stateful (pcg_precond_refresh != 1) path."""
    sys = schur.assemble_blocks(
        graph, huber_delta=cfg.huber_delta, fixed_prior=cfg.fixed_prior,
        exact_odom_jacobians=cfg.exact_odom_jacobians,
        edge_backend=cfg.edge_backend,
    )
    d = schur.damp(sys, lam)
    hll_inv = schur.inv_blocks(d.hll)
    s_diag = schur.schur_s_diag(d, hll_inv, graph)
    return build_fused_precond(d, hll_inv, graph, s_diag,
                               cfg.pcg_precond, cfg.pcg_coarse_group)


def fused_schur_solve(
    sys: schur.BlockSystem,
    graph,
    lam: jax.Array,
    tol: float,
    max_iters: int,
    precond: str,
    coarse_group: int,
    chunk_iters: int,
    restart_every: int = 64,
    pre: FusedPrecond | None = None,
    mode: str | None = None,
) -> tuple[jax.Array, jax.Array, schur.SolveStats]:
    """Drop-in replacement for ops/schur.py::schur_solve on supported
    configurations — same reduction math, same damping, same Huber
    weighting, same back-substitution; only the PCG loop moves on-chip.
    A prebuilt ``pre`` (FusedPrecond) skips the preconditioner build —
    the freeze/refresh path.  ``mode`` ("resident"/"band", from
    fused_mode) picks the VMEM-resident or the HBM-streamed banded
    operator."""
    d = schur.damp(sys, lam)
    hll_inv = schur.inv_blocks(d.hll)
    rhs = -d.bp + schur.hpl_matvec(
        d, graph.lm_edges.pose, graph.lm_edges.lm,
        bm.mv(hll_inv, d.bl), graph.num_poses, None, graph.plan,
    )
    if pre is None:
        s_diag = schur.schur_s_diag(d, hll_inv, graph)
        pre = build_fused_precond(d, hll_inv, graph, s_diag, precond,
                                  coarse_group)
    if mode is None:
        mode = "resident"
    if mode == "band":
        bop = build_band_operator(d, hll_inv, graph)
        res = band_fused_pcg(bop, pre, rhs.T, tol, max_iters,
                             chunk_iters, restart_every)
    else:
        op = build_fused_operator(d, hll_inv, graph)
        res = fused_pcg(op, pre, rhs.T, tol, max_iters, chunk_iters,
                        restart_every)
    dx_p = res.x.T
    u = schur.hlp_matvec(
        d, graph.lm_edges.pose, graph.lm_edges.lm, dx_p,
        graph.num_landmarks, None, graph.plan,
    )
    dx_l = bm.mv(hll_inv, -d.bl - u)
    stats = schur.SolveStats(pcg_iters=res.iterations,
                             pcg_residual=res.residual_norm)
    return dx_p, dx_l, stats
