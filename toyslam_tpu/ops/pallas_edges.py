"""Fused Pallas TPU kernels for per-edge GN linearization.

The reference evaluates edges one CUDA thread at a time, scattering into a
dense Hessian with atomicAdd (remote/cuda/optimizer/kernels/KernelSe2.cu:37-112
and KernelSe2Point2.cu:46-155).  The TPU-native formulation below instead
treats one edge per *VPU lane*:

* All per-edge scalars are laid out **component-major** ``[channels, E]`` —
  scalar channels (pose x/y/theta, measurement, info entries, ...) live on
  the sublane axis and edges on the 128-wide lane axis, so every lane does
  useful work (an ``[E, 3]`` layout would waste 125/128 lanes).
* One kernel invocation fuses the whole linearization of an edge tile:
  residual -> chi^2 -> Huber weight -> weighted Hessian/gradient blocks
  (``JA^T W' JA``, ``JB^T W' JB``, ``JA^T W' JB``, ``JA^T W' r``,
  ``JB^T W' r``), one read of the inputs and one write of the outputs
  through VMEM — no HBM-resident intermediates.
* Accumulation into per-vertex blocks stays *outside* the kernel as the
  deterministic gather-plan reduction (ops/schur.py) — no atomics, bitwise
  reproducible, unlike the reference's atomicAdd scatter.

The gather of pose/landmark rows by edge index happens in XLA before the
call (TPU gathers of small rows are cheap relative to the fused math), so
the kernels are pure elementwise VPU code with static shapes.

On non-TPU backends the kernels run in Pallas interpreter mode, which keeps
the CPU test suite able to validate them bit-for-bit against the XLA oracle
(ops/edge_blocks.py backend="xla").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toyslam_tpu.ops import edge_blocks as eb

# Lane-axis tile: one kernel instance linearizes this many edges.
_TILE_E = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_edges(arrs, e: int):
    """Zero-pad the lane (edge) axis of ``[C, E]`` arrays to _TILE_E."""
    ep = max(_TILE_E, -(-e // _TILE_E) * _TILE_E)
    if ep == e:
        return arrs, ep
    return [jnp.pad(a, ((0, 0), (0, ep - e))) for a in arrs], ep


def _row(ref, k):
    """Read channel ``k`` as a [1, TILE] vector (2-D keeps Mosaic happy)."""
    return ref[k : k + 1, :]



def _out_struct(rows: int, ep: int, dtype, like):
    """ShapeDtypeStruct for pallas_call outputs, propagating the input's
    varying-mesh-axes (vma) so the kernels compose with shard_map's
    check_vma (per-edge outputs vary exactly like the per-edge inputs)."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct((rows, ep), dtype, vma=vma)
    return jax.ShapeDtypeStruct((rows, ep), dtype)

def _huber(chi2, delta: float):
    """Masked-chi^2 Huber weights (reference graph_optimizer.py:106-115)."""
    delta_sq = delta * delta
    sqrt_e = jnp.sqrt(jnp.maximum(chi2, 1e-30))
    inlier = chi2 <= delta_sq
    robust = jnp.where(inlier, chi2, 2.0 * sqrt_e * delta - delta_sq)
    w = jnp.where(inlier, jnp.ones_like(chi2), delta / sqrt_e)
    return robust, w


# ---------------------------------------------------------------------------
# Landmark edges: residual + analytic 2x3/2x2 Jacobians + weighted blocks.
#
# Input channels  [16, E] (12 used):
#   0-2  observing pose (x1, y1, th)        3-4   landmark (lx, ly)
#   5-6  measurement (range, bearing)       7-10  info (i00, i01, i10, i11)
#   11   mask
# Output channels [32, E] (26 used):
#   0-8   w_ata (3x3 row-major)             9-12  w_btb (2x2)
#   13-18 w_hpl (3x2)                       19-21 bp_c (3)
#   22-23 bl_c (2)                          24    robust_err
#   25    chi2
# ---------------------------------------------------------------------------

_LM_IN_ROWS = 16
_LM_OUT_ROWS = 32


def _lm_kernel(huber_delta: float, inp, out):
    x1, y1, th = _row(inp, 0), _row(inp, 1), _row(inp, 2)
    lx, ly = _row(inp, 3), _row(inp, 4)
    rng, brg = _row(inp, 5), _row(inp, 6)
    i00, i01 = _row(inp, 7), _row(inp, 8)
    i10, i11 = _row(inp, 9), _row(inp, 10)
    mask = _row(inp, 11)

    c, s = jnp.cos(th), jnp.sin(th)
    dx, dy = lx - x1, ly - y1
    # residual: landmark in the pose frame minus measured body-frame point
    # (reference edges2d.py:26-31)
    r0 = c * dx + s * dy - rng * jnp.cos(brg)
    r1 = -s * dx + c * dy - rng * jnp.sin(brg)

    # analytic Jacobians (edges2d.py:39-53)
    a00, a01, a02 = -c, -s, c * ly - s * lx - c * y1 + s * x1
    a10, a11, a12 = s, -c, -s * ly - c * lx + s * y1 + c * x1
    b00, b01 = c, s
    b10, b11 = -s, c

    chi2 = (
        r0 * (i00 * r0 + i01 * r1) + r1 * (i10 * r0 + i11 * r1)
    ) * mask
    robust, w = _huber(chi2, huber_delta)
    wq = w * mask
    w00, w01 = wq * i00, wq * i01
    w10, w11 = wq * i10, wq * i11

    # t = W' @ JA  (2x3)
    t00, t01, t02 = (
        w00 * a00 + w01 * a10,
        w00 * a01 + w01 * a11,
        w00 * a02 + w01 * a12,
    )
    t10, t11, t12 = (
        w10 * a00 + w11 * a10,
        w10 * a01 + w11 * a11,
        w10 * a02 + w11 * a12,
    )
    # u = W' @ JB  (2x2)
    u00, u01 = w00 * b00 + w01 * b10, w00 * b01 + w01 * b11
    u10, u11 = w10 * b00 + w11 * b10, w10 * b01 + w11 * b11
    # wr = W' @ r  (2)
    wr0 = w00 * r0 + w01 * r1
    wr1 = w10 * r0 + w11 * r1

    # w_ata = JA^T t (3x3)
    out[0:1, :] = a00 * t00 + a10 * t10
    out[1:2, :] = a00 * t01 + a10 * t11
    out[2:3, :] = a00 * t02 + a10 * t12
    out[3:4, :] = a01 * t00 + a11 * t10
    out[4:5, :] = a01 * t01 + a11 * t11
    out[5:6, :] = a01 * t02 + a11 * t12
    out[6:7, :] = a02 * t00 + a12 * t10
    out[7:8, :] = a02 * t01 + a12 * t11
    out[8:9, :] = a02 * t02 + a12 * t12
    # w_btb = JB^T u (2x2)
    out[9:10, :] = b00 * u00 + b10 * u10
    out[10:11, :] = b00 * u01 + b10 * u11
    out[11:12, :] = b01 * u00 + b11 * u10
    out[12:13, :] = b01 * u01 + b11 * u11
    # w_hpl = JA^T u (3x2)
    out[13:14, :] = a00 * u00 + a10 * u10
    out[14:15, :] = a00 * u01 + a10 * u11
    out[15:16, :] = a01 * u00 + a11 * u10
    out[16:17, :] = a01 * u01 + a11 * u11
    out[17:18, :] = a02 * u00 + a12 * u10
    out[18:19, :] = a02 * u01 + a12 * u11
    # bp_c = JA^T wr (3)
    out[19:20, :] = a00 * wr0 + a10 * wr1
    out[20:21, :] = a01 * wr0 + a11 * wr1
    out[21:22, :] = a02 * wr0 + a12 * wr1
    # bl_c = JB^T wr (2)
    out[22:23, :] = b00 * wr0 + b10 * wr1
    out[23:24, :] = b01 * wr0 + b11 * wr1
    out[24:25, :] = robust * mask
    out[25:26, :] = chi2
    # zero the pad channels so the whole block is defined
    out[26:32, :] = jnp.zeros_like(out[26:32, :])


@functools.partial(jax.jit, static_argnames=("huber_delta",))
def lm_edge_blocks_pallas(
    poses, landmarks, pose_idx, lm_idx, meas, info, mask, huber_delta: float
) -> eb.LmBlocks:
    e = pose_idx.shape[0]
    dtype = poses.dtype
    p = poses[pose_idx]          # [E,3] (XLA gather)
    lm = landmarks[lm_idx]       # [E,2]
    inp = jnp.concatenate(
        [
            p.T,
            lm.T,
            meas.T,
            info.reshape(e, 4).T,
            mask[None, :],
            jnp.zeros((_LM_IN_ROWS - 12, e), dtype),
        ],
        axis=0,
    )
    (inp,), ep = _pad_edges([inp], e)

    out = pl.pallas_call(
        functools.partial(_lm_kernel, huber_delta),
        out_shape=_out_struct(_LM_OUT_ROWS, ep, dtype, inp),
        grid=(ep // _TILE_E,),
        in_specs=[
            pl.BlockSpec(
                (_LM_IN_ROWS, _TILE_E),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_LM_OUT_ROWS, _TILE_E),
            lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret(),
    )(inp)

    out = out[:, :e]
    return eb.LmBlocks(
        w_ata=out[0:9].T.reshape(e, 3, 3),
        w_btb=out[9:13].T.reshape(e, 2, 2),
        w_hpl=out[13:19].T.reshape(e, 3, 2),
        bp_c=out[19:22].T,
        bl_c=out[22:24].T,
        robust_err=out[24],
        chi2=out[25],
    )


# ---------------------------------------------------------------------------
# Odometry edges (A=-I, B=I structure, reference edges2d.py:75-77).
#
# Input channels  [24, E] (19 used):
#   0-2  pose_i (x1,y1,t1)   3-5  pose_j   6-8  meas (mx,my,mt)
#   9-17 info (3x3 row-major)              18   mask
# Output channels [16, E] (14 used):
#   0-8  w_info = w*mask*info (3x3)        9-11 wr = w_info @ r
#   12   robust_err                        13   chi2
# ---------------------------------------------------------------------------

_OD_IN_ROWS = 24
_OD_OUT_ROWS = 16


def _odom_kernel(huber_delta: float, inp, out):
    x1, y1, t1 = _row(inp, 0), _row(inp, 1), _row(inp, 2)
    x2, y2, t2 = _row(inp, 3), _row(inp, 4), _row(inp, 5)
    mx, my, mt = _row(inp, 6), _row(inp, 7), _row(inp, 8)
    info = [_row(inp, 9 + k) for k in range(9)]
    mask = _row(inp, 18)

    # rel = pose_i^-1 ⊕ pose_j (reference edges2d.py:71, se2.relative)
    c1, s1 = jnp.cos(t1), jnp.sin(t1)
    ddx, ddy = x2 - x1, y2 - y1
    rx = c1 * ddx + s1 * ddy
    ry = -s1 * ddx + c1 * ddy
    # delta = meas^-1 ⊕ rel, read out as (x, y, wrapped theta)
    cm, sm = jnp.cos(mt), jnp.sin(mt)
    mix = -(cm * mx + sm * my)
    miy = -(-sm * mx + cm * my)
    r0 = mix + cm * rx + sm * ry
    r1 = miy - sm * rx + cm * ry
    dt = t2 - t1 - mt
    # wrap to (-pi, pi] without atan2 (not lowerable in Pallas TPU):
    # dt is bounded by 3*pi here since stored thetas are wrapped
    two_pi = 2.0 * jnp.pi
    r2 = dt - two_pi * jnp.floor((dt + jnp.pi) / two_pi)

    i00, i01, i02, i10, i11, i12, i20, i21, i22 = info
    ir0 = i00 * r0 + i01 * r1 + i02 * r2
    ir1 = i10 * r0 + i11 * r1 + i12 * r2
    ir2 = i20 * r0 + i21 * r1 + i22 * r2
    chi2 = (r0 * ir0 + r1 * ir1 + r2 * ir2) * mask
    robust, w = _huber(chi2, huber_delta)
    wq = w * mask

    for k in range(9):
        out[k : k + 1, :] = wq * info[k]
    out[9:10, :] = wq * ir0
    out[10:11, :] = wq * ir1
    out[11:12, :] = wq * ir2
    out[12:13, :] = robust * mask
    out[13:14, :] = chi2
    out[14:16, :] = jnp.zeros_like(out[14:16, :])


@functools.partial(jax.jit, static_argnames=("huber_delta",))
def odom_edge_blocks_pallas(
    poses, i, j, meas, info, mask, huber_delta: float
) -> eb.OdomBlocks:
    e = i.shape[0]
    dtype = poses.dtype
    inp = jnp.concatenate(
        [
            poses[i].T,
            poses[j].T,
            meas.T,
            info.reshape(e, 9).T,
            mask[None, :],
            jnp.zeros((_OD_IN_ROWS - 19, e), dtype),
        ],
        axis=0,
    )
    (inp,), ep = _pad_edges([inp], e)

    out = pl.pallas_call(
        functools.partial(_odom_kernel, huber_delta),
        out_shape=_out_struct(_OD_OUT_ROWS, ep, dtype, inp),
        grid=(ep // _TILE_E,),
        in_specs=[
            pl.BlockSpec(
                (_OD_IN_ROWS, _TILE_E),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_OD_OUT_ROWS, _TILE_E),
            lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret(),
    )(inp)

    out = out[:, :e]
    return eb.OdomBlocks(
        w_info=out[0:9].T.reshape(e, 3, 3),
        wr=out[9:12].T,
        robust_err=out[12],
        chi2=out[13],
    )


# ---------------------------------------------------------------------------
# SE(3) reprojection edges (the 6/3-dof analogue of the landmark kernel;
# CUDA reference being replaced: KernelSe2Point2.cu:46-155).  Small-matrix
# algebra is expressed over Python lists of [1, TILE] channel rows — every
# entry is one VPU vector op, unrolled at trace time.
#
# Input channels  [32, E] (26 used):
#   0-8   R row-major          9-11  t             12-14 landmark X
#   15-16 meas (u, v)          17-20 info 2x2      21    mask
#   22-25 intrinsics (fx, fy, cx, cy) broadcast
# Output channels [80, E] (74 used):
#   0-35  w_ata (6x6)          36-44 w_btb (3x3)   45-62 w_hpl (6x3)
#   63-68 bp_c (6)             69-71 bl_c (3)      72 robust_err  73 chi2
# ---------------------------------------------------------------------------

_RP_IN_ROWS = 32
_RP_OUT_ROWS = 80


def _matmul_rows(A, B):
    """[n x k] @ [k x m] over lists of [1, TILE] rows."""
    n, k, m = len(A), len(B), len(B[0])
    return [
        [sum(A[i][p] * B[p][j] for p in range(k)) for j in range(m)]
        for i in range(n)
    ]


def _reproj_kernel(huber_delta: float, inp, out):
    R = [[_row(inp, 3 * i + j) for j in range(3)] for i in range(3)]
    t = [_row(inp, 9 + k) for k in range(3)]
    X = [_row(inp, 12 + k) for k in range(3)]
    m0, m1 = _row(inp, 15), _row(inp, 16)
    i00, i01 = _row(inp, 17), _row(inp, 18)
    i10, i11 = _row(inp, 19), _row(inp, 20)
    mask = _row(inp, 21)
    fx, fy = _row(inp, 22), _row(inp, 23)
    cx, cy = _row(inp, 24), _row(inp, 25)

    # x_c = R^T (X - t)   (residuals3d.eval_reproj_edges)
    dx = [X[k] - t[k] for k in range(3)]
    xc = [sum(R[j][i] * dx[j] for j in range(3)) for i in range(3)]
    z = jnp.maximum(xc[2], 1e-6)
    inv_z = 1.0 / z
    r0 = fx * xc[0] * inv_z + cx - m0
    r1 = fy * xc[1] * inv_z + cy - m1

    zero = jnp.zeros_like(z)
    # J_proj [2x3]
    jp = [
        [fx * inv_z, zero, -fx * xc[0] * inv_z * inv_z],
        [zero, fy * inv_z, -fy * xc[1] * inv_z * inv_z],
    ]
    # d x_c/d dt = -R^T;  d x_c/d omega = [x_c]_x;  d x_c/d X = R^T
    neg_rt = [[-R[j][i] for j in range(3)] for i in range(3)]
    hat = [
        [zero, -xc[2], xc[1]],
        [xc[2], zero, -xc[0]],
        [-xc[1], xc[0], zero],
    ]
    rt = [[R[j][i] for j in range(3)] for i in range(3)]
    ja_l = _matmul_rows(jp, neg_rt)           # [2x3]
    ja_r = _matmul_rows(jp, hat)              # [2x3]
    JA = [ja_l[0] + ja_r[0], ja_l[1] + ja_r[1]]   # [2x6]
    JB = _matmul_rows(jp, rt)                 # [2x3]

    chi2 = (
        r0 * (i00 * r0 + i01 * r1) + r1 * (i10 * r0 + i11 * r1)
    ) * mask
    robust, w = _huber(chi2, huber_delta)
    wq = w * mask
    W = [[wq * i00, wq * i01], [wq * i10, wq * i11]]

    tA = _matmul_rows(W, JA)                  # [2x6] = W' JA
    uB = _matmul_rows(W, JB)                  # [2x3] = W' JB
    wr = [W[0][0] * r0 + W[0][1] * r1, W[1][0] * r0 + W[1][1] * r1]

    k = 0
    for a in range(6):                        # w_ata = JA^T tA (6x6)
        for b in range(6):
            out[k : k + 1, :] = JA[0][a] * tA[0][b] + JA[1][a] * tA[1][b]
            k += 1
    for a in range(3):                        # w_btb = JB^T uB (3x3)
        for b in range(3):
            out[k : k + 1, :] = JB[0][a] * uB[0][b] + JB[1][a] * uB[1][b]
            k += 1
    for a in range(6):                        # w_hpl = JA^T uB (6x3)
        for b in range(3):
            out[k : k + 1, :] = JA[0][a] * uB[0][b] + JA[1][a] * uB[1][b]
            k += 1
    for a in range(6):                        # bp_c = JA^T wr (6)
        out[k : k + 1, :] = JA[0][a] * wr[0] + JA[1][a] * wr[1]
        k += 1
    for a in range(3):                        # bl_c = JB^T wr (3)
        out[k : k + 1, :] = JB[0][a] * wr[0] + JB[1][a] * wr[1]
        k += 1
    out[72:73, :] = robust * mask
    out[73:74, :] = chi2
    out[74:80, :] = jnp.zeros_like(out[74:80, :])


@functools.partial(jax.jit, static_argnames=("huber_delta",))
def reproj_edge_blocks_pallas(
    poses, landmarks, intrinsics, pose_idx, lm_idx, meas, info, mask,
    huber_delta: float,
):
    from toyslam_tpu.ops import edge_blocks3d as eb3

    e = pose_idx.shape[0]
    dtype = poses.dtype
    p = poses[pose_idx]              # [E,12] (XLA gather)
    lm = landmarks[lm_idx]           # [E,3]
    intr = jnp.broadcast_to(intrinsics[:, None], (4, e)).astype(dtype)
    inp = jnp.concatenate(
        [
            p.T,
            lm.T,
            meas.T,
            info.reshape(e, 4).T,
            mask[None, :],
            intr,
            jnp.zeros((_RP_IN_ROWS - 26, e), dtype),
        ],
        axis=0,
    )
    (inp,), ep = _pad_edges([inp], e)

    out = pl.pallas_call(
        functools.partial(_reproj_kernel, huber_delta),
        out_shape=_out_struct(_RP_OUT_ROWS, ep, dtype, inp),
        grid=(ep // _TILE_E,),
        in_specs=[
            pl.BlockSpec(
                (_RP_IN_ROWS, _TILE_E),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_RP_OUT_ROWS, _TILE_E),
            lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret(),
    )(inp)

    out = out[:, :e]
    return eb3.ReprojBlocks(
        w_ata=out[0:36].T.reshape(e, 6, 6),
        w_btb=out[36:45].T.reshape(e, 3, 3),
        w_hpl=out[45:63].T.reshape(e, 6, 3),
        bp_c=out[63:69].T,
        bl_c=out[69:72].T,
        robust_err=out[72],
        chi2=out[73],
    )
