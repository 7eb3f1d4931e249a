"""Tile-stack materialization variants (round-5 item 3): the current
element-id gather + element scatter-set costs 5.6 ms/GN; try row-
structured forms."""

import dataclasses

import _bootstrap  # noqa: F401,E402

import jax
import jax.numpy as jnp
import numpy as np

from tputime import report, rtt

from toyslam_tpu.config import OptimizerConfig
from toyslam_tpu.ops import blockmath as bm, fused_pcg, grid_schur
from toyslam_tpu.sim import synthetic


def main():
    graph, _, _ = synthetic.make_large_problem(
        num_poses=10_000, num_landmarks=10_000, obs_per_pose=6, seed=0,
    )
    cfg = OptimizerConfig(solver="schur_grid", exact_odom_jacobians=True)
    gp = grid_schur.build_grid_plan(graph)
    graph = jax.device_put(dataclasses.replace(graph, plan=gp))
    gp = graph.plan
    gb = gp.band
    n = graph.num_poses
    lam = jnp.asarray(1e-3, jnp.float32)
    sys_g = grid_schur._assemble(graph, gp, cfg)
    d = grid_schur._damp(sys_g, lam)
    lm_p = jax.device_put(gp.P_lm.reshape(n, d.kp))
    hll, hpl_p = jax.device_put(d.hll), jax.device_put(d.hpl_P)

    lh = fused_pcg._chol_spd(hll)
    el = jnp.swapaxes(fused_pcg._tri_inv_lower(lh), -1, -2)
    blk = jax.device_put(np.asarray(bm.mm(hpl_p, el[lm_p])))
    print(f"rtt={rtt()*1e3:.1f} ms  blk {blk.shape}")

    # reconstruct from the (round-5) plane-structured program: edges in
    # base-sorted order with per-plane sorted element ids
    gslot = np.asarray(gb.src_rows, np.int64)
    eids = np.asarray(gb.elem_ids, np.int64)
    base = eids.reshape(-1, 6)[:, 0]
    eb = gslot.shape[0]
    n_tiles = gb.n_chunks * gb.k_windows
    stride_a = gb.w_row * gb.chunk_b * 2
    flat_size = n_tiles * 3 * stride_a
    # legacy element-form (V1) rebuilt for comparison
    ids6 = (base[:, None] + (np.arange(6)[None, :] // 2) * stride_a
            + np.arange(6)[None, :] % 2).reshape(-1)
    src6 = (gslot[:, None] * 6 + np.arange(6)[None, :]).reshape(-1)
    order6 = np.argsort(ids6, kind="stable")
    ids = ids6[order6]
    src = src6[order6]

    gslot_d = jax.device_put(gslot.astype(np.int32))
    base2_d = jax.device_put((base // 2).astype(np.int32))
    ids_d = jax.device_put(ids.astype(np.int32))
    src_d = jax.device_put(src.astype(np.int32))

    def v1(blk):
        vals = blk.reshape(-1)[src_d]
        flat = jnp.zeros((flat_size,), jnp.float32)
        flat = flat.at[ids_d].set(vals, indices_are_sorted=True,
                                  unique_indices=True)
        return jnp.sum(flat)

    report("V1 element gather + element scatter", jax.jit(v1), blk,
           reps=10)

    def v2(blk):
        rows = blk.reshape(-1, 6)[gslot_d]         # [Eb, 6] row gather
        flat = jnp.zeros((flat_size // 2, 2), jnp.float32)
        r3 = rows.reshape(-1, 3, 2)
        for a in range(3):
            flat = flat.at[base2_d + a * (stride_a // 2)].set(
                r3[:, a, :], indices_are_sorted=True, unique_indices=True
            )
        return jnp.sum(flat)

    report("V2 row gather + 3x width-2 sorted scatters", jax.jit(v2),
           blk, reps=10)

    # V3: single width-2 scatter, (e,a) unsorted (edge-major) but unique
    dst_ea = (base[:, None] // 2
              + np.arange(3)[None, :] * (stride_a // 2)).reshape(-1)
    dst_ea_d = jax.device_put(dst_ea.astype(np.int32))

    def v3(blk):
        rows = blk.reshape(-1, 6)[gslot_d]
        flat = jnp.zeros((flat_size // 2, 2), jnp.float32)
        flat = flat.at[dst_ea_d].set(
            rows.reshape(-1, 2), indices_are_sorted=False,
            unique_indices=True,
        )
        return jnp.sum(flat)

    report("V3 row gather + one width-2 unsorted scatter", jax.jit(v3),
           blk, reps=10)

    # V4: width-6 scatter into a [flat/6? no] — a-planes not contiguous;
    # instead scatter [Eb] width-2 rows three separate a-planes but via
    # one fused jit (same as V2; skip).

    # V5: one [Eb,6] row gather (edge order = base-sorted = dest order
    # within each plane) + 3 per-plane element scatters, each with
    # globally SORTED ids (for fixed a, (tile, w, slot, b) ascending)
    ids_plane = np.stack([
        np.sort((base[:, None] + a * stride_a
                 + np.arange(2)[None, :]).reshape(-1))
        for a in range(3)
    ])
    ids_plane_d = jax.device_put(ids_plane.astype(np.int32))

    def v5(blk):
        rows = blk.reshape(-1, 6)[gslot_d].reshape(-1, 3, 2)
        flat = jnp.zeros((flat_size,), jnp.float32)
        for a in range(3):
            flat = flat.at[ids_plane_d[a]].set(
                rows[:, a, :].reshape(-1),
                indices_are_sorted=True, unique_indices=True,
            )
        return jnp.sum(flat)

    report("V5 row gather + 3 per-plane sorted element scatters",
           jax.jit(v5), blk, reps=10)

    # equivalence check
    a = np.asarray(jax.jit(v1)(blk))
    b = np.asarray(jax.jit(v2)(blk))
    c = np.asarray(jax.jit(v3)(blk))
    e = np.asarray(jax.jit(v5)(blk))
    print("sums:", a, b, c, e)


if __name__ == "__main__":
    main()
