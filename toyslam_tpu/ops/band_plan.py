"""Banded low-rank structure for the streamed fused PCG at scale.

The fused Schur operator (ops/fused_pcg.py) re-expresses the landmark fill
as ``V V^T`` with ``V = Hpl chol(Hll^-1)``.  Below ~1k poses V fits VMEM
densely; at 10k it is 2.4 GB dense — but 99.99% zero, with *structure*:
SLAM observations are local, so each landmark's observing poses form a few
short RUNS (measured on the 10k serpentine: 2.6 runs/landmark, run span
p99 = 15 poses; the runs sit ~a-row-apart because the sweep passes each
landmark from adjacent rows).

This module finds that structure host-side and fixes a static layout the
kernel can stream:

* every landmark gets a unique BASE pose ≤ its first observation
  (parking-style assignment, so each chunk of ``B`` consecutive bases owns
  ≤ B landmark columns);
* per base-chunk, the observation runs of its landmarks are clustered
  into ≤ ``K`` row-windows of fixed width ``Wrow`` (greedy interval
  clustering); landmarks that do not fit spill to a small set of
  full-height "wide" columns (handled like loop-closure columns);
* the per-edge scatter index into the dense tile stack
  ``[n_chunks, K, dp, Wrow, B*dl]`` is precomputed, so materializing the
  tiles at each linearization is one segment-sum.

One PCG matvec then streams the tile stack ONCE (double-buffered DMA,
~100-200 MB instead of 2.4 GB) and does two MXU dots per (chunk, window):
``t += xw_k @ D_k`` then ``w[win_k] += t @ D_k^T`` — the same
dot_general pattern the VMEM-resident kernel already uses.

(B, K, Wrow) are searched to minimize streamed bytes under a spill cap —
the layout adapts to the workload (single-lap serpentine: K=2 windows —
own-row + adjacent-row; multi-lap revisits: one window pair per lap).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandAux:
    """Static banded layout (host-built, structure-only).

    Lives on ``plan.band``; its presence gates the streamed fused path.
    """

    # flat index into the [n_chunks * K * dp * Wrow * B*dl] tile stack of
    # the (a=0, b=0) element of each landmark edge's block (0 if not band)
    scatter_base: jax.Array   # i32[E]
    band_mask: jax.Array      # f32[E] 1 = edge lives in the tile stack
    win_off: jax.Array        # i32[n_chunks, K] window start pose
    wide_idx: jax.Array       # i32[E] wide-column slot of the edge's lm
    wide_mask: jax.Array      # f32[E] 1 = edge belongs to a wide landmark
    # SORTED-UNIQUE scatter program for materializing the tile stack:
    # gather the per-edge block components at ``scatter_src`` (flat index
    # into blk[Eb, dp, dl]) and scatter-SET them at ``scatter_ids`` —
    # strictly increasing, collision-free by construction, so XLA's
    # sorted/unique scatter path applies (the generic scatter-add
    # measured ~12.5 ms per linearization at 10k; see fused_pcg)
    scatter_src: jax.Array    # i32[Eb * dp * dl]
    scatter_ids: jax.Array    # i32[Eb * dp * dl]
    # static list of the wide-landmark edges (padded with E -> masked):
    # the wide-column build segments over just these few hundred edges
    # instead of masking all E (a full-width segment_sum measured ~7 ms
    # per linearization at 10k for ~dozens of live values)
    wide_edges: jax.Array     # i32[Ew_pad]
    chunk_b: int = dataclasses.field(metadata=dict(static=True), default=64)
    k_windows: int = dataclasses.field(metadata=dict(static=True), default=2)
    w_row: int = dataclasses.field(metadata=dict(static=True), default=192)
    n_chunks: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_wide: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def tile_bytes(self) -> int:
        b_dl = self.chunk_b * 2
        return self.n_chunks * self.k_windows * 3 * self.w_row * b_dl * 4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridBandAux:
    """Band layout re-addressed for the pose-major GRID storage
    (ops/grid_schur.py): the scatter program indexes the flattened
    ``[N*Kp, dp, dl]`` per-slot block array instead of per-edge blocks,
    so the streamed band operator builds directly from the grid
    assembly — no BlockSystem, no per-edge gathers, no chain segment-sum
    (the grid already holds ``tupper`` positionally).

    Materialization form (round 5, measured on v5e): ONE 6-wide ROW
    gather of the band edges' blocks (row gathers run ~4.5x faster than
    the same elements gathered by element id) + THREE per-plane element
    scatter-SETs whose ids are globally sorted (for a fixed plane ``a``
    the destination order (tile, w, slot, b) is ascending) — 3.6 ms vs
    5.5 ms for the element-gather + single-scatter form, bitwise
    identical (scripts/exp_scatter_variants.py).  Width-2 row scatters
    measured 3x WORSE (16 ms) — only the 1D sorted-unique element
    scatter hits XLA's fast path."""

    src_rows: jax.Array      # i32[Eb] grid slot per band edge, base-sorted
    plane_ids: jax.Array     # i32[dp, Eb*dl] sorted tile element ids
    wide_slots: jax.Array    # i32[Ew_pad] grid slot of each wide edge
    wide_ids: jax.Array      # i32[Ew_pad] destination p*n_wide + widx
    win_off: jax.Array       # i32[n_chunks, K]
    chunk_b: int = dataclasses.field(metadata=dict(static=True), default=64)
    k_windows: int = dataclasses.field(metadata=dict(static=True), default=2)
    w_row: int = dataclasses.field(metadata=dict(static=True), default=192)
    n_chunks: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_wide: int = dataclasses.field(metadata=dict(static=True), default=0)


def build_grid_band(graph, p_pose, p_lm, p_mask, kp) -> GridBandAux | None:
    """Host-side: run the band structure search and re-address its scatter
    program to pose-major grid slots ((p, q) -> flat slot p*kp + q)."""
    band = build_band_aux(graph)
    if band is None:
        return None
    n = graph.num_poses
    lp = np.asarray(graph.lm_edges.pose)
    ll = np.asarray(graph.lm_edges.lm)
    slot_of = {}
    pm = np.asarray(p_mask) > 0
    for s in np.nonzero(pm)[0]:
        slot_of[(int(p_pose[s]), int(p_lm[s]))] = int(s)

    band_mask = np.asarray(band.band_mask)
    base = np.asarray(band.scatter_base, np.int64)
    b_dl = band.chunk_b * 2
    stride_a = band.w_row * b_dl
    eb = np.nonzero(band_mask > 0)[0]
    gslot = np.asarray(
        [slot_of[(int(lp[e]), int(ll[e]))] for e in eb], np.int64
    )
    # base-sorted edge order: for each plane a the element destinations
    # (base + a*stride_a + b) are then globally ascending (b in {0,1}
    # consecutive, bases unique per edge)
    order_e = np.argsort(base[eb], kind="stable")
    base_s = base[eb][order_e]
    src_rows = gslot[order_e]
    plane_ids = np.stack([
        (base_s[:, None] + a * stride_a
         + np.arange(2)[None, :]).reshape(-1)
        for a in range(3)
    ])

    wmask = np.asarray(band.wide_mask)
    widx = np.asarray(band.wide_idx, np.int64)
    we = np.nonzero(wmask > 0)[0]
    ew_pad = max(64, 1 << int(np.ceil(np.log2(max(len(we), 1)))))
    nw = max(band.n_wide, 1)
    wide_slots = np.full((ew_pad,), n * kp, np.int64)
    wide_ids = np.full((ew_pad,), n * nw, np.int64)
    for i, e in enumerate(we):
        wide_slots[i] = slot_of[(int(lp[e]), int(ll[e]))]
        wide_ids[i] = int(lp[e]) * band.n_wide + int(widx[e])

    return GridBandAux(
        src_rows=src_rows.astype(np.int32),
        plane_ids=plane_ids.astype(np.int32),
        wide_slots=wide_slots.astype(np.int32),
        wide_ids=wide_ids.astype(np.int32),
        win_off=np.asarray(band.win_off, np.int32),
        chunk_b=band.chunk_b, k_windows=band.k_windows,
        w_row=band.w_row, n_chunks=band.n_chunks, n_wide=band.n_wide,
    )


def _runs(poses: np.ndarray, gap: int = 8):
    """Sorted observation poses -> list of [lo, hi] run intervals."""
    iv = []
    lo = hi = int(poses[0])
    for p in poses[1:]:
        p = int(p)
        if p - hi > gap:
            iv.append((lo, hi))
            lo = p
        hi = p
    iv.append((lo, hi))
    return iv


def _try_layout(n, obs_by_lm, first_obs, order, B, K, Wrow, spill_cap):
    """Greedy layout attempt; returns (win_off, base_of_lm, wide_lms) or
    None if more than ``spill_cap`` landmarks spill."""
    n_chunks = -(-n // B)
    # parking: unique base per landmark, ascending by first observation —
    # the base only selects the landmark's COLUMN chunk (windows are
    # anchored on the runs, not the base), so it may exceed first_obs;
    # pile-ups just displace chunks slightly, widening cluster spread
    base_of = {}
    wide = []
    next_free = 0
    for m in order:          # ascending first_obs
        b = max(int(first_obs[m]), next_free)
        if b >= n:
            wide.append(m)
            continue
        base_of[m] = b
        next_free = b + 1
    # cluster runs per chunk
    win_off = np.zeros((n_chunks, K), np.int64)
    by_chunk = {}
    for m, b in base_of.items():
        by_chunk.setdefault(b // B, []).append(m)
    for c, lms in by_chunk.items():
        ivs = []
        for m in lms:
            for lo, hi in _runs(obs_by_lm[m]):
                ivs.append((lo, hi, m))
        ivs.sort()
        wins = []          # window anchor poses (128-aligned)
        bad = set()
        for lo, hi, m in ivs:
            placed = False
            for wv in wins:
                if wv[0] <= lo and hi < wv[0] + Wrow:
                    placed = True
                    break
            if placed:
                continue
            # anchors are LANE-ALIGNED (multiples of 128): Mosaic's
            # vector loads need dynamic lane offsets provably aligned
            lo_q = (lo // 128) * 128
            if len(wins) < K and hi - lo_q < Wrow:
                wins.append([lo_q])
                continue
            bad.add(m)
        for m in bad:
            del base_of[m]
            wide.append(m)
        if len(wide) > spill_cap:
            return None
        for k, wv in enumerate(wins):
            win_off[c, k] = wv[0]
        for k in range(len(wins), K):
            win_off[c, k] = win_off[c, max(len(wins) - 1, 0)]
    if len(wide) > spill_cap:
        return None
    return win_off, base_of, wide


def build_band_aux(
    graph, spill_cap: int = 56,
    search=((64, 2, 256), (64, 3, 256), (64, 4, 256), (64, 3, 384),
            (64, 4, 384), (128, 2, 256), (128, 3, 256), (128, 4, 256),
            (128, 3, 384), (128, 4, 384), (64, 6, 256),
            (64, 8, 256), (64, 6, 384), (64, 10, 256), (64, 12, 256),
            (64, 2, 768), (128, 2, 896), (64, 12, 384), (128, 6, 256),
            (128, 8, 256)),
) -> BandAux | None:
    """Host-side structure search.  Returns None when no searched
    (B, K, Wrow) covers the workload within the spill cap — callers fall
    back to the XLA grid path."""
    n = graph.num_poses
    lp = np.asarray(graph.lm_edges.pose)
    ll = np.asarray(graph.lm_edges.lm)
    msk = np.asarray(graph.lm_edges.mask) > 0
    e_all = lp.shape[0]
    if not msk.any():
        return None
    real = np.nonzero(msk)[0]
    # Duplicate (pose, lm) observations are legal graph input (the XLA and
    # segment-sum paths SUM them), but the band layout gives both copies
    # the same tile slot: the sorted-unique scatter-SET in
    # build_band_operator would silently drop one block, and
    # build_grid_band's slot map would collapse their grid slots.  Fall
    # back to the XLA path rather than diverge (mirrors the grid
    # duplicate-odometry check, ADVICE r4).
    pair_key = lp[real].astype(np.int64) * np.int64(ll.max() + 1) + ll[real]
    if np.unique(pair_key).shape[0] != real.shape[0]:
        return None
    order_e = real[np.lexsort((lp[real], ll[real]))]
    lms, starts = np.unique(ll[order_e], return_index=True)
    obs_by_lm = {}
    first_obs = {}
    for i, m in enumerate(lms):
        seg = order_e[starts[i]: starts[i + 1] if i + 1 < len(lms)
                      else None]
        ps = np.sort(lp[seg])
        obs_by_lm[int(m)] = ps
        first_obs[int(m)] = int(ps[0])
    order = sorted(obs_by_lm, key=lambda m: first_obs[m])

    cands = []
    for B, K, Wrow in search:
        got = _try_layout(n, obs_by_lm, first_obs, order, B, K, Wrow,
                          spill_cap)
        if got is None:
            continue
        bytes_ = (-(-n // B)) * K * 3 * Wrow * (B * 2) * 4
        cands.append((bytes_, B, K, Wrow, got))
    if not cands:
        return None
    # minimize streamed bytes, but prefer LARGER chunks within 25% of the
    # minimum: DMA bandwidth rises with chunk size (measured on v5e:
    # ~506 GB/s at 1.1 MB chunks vs ~855 GB/s at 4.5 MB), so a slightly
    # fatter stack that streams faster wins
    best_bytes = min(c[0] for c in cands)
    _, B, K, Wrow, (win_off, base_of, wide) = max(
        (c for c in cands if c[0] <= 1.25 * best_bytes),
        key=lambda c: (c[1], -c[0]),
    )
    n_chunks = -(-n // B)
    b_dl = B * 2

    wide_slot = {int(m): i for i, m in enumerate(sorted(wide))}
    n_wide = len(wide)

    scatter_base = np.zeros(e_all, np.int64)
    band_mask = np.zeros(e_all, np.float32)
    wide_idx = np.zeros(e_all, np.int64)
    wide_mask = np.zeros(e_all, np.float32)
    for e in real:
        m = int(ll[e])
        p = int(lp[e])
        if m in wide_slot:
            wide_idx[e] = wide_slot[m]
            wide_mask[e] = 1.0
            continue
        b = base_of.get(m)
        if b is None:       # unobserved-but-padded ids can't reach here
            continue
        c = b // B
        slot = b - c * B
        k_found = -1
        for k in range(K):
            off = int(win_off[c, k])
            if off <= p < off + Wrow:
                k_found = k
                break
        assert k_found >= 0, (m, p, c, win_off[c])
        # flat index of (c, k, a=0, p-off, slot*dl+b=0) in
        # [n_chunks, K, dp, Wrow, B*dl]
        scatter_base[e] = (
            (((c * K + k_found) * 3 + 0) * Wrow + (p - int(win_off[c, k_found])))
            * b_dl + slot * 2
        )
        band_mask[e] = 1.0

    # sorted-unique scatter program: flatten (band edge, a, b) -> (source
    # position in blk, destination tile slot), sort by destination.  Tile
    # slots are unique per (edge, a, b) — landmark slots are unique per
    # chunk and (pose, lm) pairs are unique — so a scatter-SET with
    # indices_are_sorted/unique_indices holds exactly the segment-sum.
    eb = np.nonzero(band_mask > 0)[0]
    stride_a = Wrow * b_dl
    offs = np.asarray(
        [a * stride_a + b for a in range(3) for b in range(2)], np.int64
    )
    ids6 = (scatter_base[eb][:, None] + offs[None, :]).reshape(-1)
    src6 = (eb[:, None] * 6 + np.arange(6)[None, :]).reshape(-1)
    order6 = np.argsort(ids6, kind="stable")

    we = np.nonzero(wide_mask > 0)[0]
    ew_pad = max(64, 1 << int(np.ceil(np.log2(max(len(we), 1)))))
    wide_edges = np.full((ew_pad,), e_all, np.int64)
    wide_edges[: len(we)] = we

    return BandAux(
        scatter_base=scatter_base.astype(np.int32),
        band_mask=band_mask,
        win_off=win_off.astype(np.int32),
        wide_idx=wide_idx.astype(np.int32),
        wide_mask=wide_mask,
        scatter_src=src6[order6].astype(np.int32),
        scatter_ids=ids6[order6].astype(np.int32),
        wide_edges=wide_edges.astype(np.int32),
        chunk_b=B, k_windows=K, w_row=Wrow,
        n_chunks=n_chunks, n_wide=n_wide,
    )
