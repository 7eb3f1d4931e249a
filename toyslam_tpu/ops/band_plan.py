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

* chunks index the LANDMARK space: chunk ``c`` owns the ``B`` landmarks
  ``order[c*B:(c+1)*B]`` in first-observation order, so a chunk's
  landmarks were discovered together and share observation windows
  (round 4 parked landmarks onto unique POSE bases, which left
  ``1 - m/n`` of every chunk's columns empty whenever landmarks are
  scarcer than poses — at 100k, m = n/2, that DOUBLED the stack);
* per chunk, the observation runs of its landmarks are clustered
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
    # Tile materialization program (round-5 measured form): ONE row
    # gather of the band edges' blocks (``src_edges`` into blk[E]) and
    # ONE unsorted unique-indices element scatter-SET at ``elem_ids``
    # (edge-major, collision-free by construction).  Measured on v5e:
    # 3.3 ms at 10k / 38 ms at 100k vs 4.7 / 57 for per-plane sorted
    # scatters — scatter cost scales with the DESTINATION size on TPU,
    # so fewer scatter calls win; the sorted-ids hint does not help.
    src_edges: jax.Array      # i32[Eb] edge index, base-sorted
    elem_ids: jax.Array       # i32[Eb * dp * dl] edge-major tile slots
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
    # block geometry the layout was built for: (3, 2) = SE(2), (6, 3) =
    # SE(3)/BA — fused_mode refuses a mismatched graph
    dp: int = dataclasses.field(metadata=dict(static=True), default=3)
    dl: int = dataclasses.field(metadata=dict(static=True), default=2)

    @property
    def tile_bytes(self) -> int:
        b_dl = self.chunk_b * self.dl
        return (self.n_chunks * self.k_windows * self.dp * self.w_row
                * b_dl * 4)


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
    the same elements gathered by element id) + ONE unsorted
    unique-indices element scatter-SET in edge-major order — 3.3 ms at
    10k / 38 ms at 100k vs 4.7 / 57 for three per-plane sorted scatters
    and 5.5 / 58 for the round-4 element-gather sorted form: TPU
    scatter cost scales with the DESTINATION size, so one scatter call
    beats three regardless of the sorted-ids hint, and width-2 row
    scatters are 3x worse still (scripts/exp_scatter_variants.py)."""

    src_rows: jax.Array      # i32[Eb] grid slot per band edge, base-sorted
    elem_ids: jax.Array      # i32[Eb*dp*dl] edge-major tile element ids
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
    offs6 = np.asarray(
        [a * stride_a + b for a in range(3) for b in range(2)], np.int64
    )
    elem_ids = (base_s[:, None] + offs6[None, :]).reshape(-1)

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
        elem_ids=elem_ids.astype(np.int32),
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
    """Greedy layout attempt; returns (win_off, col_of, wide_lms) or
    None if more than ``spill_cap`` landmarks spill.

    Chunks index the LANDMARK space: chunk ``c`` owns landmarks
    ``order[c*B : (c+1)*B]`` (first-observation order, so a chunk's
    landmarks were discovered together and share observation windows).
    Round 4 parked landmarks onto unique POSE bases instead, which left
    ``(1 - m/n)`` of every chunk's columns empty whenever landmarks are
    scarcer than poses — at 100k (m = n/2) that DOUBLED the streamed
    stack.  ``col_of[lm] = (chunk, slot)``."""
    m_real = len(order)
    n_chunks = max(1, -(-m_real // B))
    win_off = np.zeros((n_chunks, K), np.int64)
    col_of = {}
    wide = []
    for c in range(n_chunks):
        lms = order[c * B: (c + 1) * B]
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
        for slot, m in enumerate(lms):
            if m in bad:
                wide.append(m)
            else:
                col_of[m] = (c, slot)
        if len(wide) > spill_cap:
            return None
        for k, wv in enumerate(wins):
            win_off[c, k] = wv[0]
        for k in range(len(wins), K):
            win_off[c, k] = win_off[c, max(len(wins) - 1, 0)]
    if len(wide) > spill_cap:
        return None
    return win_off, col_of, wide


_SEARCH_DL2 = (
    (64, 2, 256), (64, 3, 256), (64, 4, 256), (64, 3, 384),
    (64, 4, 384), (128, 2, 256), (128, 3, 256), (128, 4, 256),
    (128, 3, 384), (128, 4, 384), (64, 6, 256),
    (64, 8, 256), (64, 6, 384), (64, 10, 256), (64, 12, 256),
    (64, 2, 768), (128, 2, 896), (64, 12, 384), (128, 6, 256),
    (128, 8, 256),
    # wide-window low-K shapes: at 100k the K=8/W=256 layout pays
    # ~0.44 us per (chunk, window) of in-kernel fixed cost — 12.5k
    # windows = 5.5 ms/matvec on top of the 5.8 ms stream; two wide
    # windows (one per lap) cut that 8x (see _layout_score)
    (64, 2, 512), (128, 2, 512), (256, 2, 512), (128, 2, 768),
    (256, 2, 768), (192, 2, 768), (128, 3, 512), (256, 3, 512),
    (256, 4, 384), (192, 2, 512), (128, 10, 256), (128, 6, 512),
)
# dl=3 (SE(3)/BA): B*dl must be a multiple of 128 (kernel lane dim), so
# B in {128, 256}; BA observations are runs of obs_per_pose consecutive
# poses, so narrow windows suffice
_SEARCH_DL3 = (
    (128, 2, 128), (128, 2, 256), (128, 3, 128), (128, 3, 256),
    (128, 2, 384), (128, 4, 128), (128, 4, 256), (256, 2, 128),
    (256, 2, 256), (128, 3, 384),
)


def _dense_streamed_layout(
    graph, dp: int, dl: int, max_bytes: int = 4 << 30,
) -> BandAux | None:
    """Degenerate band layout: ONE full-height window, landmark-chunked
    columns — the tile stack IS the dense V in chunk-blocked form,
    streamed from HBM by the unchanged band kernel.

    This is the BA-at-scale case (round-5 item 8): ring-camera BA graphs
    have no run-local observation structure (every landmark is visible
    from a wide random arc), so the banded search rightly fails — but
    the dense V (dp*dl*n*m*4 bytes; 151 MB at 512x4096) streams in
    ~0.2 ms at the measured 855-916 GB/s where the VMEM-resident mode
    caps out at ~24 MB.  Gated by ``max_bytes``."""
    n, m = graph.num_poses, graph.num_landmarks
    b = 128 if (64 * dl) % 128 else 64
    w_row = -(-n // 128) * 128
    n_chunks = -(-m // b)
    b_dl = b * dl
    if n_chunks * dp * w_row * b_dl * 4 > max_bytes:
        return None
    lp = np.asarray(graph.lm_edges.pose)
    ll = np.asarray(graph.lm_edges.lm)
    msk = np.asarray(graph.lm_edges.mask) > 0
    e_all = lp.shape[0]
    real = np.nonzero(msk)[0]
    if real.size == 0:
        return None
    pair_key = lp[real].astype(np.int64) * np.int64(ll.max() + 1) + ll[real]
    if np.unique(pair_key).shape[0] != real.shape[0]:
        return None
    stride_a = w_row * b_dl
    c = ll[real].astype(np.int64) // b
    slot = ll[real].astype(np.int64) - c * b
    scatter_base = np.zeros(e_all, np.int64)
    scatter_base[real] = (
        (c * dp + 0) * stride_a + lp[real].astype(np.int64) * b_dl
        + slot * dl
    )
    band_mask = np.zeros(e_all, np.float32)
    band_mask[real] = 1.0
    offs = np.asarray(
        [a * stride_a + bb for a in range(dp) for bb in range(dl)],
        np.int64,
    )
    order = np.argsort(scatter_base[real], kind="stable")
    src_edges = real[order]
    elem_ids = (
        scatter_base[src_edges][:, None] + offs[None, :]
    ).reshape(-1)
    return BandAux(
        scatter_base=scatter_base.astype(np.int32),
        band_mask=band_mask,
        win_off=np.zeros((n_chunks, 1), np.int32),
        wide_idx=np.zeros(e_all, np.int32),
        wide_mask=np.zeros(e_all, np.float32),
        src_edges=src_edges.astype(np.int32),
        elem_ids=elem_ids.astype(np.int32),
        wide_edges=np.full((64,), e_all, np.int32),
        chunk_b=b, k_windows=1, w_row=int(w_row),
        n_chunks=int(n_chunks), n_wide=0, dp=dp, dl=dl,
    )


def build_band_aux(
    graph, spill_cap: int = 56, search=None, dp: int = 3, dl: int = 2,
) -> BandAux | None:
    """Host-side structure search.  Returns the dense-streamed degenerate
    layout (:func:`_dense_streamed_layout`) when no searched (B, K, Wrow)
    covers the workload within the spill cap and the dense stack is
    HBM-reasonable; None otherwise — callers fall back to the XLA path.
    ``(dp, dl)`` = per-pose/per-landmark block sizes ((3,2) SE(2), (6,3)
    SE(3)/BA); candidate layouts must keep ``B*dl`` a multiple of 128
    (the kernel's lane alignment)."""
    if search is None:
        search = _SEARCH_DL2 if dl == 2 else _SEARCH_DL3
    search = tuple(c for c in search if (c[0] * dl) % 128 == 0)
    n = graph.num_poses
    # wide columns live VMEM-RESIDENT in the kernel (dp*dl*n*4 bytes
    # each — 2.4 MB per column at 100k): cap the spill by an ~8 MB slab
    # budget so the layout search can't produce a stack the VMEM gate
    # then rejects wholesale
    spill_cap = min(
        spill_cap, max(4, (8 << 20) // max(dp * dl * n * 4, 1))
    )
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
        bytes_ = (-(-len(order) // B)) * K * dp * Wrow * (B * dl) * 4
        cands.append((bytes_, B, K, Wrow, got))
    if not cands:
        # no run-local structure (e.g. ring-camera BA) — stream dense V
        return _dense_streamed_layout(graph, dp, dl)
    # select by MODELED per-matvec stream time, not raw bytes (round 5):
    #   t = bytes / 855 GB/s  +  n_windows * 0.44 us
    # 855 GB/s = the measured tile-stream rate; 0.44 us/(chunk, window)
    # = the measured in-kernel fixed cost per window (dynamic-slice dots
    # + wacc updates: the 10k kernel's 0.43 ms marginal decomposes as
    # 0.22 ms stream + 480 windows x 0.44 us, and the 100k K=8 layout's
    # 13.7 ms/iter as 5.8 stream + 12.5k windows — byte-minimizing
    # selection picked that K=8 layout and LOST 2x to a wide-window K=2
    # shape with a slightly fatter stack)
    _STREAM_BW = 855e9
    _C_WIN = 0.44e-6
    m_real = len(order)

    def _score(c):
        bytes_, B, K, _, _ = c
        return bytes_ / _STREAM_BW + (-(-m_real // B)) * K * _C_WIN

    _, B, K, Wrow, (win_off, col_of, wide) = min(cands, key=_score)
    n_chunks = max(1, -(-m_real // B))
    b_dl = B * dl

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
        cs = col_of.get(m)
        if cs is None:      # unobserved-but-padded ids can't reach here
            continue
        c, slot = cs
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
            (((c * K + k_found) * dp + 0) * Wrow
             + (p - int(win_off[c, k_found])))
            * b_dl + slot * dl
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
        [a * stride_a + b for a in range(dp) for b in range(dl)], np.int64
    )
    order_e = np.argsort(scatter_base[eb], kind="stable")
    src_edges = eb[order_e]
    elem_ids = (
        scatter_base[src_edges][:, None] + offs[None, :]
    ).reshape(-1)

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
        src_edges=src_edges.astype(np.int32),
        elem_ids=elem_ids.astype(np.int32),
        wide_edges=wide_edges.astype(np.int32),
        chunk_b=B, k_windows=K, w_row=Wrow,
        n_chunks=n_chunks, n_wide=n_wide, dp=dp, dl=dl,
    )
