"""Host-side banded-layout construction (ops/band_plan.py) edge cases.

Fast (pure host-side structure code, no kernels)."""

import dataclasses

import numpy as np

from toyslam_tpu.ops import band_plan
from toyslam_tpu.sim import synthetic


def _small_graph():
    graph, _, _ = synthetic.make_large_problem(
        num_poses=256, num_landmarks=200, obs_per_pose=4, seed=7,
        pose_bucket=64, landmark_bucket=64, edge_bucket=256,
    )
    return graph


def test_duplicate_pose_lm_observation_falls_back():
    """Two observations of the same landmark from the same pose are legal
    (the XLA/segment-sum paths SUM them) but would collide in the band
    tile scatter's unique slots — build_band_aux must refuse the layout
    so callers fall back (ADVICE r4 medium)."""
    graph = _small_graph()
    assert band_plan.build_band_aux(graph) is not None

    le = graph.lm_edges
    pose = np.asarray(le.pose).copy()
    lm = np.asarray(le.lm).copy()
    mask = np.asarray(le.mask)
    real = np.nonzero(mask > 0)[0]
    # make edge real[1] a duplicate of edge real[0]
    pose[real[1]] = pose[real[0]]
    lm[real[1]] = lm[real[0]]
    dup = dataclasses.replace(
        graph,
        lm_edges=dataclasses.replace(
            le, pose=pose.astype(np.int32), lm=lm.astype(np.int32)
        ),
    )
    assert band_plan.build_band_aux(dup) is None
    # and the grid re-addressing path inherits the refusal
    n = dup.num_poses
    kp = 8
    assert band_plan.build_grid_band(
        dup, np.zeros(n * kp, np.int32), np.zeros(n * kp, np.int32),
        np.zeros(n * kp, np.float32), kp,
    ) is None
