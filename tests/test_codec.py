"""Wire codec + snapshot round-trip tests (SURVEY.md §4 oracle (d)).

The reference has no tests; its codec correctness rested on the C++ server
decoding what the Python client encoded.  Here the oracle is an independent
hand-rolled struct-level decoder plus full round-trip equality.
"""

import struct

import numpy as np
import pytest

from toyslam_tpu.config import SimConfig, SlamConfig
from toyslam_tpu.io import (
    bytes_to_graph,
    graph_to_bytes,
    load_snapshot,
    save_snapshot,
)
from toyslam_tpu.models.graph import GraphBuilder2D
from toyslam_tpu.sim import frontend


@pytest.fixture(scope="module")
def graph():
    cfg = SlamConfig(sim=SimConfig(robot_steps=25, seed=0))
    sim = frontend.simulate(cfg.sim)
    g, _ = frontend.build_graph(sim, cfg)
    return g


def _decode_manual(data: bytes):
    """Independent minimal decoder following the reference format spec
    (reference python/remote/bytes_to_graph.py:16-109) — shares no code with
    toyslam_tpu.io.codec."""
    off = 0

    def u32():
        nonlocal off
        (v,) = struct.unpack_from("<I", data, off)
        off += 4
        return v

    def f32s(n):
        nonlocal off
        v = np.frombuffer(data, np.float32, n, off)
        off += 4 * n
        return v

    body = u32()
    assert body == len(data) - 4
    verts = {}
    for _ in range(u32()):
        vid, vtype = u32(), u32()
        verts[vid] = (vtype, f32s(3 if vtype == 0 else 2).copy())
    edges = []
    for _ in range(u32()):
        etype, id1, id2 = u32(), u32(), u32()
        rows, cols = u32(), u32()
        meas = f32s(cols if rows == 0 else rows * cols).copy()
        if rows:
            meas = meas.reshape(rows, cols)
        drows, dcols = u32(), u32()
        assert drows == 0  # info always diagonal-encoded
        info_diag = f32s(dcols).copy()
        edges.append((etype, id1, id2, meas, info_diag))
    fixed = [u32() for _ in range(u32())]
    assert off == len(data)
    return verts, edges, fixed


def test_wire_format_matches_reference_spec(graph):
    data = graph_to_bytes(graph)
    verts, edges, fixed = _decode_manual(data)

    n_real_poses = int(np.sum(np.asarray(graph.pose_mask) > 0.5))
    n_real_lms = int(np.sum(np.asarray(graph.lm_mask) > 0.5))
    assert len(verts) == n_real_poses + n_real_lms

    # pose vertices carry (x, y, theta); landmark vertices (x, y)
    poses = np.asarray(graph.poses)
    for p in range(n_real_poses):
        vtype, pos = verts[p]
        assert vtype == 0
        np.testing.assert_array_equal(pos, poses[p].astype(np.float32))

    # first pose is gauge-fixed
    assert fixed == [0]

    # odometry measurement decodes as a 3x3 homogeneous transform
    od_edges = [e for e in edges if e[0] == 0]
    assert len(od_edges) == int(np.sum(np.asarray(graph.odom.mask) > 0.5))
    m = od_edges[0][3]
    assert m.shape == (3, 3)
    meas0 = np.asarray(graph.odom.meas)[0]
    np.testing.assert_allclose(m[0, 2], meas0[0], rtol=1e-6)
    np.testing.assert_allclose(np.arctan2(m[1, 0], m[0, 0]), meas0[2],
                               rtol=1e-5, atol=1e-6)

    # landmark measurement is a (range, bearing) vector with 2x2 diag info
    lm_edges = [e for e in edges if e[0] == 1]
    assert len(lm_edges) == int(
        np.sum(np.asarray(graph.lm_edges.mask) > 0.5)
    )
    assert lm_edges[0][3].shape == (2,)
    assert lm_edges[0][4].shape == (2,)


def test_codec_round_trip_graph_equality(graph):
    g2 = bytes_to_graph(graph_to_bytes(graph))
    for name in ("poses", "landmarks", "pose_mask", "lm_mask",
                 "pose_fixed", "lm_fixed"):
        np.testing.assert_array_equal(
            np.asarray(getattr(graph, name)), np.asarray(getattr(g2, name)),
            err_msg=name,
        )
    np.testing.assert_array_equal(np.asarray(graph.odom.i),
                                  np.asarray(g2.odom.i))
    np.testing.assert_allclose(np.asarray(graph.odom.meas),
                               np.asarray(g2.odom.meas), rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(graph.odom.info),
                                  np.asarray(g2.odom.info))
    np.testing.assert_array_equal(np.asarray(graph.lm_edges.pose),
                                  np.asarray(g2.lm_edges.pose))
    np.testing.assert_array_equal(np.asarray(graph.lm_edges.lm),
                                  np.asarray(g2.lm_edges.lm))
    np.testing.assert_array_equal(np.asarray(graph.lm_edges.meas),
                                  np.asarray(g2.lm_edges.meas))


def test_codec_round_trip_stable(graph):
    """encode → decode → encode preserves structure exactly and floats to
    the ulp (theta rides the reference's rotation-matrix encoding, whose
    f32 cos/sin ↔ atan2 round trip is not bit-idempotent)."""
    data = graph_to_bytes(graph)
    g2 = bytes_to_graph(data)
    data2 = graph_to_bytes(g2)
    assert len(data) == len(data2)
    a = np.frombuffer(data, np.uint32)
    b = np.frombuffer(data2, np.uint32)
    # all integer fields (counts/ids/types/shapes) identical; float payload
    # within 1 ulp — compare as f32 with tiny tolerance
    af = np.frombuffer(data, np.float32)
    bf = np.frombuffer(data2, np.float32)
    mismatched = a != b
    np.testing.assert_allclose(
        af[mismatched], bf[mismatched], rtol=1e-6, atol=1e-7
    )


def test_codec_rejects_non_diagonal_info():
    b = GraphBuilder2D(pose_bucket=4, landmark_bucket=4, edge_bucket=4)
    b.add_pose([0.0, 0.0, 0.0], fixed=True)
    b.add_pose([1.0, 0.0, 0.0])
    info = np.eye(3, dtype=np.float32)
    info[0, 1] = 0.5
    b.add_odom_edge(0, 1, [1.0, 0.0, 0.0], info)
    g = b.build()
    with pytest.raises(ValueError, match="off-diagonal"):
        graph_to_bytes(g)
    # lossy mode truncates instead
    data = graph_to_bytes(g, allow_lossy_info=True)
    g2 = bytes_to_graph(data)
    np.testing.assert_array_equal(
        np.asarray(g2.odom.info)[0], np.diag(np.diag(info))
    )


def test_snapshot_round_trip_bit_exact(tmp_path, graph):
    meta = {"iteration": 7, "chi2": 123.5, "note": "mid-run"}
    path = str(tmp_path / "ckpt.npz")
    save_snapshot(path, graph, meta)
    g2, meta2 = load_snapshot(path)
    assert meta2 == meta
    for name in ("poses", "landmarks", "pose_mask", "lm_mask",
                 "pose_fixed", "lm_fixed"):
        np.testing.assert_array_equal(
            np.asarray(getattr(graph, name)), np.asarray(getattr(g2, name)),
            err_msg=name,
        )
    for name in ("i", "j", "meas", "info", "mask"):
        np.testing.assert_array_equal(
            np.asarray(getattr(graph.odom, name)),
            np.asarray(getattr(g2.odom, name)),
        )
    for name in ("pose", "lm", "meas", "info", "mask"):
        np.testing.assert_array_equal(
            np.asarray(getattr(graph.lm_edges, name)),
            np.asarray(getattr(g2.lm_edges, name)),
        )


def test_resume_from_snapshot_continues_optimization(tmp_path, graph):
    """Optimize 3 iters, checkpoint, resume 3 more == straight 6 iters
    (same jitted shapes, same arithmetic)."""
    from toyslam_tpu.config import OptimizerConfig
    from toyslam_tpu.optimizer import GaussNewton

    path = str(tmp_path / "resume.npz")
    gn3 = GaussNewton(OptimizerConfig(iterations=3, solver="dense"))
    r1 = gn3.optimize(graph)
    save_snapshot(path, r1.graph, {"lam": 1e-3})
    g_resumed, _ = load_snapshot(path)
    r2 = gn3.optimize(g_resumed)

    gn6 = GaussNewton(OptimizerConfig(iterations=6, solver="dense"))
    r_straight = gn6.optimize(graph)
    # resumed run restarts lambda/penalty bookkeeping; states agree tightly
    np.testing.assert_allclose(
        np.asarray(r2.graph.poses),
        np.asarray(r_straight.graph.poses),
        atol=5e-3,
    )
