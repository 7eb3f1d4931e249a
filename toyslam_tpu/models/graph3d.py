"""Structs-of-arrays factor graph for SE(3) pose-graph + reprojection BA.

The SE(3) extension the reference only names in its roadmap (reference
README.md:52-56 "3D ... further development") — designed array-first like
models/graph.py, with deliberately the *same field protocol* so that the
shape-generic Schur/PCG machinery (ops/schur.py matvecs, ops/gather_plan.py
tables) works on both graphs unchanged:

* ``poses``      — ``f32[N, 12]`` flat SE(3) (row-major R | t, ops/se3.py)
* ``landmarks``  — ``f32[M, 3]`` world points
* ``odom``       — relative-pose SE(3) constraints between poses ``i -> j``
  with flat [E,12] measurements and 6x6 information;
* ``lm_edges``   — BA-style pinhole *reprojection* observations: pose
  ``pose`` sees landmark ``lm`` at pixel ``meas`` (u, v) with 2x2
  information; camera intrinsics live on the graph as ``f32[4]``
  (fx, fy, cx, cy).

State layout for the normal equations: pose blocks are 6-dof (dt, omega),
landmark blocks 3-dof, poses first — the 3D analogue of the 2D offset
scheme (reference python/optimizer/graph_optimizer.py:95-103).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from toyslam_tpu.models.graph import _bucket


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Odom3DEdges:
    """SE(3) relative-pose constraints (the 3D EdgeOdometry analogue)."""

    i: jax.Array       # i32[E]
    j: jax.Array       # i32[E]
    meas: jax.Array    # f32[E,12] measured relative transform (flat SE(3))
    info: jax.Array    # f32[E,6,6]
    mask: jax.Array    # f32[E]

    @property
    def count(self) -> int:
        return self.i.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReprojEdges:
    """Pinhole reprojection observations (BA edges)."""

    pose: jax.Array    # i32[E] observing camera pose
    lm: jax.Array      # i32[E] landmark index
    meas: jax.Array    # f32[E,2] observed pixel (u, v)
    info: jax.Array    # f32[E,2,2]
    mask: jax.Array    # f32[E]

    @property
    def count(self) -> int:
        return self.pose.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FactorGraph3D:
    """SE(3) BA problem as one pytree of arrays (protocol-compatible with
    FactorGraph2D for the shape-generic solver machinery)."""

    poses: jax.Array        # f32[N,12]
    landmarks: jax.Array    # f32[M,3]
    pose_mask: jax.Array    # f32[N]
    lm_mask: jax.Array      # f32[M]
    pose_fixed: jax.Array   # f32[N]
    lm_fixed: jax.Array     # f32[M]
    odom: Odom3DEdges
    lm_edges: ReprojEdges
    intrinsics: jax.Array   # f32[4] (fx, fy, cx, cy)
    plan: object = None     # ops.gather_plan.GatherPlan (structure tables)

    @property
    def num_poses(self) -> int:
        return self.poses.shape[0]

    @property
    def num_landmarks(self) -> int:
        return self.landmarks.shape[0]

    @property
    def state_dim(self) -> int:
        return 6 * self.num_poses + 3 * self.num_landmarks

    def with_state(
        self, poses: jax.Array, landmarks: jax.Array
    ) -> "FactorGraph3D":
        return dataclasses.replace(self, poses=poses, landmarks=landmarks)


class GraphBuilder3D:
    """Host-side incremental SE(3) BA graph construction (bucketed padding)."""

    def __init__(
        self,
        intrinsics=(500.0, 500.0, 320.0, 240.0),
        pose_bucket: int = 64,
        landmark_bucket: int = 64,
        edge_bucket: int = 256,
        dtype=np.float32,
    ):
        self.intrinsics = np.asarray(intrinsics, dtype)
        self.pose_bucket = pose_bucket
        self.landmark_bucket = landmark_bucket
        self.edge_bucket = edge_bucket
        self.dtype = dtype
        self._poses: list[np.ndarray] = []
        self._pose_fixed: list[bool] = []
        self._landmarks: list[np.ndarray] = []
        self._lm_fixed: list[bool] = []
        self._lm_index: dict[int, int] = {}
        self._odom: list[tuple[int, int, np.ndarray, np.ndarray]] = []
        self._reproj: list[tuple[int, int, np.ndarray, np.ndarray]] = []

    def add_pose(self, pose_flat12, fixed: bool = False) -> int:
        p = np.asarray(pose_flat12, dtype=self.dtype)
        assert p.shape == (12,)
        self._poses.append(p)
        self._pose_fixed.append(bool(fixed))
        return len(self._poses) - 1

    def add_landmark(
        self, external_id: int, position_xyz, fixed: bool = False
    ) -> int:
        if external_id in self._lm_index:
            return self._lm_index[external_id]
        idx = len(self._landmarks)
        self._lm_index[external_id] = idx
        self._landmarks.append(np.asarray(position_xyz, dtype=self.dtype))
        self._lm_fixed.append(bool(fixed))
        return idx

    def landmark_index(self, external_id: int) -> int:
        return self._lm_index[external_id]

    @property
    def landmark_id_map(self) -> dict[int, int]:
        return dict(self._lm_index)

    def add_odom_edge(self, i: int, j: int, meas_flat12, info6) -> None:
        self._odom.append(
            (
                i,
                j,
                np.asarray(meas_flat12, dtype=self.dtype),
                np.asarray(info6, dtype=self.dtype),
            )
        )

    def add_reproj_edge(
        self, pose: int, external_lm_id: int, meas_uv, info2
    ) -> None:
        lm = self._lm_index[external_lm_id]
        self._reproj.append(
            (
                pose,
                lm,
                np.asarray(meas_uv, dtype=self.dtype),
                np.asarray(info2, dtype=self.dtype),
            )
        )

    @property
    def num_poses(self) -> int:
        return len(self._poses)

    @property
    def num_landmarks(self) -> int:
        return len(self._landmarks)

    def build(self) -> FactorGraph3D:
        n, m = len(self._poses), len(self._landmarks)
        np_ = _bucket(n, self.pose_bucket)
        mp = _bucket(m, self.landmark_bucket)

        poses = np.zeros((np_, 12), self.dtype)
        # padded poses get identity rotations so se3 math stays well-defined
        poses[:, 0] = poses[:, 4] = poses[:, 8] = 1.0
        if n:
            poses[:n] = np.stack(self._poses)
        landmarks = np.zeros((mp, 3), self.dtype)
        if m:
            landmarks[:m] = np.stack(self._landmarks)

        pose_mask = np.zeros(np_, self.dtype)
        pose_mask[:n] = 1.0
        lm_mask = np.zeros(mp, self.dtype)
        lm_mask[:m] = 1.0
        pose_fixed = np.zeros(np_, self.dtype)
        pose_fixed[:n] = np.asarray(self._pose_fixed, self.dtype)
        lm_fixed = np.zeros(mp, self.dtype)
        lm_fixed[:m] = np.asarray(self._lm_fixed, self.dtype)

        od = self._build_edges(self._odom, 12, 6)
        rp = self._build_edges(self._reproj, 2, 2)

        return FactorGraph3D(
            poses=poses,
            landmarks=landmarks,
            pose_mask=pose_mask,
            lm_mask=lm_mask,
            pose_fixed=pose_fixed,
            lm_fixed=lm_fixed,
            odom=Odom3DEdges(
                i=od[0], j=od[1], meas=od[2], info=od[3], mask=od[4]
            ),
            lm_edges=ReprojEdges(
                pose=rp[0], lm=rp[1], meas=rp[2], info=rp[3], mask=rp[4]
            ),
            intrinsics=self.intrinsics.copy(),
        )

    def _build_edges(self, edges, meas_dim: int, info_dim: int):
        e = len(edges)
        ep = _bucket(e, self.edge_bucket)
        i = np.zeros(ep, np.int32)
        j = np.zeros(ep, np.int32)
        meas = np.zeros((ep, meas_dim), self.dtype)
        info = np.zeros((ep, info_dim, info_dim), self.dtype)
        mask = np.zeros(ep, self.dtype)
        if meas_dim == 12:
            meas[:, 0] = meas[:, 4] = meas[:, 8] = 1.0  # identity rotations
        if e:
            i[:e] = np.fromiter((x[0] for x in edges), np.int32, e)
            j[:e] = np.fromiter((x[1] for x in edges), np.int32, e)
            meas[:e] = np.stack([x[2] for x in edges])
            info[:e] = np.stack([x[3] for x in edges])
            mask[:e] = 1.0
        return (i, j, meas, info, mask)
