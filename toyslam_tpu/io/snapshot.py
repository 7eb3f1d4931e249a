"""Graph checkpoint / resume.

The reference persists nothing — the graph lives in process memory and the
remote server is stateless per request (reference
remote/app/ConnectionHandler.h:14-34); killing the process loses the map.
SURVEY.md §5 calls checkpoint/resume out as a new capability, with the wire
codec as the natural snapshot payload.

A snapshot is a single ``.npz`` holding the exact padded SoA arrays (masks,
fixed flags, bucketing included — reload gives a bit-identical
:class:`FactorGraph2D`, so an interrupted optimization resumes on the same
XLA-compiled shapes) plus a JSON metadata blob (config, iteration counters,
chi^2 history — whatever the caller wants to carry).  For interchange with
non-numpy consumers use ``io.codec.graph_to_bytes`` instead; that format is
lossy only in padding.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

import numpy as np

from toyslam_tpu.models.graph import (
    FactorGraph2D,
    LandmarkEdges,
    OdomEdges,
)

_FORMAT_VERSION = 1


def save_snapshot(
    path: str,
    graph: FactorGraph2D,
    metadata: Optional[dict[str, Any]] = None,
) -> None:
    """Write the graph (and optional metadata dict) to ``path`` (.npz)."""
    np.savez_compressed(
        path,
        __version__=np.int32(_FORMAT_VERSION),
        __metadata__=np.frombuffer(
            json.dumps(metadata or {}).encode(), np.uint8
        ),
        poses=np.asarray(graph.poses),
        landmarks=np.asarray(graph.landmarks),
        pose_mask=np.asarray(graph.pose_mask),
        lm_mask=np.asarray(graph.lm_mask),
        pose_fixed=np.asarray(graph.pose_fixed),
        lm_fixed=np.asarray(graph.lm_fixed),
        odom_i=np.asarray(graph.odom.i),
        odom_j=np.asarray(graph.odom.j),
        odom_meas=np.asarray(graph.odom.meas),
        odom_info=np.asarray(graph.odom.info),
        odom_mask=np.asarray(graph.odom.mask),
        lm_pose=np.asarray(graph.lm_edges.pose),
        lm_lm=np.asarray(graph.lm_edges.lm),
        lm_meas=np.asarray(graph.lm_edges.meas),
        lm_info=np.asarray(graph.lm_edges.info),
        lm_edge_mask=np.asarray(graph.lm_edges.mask),
    )


def load_snapshot(path: str) -> tuple[FactorGraph2D, dict[str, Any]]:
    """Inverse of :func:`save_snapshot`."""
    with np.load(path) as z:
        version = int(z["__version__"])
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported snapshot version {version}")
        metadata = json.loads(bytes(z["__metadata__"].tobytes()).decode())
        graph = FactorGraph2D(
            poses=z["poses"],
            landmarks=z["landmarks"],
            pose_mask=z["pose_mask"],
            lm_mask=z["lm_mask"],
            pose_fixed=z["pose_fixed"],
            lm_fixed=z["lm_fixed"],
            odom=OdomEdges(
                i=z["odom_i"],
                j=z["odom_j"],
                meas=z["odom_meas"],
                info=z["odom_info"],
                mask=z["odom_mask"],
            ),
            lm_edges=LandmarkEdges(
                pose=z["lm_pose"],
                lm=z["lm_lm"],
                meas=z["lm_meas"],
                info=z["lm_info"],
                mask=z["lm_edge_mask"],
            ),
        )
    return graph, metadata
