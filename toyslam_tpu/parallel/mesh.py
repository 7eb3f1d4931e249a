"""Device mesh construction and graph padding for shardability."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from toyslam_tpu.models.graph import FactorGraph2D

EDGE_AXIS = "edges"


def make_mesh(num_devices: int | None = None, axis: str = EDGE_AXIS) -> Mesh:
    """A 1D mesh over the first ``num_devices`` devices.

    Single-axis edge/landmark parallelism is the right first shape for BA:
    the pose state is small and replicated; the per-edge work dominates.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def _pad_axis0(x: jax.Array, target: int) -> jax.Array:
    pad = target - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths)


def pad_edges_for_mesh(graph: FactorGraph2D, num_devices: int) -> FactorGraph2D:
    """Pad edge arrays (mask-extended with zeros) to a multiple of the mesh
    size so they shard evenly.  Padded edges have mask 0 and index 0 —
    mathematically inert everywhere (see ops/residuals.py)."""

    def round_up(n):
        return -(-n // num_devices) * num_devices

    od, lm = graph.odom, graph.lm_edges
    e1, e2 = round_up(od.count), round_up(lm.count)
    od = dataclasses.replace(
        od,
        i=_pad_axis0(od.i, e1),
        j=_pad_axis0(od.j, e1),
        meas=_pad_axis0(od.meas, e1),
        info=_pad_axis0(od.info, e1),
        mask=_pad_axis0(od.mask, e1),
    )
    lm = dataclasses.replace(
        lm,
        pose=_pad_axis0(lm.pose, e2),
        lm=_pad_axis0(lm.lm, e2),
        meas=_pad_axis0(lm.meas, e2),
        info=_pad_axis0(lm.info, e2),
        mask=_pad_axis0(lm.mask, e2),
    )
    return dataclasses.replace(graph, odom=od, lm_edges=lm)
