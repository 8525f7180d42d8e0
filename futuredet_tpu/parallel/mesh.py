"""Device mesh + sharding helpers.

TPU-native replacement for the reference's torch.distributed/NCCL plumbing
(SURVEY.md §2.2): one `jax.sharding.Mesh` with a `data` axis; batches are
sharded over it, parameters replicated, gradients/BN-stats psum/pmean'ed by
XLA collectives over ICI inside the jitted step (no launcher, no process
groups, no pickle gathers).

A second `space` axis spatially shards the BEV grid: the canvas is
partitioned along Y (`PartitionSpec("data", "space")` on (B, Y, X, C)) and
XLA's SPMD partitioner inserts the halo exchanges (collective-permute of
boundary rows over ICI) that the RPN/head convolutions need — no manual
ghost-cell code. Use it when the detection range outgrows one chip's HBM or
to cut per-chip latency at fixed batch.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(n_data: int, n_space: int, devices=None) -> Mesh:
    """(data, space) mesh. Adjacent devices share the space axis so halo
    exchanges ride nearest-neighbor ICI links."""
    if devices is None:
        devices = jax.devices()
    if n_data * n_space > len(devices):
        raise ValueError(f"mesh ({n_data} data x {n_space} space) needs "
                         f"{n_data * n_space} devices, have {len(devices)}")
    devices = np.asarray(devices[:n_data * n_space]).reshape(n_data, n_space)
    return Mesh(devices, (DATA_AXIS, SPACE_AXIS))


def data_axis_size(global_batch: int, n_space: int = 1,
                   n_devices: Optional[int] = None) -> int:
    """Largest data-axis size that divides both the global batch and the
    devices left after the space axis. Raises when n_space leaves no
    capacity (shared by the trainer and the eval CLI)."""
    import math

    total = n_devices if n_devices is not None else jax.device_count()
    if n_space > total:
        raise ValueError(f"n_space={n_space} exceeds the {total} available "
                         f"devices")
    cap = total // max(n_space, 1)
    if cap < 1:
        raise ValueError(f"no data-parallel capacity left: {total} devices "
                         f"/ n_space={n_space}")
    return max(math.gcd(global_batch, cap), 1)


def canvas_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, Y, X, C) BEV canvases: batch over data, rows over
    space (identity when the mesh has no space axis)."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
