"""Device mesh + sharding helpers.

TPU-native replacement for the reference's torch.distributed/NCCL plumbing
(SURVEY.md §2.2): one `jax.sharding.Mesh` with a `data` axis; batches are
sharded over it, parameters replicated, gradients/BN-stats psum/pmean'ed by
XLA collectives over ICI inside the jitted step (no launcher, no process
groups, no pickle gathers).

A second optional `space` axis is reserved for spatially sharding the BEV
grid if the detection range ever outgrows one chip's HBM.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
