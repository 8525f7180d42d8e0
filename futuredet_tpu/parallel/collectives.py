"""Distributed collectives: multi-host init + fixed-shape result gathering.

Replaces the reference's NCCL plumbing (SURVEY.md §2.2): the pickle-padded
`dist.all_gather` of per-rank detection dicts
(`det3d/torchie/trainer/utils.py:100-155`) becomes a fixed-shape device
all_gather over the mesh — no serialization, no padding negotiation, the
arrays already have static shapes by construction.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Multi-host bring-up (replaces torch.distributed.launch + NCCL init,
    ref tools/train.py:84-92). A no-op on a single host."""
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_count()


def gather_detections(det_tree):
    """Gather a per-host detection pytree (fixed shapes, leading batch dim)
    onto every host. Single-process: identity. Multi-process: a
    process_allgather concatenating along the batch dim."""
    if jax.process_count() == 1:
        return jax.device_get(det_tree)
    from jax.experimental import multihost_utils
    return jax.device_get(
        multihost_utils.process_allgather(det_tree, tiled=True))
