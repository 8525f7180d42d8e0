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


# ---------------------------------------------------------------------------
# Eval-payload gathering: the reference pickles per-rank detection dicts into
# padded byte tensors (det3d/torchie/trainer/utils.py:114-155). Here every
# host-side field is encoded into a fixed-shape array (tokens -> uint8 rows,
# attribute names -> vocab ids, keyframe times -> nan-padded rows) so ONE
# process_allgather moves the whole batch — no serialization protocol.
# ---------------------------------------------------------------------------

# nuScenes attribute vocabulary (taken from the nuScenes schema; index 0 =
# "no attribute"). Fixed so every host encodes identically.
NUSC_ATTRS = (
    "", "cycle.with_rider", "cycle.without_rider", "pedestrian.moving",
    "pedestrian.sitting_lying_down", "pedestrian.standing", "vehicle.moving",
    "vehicle.parked", "vehicle.stopped",
)
_ATTR_ID = {a: i for i, a in enumerate(NUSC_ATTRS)}
_TOKEN_WIDTH = 64


def encode_tokens(tokens) -> np.ndarray:
    """List of sample-token strings -> (B, 64) uint8 (utf-8, zero-padded)."""
    out = np.zeros((len(tokens), _TOKEN_WIDTH), np.uint8)
    for i, t in enumerate(tokens):
        raw = t.encode("utf-8")[:_TOKEN_WIDTH]
        out[i, :len(raw)] = np.frombuffer(raw, np.uint8)
    return out


def decode_tokens(arr: np.ndarray):
    return [bytes(row[row != 0]).decode("utf-8") for row in np.asarray(arr)]


def _encode_gt(gt) -> dict:
    enc = {k: np.asarray(gt[k]) for k in ("boxes", "valid", "classes", "traj")
           if gt.get(k) is not None}
    if gt.get("attr") is not None:
        enc["attr"] = np.asarray(
            [[_ATTR_ID.get(str(a), 0) for a in row] for row in gt["attr"]],
            np.int32)
    times = gt.get("times")
    if times is not None and any(t is not None for t in times):
        L = max(len(t) for t in times if t is not None)
        tarr = np.full((len(times), L), np.nan, np.float32)
        for i, t in enumerate(times):
            if t is not None:
                tarr[i, :len(t)] = np.asarray(t, np.float32)
        enc["times"] = tarr
    return enc


def _decode_gt(enc: dict) -> dict:
    gt = {k: enc[k] for k in ("boxes", "valid", "classes", "traj")
          if k in enc}
    if "attr" in enc:
        gt["attr"] = np.array(
            [[NUSC_ATTRS[i] for i in row] for row in enc["attr"]], object)
    if "times" in enc:
        gt["times"] = [row[~np.isnan(row)] for row in enc["times"]]
    return gt


def gather_eval_batch(det_tree, gt, tokens):
    """Gather one eval batch's (detections, gt dict, sample tokens) across
    hosts, concatenating along the batch dim. Requires every host to process
    the same number of batches per step (guaranteed by the strided dataset
    sharding in `batches_from_dataset`). Single-process: an encode/decode
    roundtrip (identity, exercised by tests)."""
    payload = {"det": jax.device_get(det_tree), "gt": _encode_gt(gt),
               "tok": encode_tokens(tokens)}
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        payload = jax.device_get(
            multihost_utils.process_allgather(payload, tiled=True))
    return payload["det"], _decode_gt(payload["gt"]), \
        decode_tokens(payload["tok"])
