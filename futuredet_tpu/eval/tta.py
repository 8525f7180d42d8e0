"""Double-flip test-time augmentation.

Capability port of the reference's DOUBLE_FLIP path (`Voxelization`
double-flip variants, preprocess.py:273-319, merged in CenterHead.predict).
Deviation (documented): the reference averages the raw head maps of the four
flips; here each flip is decoded in its own frame, boxes are transformed back
and fused by the standard rotated NMS — a box-level ensemble with the same
inputs, simpler to verify and fully shape-static.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from .decode import Detections, decode_and_nms

FLIPS = ((False, False), (True, False), (False, True), (True, True))


def _flip_points(points, fy: bool, fx: bool):
    p = points
    if fy:
        p = p.at[..., 1].multiply(-1.0)
    if fx:
        p = p.at[..., 0].multiply(-1.0)
    return p


def _unflip_boxes(det: Detections, fy: bool, fx: bool) -> Detections:
    b = det.boxes
    if fy:  # y was negated: mirror y, vy; yaw -> -yaw
        b = b.at[..., 1].multiply(-1.0)
        b = b.at[..., 7].multiply(-1.0)
        b = b.at[..., 8].multiply(-1.0)
    if fx:  # x was negated: mirror x, vx; yaw -> pi - yaw
        b = b.at[..., 0].multiply(-1.0)
        b = b.at[..., 6].multiply(-1.0)
        b = b.at[..., 8].set(np.pi - b[..., 8])
    return det._replace(boxes=b)


def infer_double_flip(cfg: ExperimentConfig, forward: Callable,
                      points, points_valid) -> Detections:
    """forward: (points, valid) -> head pred dicts. Returns fused Detections
    (4x the per-flip slots; duplicates suppressed downstream by linking)."""
    parts = []
    for fy, fx in FLIPS:
        preds = forward(_flip_points(points, fy, fx), points_valid)
        det = decode_and_nms(cfg, preds)
        det = _unflip_boxes(det, fy, fx)
        parts.append(det._replace(scores=det.scores / len(FLIPS)))
    return Detections(
        boxes=jnp.concatenate([d.boxes for d in parts], 1),
        scores=jnp.concatenate([d.scores for d in parts], 1),
        labels=jnp.concatenate([d.labels for d in parts], 1),
        valid=jnp.concatenate([d.valid for d in parts], 1))
