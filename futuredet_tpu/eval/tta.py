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


def unflip_pred_maps(pd, fy: bool, fx: bool):
    """Transform one head dict's NHWC maps from a flipped input frame back
    to the canonical frame (the reference's map-average double flip,
    CenterHead.predict double_flip handling).

    BEV row h of the flipped frame corresponds to canonical row H-1-h with
    sub-cell offset 1-reg_y (and likewise for columns); y components of
    velocities negate; yaw -> -yaw under a y flip (sin negates) and
    yaw -> pi - yaw under an x flip (cos negates).
    """
    out = {}
    for k, v in pd.items():
        if k == "feats":
            continue
        if fy:
            v = jnp.flip(v, axis=1)
        if fx:
            v = jnp.flip(v, axis=2)
        out[k] = v
    if fy:
        if "reg" in out:
            out["reg"] = out["reg"].at[..., 1].multiply(-1.0).at[..., 1].add(1.0)
        for vk in ("vel", "rvel"):
            if vk in out:
                out[vk] = out[vk].at[..., 1::2].multiply(-1.0)
        for rk in ("rot", "rrot"):
            if rk in out:
                out[rk] = out[rk].at[..., 0].multiply(-1.0)   # sin(-yaw)
    if fx:
        if "reg" in out:
            out["reg"] = out["reg"].at[..., 0].multiply(-1.0).at[..., 0].add(1.0)
        for vk in ("vel", "rvel"):
            if vk in out:
                out[vk] = out[vk].at[..., 0::2].multiply(-1.0)
        for rk in ("rot", "rrot"):
            if rk in out:
                out[rk] = out[rk].at[..., 1].multiply(-1.0)   # cos(pi-yaw)
    return out


def infer_double_flip_map(cfg: ExperimentConfig, forward: Callable,
                          points, points_valid) -> Detections:
    """Map-average double flip (the reference's formulation): run the four
    flips, unflip each head's RAW maps back to the canonical frame, average
    the logits/regressions, decode + NMS once. Unlike the box-level
    ensemble this keeps the standard detection count."""
    acc = None
    for fy, fx in FLIPS:
        preds = forward(_flip_points(points, fy, fx), points_valid)
        preds = [unflip_pred_maps(pd, fy, fx) for pd in preds]
        if acc is None:
            acc = preds
        else:
            acc = [jax.tree.map(lambda a, b: a + b, a_, p_)
                   for a_, p_ in zip(acc, preds)]
    acc = [jax.tree.map(lambda a: a / len(FLIPS), pd) for pd in acc]
    return decode_and_nms(cfg, acc)
