"""Double-flip test-time augmentation.

Capability port of the reference's DOUBLE_FLIP path (`Voxelization`
double-flip variants, preprocess.py:273-319, merged in CenterHead.predict).
Two formulations:

  * `infer_double_flip_map` — the reference's map averaging: unflip each
    flip's head maps to the canonical frame, average activated maps
    (post-sigmoid heatmaps, exp'd dims; regressions linearly), decode once.
  * `infer_double_flip` — a box-level 4-way ensemble (decode each flip in
    its own frame, transform boxes back, fuse through NMS); keeps per-flip
    provenance.
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
    """boxes[..., 8] carries the STORED rot r = -physical_yaw - pi/2
    (CLAUDE.md box layout). A y flip maps physical yaw theta -> -theta,
    i.e. r -> -r - pi (== pi - r); an x flip maps theta -> pi - theta,
    i.e. r -> -r."""
    b = det.boxes
    if fy:  # y was negated: mirror y, vy; stored rot -> pi - r
        b = b.at[..., 1].multiply(-1.0)
        b = b.at[..., 7].multiply(-1.0)
        b = b.at[..., 8].set(np.pi - b[..., 8])
    if fx:  # x was negated: mirror x, vx; stored rot -> -r
        b = b.at[..., 0].multiply(-1.0)
        b = b.at[..., 6].multiply(-1.0)
        b = b.at[..., 8].multiply(-1.0)
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
    velocities negate. Rot maps hold (sin r, cos r) of the STORED rot
    r = -physical_yaw - pi/2, for which a y flip is r -> pi - r (cos
    negates) and an x flip is r -> -r (sin negates).
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
                out[rk] = out[rk].at[..., 1].multiply(-1.0)   # cos(pi - r)
    if fx:
        if "reg" in out:
            out["reg"] = out["reg"].at[..., 0].multiply(-1.0).at[..., 0].add(1.0)
        for vk in ("vel", "rvel"):
            if vk in out:
                out[vk] = out[vk].at[..., 0::2].multiply(-1.0)
        for rk in ("rot", "rrot"):
            if rk in out:
                out[rk] = out[rk].at[..., 0].multiply(-1.0)   # sin(-r)
    return out


def infer_double_flip_map(cfg: ExperimentConfig, forward: Callable,
                          points, points_valid) -> Detections:
    """Map-average double flip (the reference's formulation): run the four
    flips, unflip each head's maps back to the canonical frame, average in
    activated space, decode + NMS once. Unlike the box-level ensemble this
    keeps the standard detection count."""
    def activate(pd):
        # the reference averages ACTIVATED maps (post-sigmoid heatmaps,
        # exp'd dims); regressions average linearly
        out = dict(pd)
        out["hm"] = jax.nn.sigmoid(pd["hm"])
        out["dim"] = jnp.exp(pd["dim"])
        return out

    acc = None
    for fy, fx in FLIPS:
        preds = forward(_flip_points(points, fy, fx), points_valid)
        preds = [activate(unflip_pred_maps(pd, fy, fx)) for pd in preds]
        if acc is None:
            acc = preds
        else:
            acc = [jax.tree.map(lambda a, b: a + b, a_, p_)
                   for a_, p_ in zip(acc, preds)]
    acc = [jax.tree.map(lambda a: a / len(FLIPS), pd) for pd in acc]

    def deactivate(pd):
        # invert so decode's internal sigmoid/exp lands on the averages
        out = dict(pd)
        p = jnp.clip(pd["hm"], 1e-6, 1.0 - 1e-6)
        out["hm"] = jnp.log(p) - jnp.log1p(-p)
        out["dim"] = jnp.log(jnp.maximum(pd["dim"], 1e-9))
        return out

    return decode_and_nms(cfg, [deactivate(pd) for pd in acc])
