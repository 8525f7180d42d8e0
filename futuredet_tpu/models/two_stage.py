"""Two-stage refinement: BEV feature pooling at box points + RoI head.

Capability port of the reference second stage
(`det3d/models/detectors/two_stage.py:9-193`,
`det3d/models/second_stage/bird_eye_view.py:10-41` and
`det3d/models/roi_heads/`): the first stage's BEV map is bilinearly sampled
at 5 points per proposal (center + 4 side midpoints, the CenterPoint-style
pooling the reference's BEVFeatureExtractor implements), and a shared MLP
refines score + box residuals.

Shipped forecast configs run single-stage (TWO_STAGE=False); the flag's
training behavior (freeze everything but vel/rot heads, ref
apis/train.py:353-356) lives in `two_stage_trainable_mask`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..ops.deform import bilinear_sample


def box_sample_points(boxes):
    """(N, 9) decoded boxes -> (N, 5, 2) xy sample points: center + 4 side
    midpoints in the box frame (ref bird_eye_view.py pooling locations)."""
    x, y = boxes[:, 0], boxes[:, 1]
    w, l = boxes[:, 3], boxes[:, 4]
    yaw = -boxes[:, 8] - np.pi / 2       # stored -> physical heading
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    offs = jnp.stack([
        jnp.zeros_like(x), jnp.zeros_like(x),
        l / 2, jnp.zeros_like(x),
        -l / 2, jnp.zeros_like(x),
        jnp.zeros_like(x), w / 2,
        jnp.zeros_like(x), -w / 2,
    ], -1).reshape(-1, 5, 2)
    ox = offs[..., 0] * c[:, None] - offs[..., 1] * s[:, None]
    oy = offs[..., 0] * s[:, None] + offs[..., 1] * c[:, None]
    return jnp.stack([x[:, None] + ox, y[:, None] + oy], -1)


def pool_bev_features(bev, boxes, cfg: ExperimentConfig):
    """bev (H, W, C) single sample; boxes (N, 9) -> (N, 5*C)."""
    pts = box_sample_points(boxes)                       # (N, 5, 2)
    vx, vy = cfg.voxel.voxel_size[:2]
    osf = cfg.assigner.out_size_factor
    xs = (pts[..., 0] - cfg.voxel.pc_range[0]) / (vx * osf) - 0.5
    ys = (pts[..., 1] - cfg.voxel.pc_range[1]) / (vy * osf) - 0.5
    feats = bilinear_sample(bev, ys, xs)                 # (N, 5, C)
    return feats.reshape(feats.shape[0], -1)


class RoIHead(nn.Module):
    """Shared MLP: pooled features -> (iou score logit, 7 box residuals)
    (ref roi_heads/roi_head.py structure: FC stacks for cls + reg)."""
    hidden: int = 256

    @nn.compact
    def __call__(self, pooled, train: bool = False):
        x = pooled
        for i in range(2):
            x = nn.Dense(self.hidden, name=f"shared_fc{i}")(x)
            x = nn.relu(x)
        score = nn.Dense(1, name="cls")(x)[..., 0]
        resid = nn.Dense(7, name="reg")(x)
        return score, resid


class TwoStageRefiner(nn.Module):
    """Applies the RoI head to decoded first-stage detections."""
    cfg: ExperimentConfig

    @nn.compact
    def __call__(self, bev, boxes, train: bool = False):
        """bev (B, H, W, C); boxes (B, N, 9) -> refined boxes + scores."""
        pooled = jax.vmap(lambda m, b: pool_bev_features(m, b, self.cfg))(
            bev, boxes)
        score, resid = RoIHead(name="roi_head")(pooled, train)
        refined = boxes.at[..., :3].add(resid[..., :3])
        refined = refined.at[..., 3:6].multiply(jnp.exp(resid[..., 3:6]))
        refined = refined.at[..., 8].add(resid[..., 6])
        return refined, jax.nn.sigmoid(score)


def two_stage_trainable_mask(params) -> dict:
    """Trainable mask for the TWO_STAGE schedule: only vel/rot branches train
    (ref apis/train.py:353-356 freezes everything else)."""
    def mask(path, leaf):
        keys = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return ("vel_" in keys or "rot_" in keys
                or "/vel" in keys or "/rot" in keys)
    return jax.tree_util.tree_map_with_path(mask, params)
