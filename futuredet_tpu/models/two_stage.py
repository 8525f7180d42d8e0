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


class TwoStageDetector(nn.Module):
    """End-to-end two-stage detector (ref detectors/two_stage.py:9-193):
    first stage forward -> decode + NMS proposals (stop-gradient) -> BEV
    pooling at 5 box points -> RoI refinement.

    Returns (first_stage_preds, proposals: Detections, roi dict). The final
    detection score is sqrt(sigmoid(iou_logit) * stage1_score) (ref
    post_process :139).
    """
    cfg: ExperimentConfig
    axis_name: str | None = None
    canvas_sharding: object = None

    @nn.compact
    def __call__(self, points, points_valid, bev_map=None,
                 train: bool = False):
        from ..eval.decode import decode_and_nms
        from .detector import build_single_stage

        first = build_single_stage(self.cfg, self.axis_name,
                                   self.canvas_sharding, name="first_stage")
        preds, bev = first(points, points_valid, bev_map=bev_map,
                           train=train, return_bev=True)
        det = decode_and_nms(self.cfg, preds)
        # proposals feed the RoI head but carry no gradient back into the
        # first stage (ref: the frozen first stage / detached predict path)
        boxes = jax.lax.stop_gradient(det.boxes)
        pooled = jax.vmap(lambda m, b: pool_bev_features(m, b, self.cfg))(
            jax.lax.stop_gradient(bev) if train else bev, boxes)
        logits, resid = RoIHead(name="roi_head")(pooled, train)
        refined = boxes.at[..., :3].add(resid[..., :3])
        refined = refined.at[..., 3:6].multiply(
            jnp.exp(jnp.clip(resid[..., 3:6], -4.0, 4.0)))
        refined = refined.at[..., 8].add(resid[..., 6])
        # ref post_process :139: score = sqrt(sigmoid(iou) * roi_score)
        score = jnp.sqrt(jnp.clip(jax.nn.sigmoid(logits) * det.scores,
                                  1e-12, None))
        roi = {"logits": logits, "resid": resid, "boxes": refined,
               "scores": jnp.where(det.valid, score, 0.0)}
        return preds, det, roi


def refined_detections(det, roi):
    """Assemble the final Detections from the RoI outputs (ref
    post_process :120-155: refined boxes, fused scores, stage-1 labels)."""
    from ..eval.decode import Detections
    return Detections(boxes=roi["boxes"], scores=roi["scores"],
                      labels=det.labels, valid=det.valid)


def proposal_targets(proposals, gt_boxes, gt_valid, *,
                     fg_iou: float = 0.55, bg_iou: float = 0.25):
    """IoU-based proposal target assignment (capability port of
    `det3d/models/roi_heads/target_assigner/proposal_target_layer.py`):
    each proposal's classification target is its clipped-scaled IoU with the
    best GT (pcdet soft-IoU labels), and foreground proposals get box
    residual targets.

    proposals (N, 9) decoded layout; gt_boxes (M, 12) info layout.
    Returns (cls_target (N,), reg_target (N, 7), fg_mask (N,)).
    """
    from ..ops.rotated_iou import pairwise_iou_bev

    p5 = jnp.stack([proposals[:, 0], proposals[:, 1], proposals[:, 4],
                    proposals[:, 3], -proposals[:, 8] - np.pi / 2], -1)
    g5 = jnp.stack([gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 4],
                    gt_boxes[:, 3], -gt_boxes[:, 10] - np.pi / 2], -1)
    iou = pairwise_iou_bev(p5, g5)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    best = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)

    # soft classification target: 0 below bg, 1 above fg, linear between
    cls_t = jnp.clip((best_iou - bg_iou) / (fg_iou - bg_iou), 0.0, 1.0)
    fg = best_iou >= fg_iou

    g = gt_boxes[best]
    reg_t = jnp.stack([
        g[:, 0] - proposals[:, 0], g[:, 1] - proposals[:, 1],
        g[:, 2] - proposals[:, 2],
        jnp.log(jnp.maximum(g[:, 3], 1e-3) / jnp.maximum(proposals[:, 3], 1e-3)),
        jnp.log(jnp.maximum(g[:, 4], 1e-3) / jnp.maximum(proposals[:, 4], 1e-3)),
        jnp.log(jnp.maximum(g[:, 5], 1e-3) / jnp.maximum(proposals[:, 5], 1e-3)),
        g[:, 10] - proposals[:, 8],
    ], -1)
    return cls_t, reg_t, fg


def two_stage_loss(score_logits, resid, proposals, gt_boxes, gt_valid,
                   prop_valid):
    """RoI head loss: BCE against soft-IoU targets + masked smooth-L1 on
    foreground residuals (ref roi_heads/roi_head.py loss structure)."""
    cls_t, reg_t, fg = jax.vmap(
        lambda p, g, v: proposal_targets(p, g, v))(proposals, gt_boxes,
                                                   gt_valid)
    w = prop_valid.astype(score_logits.dtype)
    cls_loss = jnp.sum(
        w * (jnp.maximum(score_logits, 0) - score_logits * cls_t
             + jnp.log1p(jnp.exp(-jnp.abs(score_logits))))
    ) / jnp.maximum(jnp.sum(w), 1.0)
    fgw = (fg & prop_valid).astype(resid.dtype)[..., None]
    d = resid - reg_t
    sl1 = jnp.where(jnp.abs(d) < 1.0, 0.5 * d * d, jnp.abs(d) - 0.5)
    reg_loss = jnp.sum(sl1 * fgw) / jnp.maximum(jnp.sum(fgw), 1.0)
    return {"roi_cls_loss": cls_loss, "roi_reg_loss": reg_loss,
            "loss": cls_loss + reg_loss}


def adopt_first_stage(two_stage_tree, first_stage_tree):
    """Graft a trained single-stage param (or batch_stats) tree under the
    two-stage model's 'first_stage' scope (ref TwoStageDetector.__init__
    builds the first stage from its own checkpointed config, two_stage.py:21).

    Merge is strict=False like the reference's load_state_dict
    (torchie/trainer/checkpoint.py): leaves present in the checkpoint
    overwrite; leaves the two-stage head adds (e.g. the shared
    two_stage_forecast_conv, built only when head.two_stage=True) keep
    their fresh init. The RoI head keeps its fresh init."""
    def merge(dst, src):
        out = {}
        for k, v in dst.items():
            if k in src and isinstance(v, dict):
                out[k] = merge(v, src[k])
            elif k in src:
                assert jnp.shape(v) == jnp.shape(src[k]), (k, jnp.shape(v),
                                                           jnp.shape(src[k]))
                out[k] = src[k]
            else:
                out[k] = v
        return out

    out = dict(two_stage_tree)
    assert "first_stage" in out, sorted(out)
    out["first_stage"] = merge(dict(out["first_stage"]),
                               dict(first_stage_tree))
    return out


def two_stage_trainable_mask(params) -> dict:
    """Trainable mask for the TWO_STAGE schedule: only vel/rot branches and
    the RoI head train (ref apis/train.py:353-356 freezes everything else;
    the roi_head is new in stage two and always trains)."""
    def mask(path, leaf):
        keys = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return ("vel_" in keys or "rot_" in keys
                or "/vel" in keys or "/rot" in keys
                or "roi_head" in keys)
    return jax.tree_util.tree_map_with_path(mask, params)
