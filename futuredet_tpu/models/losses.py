"""CenterNet losses + the full per-mode loss assembly.

Behavioral ports:
  * FastFocalLoss  — ref det3d/models/losses/centernet_loss.py:67-95
  * RegLoss        — ref centernet_loss.py:7-25
  * CenterHead.loss mode plumbing — ref center_head.py:396-539

Layouts: predictions NHWC (B, H, W, C); targets
  hm   (B, T, H, W, C)   gaussian heatmaps per timestep
  ind  (B, T, M) int32   flat y*W+x of each object's center cell
  mask (B, T, M) bool
  cat  (B, T, M) int32   class id at each peak
  anno_box (B, T, M, 14) [dx,dy,z,logw,logl,logh,vx,vy,rvx,rvy,sin r,cos r,
                          sin rr,cos rr]
Trajectory / forecast target variants share the same shapes with C=3 / C=7.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..config import HeadConfig

# anno_box column selection when the model has vel+rot heads but no rvel/rrot
# (ref center_head.py:462,469): [reg, z, dim, vel, sin rr, cos rr]
_TARGET_COLS_10 = (0, 1, 2, 3, 4, 5, 6, 7, 12, 13)


def _gather_feat(fmap, ind):
    """fmap (B, H, W, C), ind (B, M) flat spatial -> (B, M, C).

    == _transpose_and_gather_feat (ref center_utils.py:66-80); our maps are
    already NHWC so it is a pure take_along_axis.
    """
    B, H, W, C = fmap.shape
    flat = fmap.reshape(B, H * W, C)
    return jnp.take_along_axis(flat, ind[..., None], axis=1)


def fast_focal_loss(out, target, ind, mask, cat):
    """CornerNet penalty-reduced focal loss (ref centernet_loss.py:75-95).

    out: (B,H,W,C) raw logits are NOT accepted — pass sigmoid-clipped probs
    (ref center_head.py:392-394 clamps to [1e-4, 1-1e-4]).
    """
    maskf = mask.astype(out.dtype)
    gt = jnp.power(1.0 - target, 4)
    neg = jnp.sum(jnp.log(1.0 - out) * jnp.square(out) * gt)

    pos_pred = _gather_feat(out, ind)                                 # (B,M,C)
    pos_pred = jnp.take_along_axis(pos_pred, cat[..., None], axis=2)[..., 0]
    num_pos = jnp.sum(maskf)
    pos = jnp.sum(jnp.log(pos_pred) * jnp.square(1.0 - pos_pred) * maskf)
    return jnp.where(num_pos == 0, -neg, -(pos + neg) / jnp.maximum(num_pos, 1.0))


def reg_loss(output, mask, ind, target):
    """Masked per-dim L1 (ref centernet_loss.py:18-25). Returns (D,)."""
    pred = _gather_feat(output, ind)                                  # (B,M,D)
    m = mask.astype(output.dtype)[..., None]
    loss = jnp.abs(pred * m - target * m) / (jnp.sum(m) + 1e-4)
    return jnp.sum(loss, axis=(0, 1))


def _sigmoid_clip(x):
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1 - 1e-4)


def assemble_anno_box(pd: Dict[str, jax.Array], cfg: HeadConfig,
                      timestep: int | None) -> jax.Array:
    """Concatenate regression maps into the anno_box layout (ref :447-475).

    For standard/reverse/sparse modes the (timesteps*2)-channel vel map is
    sliced per timestep (`timestep` arg); dense/classify/wide pass None.
    """
    vel = pd["vel"]
    if timestep is not None and not (cfg.dense or cfg.classify or cfg.wide_head):
        vel = vel[..., 2 * timestep:2 * timestep + 2]
    parts = [pd["reg"], pd["height"], pd["dim"], vel]
    if "rvel" in dict(cfg.common_heads):
        rvel = pd["rvel"]
        if timestep is not None and not (cfg.dense or cfg.classify or cfg.wide_head):
            rvel = rvel[..., 2 * timestep:2 * timestep + 2]
        parts += [rvel, pd["rot"], pd["rrot"]]
    else:
        parts += [pd["rot"]]
    return jnp.concatenate(parts, axis=-1)


def center_head_loss(cfg: HeadConfig, preds: List[Dict[str, jax.Array]],
                     targets: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Full multi-task / multi-mode loss (ref center_head.py:396-539)."""
    T = cfg.timesteps
    cw = jnp.asarray(cfg.code_weights)
    cwf = jnp.asarray(cfg.code_weights_forecast)
    if cfg.two_stage:
        # TWO_STAGE fine-tuning: vel+rot-only weights on EVERY timestep
        # (ref :509-511) and no heatmap loss (ref :405-406)
        cw = cwf = jnp.asarray(cfg.code_weights_two_stage)
    # with rvel/rrot heads the target keeps all 14 anno_box columns
    # (ref :448-455); without them, the 10-column selection (ref :462,469)
    has_rvel = "rvel" in dict(cfg.common_heads)
    cols = tuple(range(14)) if has_rvel else _TARGET_COLS_10

    hm_t, ind_t = targets["hm"], targets["ind"]
    mask_t, cat_t, anno_t = targets["mask"], targets["cat"], targets["anno_box"]

    total = 0.0
    hm_losses, loc_losses = [], []
    for task_id, pd in enumerate(preds):
        hm_pred = _sigmoid_clip(pd["hm"])

        if cfg.dense:
            t = task_id
            hm_loss = fast_focal_loss(hm_pred, hm_t[:, t], ind_t[:, t],
                                      mask_t[:, t], cat_t[:, t])
            box = assemble_anno_box(pd, cfg, None)
            tgt = anno_t[:, t][..., cols]
            bl = reg_loss(box, mask_t[:, t], ind_t[:, t], tgt)
            loc = jnp.sum(bl * cw)
        elif cfg.classify:
            t = task_id
            hm_loss = fast_focal_loss(
                hm_pred, targets["hm_trajectory"][:, t],
                targets["ind_trajectory"][:, t], targets["mask_trajectory"][:, t],
                targets["cat_trajectory"][:, t])
            box = assemble_anno_box(pd, cfg, None)
            tgt = targets["anno_box_trajectory"][:, t][..., cols]
            bl = reg_loss(box, targets["mask_trajectory"][:, t],
                          targets["ind_trajectory"][:, t], tgt)
            loc = jnp.sum(bl * cw)
        elif cfg.wide_head:
            # quirk preserved: hm from forecast targets, boxes from trajectory
            # targets (ref :418,:441,:497). The forecast family's object axis
            # is T*M (every timestep's boxes in each map) while the
            # trajectory family's is M; its first M slots are the t=0 objects
            # in the same order, so the regression pairs mask/ind with the
            # slot-aligned prefix.
            hm_loss = fast_focal_loss(
                hm_pred, targets["hm_forecast"][:, 0],
                targets["ind_forecast"][:, 0], targets["mask_forecast"][:, 0],
                targets["cat_forecast"][:, 0])
            box = assemble_anno_box(pd, cfg, None)
            tgt = targets["anno_box_trajectory"][:, 0][..., cols]
            M = tgt.shape[1]
            bl = reg_loss(box, targets["mask_forecast"][:, 0, :M],
                          targets["ind_forecast"][:, 0, :M], tgt)
            loc = jnp.sum(bl * cw)
        elif cfg.sparse:
            # task 0 = forward chain anchored at t=0; task 1 = reverse chain
            # anchored at t=T-1 (ref :411,:427-432,:487). Quirk preserved:
            # the box target is anno_box[t=0] for BOTH tasks — task 1 indexes
            # its REVERSED target list at (T-1), which is timestep 0 again
            # (ref :432,:487: target_box[::-1][(T-1)*task_id]) — while its
            # mask/ind come from timestep T-1.
            t_anchor = (T - 1) * task_id
            hm_loss = fast_focal_loss(hm_pred, hm_t[:, t_anchor],
                                      ind_t[:, t_anchor], mask_t[:, t_anchor],
                                      cat_t[:, t_anchor])
            loc = 0.0
            for i in range(T):
                box = assemble_anno_box(pd, cfg, i)
                tgt = anno_t[:, 0][..., cols]
                bl = reg_loss(box, mask_t[:, t_anchor], ind_t[:, t_anchor], tgt)
                loc = loc + jnp.sum(bl * (cw if i == 0 else cwf))
        elif cfg.reverse:
            hm_loss = fast_focal_loss(hm_pred, hm_t[:, -1], ind_t[:, -1],
                                      mask_t[:, -1], cat_t[:, -1])
            loc = 0.0
            order = list(range(T))[::-1]
            for i in range(T):
                box = assemble_anno_box(pd, cfg, i)
                tgt = anno_t[:, order[i]][..., cols]
                bl = reg_loss(box, mask_t[:, -1], ind_t[:, -1], tgt)
                loc = loc + jnp.sum(bl * (cw if i == 0 else cwf))
        else:  # standard (ref :421,:444,:500,:513-514)
            # multi-task class groups: the leading target axis is the task
            # index (timesteps == 1); heatmap targets are channel-padded to
            # the widest group, so slice to this head's width
            fam = task_id if len(cfg.tasks) > 1 else 0
            hm_tgt = hm_t[:, fam][..., :hm_pred.shape[-1]]
            hm_loss = fast_focal_loss(hm_pred, hm_tgt, ind_t[:, fam],
                                      mask_t[:, fam], cat_t[:, fam])
            loc = 0.0
            for i in range(T):
                box = assemble_anno_box(pd, cfg, i)
                tgt = anno_t[:, fam + i][..., cols]
                bl = reg_loss(box, mask_t[:, fam], ind_t[:, fam], tgt)
                loc = loc + jnp.sum(bl * (cw if i == 0 else cwf))

        if cfg.two_stage:
            hm_loss = jnp.zeros(())
        total = total + hm_loss + cfg.weight * loc
        hm_losses.append(hm_loss)
        loc_losses.append(loc)

    return {"loss": total,
            "hm_loss": jnp.stack([jnp.asarray(h) for h in hm_losses]),
            "loc_loss": jnp.stack([jnp.asarray(l) for l in loc_losses])}
