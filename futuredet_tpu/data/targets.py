"""CenterNet target assignment — vectorized, on-device.

Behavioral port of the `AssignLabel` pipeline stage
(`/root/reference/det3d/datasets/pipelines/preprocess.py:336-910`), which is
the reference's dataloader bottleneck (a 900-line per-object python loop per
sample). Here the whole assignment for all timesteps runs as one fused XLA
program: per-object radii -> gaussian patch render -> segment_max scatter
(core.gaussian), plus the anno_box/ind/mask/cat tensors.

Three target families (ref :568,:733,:897):
  standard    — per-timestep boxes, class = object class            (C=K)
  trajectory  — class = static/linear/nonlinear                     (C=3)
  forecast    — boxes of ALL timesteps in every map, class = t+1    (C=7)

GT layout in: gt_boxes (T, M, 12) [x,y,z,w,l,h,vx,vy,rvx,rvy,rot,rrot]
(ref nusc_common.py:531), gt_classes (T, M) 1-based, gt_valid (T, M) bool.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..core import boxes as box_ops
from ..core.gaussian import radius_with_mult, render_heatmap


def _assign_one_timestep(boxes, classes, valid, timestep, *, num_classes,
                         fmap_w, fmap_h, voxel_size, pc_range, out_size_factor,
                         gaussian_overlap, min_radius, radius_mult,
                         class_blocked=False):
    """boxes (M, 12), classes (M,) 1-based, valid (M,). One timestep's maps.

    Returns hm (C, H, W) [transposed to HWC by caller], anno_box (M, 14),
    ind/mask/cat (M,).
    """
    x, y, z = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    w, l, h = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    vx, vy = boxes[:, 6], boxes[:, 7]
    rvx, rvy = boxes[:, 8], boxes[:, 9]
    rot = box_ops.limit_period(boxes[:, 10], 0.5, 2 * np.pi)
    rrot = box_ops.limit_period(boxes[:, 11], 0.5, 2 * np.pi)

    w_f = w / voxel_size[0] / out_size_factor
    l_f = l / voxel_size[1] / out_size_factor
    size_ok = (w_f > 0) & (l_f > 0)

    vel_norm = jnp.sqrt(vx ** 2 + vy ** 2)
    radius = radius_with_mult(
        w_f, l_f, vel_norm, timestep, gaussian_overlap=gaussian_overlap,
        min_radius=min_radius, radius_mult=radius_mult)

    coor_x = (x - pc_range[0]) / voxel_size[0] / out_size_factor
    coor_y = (y - pc_range[1]) / voxel_size[1] / out_size_factor
    ct_int_x = coor_x.astype(jnp.int32)   # trunc, matching .astype (ref :508)
    ct_int_y = coor_y.astype(jnp.int32)
    in_bounds = ((ct_int_x >= 0) & (ct_int_x < fmap_w)
                 & (ct_int_y >= 0) & (ct_int_y < fmap_h))

    ok = valid & size_ok & in_bounds
    cls0 = jnp.clip(classes - 1, 0, num_classes - 1)

    hm = render_heatmap(jnp.stack([ct_int_x, ct_int_y], -1), radius, ok,
                        cls0, num_classes, fmap_w, fmap_h,
                        class_blocked=class_blocked)

    anno = jnp.stack([
        coor_x - ct_int_x, coor_y - ct_int_y, z,
        jnp.log(jnp.maximum(w, 1e-6)), jnp.log(jnp.maximum(l, 1e-6)),
        jnp.log(jnp.maximum(h, 1e-6)),
        vx, vy, rvx, rvy,
        jnp.sin(rot), jnp.cos(rot), jnp.sin(rrot), jnp.cos(rrot)], -1)

    ind = jnp.where(ok, ct_int_y * fmap_w + ct_int_x, 0)
    return hm, jnp.where(ok[:, None], anno, 0.0), ind, ok, jnp.where(ok, cls0, 0)


def _assign_targets(cfg: ExperimentConfig, gt_boxes, gt_classes, gt_valid,
                    num_classes: int = 1, class_blocked: bool = False):
    """Standard family for one sample: gt_boxes (T, M, 12) -> target dict with
    leading T axis (stack over timesteps; radius mult grows with t)."""
    W, H = cfg.feature_map_size
    a = cfg.assigner
    T = gt_boxes.shape[0]

    def per_t(t, boxes, classes, valid):
        hm, anno, ind, mask, cat = _assign_one_timestep(
            boxes, classes, valid, t, num_classes=num_classes,
            fmap_w=W, fmap_h=H, voxel_size=cfg.voxel.voxel_size[:2],
            pc_range=cfg.voxel.pc_range[:2], out_size_factor=a.out_size_factor,
            gaussian_overlap=a.gaussian_overlap, min_radius=a.min_radius,
            radius_mult=a.radius_mult, class_blocked=class_blocked)
        return jnp.transpose(hm, (1, 2, 0)), anno, ind, mask, cat

    hm, anno, ind, mask, cat = jax.vmap(per_t)(
        jnp.arange(T), gt_boxes, gt_classes, gt_valid)
    return {"hm": hm, "anno_box": anno, "ind": ind, "mask": mask, "cat": cat}


def _assign_trajectory_targets(cfg: ExperimentConfig, gt_boxes,
                               traj_classes, gt_valid):
    """Trajectory family (C=3): same boxes, class = 1-based trajectory label
    (ref :571-733). traj_classes (M,) in {1,2,3} broadcast over timesteps."""
    T = gt_boxes.shape[0]
    cls = jnp.broadcast_to(traj_classes[None, :], gt_valid.shape)
    out = _assign_targets(cfg, gt_boxes, cls, gt_valid, num_classes=3)
    return {f"{k}_trajectory": v for k, v in out.items()}


def _assign_forecast_targets(cfg: ExperimentConfig, gt_boxes, gt_valid):
    """Forecast family (C=7): every timestep's map contains the boxes of ALL
    timesteps, with class = source-timestep+1 (ref :736-897). The object axis
    becomes T*M."""
    T, M, D = gt_boxes.shape
    flat_boxes = gt_boxes.reshape(T * M, D)
    flat_valid = gt_valid.reshape(T * M)
    flat_cls = jnp.repeat(jnp.arange(1, T + 1), M)
    boxes_all = jnp.broadcast_to(flat_boxes[None], (T, T * M, D))
    valid_all = jnp.broadcast_to(flat_valid[None], (T, T * M))
    cls_all = jnp.broadcast_to(flat_cls[None], (T, T * M))
    # flat_cls is repeat(arange(1, T+1), M): positionally class-blocked, so
    # each source-timestep class renders only its own M-object slice. One
    # class per source timestep (ref :736-897 builds car_1..car_T), so
    # num_classes tracks T instead of hardcoding 7.
    out = _assign_targets(cfg, boxes_all, cls_all, valid_all, num_classes=T,
                          class_blocked=True)
    return {f"{k}_forecast": v for k, v in out.items()}


def _assign_multitask_targets(cfg: ExperimentConfig, gt_boxes, gt_classes,
                              gt_valid):
    """Multi-task standard family (classic CenterPoint: classes partitioned
    into per-SepHead groups, ref center_head.py:321-323 + AssignLabel's
    per-task loop). Requires timesteps == 1; the leading target axis becomes
    the TASK index instead of the timestep, heatmaps are channel-padded to
    the widest group, and `cat` is the within-task 0-based class."""
    tasks = cfg.model.head.tasks
    names = list(cfg.data.class_names)
    cmax = max(len(t) for t in tasks)
    boxes0, cls0, val0 = gt_boxes[0], gt_classes[0], gt_valid[0]

    hms, annos, inds, masks, cats = [], [], [], [], []
    for task in tasks:
        # global 1-based class id -> within-task 1-based id (0 = not ours)
        lut = np.zeros(len(names) + 1, np.int32)
        for j, n in enumerate(task):
            lut[names.index(n) + 1] = j + 1
        tcls = jnp.asarray(lut)[jnp.clip(cls0, 0, len(names))]
        tval = val0 & (tcls > 0)
        out = _assign_targets(cfg, boxes0[None], tcls[None], tval[None],
                              num_classes=len(task))
        hm = out["hm"][0]
        if len(task) < cmax:
            hm = jnp.pad(hm, ((0, 0), (0, 0), (0, cmax - len(task))))
        hms.append(hm)
        annos.append(out["anno_box"][0])
        inds.append(out["ind"][0])
        masks.append(out["mask"][0])
        cats.append(out["cat"][0])
    return {"hm": jnp.stack(hms), "anno_box": jnp.stack(annos),
            "ind": jnp.stack(inds), "mask": jnp.stack(masks),
            "cat": jnp.stack(cats)}


def build_targets_batch(cfg: ExperimentConfig, raw) -> Dict[str, jax.Array]:
    """Batched target build from raw GT arrays, for use INSIDE the jitted
    train step (the tpu-native placement: the host ships only the small
    (B, T, M, 12) box arrays; rasterization runs on-device fused with the
    step instead of as a per-sample host/dispatch round-trip).

    raw: {"gt_boxes" (B,T,M,12), "gt_classes" (B,T,M), "gt_valid" (B,T,M),
          "traj_classes" (B,M)}. Returns the same dict build_targets returns,
    plus the raw t0 gt_boxes/gt_valid the two-stage RoI head consumes.
    """
    out = jax.vmap(lambda b, c, v, t: build_targets(cfg, b, c, v, t))(
        raw["gt_boxes"], raw["gt_classes"], raw["gt_valid"],
        raw["traj_classes"])
    out["gt_boxes"] = raw["gt_boxes"][:, 0]
    out["gt_valid"] = raw["gt_valid"][:, 0]
    return out


def _build_targets_impl(cfg: ExperimentConfig, gt_boxes, gt_classes,
                        gt_valid, traj_classes=None) -> Dict[str, jax.Array]:
    h = cfg.model.head
    if h.standard and len(h.tasks) > 1:
        assert h.timesteps == 1, \
            "multi-task class groups require timesteps == 1"
        return dict(_assign_multitask_targets(cfg, gt_boxes, gt_classes,
                                              gt_valid))
    out = dict(_assign_targets(cfg, gt_boxes, gt_classes, gt_valid,
                               num_classes=max(1, len(cfg.data.class_names))))
    if cfg.assigner.sampler_type != "standard" and traj_classes is not None:
        out.update(_assign_trajectory_targets(cfg, gt_boxes, traj_classes,
                                              gt_valid))
        out.update(_assign_forecast_targets(cfg, gt_boxes, gt_valid))
    return out


_build_targets_jit = partial(jax.jit, static_argnames=("cfg",))(
    _build_targets_impl)


def build_targets(cfg: ExperimentConfig, gt_boxes, gt_classes, gt_valid,
                  traj_classes=None) -> Dict[str, jax.Array]:
    """Full target dict for one sample (standard [+ trajectory/forecast when
    the sampler is trajectory-conditioned], ref AssignLabel :571).

    Host callers get the jitted program; inside an enclosing trace (the
    train step, a vmap, a shard_map body) the impl inlines instead — a
    nested jit caches avals tagged with the first caller's mesh, which
    poisons later traces under a different mesh (sharding-in-types)."""
    # trace_state_clean is a private API that has moved between JAX
    # releases; treat "can't tell" as "inside a trace" (inline impl), which
    # is always correct — the jit wrapper is only a host-side caching win
    try:
        from jax._src.core import trace_state_clean
    except ImportError:
        try:
            from jax.core import trace_state_clean  # older releases
        except ImportError:
            def trace_state_clean():
                return False
    if trace_state_clean():
        return _build_targets_jit(cfg, gt_boxes, gt_classes, gt_valid,
                                  traj_classes)
    return _build_targets_impl(cfg, gt_boxes, gt_classes, gt_valid,
                               traj_classes)


# public aliases for direct (host-side) use of individual families — tests
# and tools call these on concrete arrays
assign_targets = partial(jax.jit, static_argnames=(
    "cfg", "num_classes", "class_blocked"))(_assign_targets)
assign_trajectory_targets = partial(jax.jit, static_argnames=("cfg",))(
    _assign_trajectory_targets)
assign_forecast_targets = partial(jax.jit, static_argnames=("cfg",))(
    _assign_forecast_targets)
assign_multitask_targets = partial(jax.jit, static_argnames=("cfg",))(
    _assign_multitask_targets)


# ---------------------------------------------------------------------------
# numpy oracle — exact port of the AssignLabel per-object loop (tests only)
# ---------------------------------------------------------------------------

def assign_targets_np(cfg: ExperimentConfig, gt_boxes, gt_classes, gt_valid,
                      num_classes=1):
    from ..core.gaussian import draw_gaussian_np

    def ref_gaussian_radius(h_, w_, min_overlap):
        a1, b1 = 1, h_ + w_
        c1 = w_ * h_ * (1 - min_overlap) / (1 + min_overlap)
        r1 = (b1 + np.sqrt(b1 ** 2 - 4 * a1 * c1)) / 2
        a2, b2 = 4, 2 * (h_ + w_)
        c2 = (1 - min_overlap) * w_ * h_
        r2 = (b2 + np.sqrt(b2 ** 2 - 4 * a2 * c2)) / 2
        a3, b3 = 4 * min_overlap, -2 * min_overlap * (h_ + w_)
        c3 = (min_overlap - 1) * w_ * h_
        r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
        return min(r1, r2, r3)

    W, H = cfg.feature_map_size
    a = cfg.assigner
    vs = cfg.voxel.voxel_size
    pc = cfg.voxel.pc_range
    T, M, _ = gt_boxes.shape
    hm = np.zeros((T, H, W, num_classes), np.float32)
    anno = np.zeros((T, M, 14), np.float32)
    ind = np.zeros((T, M), np.int64)
    mask = np.zeros((T, M), bool)
    cat = np.zeros((T, M), np.int64)
    for i in range(T):
        for k in range(M):
            if not gt_valid[i, k]:
                continue
            b = gt_boxes[i, k].astype(np.float64)
            w_f = b[3] / vs[0] / a.out_size_factor
            l_f = b[4] / vs[1] / a.out_size_factor
            if not (w_f > 0 and l_f > 0):
                continue
            vel_norm = np.linalg.norm(b[6:8])
            mult = min(max(1, vel_norm * (1 + i) / 2), 4) if a.radius_mult else 1.0
            radius = max(a.min_radius, int(mult * ref_gaussian_radius(
                l_f, w_f, a.gaussian_overlap)))
            coor_x = (b[0] - pc[0]) / vs[0] / a.out_size_factor
            coor_y = (b[1] - pc[1]) / vs[1] / a.out_size_factor
            ct = np.array([coor_x, coor_y], np.float32)
            ct_int = ct.astype(np.int32)
            if not (0 <= ct_int[0] < W and 0 <= ct_int[1] < H):
                continue
            cls0 = int(gt_classes[i, k]) - 1
            draw_gaussian_np(hm[i, :, :, cls0], ct, radius)
            rot = b[10] - np.floor(b[10] / (2 * np.pi) + 0.5) * 2 * np.pi
            rrot = b[11] - np.floor(b[11] / (2 * np.pi) + 0.5) * 2 * np.pi
            anno[i, k] = np.concatenate([
                ct - ct_int, [b[2]], np.log(b[3:6]), b[6:8], b[8:10],
                [np.sin(rot), np.cos(rot), np.sin(rrot), np.cos(rrot)]])
            ind[i, k] = ct_int[1] * W + ct_int[0]
            mask[i, k] = True
            cat[i, k] = cls0
    return {"hm": hm, "anno_box": anno, "ind": ind, "mask": mask, "cat": cat}
