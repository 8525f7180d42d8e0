"""Synthetic nuScenes-like scene generator.

Stands in for the real dataset in tests and benchmarks (no nuScenes data is
mounted in this environment): samples objects with static / linear /
nonlinear trajectories over `timesteps` keyframes, simulates the 12-dim
per-timestep gt layout of the reference infos (ref nusc_common.py:531) and
renders lidar-like point clouds (points on box walls + ground clutter).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from ..config import ExperimentConfig
from ..core.trajectory import LINEAR, NONLINEAR, STATIC

DT = 0.5  # seconds between keyframes (2 Hz, ref README 3s horizon / 7 steps)

# per-class size priors (w, l, h) ~ nuScenes means, for multi-class scenes
CLASS_SIZES = {
    "car": (1.9, 4.6, 1.7), "truck": (2.5, 6.9, 2.8), "bus": (2.9, 11.0, 3.5),
    "trailer": (2.9, 12.3, 3.9), "construction_vehicle": (2.8, 6.4, 3.2),
    "pedestrian": (0.67, 0.73, 1.77), "motorcycle": (0.77, 2.1, 1.5),
    "bicycle": (0.6, 1.7, 1.3), "barrier": (2.5, 0.5, 1.0),
    "traffic_cone": (0.41, 0.41, 1.07),
}


@dataclass
class Scene:
    points: np.ndarray        # (P, 5) x,y,z,intensity,time-lag
    points_valid: np.ndarray  # (P,)
    gt_boxes: np.ndarray      # (T, M, 12)
    gt_classes: np.ndarray    # (T, M) 1-based; 0 invalid
    gt_valid: np.ndarray      # (T, M)
    traj_classes: np.ndarray  # (M,) 1-based static/linear/nonlinear; 0 invalid


def make_scene(cfg: ExperimentConfig, n_objects: int = 12,
               n_clutter: int = 20000, points_per_object: int = 600,
               seed: int = 0, max_objs: Optional[int] = None,
               speed_range: tuple = (3.0, 10.0),
               radial_clutter: bool = False) -> Scene:
    """radial_clutter=True draws ground clutter with ~1/r density around the
    ego (uniform radius draw), matching real lidar's range falloff — used by
    the bench's realistic-scene mode; False keeps uniform-area clutter."""
    rng = np.random.default_rng(seed)
    T = max(cfg.timesteps, 1)
    M = max_objs or cfg.assigner.max_objs
    P = cfg.voxel.max_points
    lo, hi = cfg.voxel.pc_range[0], cfg.voxel.pc_range[3]
    span = (hi - lo) * 0.4

    gt_boxes = np.zeros((T, M, 12), np.float32)
    gt_classes = np.zeros((T, M), np.int32)
    gt_valid = np.zeros((T, M), bool)
    traj = np.zeros((M,), np.int32)

    pts_list = []
    names = list(cfg.data.class_names)
    for k in range(n_objects):
        cx, cy = rng.uniform(-span, span, 2)
        cz = rng.uniform(-1.5, -0.5)
        # multi-class configs sample a class per object with its size prior;
        # single-class keeps the original car-like distribution
        cls_id = 1 if len(names) <= 1 else int(rng.integers(1, len(names) + 1))
        if len(names) > 1:
            bw, bl, bh = CLASS_SIZES.get(names[cls_id - 1], (1.9, 4.6, 1.7))
            w, l, h = (bw * rng.uniform(0.9, 1.1), bl * rng.uniform(0.9, 1.1),
                       bh * rng.uniform(0.9, 1.1))
        else:
            w, l, h = (rng.uniform(1.6, 2.2), rng.uniform(3.8, 5.2),
                       rng.uniform(1.4, 1.9))
        yaw = rng.uniform(-np.pi, np.pi)
        kind = rng.choice([STATIC, LINEAR, NONLINEAR], p=[0.4, 0.4, 0.2])
        speed = 0.0 if kind == STATIC else rng.uniform(*speed_range)
        heading = np.array([np.cos(yaw), np.sin(yaw)])
        turn = 0.0 if kind != NONLINEAR else rng.choice([-1, 1]) * rng.uniform(0.25, 0.5)

        pos = np.array([cx, cy], np.float64)
        ang = yaw
        for t in range(T):
            vel = speed * np.array([np.cos(ang), np.sin(ang)])
            gt_boxes[t, k] = [pos[0], pos[1], cz, w, l, h, vel[0], vel[1],
                              vel[0], vel[1], -ang - np.pi / 2, -ang - np.pi / 2]
            gt_classes[t, k] = cls_id
            gt_valid[t, k] = True
            pos = pos + vel * DT
            ang = ang + turn * DT
        traj[k] = kind + 1

        # lidar hits on the walls + roof of the t=0 box
        n = points_per_object
        face = rng.integers(0, 4, n)
        u = rng.uniform(-0.5, 0.5, n)
        local = np.zeros((n, 2))
        local[face == 0] = np.stack([np.full((face == 0).sum(), 0.5),
                                     u[face == 0]], -1)
        local[face == 1] = np.stack([np.full((face == 1).sum(), -0.5),
                                     u[face == 1]], -1)
        local[face == 2] = np.stack([u[face == 2],
                                     np.full((face == 2).sum(), 0.5)], -1)
        local[face == 3] = np.stack([u[face == 3],
                                     np.full((face == 3).sum(), -0.5)], -1)
        local *= np.array([l, w])  # local x rotates onto the heading -> length
        c0, s0 = np.cos(yaw), np.sin(yaw)
        world = local @ np.array([[c0, s0], [-s0, c0]])
        world += np.array([cx, cy])
        z = rng.uniform(cz - h / 2, cz + h / 2, n)
        inten = rng.uniform(0, 1, n)
        pts_list.append(np.stack([world[:, 0], world[:, 1], z, inten,
                                  np.zeros(n)], -1))

    if radial_clutter:
        # uniform radius -> areal density ~ 1/r (lidar range falloff)
        r = rng.uniform(1.0, hi, n_clutter)
        th = rng.uniform(-np.pi, np.pi, n_clutter)
        cx_, cy_ = r * np.cos(th), r * np.sin(th)
        clutter = np.stack([
            cx_, cy_, rng.uniform(-2.0, -1.6, n_clutter),
            rng.uniform(0, 1, n_clutter), np.zeros(n_clutter)], -1)
    else:
        clutter = np.stack([
            rng.uniform(lo, hi, n_clutter), rng.uniform(lo, hi, n_clutter),
            rng.uniform(-2.0, -1.8, n_clutter), rng.uniform(0, 1, n_clutter),
            np.zeros(n_clutter)], -1)
    pts_list.append(clutter)
    pts = np.concatenate(pts_list, 0).astype(np.float32)

    points = np.zeros((P, 5), np.float32)
    valid = np.zeros((P,), bool)
    n = min(len(pts), P)
    sel = rng.permutation(len(pts))[:n]
    points[:n] = pts[sel]
    valid[:n] = True
    return Scene(points=points, points_valid=valid, gt_boxes=gt_boxes,
                 gt_classes=gt_classes, gt_valid=gt_valid, traj_classes=traj)


def rasterize_scene_map(cfg: ExperimentConfig, scene: Scene,
                        road_halfwidth: float = 3.0) -> np.ndarray:
    """Synthetic drivable-area raster: cells within `road_halfwidth` metres
    of any valid object's center at any timestep are road (1.0). Canvas
    orientation (row = y bin, col = x bin — data/targets.py convention)."""
    W, H = cfg.feature_map_size
    pc = cfg.voxel.pc_range
    sx = (pc[3] - pc[0]) / W
    sy = (pc[4] - pc[1]) / H
    xs = pc[0] + (np.arange(W) + 0.5) * sx
    ys = pc[1] + (np.arange(H) + 0.5) * sy
    gx, gy = np.meshgrid(xs, ys)
    out = np.zeros((H, W), np.float32)
    centers = scene.gt_boxes[scene.gt_valid][:, :2]
    for cx, cy in centers:
        out[(gx - cx) ** 2 + (gy - cy) ** 2 <= road_halfwidth ** 2] = 1.0
    return out


def make_batch(cfg: ExperimentConfig, batch_size: int, seed: int = 0,
               **kw) -> Dict[str, np.ndarray]:
    """Stacked batch of scenes + targets (host numpy; targets built on device
    in the input pipeline normally — here eagerly for tests/bench)."""
    import jax.numpy as jnp
    from .targets import build_targets

    scenes = [make_scene(cfg, seed=seed + i, **kw) for i in range(batch_size)]
    batch = {
        "points": jnp.asarray(np.stack([s.points for s in scenes])),
        "points_valid": jnp.asarray(np.stack([s.points_valid for s in scenes])),
    }
    tgts = [build_targets(cfg, s.gt_boxes, s.gt_classes, s.gt_valid,
                          s.traj_classes) for s in scenes]
    batch["targets"] = {k: jnp.stack([t[k] for t in tgts]) for k in tgts[0]}
    if cfg.model.two_stage_refine:
        # RoI target assignment consumes the raw t0 GT boxes (ref
        # gt_boxes_and_cls through collate, two_stage.py:181)
        batch["targets"]["gt_boxes"] = jnp.asarray(
            np.stack([s.gt_boxes[0] for s in scenes]))
        batch["targets"]["gt_valid"] = jnp.asarray(
            np.stack([s.gt_valid[0] for s in scenes]))
    if cfg.model.head.bev_map:
        # synthetic "drivable area": corridor cells under each object's
        # trajectory (stands in for the rasterized ego map the reference
        # stores per info, nusc_common.py:508-509) — canvas orientation,
        # so the map channel carries real signal in n3dtfm tests
        batch["bev_map"] = jnp.asarray(np.stack(
            [rasterize_scene_map(cfg, s)[..., None] for s in scenes]))
    batch["gt"] = {
        "boxes": np.stack([s.gt_boxes for s in scenes]),
        "classes": np.stack([s.gt_classes for s in scenes]),
        "valid": np.stack([s.gt_valid for s in scenes]),
        "traj": np.stack([s.traj_classes for s in scenes]),
    }
    return batch
