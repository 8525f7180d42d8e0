"""Global augmentations — synchronized across all forecast timesteps.

Behavioral ports of `det3d/core/sampler/preprocess.py`:
  random_flip_both   :815-857   x/y flips, angles mirrored, velocities flipped
  global_rotation    :776-799   rotate points, centers, velocities, yaw
  global_scaling_v2  :860+      scale points/centers/sizes/velocities
  global_translate_  :967+      translate points/centers

gt_boxes layout (T, M, 12): [x,y,z,w,l,h,vx,vy,rvx,rvy,rot,rrot]
(angles are the stored -yaw-pi/2 convention; the flip rules below operate on
the stored columns exactly as the reference does).
Host-side numpy; applied before voxelization like the reference pipeline.
"""
from __future__ import annotations

import numpy as np


def _rot_xy(arr_xy, angle):
    c, s = np.cos(angle), np.sin(angle)
    x = arr_xy[..., 0] * c - arr_xy[..., 1] * s
    y = arr_xy[..., 0] * s + arr_xy[..., 1] * c
    return np.stack([x, y], -1)


def random_flip_both(gt_boxes, points, rng, probability=0.5):
    """ref :815-857. gt_boxes (T, M, 12) mutated copy; returns flips."""
    gt = gt_boxes.copy()
    pts = points.copy()
    flips = []
    # x flip (mirror y)
    if rng.random() < probability:
        pts[:, 1] = -pts[:, 1]
        gt[..., 1] = -gt[..., 1]
        gt[..., 10] = -gt[..., 10] + np.pi
        gt[..., 11] = -gt[..., 11] + np.pi
        gt[..., 7] = -gt[..., 7]
        gt[..., 9] = -gt[..., 9]
        flips.append(True)
    else:
        flips.append(False)
    # y flip (mirror x)
    if rng.random() < probability:
        pts[:, 0] = -pts[:, 0]
        gt[..., 0] = -gt[..., 0]
        gt[..., 10] = -gt[..., 10] + 2 * np.pi
        gt[..., 11] = -gt[..., 11] + 2 * np.pi
        gt[..., 6] = -gt[..., 6]
        gt[..., 8] = -gt[..., 8]
        flips.append(True)
    else:
        flips.append(False)
    return gt, pts, flips


def global_rotation(gt_boxes, points, rng, rotation=(-np.pi / 4, np.pi / 4)):
    noise = rng.uniform(rotation[0], rotation[1])
    pts = points.copy()
    pts[:, :2] = _rot_xy(pts[:, :2], noise)
    gt = gt_boxes.copy()
    gt[..., :2] = _rot_xy(gt[..., :2], noise)
    gt[..., 6:8] = _rot_xy(gt[..., 6:8], noise)
    gt[..., 8:10] = _rot_xy(gt[..., 8:10], noise)
    gt[..., 10] += noise
    gt[..., 11] += noise
    return gt, pts, noise


def global_scaling(gt_boxes, points, rng, min_scale=0.9, max_scale=1.1):
    s = rng.uniform(min_scale, max_scale)
    pts = points.copy()
    pts[:, :3] *= s
    gt = gt_boxes.copy()
    gt[..., :6] *= s
    gt[..., 6:10] *= s
    return gt, pts, s


def global_translate(gt_boxes, points, rng, std=0.5):
    if std == 0:
        return gt_boxes, points, np.zeros(3)
    t = rng.normal(0, std, 3)
    pts = points.copy()
    pts[:, :3] += t
    gt = gt_boxes.copy()
    gt[..., :3] += t
    return gt, pts, t


def apply_train_augmentations(gt_boxes, points, rng, *, rot_noise,
                              scale_noise, translate_std):
    """The reference train-time sequence (preprocess.py:189-192)."""
    gt, pts, flips = random_flip_both(gt_boxes, points, rng)
    gt, pts, rot = global_rotation(gt, pts, rng, rot_noise)
    gt, pts, scale = global_scaling(gt, pts, rng, *scale_noise)
    gt, pts, trans = global_translate(gt, pts, rng, translate_std)
    return gt, pts, {"flips": flips, "rot": rot, "scale": scale,
                     "trans": trans}
