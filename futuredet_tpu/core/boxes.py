"""Box geometry core — pure JAX, static shapes.

Behavioral ports (not translations) of the formulas in
`/root/reference/det3d/core/bbox/box_np_ops.py`:
  - limit_period            (ref :360-361)
  - rotation_2d / corners   (ref :207-285)
  - points_in_rbbox         (ref :641+, reimplemented as a frame transform)

Box convention (nuScenes-lidar, as used throughout the reference):
  box = [x, y, z, w, l, h, yaw]; yaw stored as -nusc_yaw - pi/2
  (ref: nusc_common.py:531). w extends along box-local x after the kitti-style
  corner convention used by `center_to_corner_box2d(dims=boxes[:, 3:5])`.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def limit_period(val, offset: float = 0.5, period: float = 2 * np.pi):
    """Wrap angle into [-offset*period, (1-offset)*period)."""
    return val - jnp.floor(val / period + offset) * period


def rotation_2d(points, angles):
    """Rotate (..., N, 2) point sets clockwise-positive (ref convention).

    points: (N, K, 2); angles: (N,). Matches box_np_ops.rotation_2d which
    right-multiplies by [[cos, -sin], [sin, cos]].
    """
    c, s = jnp.cos(angles), jnp.sin(angles)
    rot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)  # (N,2,2)
    return jnp.einsum("nkj,njm->nkm", points, rot)


_CORNERS_NORM_2D = np.array(
    [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]]) - 0.5  # ref corners_nd order


def center_to_corner_box2d(centers, dims, angles):
    """BEV corners (N, 4, 2) of rotated boxes (ref: box_np_ops :265-285)."""
    corners = dims[:, None, :] * jnp.asarray(_CORNERS_NORM_2D, dims.dtype)
    corners = rotation_2d(corners, angles)
    return corners + centers[:, None, :]


def box_area_bev(boxes):
    """boxes (N, >=5) [x,y,(z),w,l,...] — BEV area w*l given layout [...,3]=w,[...,4]=l."""
    return boxes[:, 3] * boxes[:, 4]


def points_in_rbbox(points, boxes, z_axis: bool = True):
    """Boolean mask (P, N): point p inside rotated 3D box n.

    points: (P, >=3); boxes: (N, 7) [x,y,z,w,l,h,yaw] with z at box center
    bottom offset semantics of the reference (origin=(0.5,0.5,0.5) — the
    reference's points_in_rbbox uses origin (0.5,0.5,0.5) for nuScenes).
    """
    d = points[:, None, :3] - boxes[None, :, :3]          # (P, N, 3)
    yaw = boxes[:, 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # inverse rotation: local_x = cos*dx + sin*dy; local_y = -sin*dx + cos*dy
    lx = c[None, :] * d[..., 0] + s[None, :] * d[..., 1]
    ly = -s[None, :] * d[..., 0] + c[None, :] * d[..., 1]
    lz = d[..., 2]
    inside = ((jnp.abs(lx) <= boxes[None, :, 3] / 2)
              & (jnp.abs(ly) <= boxes[None, :, 4] / 2))
    if z_axis:
        inside &= jnp.abs(lz) <= boxes[None, :, 5] / 2
    return inside


def filter_boxes_outside_range(boxes, bv_range):
    """Mask of boxes whose center xy is inside [xmin,ymin,xmax,ymax].

    ref: prep.filter_gt_box_outside_range keeps boxes with any corner in range;
    we use the stricter/simpler center criterion used by Voxelization's range
    filter in practice (centers dominate; parity-tested on synthetic data).
    """
    return ((boxes[:, 0] >= bv_range[0]) & (boxes[:, 0] <= bv_range[2])
            & (boxes[:, 1] >= bv_range[1]) & (boxes[:, 1] <= bv_range[3]))


# ---------------------------------------------------------------------------
# Coordinate transforms between our decode output and nuScenes global frame.
# ---------------------------------------------------------------------------

def yaw_to_nusc(yaw):
    """Invert the stored-yaw convention: stored = -nusc - pi/2 (ref nusc_common:531,
    applied again on the way out at nusc_common.py:172)."""
    return -yaw - np.pi / 2


def boxes_to_global(boxes_xyz, yaw, vel, lidar2global_rot, lidar2global_trans):
    """Transform decoded lidar-frame boxes to the global frame.

    lidar2global_rot: (3,3) rotation composed of calibrated_sensor and ego_pose
    (ref: _lidar_nusc_box_to_global, nusc_common.py:192-214). Vectorized over N.
    """
    xyz = boxes_xyz @ lidar2global_rot.T + lidar2global_trans
    # yaw in global frame: rotate by the rotation's heading about z
    head = jnp.arctan2(lidar2global_rot[1, 0], lidar2global_rot[0, 0])
    vel3 = jnp.concatenate([vel, jnp.zeros_like(vel[:, :1])], axis=1)
    vel_g = vel3 @ lidar2global_rot.T
    return xyz, yaw + head, vel_g[:, :2]
