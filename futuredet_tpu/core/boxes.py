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


def box_collision_test(corners: np.ndarray, qcorners: np.ndarray
                       ) -> np.ndarray:
    """Vectorized numpy port of the reference's GT-AUG collision test
    (`det3d/core/sampler/preprocess.py:882-967`, numba): (N, 4, 2) vs
    (K, 4, 2) BEV corner sets -> (N, K) bool.

    collision = standup-box overlap AND (any edge pair strictly crosses OR
    one box strictly contains ALL of the other's corners). All comparisons
    strict, matching the reference's `>` / `>= 0` branches (touching
    boundaries do NOT collide).
    """
    corners = np.asarray(corners, np.float64)
    qcorners = np.asarray(qcorners, np.float64)
    N, K = len(corners), len(qcorners)
    if N == 0 or K == 0:
        return np.zeros((N, K), bool)
    sl = [1, 2, 3, 0]

    # standup gate
    blo, bhi = corners.min(1), corners.max(1)            # (N, 2)
    qlo, qhi = qcorners.min(1), qcorners.max(1)          # (K, 2)
    iw = (np.minimum(bhi[:, None, 0], qhi[None, :, 0])
          - np.maximum(blo[:, None, 0], qlo[None, :, 0])) > 0
    ih = (np.minimum(bhi[:, None, 1], qhi[None, :, 1])
          - np.maximum(blo[:, None, 1], qlo[None, :, 1])) > 0
    gate = iw & ih

    # segment crossings: edges (A->B) of boxes vs (C->D) of qboxes
    A = corners[:, None, :, None, :]                     # (N,1,4,1,2)
    B = corners[:, sl][:, None, :, None, :]
    C = qcorners[None, :, None, :, :]                    # (1,K,1,4,2)
    D = qcorners[:, sl][None, :, None, :, :]

    def ccw(p, q, r):   # (r - p) x (q - p) > 0 in the reference's form
        return ((r[..., 1] - p[..., 1]) * (q[..., 0] - p[..., 0])
                > (q[..., 1] - p[..., 1]) * (r[..., 0] - p[..., 0]))

    acd, bcd = ccw(A, C, D), ccw(B, C, D)
    abc, abd = ccw(A, B, C), ccw(A, B, D)
    seg = ((acd != bcd) & (abc != abd)).any((-1, -2))    # (N, K)

    def contains(c1, c2):
        """(n,4,2) boxes strictly contain ALL corners of (k,4,2) boxes.
        clockwise=True: vec = -(corner_k - corner_{k+1}); inside needs
        cross < 0 for every edge/corner pair (ref :935-945)."""
        vec = -(c1 - c1[:, sl])                          # (n, 4, 2)
        dx = c1[:, None, :, None, 0] - c2[None, :, None, :, 0]
        dy = c1[:, None, :, None, 1] - c2[None, :, None, :, 1]
        cross = vec[:, None, :, None, 1] * dx - vec[:, None, :, None, 0] * dy
        return (cross < 0).all((-1, -2))                 # (n, k)

    return gate & (seg | contains(corners, qcorners)
                   | contains(qcorners, corners).T)


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
    """Keep mask of boxes with ANY BEV corner inside [xmin,ymin,xmax,ymax]
    (ref prep.filter_gt_box_outside_range, core/sampler/preprocess.py:
    113-127, consumed by Voxelization at pipelines/preprocess.py:249-254).

    The reference computes corners from dims (w, l) and the LAST box column
    as the angle — for 12-column forecast boxes that is rrot, a quirk
    preserved here. Boxes narrower than the grid edge with only the center
    inside are kept either way; the corner test additionally keeps boxes
    whose center is just outside the range (range-edge GT count parity).
    """
    boxes = jnp.asarray(boxes)
    corners = center_to_corner_box2d(boxes[:, :2], boxes[:, 3:5],
                                     boxes[:, -1])          # (N, 4, 2)
    inside = ((corners[..., 0] >= bv_range[0])
              & (corners[..., 0] <= bv_range[2])
              & (corners[..., 1] >= bv_range[1])
              & (corners[..., 1] <= bv_range[3]))
    return jnp.any(inside, axis=1)


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
