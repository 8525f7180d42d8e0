"""Pairwise rotated-rectangle BEV IoU — vectorized XLA, no host loop.

TPU-native replacement for the reference CUDA kernels
(`/root/reference/det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu`:
`boxes_overlap_kernel`/`boxes_iou_bev_kernel`). Instead of the CUDA
polygon-clipping state machine we use the fixed-size candidate-vertex method,
which maps cleanly onto the VPU:

  intersection polygon vertices ⊆ {corners of A inside B}  (4)
                               ∪ {corners of B inside A}   (4)
                               ∪ {edge×edge intersections} (16)
  -> 24 candidates with validity mask, sorted by angle around their centroid,
  shoelace area over the masked polygon.

Box parametrization here: (x, y, dx, dy, angle) — extent dx along the heading.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def rect_corners(boxes):
    """(N, 5) [x,y,dx,dy,ang] -> (N, 4, 2) CCW corners."""
    x, y, dx, dy, ang = (boxes[:, i] for i in range(5))
    c, s = jnp.cos(ang), jnp.sin(ang)
    hx, hy = dx / 2, dy / 2
    local = jnp.stack([
        jnp.stack([hx, hy], -1), jnp.stack([-hx, hy], -1),
        jnp.stack([-hx, -hy], -1), jnp.stack([hx, -hy], -1)], 1)  # (N,4,2)
    rot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    world = jnp.einsum("nkj,nmj->nkm", local, rot)
    return world + jnp.stack([x, y], -1)[:, None, :]


def _point_in_rect(pts, boxes):
    """pts (..., 2) vs boxes (..., 5) broadcast: inside test in box frame."""
    d = pts - boxes[..., :2]
    c, s = jnp.cos(boxes[..., 4]), jnp.sin(boxes[..., 4])
    lx = c * d[..., 0] + s * d[..., 1]
    ly = -s * d[..., 0] + c * d[..., 1]
    return ((jnp.abs(lx) <= boxes[..., 2] / 2 + 1e-6)
            & (jnp.abs(ly) <= boxes[..., 3] / 2 + 1e-6))


def _seg_intersections(ca, cb):
    """All 16 edge-pair intersections of two quads ca, cb (4, 2) each.

    Returns (16, 2) points + (16,) validity.
    """
    a1 = jnp.repeat(ca, 4, axis=0)                       # (16,2)
    a2 = jnp.repeat(jnp.roll(ca, -1, 0), 4, axis=0)
    b1 = jnp.tile(cb, (4, 1))
    b2 = jnp.tile(jnp.roll(cb, -1, 0), (4, 1))

    da = a2 - a1
    db = b2 - b1
    denom = da[:, 0] * db[:, 1] - da[:, 1] * db[:, 0]
    diff = b1 - a1
    t = (diff[:, 0] * db[:, 1] - diff[:, 1] * db[:, 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom)
    u = (diff[:, 0] * da[:, 1] - diff[:, 1] * da[:, 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom)
    ok = (jnp.abs(denom) >= _EPS) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = a1 + t[:, None] * da
    return pts, ok


def _pair_intersection_area(box_a, box_b, ca, cb):
    """Intersection area of one rect pair. box_* (5,), c* (4, 2)."""
    in_b = _point_in_rect(ca, box_b[None, :])            # (4,)
    in_a = _point_in_rect(cb, box_a[None, :])            # (4,)
    xpts, xok = _seg_intersections(ca, cb)               # (16,2),(16,)

    pts = jnp.concatenate([ca, cb, xpts], 0)             # (24,2)
    ok = jnp.concatenate([in_b, in_a, xok], 0)           # (24,)

    cnt = jnp.sum(ok)
    center = jnp.sum(jnp.where(ok[:, None], pts, 0.0), 0) / jnp.maximum(cnt, 1)
    ang = jnp.arctan2(pts[:, 1] - center[1], pts[:, 0] - center[0])
    ang = jnp.where(ok, ang, jnp.inf)
    order = jnp.argsort(ang)
    pts = pts[order]
    ok_s = ok[order]
    # replace invalid (sorted last) with the first (valid) vertex -> zero-area
    first = pts[0]
    poly = jnp.where(ok_s[:, None], pts, first[None, :])
    nxt = jnp.roll(poly, -1, 0)
    area = 0.5 * jnp.abs(jnp.sum(poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]))
    return jnp.where(cnt >= 3, area, 0.0)


def pairwise_intersection(boxes_a, boxes_b):
    """(N,5),(M,5) -> (N,M) BEV intersection areas."""
    ca = rect_corners(boxes_a)
    cb = rect_corners(boxes_b)
    f = jax.vmap(jax.vmap(_pair_intersection_area,
                          in_axes=(None, 0, None, 0)),
                 in_axes=(0, None, 0, None))
    return f(boxes_a, boxes_b, ca, cb)


def pairwise_iou_bev(boxes_a, boxes_b):
    """(N,5),(M,5) -> (N,M) IoU (ref boxes_iou_bev_kernel semantics)."""
    inter = pairwise_intersection(boxes_a, boxes_b)
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, _EPS)
