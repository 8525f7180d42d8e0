"""Fused rotated NMS as a Pallas TPU kernel.

The XLA version (ops.nms.rotate_nms) materializes the (N, N) IoU matrix in
HBM and then runs the greedy loop as a second pass of N dynamic-sliced row
reads. This kernel keeps everything in VMEM and computes each IoU row on the
fly inside the suppression loop — one pass, no HBM matrix:

  boxes live as SoA (5, 8, N/128 * 128) tiles in VMEM
  for i in 0..N-1:                       (lax.fori_loop in-kernel)
    read box i's scalars from VMEM
    iou_row = rotated IoU of box i vs ALL boxes  (VPU, pair-per-lane)
    alive &= ~(alive[i] & iou_row > thresh & idx > i)

The IoU math is the same Liang-Barsky boundary integral as
ops.rotated_iou (sort-free, atan2-free), specialized to scalar-vs-lane
broadcasting. Equivalent of the reference CUDA bitmask kernel
(`det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu:267+`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DIV_EPS = 1e-12
_CLIP_EPS = 1e-5
LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES  # boxes are padded to a multiple of 1024


def _slab(p, d, h):
    safe = jnp.where(jnp.abs(d) < _DIV_EPS, _DIV_EPS, d)
    t1 = (-h - p) / safe
    t2 = (h - p) / safe
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    par = jnp.abs(d) < _DIV_EPS
    inside = jnp.abs(p) <= h
    big = jnp.float32(1e30)
    lo = jnp.where(par, jnp.where(inside, -big, big), lo)
    hi = jnp.where(par, jnp.where(inside, big, -big), hi)
    return lo, hi


def _edge_sum(px, py, qx, qy, cx, cy, cc, cs, hx, hy):
    """Boundary-integral contribution of ONE edge p->q clipped to the slab
    |.|<=h in the clip frame (cx, cy, cc, cs). All args broadcastable."""
    rpx = cc * (px - cx) + cs * (py - cy)
    rpy = -cs * (px - cx) + cc * (py - cy)
    rqx = cc * (qx - cx) + cs * (qy - cy)
    rqy = -cs * (qx - cx) + cc * (qy - cy)
    lox, hix = _slab(rpx, rqx - rpx, hx)
    loy, hiy = _slab(rpy, rqy - rpy, hy)
    t0 = jnp.maximum(jnp.maximum(lox, loy), 0.0)
    t1 = jnp.minimum(jnp.minimum(hix, hiy), 1.0)
    ok = t1 > t0
    t0 = jnp.where(ok, t0, 0.0)
    t1 = jnp.where(ok, t1, 0.0)
    ex = qx - px
    ey = qy - py
    x0 = px + t0 * ex
    y0 = py + t0 * ey
    x1 = px + t1 * ex
    y1 = py + t1 * ey
    return jnp.where(ok, x0 * y1 - y0 * x1, 0.0)


def _corners(x, y, hx, hy, c, s):
    """CCW corners; returns lists of 4 (x, y)."""
    pts = []
    for sx, sy in ((1, 1), (-1, 1), (-1, -1), (1, -1)):
        lx, ly = sx * hx, sy * hy
        pts.append((x + c * lx - s * ly, y + s * lx + c * ly))
    return pts


def _nms_kernel(boxes_ref, thresh_ref, alive_ref):
    # SoA components, shape (S, L) with S*L = N
    x = boxes_ref[0]
    y = boxes_ref[1]
    dx = boxes_ref[2]
    dy = boxes_ref[3]
    ang = boxes_ref[4]
    S, L = x.shape
    N = S * L
    th = thresh_ref[0]

    c = jnp.cos(ang)
    s = jnp.sin(ang)
    hx = dx * 0.5
    hy = dy * 0.5
    area = dx * dy
    lane_corners = _corners(x, y, hx, hy, c, s)

    lin = (jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) * L
           + jax.lax.broadcasted_iota(jnp.int32, (S, L), 1))

    # padded slots carry dx == 0 -> area 0 -> never suppress anything real
    alive0 = (dx > 0.0).astype(jnp.float32)

    def body(i, alive):
        # scalar extraction via onehot reductions (dynamic_slice of values is
        # not lowerable on TPU Pallas)
        onehot = (lin == i).astype(jnp.float32)
        xi = jnp.sum(x * onehot)
        yi = jnp.sum(y * onehot)
        hxi = jnp.sum(hx * onehot)
        hyi = jnp.sum(hy * onehot)
        ci = jnp.sum(c * onehot)
        si = jnp.sum(s * onehot)
        area_i = jnp.sum(area * onehot)

        # lane-box edges clipped to box i (shrunk)
        sa = 0.0
        for k in range(4):
            px, py = lane_corners[k]
            qx, qy = lane_corners[(k + 1) % 4]
            sa = sa + _edge_sum(px, py, qx, qy, xi, yi, ci, si,
                                hxi - _CLIP_EPS, hyi - _CLIP_EPS)
        # box-i edges clipped to lane boxes (grown)
        ci_corners = _corners(xi, yi, hxi, hyi, ci, si)
        sb = 0.0
        for k in range(4):
            px, py = ci_corners[k]
            qx, qy = ci_corners[(k + 1) % 4]
            sb = sb + _edge_sum(px, py, qx, qy, x, y, c, s,
                                hx + _CLIP_EPS, hy + _CLIP_EPS)
        inter = jnp.maximum(0.5 * (sa + sb), 0.0)
        union = jnp.maximum(area + area_i - inter, 1e-8)
        iou = inter / union

        keep_i = jnp.sum(alive * onehot) > 0.0
        kill = (iou > th) & (lin > i) & keep_i
        return alive * (1.0 - kill.astype(jnp.float32))

    alive = jax.lax.fori_loop(0, N, body, alive0)
    alive_ref[:] = alive


@partial(jax.jit, static_argnames=("interpret",))
def nms_alive_mask(nms_boxes, valid, iou_threshold, interpret: bool = False):
    """nms_boxes (N, 5) [x, y, dx, dy, ang] SCORE-SORTED desc; valid (N,).

    Returns float mask (N,) of survivors. N is padded to a multiple of 1024.
    """
    N = nms_boxes.shape[0]
    Np = -(-N // TILE) * TILE
    soa = jnp.zeros((5, Np), jnp.float32)
    b = jnp.where(valid[:, None], nms_boxes, 0.0)
    soa = soa.at[:, :N].set(b.T)
    S = Np // LANES
    soa = soa.reshape(5, S, LANES)
    thresh = jnp.asarray([iou_threshold], jnp.float32)

    alive = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((S, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(soa, thresh)
    return alive.reshape(Np)[:N]


def rotate_nms_pallas(boxes, scores, valid, *, iou_threshold: float,
                      pre_max: int = 1024, post_max: int = 83,
                      interpret: bool = False):
    """Drop-in for ops.nms.rotate_nms using the fused kernel.

    boxes (N, 7) decode layout [x, y, z, w, l, h, rot]; same pcdet frame
    transform as the reference (box_torch_ops.py:256-257).
    """
    pre_max = min(pre_max, boxes.shape[0])
    scores = jnp.where(valid, scores, -jnp.inf)
    top_scores, order = jax.lax.top_k(scores, pre_max)
    b = boxes[order]
    nms_boxes = jnp.stack(
        [b[:, 0], b[:, 1], b[:, 4], b[:, 3], -b[:, 6] - np.pi / 2], -1)
    ok = jnp.isfinite(top_scores)
    nms_boxes = jnp.where(ok[:, None], nms_boxes, 0.0)

    alive = nms_alive_mask(nms_boxes, ok, iou_threshold,
                           interpret=interpret) > 0.0
    alive = alive & ok
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    sel = jnp.full((post_max,), -1, jnp.int32)
    src = jnp.where(alive & (rank < post_max), rank, post_max)
    sel = sel.at[jnp.minimum(src, post_max)].set(
        jnp.where(alive, order, -1).astype(jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(alive.astype(jnp.int32)), post_max)
    return sel, count
