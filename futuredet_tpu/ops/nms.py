"""Greedy NMS — static shapes, device-resident.

Replaces the reference's CUDA bitmask NMS
(`det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu:267+`, python entry
`box_torch_ops.rotate_nms_pcdet`, ref box_torch_ops.py:248-277) and the numba
circle NMS (`det3d/core/utils/circle_nms_jit.py`).

The input convention matches rotate_nms_pcdet: boxes (N, 7)
[x, y, z, w, l, h, rot] in the decode frame; internally transformed to the
physical pcdet frame [x, y, l, w, -rot-pi/2] before IoU (ref :256-257).

Greedy suppression is computed as the unique fixpoint of
    alive[i] = valid[i] and not exists j < i: alive[j] and iou[j,i] > thr
iterated Jacobi-style (each sweep is one (P,P)x(P,) masked matvec on the
MXU). Starting from all-valid, even iterates decrease and odd iterates
increase toward the greedy solution; both reach it within the longest
suppression-chain depth (~5-15 on detection workloads, bounded by P), and
consecutive equal iterates certify the fixpoint. This replaces a P-step
sequential fori_loop (~1 ms at P=1000 from per-step latency) with ~10
matvec sweeps — identical output to the CUDA kernel's sequential greedy.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from .rotated_iou import pairwise_iou_bev


def _greedy_alive(suppress, alive0):
    """Fixpoint of the greedy-NMS recurrence (see module docstring).

    suppress (P, P) bool — suppress[j, i] True when j would kill i (any
    ordering; the strict j<i constraint is applied here); alive0 (P,) bool.
    """
    P = alive0.shape[0]
    idx = jnp.arange(P)
    s = (suppress & (idx[:, None] < idx[None, :])).astype(jnp.float32)

    def cond(state):
        i, prev, a = state
        return (i < P) & jnp.any(prev != a)

    def body(state):
        i, _, a = state
        nxt = alive0 & ~(jnp.dot(a.astype(jnp.float32), s,
                                 preferred_element_type=jnp.float32) > 0.0)
        return i + 1, a, nxt

    _, _, alive = jax.lax.while_loop(
        cond, body, (jnp.int32(0), ~alive0, alive0))
    return alive


@partial(jax.jit, static_argnames=("pre_max", "post_max"))
def rotate_nms(boxes, scores, valid, *, iou_threshold: float,
               pre_max: int = 1000, post_max: int = 83):
    """boxes (N,7), scores (N,), valid (N,) bool.

    Returns (selected_idx (post_max,) int32 into the ORIGINAL array, -1 pad;
             keep_count ()).
    """
    pre_max = min(pre_max, boxes.shape[0])
    scores = jnp.where(valid, scores, -jnp.inf)
    top_scores, order = jax.lax.top_k(scores, pre_max)      # score-desc prefix
    b = boxes[order]
    alive0 = jnp.isfinite(top_scores)

    nms_boxes = jnp.stack(
        [b[:, 0], b[:, 1], b[:, 4], b[:, 3], -b[:, 6] - np.pi / 2], -1)
    iou = pairwise_iou_bev(nms_boxes, nms_boxes)            # (P,P)

    alive = _greedy_alive(iou > iou_threshold, alive0)

    # stable-select kept boxes in score order, pad with -1
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    sel = jnp.full((post_max,), -1, jnp.int32)
    src = jnp.where(alive & (rank < post_max), rank, post_max)
    sel = sel.at[jnp.minimum(src, post_max)].set(
        jnp.where(alive, order, -1).astype(jnp.int32), mode="drop")
    # the scatter above drops writes at index post_max (the trash index)
    count = jnp.minimum(jnp.sum(alive.astype(jnp.int32)), post_max)
    return sel, count


@partial(jax.jit, static_argnames=("post_max",))
def circle_nms(centers, scores, valid, *, min_radius: float, post_max: int = 83):
    """Center-distance greedy suppression (ref circle_nms_jit.py:5-29):
    suppress j when squared center distance <= thresh (the reference passes
    test_cfg.min_radius as the squared-distance threshold directly).
    """
    N = centers.shape[0]
    scores = jnp.where(valid, scores, -jnp.inf)
    top_scores, order = jax.lax.top_k(scores, N)
    c = centers[order]
    d2 = jnp.sum((c[:, None, :] - c[None, :, :]) ** 2, -1)
    alive0 = jnp.isfinite(top_scores)
    alive = _greedy_alive(d2 <= min_radius, alive0)
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    sel = jnp.full((post_max,), -1, jnp.int32)
    src = jnp.where(alive & (rank < post_max), rank, post_max)
    sel = sel.at[jnp.minimum(src, post_max)].set(
        jnp.where(alive, order, -1).astype(jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(alive.astype(jnp.int32)), post_max)
    return sel, count


# ---------------------------------------------------------------------------
# numpy oracle: sequential greedy with shapely-free polygon IoU (tests only)
# ---------------------------------------------------------------------------

def _corners_np(b):
    x, y, dx, dy, a = b
    c, s = np.cos(a), np.sin(a)
    loc = np.array([[dx, dy], [-dx, dy], [-dx, -dy], [dx, -dy]]) / 2
    rot = np.array([[c, -s], [s, c]])
    return loc @ rot.T + np.array([x, y])


def polygon_clip_np(subject, clip):
    """Sutherland–Hodgman; clip must be convex CCW."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    def inter(p1, p2, a, b):
        d1 = np.asarray(p2) - p1
        d2 = np.asarray(b) - a
        den = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / den
        return p1 + t * d1

    out = list(subject)
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        inp, out = out, []
        if not inp:
            break
        s = inp[-1]
        for p in inp:
            if inside(p, a, b):
                if not inside(s, a, b):
                    out.append(inter(s, p, a, b))
                out.append(p)
            elif inside(s, a, b):
                out.append(inter(s, p, a, b))
            s = p
    return out


def iou_bev_np(ba, bb):
    ca, cb = _corners_np(ba), _corners_np(bb)
    poly = polygon_clip_np(ca, cb)
    if len(poly) < 3:
        inter = 0.0
    else:
        p = np.array(poly)
        q = np.roll(p, -1, 0)
        inter = 0.5 * abs(np.sum(p[:, 0] * q[:, 1] - q[:, 0] * p[:, 1]))
    union = ba[2] * ba[3] + bb[2] * bb[3] - inter
    return inter / max(union, 1e-8)


def rotate_nms_np(boxes, scores, iou_threshold, pre_max=1000, post_max=83):
    order = np.argsort(-scores)[:pre_max]
    nb = np.stack([boxes[:, 0], boxes[:, 1], boxes[:, 4], boxes[:, 3],
                   -boxes[:, 6] - np.pi / 2], -1)
    keep = []
    alive = np.ones(len(order), bool)
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(order[i])
        for j in range(i + 1, len(order)):
            if alive[j] and iou_bev_np(nb[order[i]], nb[order[j]]) > iou_threshold:
                alive[j] = False
    return np.array(keep[:post_max])
