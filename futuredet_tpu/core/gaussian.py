"""CenterNet gaussian heatmap targets — vectorized for TPU.

Behavioral port of `/root/reference/det3d/core/utils/center_utils.py:17-64`
(`gaussian_radius`, `gaussian2D`, `draw_umich_gaussian`) plus the
velocity-scaled radius trick of AssignLabel
(`/root/reference/det3d/datasets/pipelines/preprocess.py:489-497`).

Design: instead of the reference's per-object python loop mutating a numpy
heatmap, we render every object's gaussian patch (max_objs, D, D) in one shot
and scatter-max them into the heatmap with a single segment_max — one fused
XLA computation, no host loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Max gaussian radius we materialize as a patch. Reference radii for the
# 180x180 car map are <= ~4x base radius (mult clipped at 4, preprocess:492);
# 48 cells is far beyond anything reachable at out_size_factor 8.
MAX_RADIUS = 48
PATCH = 2 * MAX_RADIUS + 1


def gaussian_radius(height, width, min_overlap: float = 0.5):
    """Min radius keeping IoU >= min_overlap (ref center_utils.py:17-38).

    Vectorized over arrays; same three quadratic cases, returns elementwise min.
    """
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def radius_with_mult(w_feat, l_feat, vel_norm, timestep, *, gaussian_overlap,
                     min_radius, radius_mult):
    """Integer radius incl. the velocity-scaled multiplier.

    ref preprocess.py:489-497: mult = clip(vel_norm*(1+i)/2, 1, 4); radius =
    max(min_radius, int(mult * gaussian_radius((l, w), overlap))).
    """
    base = gaussian_radius(l_feat, w_feat, gaussian_overlap)
    if radius_mult:
        mult = jnp.clip(vel_norm * (1.0 + timestep) / 2.0, 1.0, 4.0)
    else:
        mult = 1.0
    r = jnp.floor(mult * base).astype(jnp.int32)
    return jnp.maximum(jnp.asarray(min_radius, jnp.int32), r)


def render_heatmap(centers_int, radii, valid, cls_ids, num_classes, fmap_w, fmap_h):
    """Render a (num_classes, H, W) heatmap by scatter-max of gaussian patches.

    centers_int: (M, 2) int32 feature-map cells (x, y)
    radii:       (M,)   int32
    valid:       (M,)   bool — object exists AND center in-range
    cls_ids:     (M,)   int32

    Matches draw_umich_gaussian: gaussian2D((2r+1, 2r+1), sigma=(2r+1)/6),
    drawn centered on the integer cell, max-composited.
    """
    M = centers_int.shape[0]
    dy = jax.lax.broadcasted_iota(jnp.int32, (PATCH, PATCH), 0) - MAX_RADIUS
    dx = jax.lax.broadcasted_iota(jnp.int32, (PATCH, PATCH), 1) - MAX_RADIUS

    def one(ct, r, ok):
        diameter = 2 * r + 1
        sigma = diameter.astype(jnp.float32) / 6.0
        g = jnp.exp(-(dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2)
                    / (2.0 * sigma * sigma))
        # ref gaussian2D zeroes values < eps*max (max==1 at center)
        g = jnp.where(g < np.finfo(np.float32).eps, 0.0, g)
        inside = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
        xs = ct[0] + dx
        ys = ct[1] + dy
        ok_pix = inside & ok & (xs >= 0) & (xs < fmap_w) & (ys >= 0) & (ys < fmap_h)
        flat_idx = jnp.where(ok_pix, ys * fmap_w + xs, fmap_h * fmap_w)  # OOB sentinel
        return g, flat_idx

    gs, idxs = jax.vmap(one)(centers_int, radii, valid)          # (M,P,P)
    cls_off = cls_ids[:, None, None] * (fmap_h * fmap_w)
    idxs = jnp.where(idxs < fmap_h * fmap_w, idxs + cls_off,
                     num_classes * fmap_h * fmap_w)
    flat = jax.ops.segment_max(
        gs.reshape(-1), idxs.reshape(-1),
        num_segments=num_classes * fmap_h * fmap_w + 1,
        indices_are_sorted=False)
    flat = jnp.maximum(flat[:-1], 0.0)  # empty segments come back as -inf
    return flat.reshape(num_classes, fmap_h, fmap_w)


# ---------------------------------------------------------------------------
# numpy oracle (exact loop port, used only by tests)
# ---------------------------------------------------------------------------

def gaussian2d_np(shape, sigma=1.0):
    m, n = [(s - 1.0) / 2.0 for s in shape]
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_gaussian_np(heatmap, center, radius, k=1):
    diameter = 2 * radius + 1
    gaussian = gaussian2d_np((diameter, diameter), sigma=diameter / 6)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[0:2]
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    masked_heatmap = heatmap[y - top:y + bottom, x - left:x + right]
    masked_gaussian = gaussian[radius - top:radius + bottom,
                               radius - left:radius + right]
    if min(masked_gaussian.shape) > 0 and min(masked_heatmap.shape) > 0:
        np.maximum(masked_heatmap, masked_gaussian * k, out=masked_heatmap)
    return heatmap
