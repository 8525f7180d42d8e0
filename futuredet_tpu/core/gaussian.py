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


# log-domain "minus infinity": far enough that exp underflows to exact 0,
# near enough that sums of two stay finite in fp32. (numpy scalar, NOT a
# jnp constant: a module-level jnp array materialized during a shard_map
# trace would be permanently tagged with that trace's mesh)
_NEG = np.float32(-1e30)


def _log_axis_tables(centers_int, radii, valid, fmap_w, fmap_h):
    """Separable log-gaussian axis tables.

    ly[m, y] = -(y-cy)^2 / 2sigma^2  where |y-cy| <= r and valid, else -inf
    lx[m, x] = likewise for x.
    """
    sigma = (2 * radii + 1).astype(jnp.float32) / 6.0
    inv = 1.0 / (2.0 * sigma * sigma)                        # (M,)

    def axis(cts, n):
        d = (jnp.arange(n, dtype=jnp.int32)[None, :]
             - cts[:, None])                                 # (M, n)
        l = -(d.astype(jnp.float32) ** 2) * inv[:, None]
        return jnp.where((jnp.abs(d) <= radii[:, None])
                         & valid[:, None], l, _NEG)

    return axis(centers_int[:, 1], fmap_h), axis(centers_int[:, 0], fmap_w)


def _maxplus(ly, lx):
    """Tropical (max-plus) contraction: out[y, x] = max_m ly[m, y] + lx[m, x].

    The 2D gaussian is separable, so the max-composited CenterNet heatmap is
    exp of a max-plus product of two dense (M, H)/(M, W) log tables — a pure
    fused VPU broadcast+reduce. This is the tpu-native replacement for the
    reference's per-object patch blit (and for scatter-based ports of it:
    TPU scatter issues one update per ROW — the pixel-granular segment_max
    formulation measured 2.8 s/sample, and XLA serializes overlapping
    windowed scatter_max updates entirely, 4.7 s/sample; this contraction
    renders the same maps in ~2 ms)."""
    return jnp.max(ly[:, :, None] + lx[:, None, :], axis=0)


def render_heatmap_single(centers_int, radii, valid, fmap_w, fmap_h):
    """One single-class (H, W) map — the hot path the per-timestep target
    families use directly (their class partition is by construction:
    source-timestep for the forecast family, task class group otherwise)."""
    ly, lx = _log_axis_tables(jnp.asarray(centers_int, jnp.int32),
                              jnp.asarray(radii, jnp.int32),
                              jnp.asarray(valid, bool), fmap_w, fmap_h)
    g = jnp.exp(_maxplus(ly, lx))
    # ref gaussian2D zeroes values < eps*max (max==1 at center); the -inf
    # box/validity masks underflow exp to exact 0 on their own
    return jnp.where(g < np.finfo(np.float32).eps, 0.0, g)


def render_heatmap(centers_int, radii, valid, cls_ids, num_classes, fmap_w,
                   fmap_h, class_blocked: bool = False):
    """Render a (num_classes, H, W) heatmap, max-compositing per class.

    centers_int: (M, 2) int32 feature-map cells (x, y)
    radii:       (M,)   int32
    valid:       (M,)   bool — object exists AND center in-range
    cls_ids:     (M,)   int32

    Matches draw_umich_gaussian: gaussian2D((2r+1, 2r+1), sigma=(2r+1)/6),
    drawn centered on the integer cell, max-composited. Each class map is a
    separable max-plus contraction (see _maxplus) with the other classes'
    objects masked out.

    class_blocked=True: caller guarantees cls_ids == repeat(arange(C), M/C)
    positionally (the forecast family's source-timestep layout) — class c
    renders only its own M/C-object slice instead of a masked full-M pass.
    """
    centers_int = jnp.asarray(centers_int, jnp.int32)
    radii = jnp.asarray(radii, jnp.int32)
    valid = jnp.asarray(valid, bool)
    cls_ids = jnp.asarray(cls_ids, jnp.int32)
    ly, lx = _log_axis_tables(centers_int, radii, valid, fmap_w, fmap_h)
    maps = []
    if class_blocked:
        # positional slicing is only sound when the object axis really is
        # num_classes equal blocks — a mismatched sampler config would
        # otherwise render silently wrong per-class maps
        assert centers_int.shape[0] % num_classes == 0, (
            f"class_blocked requires M ({centers_int.shape[0]}) divisible "
            f"by num_classes ({num_classes})")
        blk = centers_int.shape[0] // num_classes
        for c in range(num_classes):
            sl = slice(c * blk, (c + 1) * blk)
            maps.append(_maxplus(ly[sl], lx[sl]))
    else:
        for c in range(num_classes):
            lyc = jnp.where(cls_ids[:, None] == c, ly, _NEG)
            maps.append(_maxplus(lyc, lx))
    g = jnp.exp(jnp.stack(maps))
    return jnp.where(g < np.finfo(np.float32).eps, 0.0, g)


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
