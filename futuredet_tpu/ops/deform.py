"""Deformable convolution v1 — bilinear-gather formulation.

TPU-native equivalent of the reference CUDA extension
(`/root/reference/det3d/ops/dcn/`: deform_conv_cuda*.cu, python wrapper
`deform_conv.py:14-324`), used by the optional DCN center-head
(`center_head.py:40-79,176-228`; all shipped configs set dcn_head=False).

Instead of the im2col CUDA kernel we sample the input at the offset kernel
taps with bilinear gathers and contract with the kernel weights on the MXU —
the natural XLA decomposition.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample(img, ys, xs):
    """img (H, W, C); ys/xs (...,) float pixel coords -> (..., C).

    Zero-padding outside (matches the CUDA kernel's boundary handling).
    """
    H, W, C = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def tap(yi, xi):
        ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        v = img[yc, xc]
        return jnp.where(ok[..., None], v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return ((1 - wy)[..., None] * ((1 - wx)[..., None] * v00
                                  + wx[..., None] * v01)
            + wy[..., None] * ((1 - wx)[..., None] * v10
                               + wx[..., None] * v11))


def deform_conv2d(x, offsets, weights, *, deformable_groups: int = 4):
    """x (B, H, W, Cin); offsets (B, H, W, G*2*K) with K=9 taps (dy, dx per
    tap, ref deform_conv.py channel layout); weights (K, Cin, Cout).

    Returns (B, H, W, Cout). kernel 3x3, stride 1, pad 1.
    """
    B, H, W, Cin = x.shape
    K = 9
    G = deformable_groups
    taps = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    off = offsets.reshape(B, H, W, G, K, 2)
    cg = Cin // G

    def one(img, off_b):
        outs = []
        for k, (dy, dx) in enumerate(taps):
            groups = []
            for g in range(G):
                sy = ys + dy + off_b[:, :, g, k, 0]
                sx = xs + dx + off_b[:, :, g, k, 1]
                groups.append(bilinear_sample(
                    img[:, :, g * cg:(g + 1) * cg], sy, sx))
            outs.append(jnp.concatenate(groups, -1))     # (H, W, Cin)
        samp = jnp.stack(outs, 0)                        # (K, H, W, Cin)
        return jnp.einsum("khwc,kco->hwo", samp, weights)

    return jax.vmap(one)(x, off)
