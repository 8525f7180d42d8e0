"""Sparse 3D middle encoder — the VoxelNet backbone.

Capability port of `SpMiddleResNetFHD`
(`/root/reference/det3d/models/backbones/scn.py:84-177`): 4 stages of
{stride-2 sparse conv + 2 submanifold residual blocks}, 16->32->64->128
channels over the (41, 1440, 1440) grid, finishing with a z-crush to a dense
BEV map of 128 * Z4 channels at 1/8 resolution.

Built on ops.sparse_conv gather-scatter primitives. Neighbor tables are
computed once per stage and shared by all submanifold convs of that stage
(the spconv indice_key pattern, ref scn.py:20,99).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sparse_conv import (downsample_coords, make_grid, neighbor_table,
                               scatter_dense, strided_gather_table,
                               subm_conv_apply)
from .readers import MaskedBatchNorm


def _kernel_init(key, shape, dtype=jnp.float32):
    # fan-in = K * Cin (matches torch Conv3d default scaling)
    k, cin, cout = shape
    std = (1.0 / (k * cin)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -std, std)


class SparseConv(nn.Module):
    """One sparse conv (submanifold or strided, depending on the table)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, feats, table):
        K = table.shape[0]
        cin = feats.shape[-1]
        w = self.param("kernel", _kernel_init, (K, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        return subm_conv_apply(feats, table, w, b)


class SparseBasicBlock(nn.Module):
    """Two submanifold 3x3x3 convs + BN + residual (ref scn.py:37-80)."""
    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, table, valid, train: bool = False):
        identity = feats
        x = SparseConv(self.features, name="conv1")(feats, table)
        x = MaskedBatchNorm(axis_name=self.axis_name, name="bn1")(
            x, valid, train=train)
        x = nn.relu(x)
        x = SparseConv(self.features, name="conv2")(x, table)
        x = MaskedBatchNorm(axis_name=self.axis_name, name="bn2")(
            x, valid, train=train)
        x = nn.relu(x + identity)
        return x


class SparseMiddleEncoder(nn.Module):
    """Per-sample middle encoder (vmapped over batch by the caller via
    nn.vmap in the detector — BN stats sync across batch+devices by axis
    names)."""
    channels: Tuple[int, ...] = (16, 32, 64, 128)
    vmax: Tuple[int, ...] = (120000, 60000, 30000, 16000)
    grid_zyx: Tuple[int, int, int] = (41, 1440, 1440)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, voxel_feats, coords_zyx, voxel_valid,
                 train: bool = False):
        """voxel_feats (V0, C), coords (V0, 3) zyx, valid (V0,) ->
        dense BEV (Y/8, X/8, channels[-1] * Z4)."""
        grid = make_grid(coords_zyx, voxel_valid, self.grid_zyx)
        # re-sort features to the grid's id order
        sentinel = self.grid_zyx[0] * self.grid_zyx[1] * self.grid_zyx[2]
        order = jnp.argsort(jnp.where(voxel_valid,
                                      (coords_zyx[:, 0] * self.grid_zyx[1]
                                       + coords_zyx[:, 1]) * self.grid_zyx[2]
                                      + coords_zyx[:, 2], sentinel))
        x = voxel_feats[order]

        dims = self.grid_zyx
        # stage 0: subm conv_input + 2 residual blocks (ref :98-107)
        table = neighbor_table(grid, dims)
        x = SparseConv(self.channels[0], use_bias=False, name="conv_input")(
            x, table)
        x = MaskedBatchNorm(axis_name=self.axis_name, name="bn_input")(
            x, grid.valid, train=train)
        x = nn.relu(x)
        for j in range(2):
            x = SparseBasicBlock(self.channels[0], axis_name=self.axis_name,
                                 name=f"res0_{j}")(x, table, grid.valid, train)

        # stages 1..3: strided down + 2 residual blocks (ref :109-137)
        for s in range(1, 4):
            out_dims = tuple(max((d + 1) // 2, 1) for d in dims)
            ngrid = downsample_coords(grid, out_dims, self.vmax[s])
            dtable = strided_gather_table(grid, ngrid, dims)
            x = SparseConv(self.channels[s], use_bias=False,
                           name=f"down{s}")(x, dtable)
            x = MaskedBatchNorm(axis_name=self.axis_name, name=f"bn_down{s}")(
                x, ngrid.valid, train=train)
            x = nn.relu(x)
            grid, dims = ngrid, out_dims
            table = neighbor_table(grid, dims)
            for j in range(2):
                x = SparseBasicBlock(self.channels[s],
                                     axis_name=self.axis_name,
                                     name=f"res{s}_{j}")(x, table, grid.valid,
                                                         train)

        # z-crush (ref extra_conv :140-146 + .dense() reshape :165-168):
        # scatter to dense (Z4, Y4, X4, C) and fold z into channels
        x = jnp.where(grid.valid[:, None], x, 0.0)
        dense = scatter_dense(x, grid, dims)           # (Z, Y, X, C)
        Z, Y, X, C = dense.shape
        return dense.transpose(1, 2, 0, 3).reshape(Y, X, Z * C)
