"""Sparse 3D middle encoder — the VoxelNet backbone.

Capability port of `SpMiddleResNetFHD`
(`/root/reference/det3d/models/backbones/scn.py:84-177`): 4 stages of
{stride-2 sparse conv + 2 submanifold residual blocks}, 16->32->64->128
channels over the (41, 1440, 1440) grid, finishing with a z-crush to a dense
BEV map of 128 * Z4 channels at 1/8 resolution.

Built on ops.sparse_conv gather-scatter primitives. Neighbor tables are
computed once per stage and shared by all submanifold convs of that stage
(the spconv indice_key pattern, ref scn.py:20,99).

Hybrid dense tail (`dense_from_stage`): stages >= the threshold run as
masked dense 3D convolutions on a scattered canvas instead of 27-way
gathers. Because inactive cells hold exact zeros and outputs are re-masked
after every conv, the dense form computes the *same* submanifold sums as
the gather path (up to fp reassociation) while keeping the MXU fed with
large conv contractions instead of HBM-latency-bound row gathers — the
right trade on TPU for the deeper stages, whose grids are small
((11,360,360) / (6,180,180)) but whose gather rows are wide. Parameters are
shape- and name-compatible between the two forms, so a checkpoint trained
one way runs the other. Only difference vs the sparse path: no `vmax`
capacity cap on dense stages (the sparse path drops overflow sites).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sparse_conv import (_bitmap_rows_ov, _dense_index_rows,
                               _dense_rows_ov,
                               downsample_coords, make_grid, neighbor_table,
                               scatter_dense, strided_xpack_tables,
                               subm_xpack_tables,
                               strided_gather_table, strided_inverse_table,
                               subm_conv_apply)
from .readers import MaskedBatchNorm


def _kernel_init(key, shape, dtype=jnp.float32):
    # fan-in = K * Cin (matches torch Conv3d default scaling)
    k, cin, cout = shape
    std = (1.0 / (k * cin)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -std, std)


class SparseConv(nn.Module):
    """One sparse conv (submanifold or strided, depending on the table).

    `symmetric=True` for submanifold tables enables the gather-transpose
    custom VJP (backward ~2x forward instead of ~7x scatter-adds)."""
    features: int
    use_bias: bool = True
    gather_algo: str = "loop"
    symmetric: bool = False
    packed_pairs: bool = False

    @nn.compact
    def __call__(self, feats, table, inverse_table=None):
        # x-packed tables arrive as a (table9, adj, valid) tuple
        K = 27 if isinstance(table, tuple) else table.shape[0]
        cin = feats.shape[-1]
        w = self.param("kernel", _kernel_init, (K, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        return subm_conv_apply(feats, table, w, b, algo=self.gather_algo,
                               symmetric=self.symmetric,
                               inverse_table=inverse_table,
                               packed_pairs=self.packed_pairs)


class DenseConv3d(nn.Module):
    """Dense 3x3x3 conv over a (Z, Y, X, C) canvas.

    Parameter layout is identical to `SparseConv` ((K=27, Cin, Cout) under
    the name "kernel"), reshaped to DHWIO at apply time, so sparse- and
    dense-stage checkpoints interchange. `_offsets` enumerates dz, dy, dx
    row-major == reshape(3, 3, 3) order.
    """
    features: int
    stride: int = 1
    use_bias: bool = True
    compute_dtype: Optional[jnp.dtype] = None
    pads: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, canvas):
        cin = canvas.shape[-1]
        w = self.param("kernel", _kernel_init, (27, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        cd = self.compute_dtype or canvas.dtype
        y = jax.lax.conv_general_dilated(
            canvas[None].astype(cd),
            w.reshape(3, 3, 3, cin, self.features).astype(cd),
            window_strides=(self.stride,) * 3,
            padding=[(p, p) for p in self.pads],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)[0]
        if b is not None:
            y = y + b
        return y


def _mask_downsample(mask, out_dims, pads=(1, 1, 1)):
    """Kernel-3 stride-2 footprint any-pool of a (Z, Y, X) bool mask == the
    generative active-site semantics of `downsample_coords` (without the
    vmax cap): an output cell is active iff any input cell under its conv
    window is."""
    win_pads = [(p, p) for p in pads]
    out = jax.lax.reduce_window(
        mask, False, jax.lax.bitwise_or, (3, 3, 3), (2, 2, 2), win_pads)
    assert out.shape == tuple(out_dims), (out.shape, out_dims)
    return out


class DenseBasicBlock(nn.Module):
    """Dense form of `SparseBasicBlock`: identical param tree (conv1/bn1/
    conv2/bn2). Re-masks after each conv so inactive cells stay exact zeros
    (submanifold semantics)."""
    features: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, canvas, mask, train: bool = False):
        shape = canvas.shape
        m = mask[..., None]
        flat_mask = mask.reshape(-1)

        def bn(name, x):
            x = MaskedBatchNorm(axis_name=self.axis_name, name=name)(
                x.reshape(-1, x.shape[-1]), flat_mask, train=train)
            return x.reshape(shape[:-1] + (self.features,))

        identity = canvas
        x = DenseConv3d(self.features, compute_dtype=self.compute_dtype,
                        name="conv1")(canvas)
        x = jnp.where(m, nn.relu(bn("bn1", x)), 0.0)
        x = DenseConv3d(self.features, compute_dtype=self.compute_dtype,
                        name="conv2")(x)
        x = bn("bn2", x)
        return jnp.where(m, nn.relu(x + identity), 0.0)


class SparseBasicBlock(nn.Module):
    """Two submanifold 3x3x3 convs + BN + residual (ref scn.py:37-80).

    sparse_dtype=bf16 casts the conv INPUTS (the gathered payloads — the
    stage wall is gather bandwidth); BN, the residual add and the outputs
    stay fp32 (matmuls accumulate fp32 via preferred_element_type)."""
    features: int
    axis_name: Optional[str] = None
    gather_algo: str = "loop"
    sparse_dtype: Optional[jnp.dtype] = None
    packed_pairs: bool = False

    @nn.compact
    def __call__(self, feats, table, valid, train: bool = False):
        cast = (lambda a: a.astype(self.sparse_dtype)) \
            if self.sparse_dtype is not None else (lambda a: a)
        identity = feats
        x = SparseConv(self.features, gather_algo=self.gather_algo,
                       symmetric=True, packed_pairs=self.packed_pairs,
                       name="conv1")(cast(feats), table)
        x = MaskedBatchNorm(axis_name=self.axis_name, name="bn1")(
            x, valid, train=train)
        x = nn.relu(x)
        x = SparseConv(self.features, gather_algo=self.gather_algo,
                       symmetric=True, packed_pairs=self.packed_pairs,
                       name="conv2")(cast(x), table)
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
    # stages >= this run as masked dense convs (None = fully sparse)
    dense_from_stage: Optional[int] = None
    # dtype for dense-stage conv contractions (canvases stream, so bf16 has
    # no sub-word gather penalty here; accumulation stays fp32)
    dense_dtype: Optional[jnp.dtype] = None
    # sparse-stage gather/matmul strategy (ops.sparse_conv.subm_conv_apply)
    gather_algo: str = "loop"
    # xpack stage cutoff: stages with channels > this use stacked
    xpack_max_cin: int = 32
    # sparse-conv input dtype (None = fp32 reference numerics; bf16 halves
    # every gathered row — serving mode, fp32 accumulation)
    sparse_dtype: Optional[jnp.dtype] = None
    # bf16-PAIR packed gathers (conv_x3_packed) for the stages where they
    # win (128 < 3*Cin <= 256, i.e. Cin=64 on the reference channel chain:
    # slab rows drop from 2 gather issues to 1; measured 1.81 -> 1.36 ms
    # per conv at V=31.5k, scripts/probe_shift_unpack.py). Serving mode:
    # eval-only (no VJP), inputs bf16-truncated at those stages.
    packed_pairs: bool = False
    # cell->site map representation for eval-time xpack table builds:
    # "ov" (default) or "bitmap" (popcount rows — see config.py
    # middle_map_format for the measured A/B). Training always uses ov
    # (inverse tables probe the maps directly).
    map_format: str = "ov"
    # caller guarantees (coords, feats) already sorted ascending by the
    # grid's z-major linear id with padding at the end — true for
    # ops.voxelize outputs (same sort key) — skipping the entry argsorts
    assume_sorted: bool = False

    @nn.compact
    def __call__(self, voxel_feats, coords_zyx, voxel_valid,
                 train: bool = False):
        """voxel_feats (V0, C), coords (V0, 3) zyx, valid (V0,) ->
        (dense BEV (Y/8, X/8, channels[-1] * Z4),
         extra-conv active z-mask (Y/8, X/8, Dz_out))."""
        dense_start = (self.dense_from_stage
                       if self.dense_from_stage is not None else 4)
        # sparse-conv input cast (bf16 serving mode; identity when None)
        cast = (lambda a: a.astype(self.sparse_dtype)) \
            if self.sparse_dtype is not None else (lambda a: a)
        # the Pallas windowed gather has no AD rule — training falls back
        # to the stacked custom-VJP path there; x-packed convs train
        # natively via _xpack_conv_sym_vjp / _xpack_strided_vjp
        algo = "stacked" if (train and (self.gather_algo == "hybrid"
                                        or self.gather_algo.startswith(
                                            "window"))) \
            else self.gather_algo
        def stage_packed(cin, algo_used):
            # conv_x3_packed win regime only; never under train (no VJP)
            return (self.packed_pairs and not train
                    and algo_used == "xpack" and 128 < 3 * cin <= 256)

        def stage_algo(s):
            # xpack only pays off for narrow channels (v5e: conv 0.9-1.0 vs
            # 1.65 ms at Cin<=32; at Cin>=64 the lane-select routing cancels
            # the wider-row gather win)
            if algo == "xpack" and self.channels[s] > self.xpack_max_cin:
                return "stacked"
            return algo

        # table LAYOUT follows the configured algo, not the train-coerced
        # conv algo: the 9-probe packed builds are ~2x cheaper than the
        # plain 27-probe ones at train geometry (s0: 19.8 -> 11.6 ms,
        # scripts/probe_traintables.py) and the stacked/custom-VJP convs
        # consume them via unpack_xpack_tables (bit-identical tables)
        packed_layout = self.gather_algo == "xpack"

        def make_map(grid, dims, stage=0):
            # xpack probes the overlapped-row layout (halo lanes carry the
            # x-neighbor cells) — 9 probes/table at EVERY stage; stages
            # whose conv runs stacked unpack the 27-row form on the fly.
            # Eval uses the compact popcount-bitmap maps when configured
            # ("bitmap" everywhere, "bitmap0" at stage 0 only — where the
            # 345 MB ov map pays the large-operand probe penalty; train
            # keeps ov: the strided custom VJPs' inverse tables probe the
            # maps directly)
            if not packed_layout:
                return _dense_index_rows(grid, dims)
            bm = self.map_format == "bitmap" or (
                self.map_format == "bitmap0" and stage == 0)
            if bm and not train:
                return _bitmap_rows_ov(grid, dims)
            return _dense_rows_ov(grid, dims)

        def subm_table(grid, dims, dense_map):
            if packed_layout:
                return (subm_xpack_tables(grid, dims, dense_ov=dense_map),
                        grid.valid)
            return neighbor_table(grid, dims, dense_rows=dense_map)
        sentinel = self.grid_zyx[0] * self.grid_zyx[1] * self.grid_zyx[2]
        if self.assume_sorted:
            # voxelize_mean emits slots in ascending linear-id order with
            # padding (valid=False) at the end — exactly make_grid's
            # invariant, so both entry argsorts are identity work
            from ..ops.sparse_conv import SparseGrid, linear_ids
            ids = jnp.where(voxel_valid,
                            linear_ids(coords_zyx, self.grid_zyx), sentinel)
            grid = SparseGrid(coords=coords_zyx, ids=ids, valid=voxel_valid)
            x = voxel_feats
        else:
            grid = make_grid(coords_zyx, voxel_valid, self.grid_zyx)
            # re-sort features to the grid's id order
            order = jnp.argsort(
                jnp.where(voxel_valid,
                          (coords_zyx[:, 0] * self.grid_zyx[1]
                           + coords_zyx[:, 1]) * self.grid_zyx[2]
                          + coords_zyx[:, 2], sentinel))
            x = voxel_feats[order]

        dims = self.grid_zyx
        canvas = mask = None          # dense-stage state, once transitioned
        # per-downsample-stage clipped-site counters (stages 1..3): the
        # reference spconv never drops active sites, so any nonzero entry
        # means this forward diverged from reference semantics. Sowed as
        # intermediates "dropped_sites"; callers opt in with
        # mutable=["intermediates"] (a no-op otherwise).
        drops = []

        def to_dense(x, grid, dims):
            c = scatter_dense(jnp.where(grid.valid[:, None], x, 0.0),
                              grid, dims)
            m = scatter_dense(grid.valid[:, None].astype(jnp.float32),
                              grid, dims)[..., 0] > 0
            return c, m

        def bn_dense(name, c, m):
            y = MaskedBatchNorm(axis_name=self.axis_name, name=name)(
                c.reshape(-1, c.shape[-1]), m.reshape(-1), train=train)
            return y.reshape(c.shape)

        # stage 0: subm conv_input + 2 residual blocks (ref :98-107)
        if dense_start <= 0:
            canvas, mask = to_dense(x, grid, dims)
            canvas = DenseConv3d(self.channels[0], use_bias=False,
                                 compute_dtype=self.dense_dtype,
                                 name="conv_input")(canvas)
            canvas = jnp.where(
                mask[..., None],
                nn.relu(bn_dense("bn_input", canvas, mask)), 0.0)
            for j in range(2):
                canvas = DenseBasicBlock(
                    self.channels[0], axis_name=self.axis_name,
                    compute_dtype=self.dense_dtype,
                    name=f"res0_{j}")(canvas, mask, train)
        else:
            # one cell->site map per stage, shared by the stage's subm
            # table and the next stage's strided table
            a0 = stage_algo(0)
            dense_map = make_map(grid, dims, stage=0)
            table = subm_table(grid, dims, dense_map)
            x = SparseConv(self.channels[0], use_bias=False,
                           gather_algo=a0, symmetric=True,
                           name="conv_input")(cast(x), table)
            x = MaskedBatchNorm(axis_name=self.axis_name, name="bn_input")(
                x, grid.valid, train=train)
            x = nn.relu(x)
            for j in range(2):
                x = SparseBasicBlock(self.channels[0],
                                     axis_name=self.axis_name,
                                     gather_algo=a0,
                                     sparse_dtype=self.sparse_dtype,
                                     name=f"res0_{j}")(x, table, grid.valid,
                                                       train)

        # stages 1..3: strided down + 2 residual blocks (ref :109-137).
        # Stage 3 uses z padding 0 (ref conv4 padding=[0,1,1], scn.py:129),
        # giving the reference's 41->21->11->5 depth chain; degenerate tiny
        # z-geometries fall back to pad 1 so the stage stays well-formed.
        for s in range(1, 4):
            pads = (0, 1, 1) if s == 3 else (1, 1, 1)
            if (dims[0] + 2 * pads[0] - 3) // 2 + 1 < 1:
                pads = (1, 1, 1)
            out_dims = tuple((d + 2 * p - 3) // 2 + 1
                             for d, p in zip(dims, pads))
            if s >= dense_start:
                if canvas is None:    # sparse -> dense transition
                    canvas, mask = to_dense(x, grid, dims)
                canvas = DenseConv3d(self.channels[s], use_bias=False,
                                     stride=2, pads=pads,
                                     compute_dtype=self.dense_dtype,
                                     name=f"down{s}")(canvas)
                mask = _mask_downsample(mask, out_dims, pads)
                drops.append(jnp.int32(0))   # dense stages never clip
                canvas = jnp.where(
                    mask[..., None],
                    nn.relu(bn_dense(f"bn_down{s}", canvas, mask)), 0.0)
                dims = out_dims
                for j in range(2):
                    canvas = DenseBasicBlock(
                        self.channels[s], axis_name=self.axis_name,
                        compute_dtype=self.dense_dtype,
                        name=f"res{s}_{j}")(canvas, mask, train)
            else:
                ngrid, ndrop = downsample_coords(grid, out_dims,
                                                 self.vmax[s], pads,
                                                 with_dropped=True)
                drops.append(ndrop)
                a_prev, a_s = stage_algo(s - 1), stage_algo(s)
                # the strided conv reads the PREVIOUS stage's grid/map
                if packed_layout:
                    dtable = (strided_xpack_tables(grid, ngrid, dims,
                                                   dense_ov=dense_map,
                                                   pads=pads),
                              grid.valid)
                else:
                    dtable = strided_gather_table(grid, ngrid, dims,
                                                  dense_rows=dense_map,
                                                  pads=pads)
                ndense_map = make_map(ngrid, out_dims, stage=s)
                # inverse table only feeds the strided conv's custom VJP —
                # skip the build at eval
                inv = strided_inverse_table(grid, out_dims, ndense_map,
                                            ov=packed_layout, pads=pads) \
                    if train else None
                x = SparseConv(self.channels[s], use_bias=False,
                               gather_algo=a_prev,
                               packed_pairs=stage_packed(
                                   self.channels[s - 1], a_prev),
                               name=f"down{s}")(cast(x), dtable, inv)
                x = MaskedBatchNorm(axis_name=self.axis_name,
                                    name=f"bn_down{s}")(
                    x, ngrid.valid, train=train)
                x = nn.relu(x)
                grid, dims = ngrid, out_dims
                dense_map = ndense_map
                table = subm_table(grid, dims, dense_map)
                for j in range(2):
                    x = SparseBasicBlock(self.channels[s],
                                         axis_name=self.axis_name,
                                         gather_algo=a_s,
                                         sparse_dtype=self.sparse_dtype,
                                         packed_pairs=stage_packed(
                                             self.channels[s], a_s),
                                         name=f"res{s}_{j}")(x, table,
                                                             grid.valid,
                                                             train)

        self.sow("intermediates", "dropped_sites", jnp.stack(drops))

        # z-crush (ref extra_conv :140-146 + .dense() reshape :165-168):
        # scatter to dense (Z4, Y4, X4, C) and fold z into channels
        if canvas is None:
            x = jnp.where(grid.valid[:, None], x, 0.0)
            canvas = scatter_dense(x, grid, dims)      # (Z, Y, X, C)
            mask = scatter_dense(grid.valid[:, None].astype(jnp.float32),
                                 grid, dims)[..., 0] > 0
        Z, Y, X, C = canvas.shape
        # active-site mask of the ref extra_conv output ((3,1,1) stride
        # (2,1,1) pad 0 generative rule): the detector's z_crush output must
        # be re-masked with it — ref .dense() leaves those sites exactly 0
        # while a dense BN(0)+ReLU after the folded conv would not be
        if Z >= 3:
            dz = (Z - 3) // 2 + 1
            zmask = jnp.stack([mask[2 * d:2 * d + 3].any(0)
                               for d in range(dz)], -1)      # (Y, X, dz)
        else:
            zmask = mask.any(0)[..., None]
        return canvas.transpose(1, 2, 0, 3).reshape(Y, X, Z * C), zmask
