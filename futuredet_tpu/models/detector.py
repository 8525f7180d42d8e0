"""Detector assembly: points -> BEV features -> RPN -> CenterHead.

TPU-first redesign of ref `det3d/models/detectors/{point_pillars,voxelnet}.py`:
the voxelizer runs *inside* the jitted forward (fused with the network), the
batch dimension is folded into the point dimension for the reader (one big
MXU matmul + one segment reduction instead of per-sample loops), and all
feature maps are NHWC.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from ..ops.voxelize import PointVoxelMap, point_voxel_map
from .backbone2d import RPN
from .center_head import CenterHead
from .layers import ConvBNReLU
from .readers import (PillarFeatureNet, PillarFeatureNetDirect,
                      scatter_to_bev)


def _batched_point_voxel_map(points, points_valid, cfg: ExperimentConfig,
                             max_voxels: int) -> PointVoxelMap:
    """Voxelize a (B, P, F) batch into one flat segment space of
    B*max_voxels slots so downstream segment ops need no batch loop."""
    vm = jax.vmap(lambda p, v: point_voxel_map(
        p, v, jnp.asarray(cfg.voxel.pc_range), jnp.asarray(cfg.voxel.voxel_size),
        grid_size=cfg.voxel.grid_size, max_voxels=max_voxels,
        max_points=cfg.voxel.max_points_per_voxel))(points, points_valid)
    B, P = points.shape[:2]
    offs = (jnp.arange(B, dtype=jnp.int32) * max_voxels)[:, None]
    # dropped points keep the global trash slot B*max_voxels
    slot = jnp.where(vm.valid, vm.slot + offs, B * max_voxels).reshape(-1)
    # run machinery in the flat (B*P)-position space: per-sample run starts
    # shifted by each sample's point offset, final bound = B*P. Valid for
    # segmented_run_sums because (a) each sample's flat positions are
    # contiguous and sample b+1's first run (if any) starts a fresh
    # is_first head at flat position (b+1)*P, (b) run heads of DROPPED
    # voxels (slot capped at max_voxels) are removed below, so the last
    # kept run's scan segment extends over masked-zero positions only —
    # run values must be masked by point validity before the scan, the
    # same contract the per-sample map already has.
    rb = vm.run_bounds + (jnp.arange(B, dtype=jnp.int32) * P)[:, None]
    run_bounds = jnp.concatenate([rb[:, :-1].reshape(-1), rb[-1:, -1]])
    is_first = (vm.is_first & (vm.slot < max_voxels)).reshape(-1)
    return PointVoxelMap(
        slot=slot, rank=vm.rank.reshape(-1), valid=vm.valid.reshape(-1),
        coords=vm.coords.reshape(B * max_voxels, 3),
        num_points=vm.num_points.reshape(-1), num_voxels=vm.num_voxels,
        points=vm.points.reshape(B * P, -1),
        is_first=is_first, run_bounds=run_bounds)


def middle_stage_caps(model_cfg, max_v: int) -> tuple:
    """Sparse middle-encoder stage capacities for a voxelizer budget of
    `max_v` sites. Stage s holds up to middle_growth[s-1] * max_v generative
    sites (measured lidar-scene growth bounds, config.py), ceilinged by the
    absolute middle_vmax. middle_growth=None disables the growth rule and
    honors the configured middle_vmax exactly — explicitly-sized
    (test/oracle) configs must never be re-capped (round-3 regression:
    silent re-capping broke reference-graph parity). Clipping, when it does
    happen, is counted — see `forward_with_drop_counters`."""
    caps = [min(model_cfg.middle_vmax[0], max_v)]
    for s, v in enumerate(model_cfg.middle_vmax[1:], start=1):
        if model_cfg.middle_growth is None:
            caps.append(v)
        else:
            g = model_cfg.middle_growth[s - 1]
            caps.append(min(v, int(math.ceil(g * max_v))))
    return tuple(caps)


class PointPillarsDetector(nn.Module):
    """ref det3d/models/detectors/point_pillars.py + pillar_encoder.py."""
    cfg: ExperimentConfig
    axis_name: Optional[str] = None
    # NamedSharding for the (B, Y, X, C) BEV canvas under GSPMD spatial
    # sharding (parallel.mesh.canvas_sharding); None = no constraint
    canvas_sharding: Optional[Any] = None

    @nn.compact
    def __call__(self, points, points_valid, bev_map=None, train: bool = False,
                 return_bev: bool = False):
        c = self.cfg
        gx, gy, _ = c.voxel.grid_size
        # sortless direct-scatter pillarization (see PillarFeatureNetDirect)
        canvas = PillarFeatureNetDirect(
            num_filters=c.model.pillar_filters,
            voxel_size=c.voxel.voxel_size[:2], pc_range=c.voxel.pc_range,
            grid_hw=(gy, gx),
            pad_floor_cap=(c.voxel.max_points_per_voxel
                           if c.model.pfn_pad_floor else 0),
            axis_name=self.axis_name,
            name="reader")(points, points_valid, train)
        if self.canvas_sharding is not None:
            # XLA SPMD propagates this through the conv tower, inserting
            # halo exchanges for every spatial window
            canvas = jax.lax.with_sharding_constraint(
                canvas, self.canvas_sharding)

        x = RPN(layer_nums=c.model.rpn.layer_nums,
                ds_strides=c.model.rpn.ds_strides,
                ds_filters=c.model.rpn.ds_filters,
                us_strides=c.model.rpn.us_strides,
                us_filters=c.model.rpn.us_filters,
                compute_dtype=c.model.compute_dtype,
                axis_name=self.axis_name, name="neck")(canvas, train)

        preds = CenterHead(cfg=c.model.head, axis_name=self.axis_name,
                           compute_dtype=c.model.compute_dtype,
                           name="head")(x, bev_map=bev_map, train=train)
        # return_bev: expose the neck output for second-stage BEV pooling
        # (ref two_stage.py:170-173 passes bev_feature to the RoI modules)
        return (preds, x) if return_bev else preds


class VoxelNetDetector(nn.Module):
    """VoxelNet path: mean-VFE -> sparse submanifold middle encoder -> RPN ->
    CenterHead (ref det3d/models/detectors/voxelnet.py + scn.py). Set
    cfg.model.middle="dense" for the dense BEV fallback tower."""
    cfg: ExperimentConfig
    axis_name: Optional[str] = None
    canvas_sharding: Optional[Any] = None

    @nn.compact
    def __call__(self, points, points_valid, bev_map=None, train: bool = False,
                 return_bev: bool = False):
        from ..ops.voxelize import voxelize_mean
        from .middle import SparseMiddleEncoder

        c = self.cfg
        if c.model.middle != "sparse":
            return self._dense_path(points, points_valid, bev_map, train,
                                    return_bev)
        B = points.shape[0]
        max_v = c.voxel.max_voxels_train if train else c.voxel.max_voxels_eval
        gx, gy, gz = c.voxel.grid_size

        feats, coords, num_points, _ = jax.vmap(
            lambda p, v: voxelize_mean(
                p, v, jnp.asarray(c.voxel.pc_range),
                jnp.asarray(c.voxel.voxel_size), grid_size=c.voxel.grid_size,
                max_voxels=max_v,
                max_points=c.voxel.max_points_per_voxel))(points, points_valid)
        vvalid = coords[:, :, 0] >= 0

        algo = c.model.middle_gather_algo
        if B > 1 and (algo.startswith("window") or algo == "hybrid"):
            # the Pallas windowed gather's exactness cond degenerates to
            # select-both under vmap — use the plain path when batched
            algo = "loop" if algo.startswith("window") else "stacked"
        caps = middle_stage_caps(c.model, max_v)
        mid_kwargs = dict(
            channels=c.model.middle_channels,
            vmax=tuple(caps),
            grid_zyx=(gz + 1, gy, gx),
            dense_from_stage=c.model.middle_dense_from_stage,
            dense_dtype=(jnp.bfloat16
                         if c.model.middle_dense_dtype == "bfloat16"
                         else None),
            gather_algo=algo,
            map_format=c.model.middle_map_format,
            xpack_max_cin=c.model.middle_xpack_max_cin,
            sparse_dtype=(jnp.bfloat16
                          if c.model.middle_sparse_dtype == "bfloat16"
                          else None),
            # "bf16_packed": bf16-PAIR packed gathers at the Cin=64 stages
            # only (conv_x3_packed win regime) — serving mode, eval-only
            packed_pairs=c.model.middle_sparse_dtype == "bf16_packed",
            # voxelize_mean's slot order IS the grid sort order (same
            # z-major key, padding at the end) — skip the entry argsorts
            assume_sorted=True)
        if B == 1:
            # unbatched fast path: identical param tree (nn.vmap with
            # variable_axes=None does not rename), no vmap wrapper, and
            # BN over one sample needs no batch axis reduction
            enc = SparseMiddleEncoder(**mid_kwargs,
                                      axis_name=self.axis_name,
                                      name="middle")
            x, zmask = enc(feats[0], coords[0], vvalid[0], train)
            x, zmask = x[None], zmask[None]
        else:
            bn_axes = ("batch",) if self.axis_name is None \
                else ("batch", self.axis_name)
            mid = nn.vmap(
                SparseMiddleEncoder,
                in_axes=(0, 0, 0, None), out_axes=0,
                variable_axes={"params": None, "batch_stats": None,
                               "intermediates": 0},
                split_rngs={"params": False}, axis_name="batch",
                methods=["__call__"])(
                    **mid_kwargs, axis_name=bn_axes, name="middle")
            x, zmask = mid(feats, coords, vvalid, train)  # (B, Y8, X8, Z4*128)
        if self.canvas_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, self.canvas_sharding)

        x = ConvBNReLU(c.model.rpn.in_channels, 1, 1, use_bias=False,
                       compute_dtype=c.model.compute_dtype,
                       axis_name=self.axis_name, name="z_crush")(x, train)
        # re-mask with the ref extra_conv's active sites (spconv .dense()
        # zeros them; the dense BN(0)+ReLU above does not). Channel j of the
        # z_crush output carries (c = j // Dz, d = j % Dz) in the reference's
        # C-major .dense() layout (scn.py:165-168) under checkpoint
        # conversion — tile matches d = j % Dz.
        Dz = zmask.shape[-1]
        if x.shape[-1] % Dz == 0:
            x = x * jnp.tile(zmask.astype(x.dtype),
                             (1, 1, 1, x.shape[-1] // Dz))
        else:
            x = x * zmask.any(-1, keepdims=True).astype(x.dtype)

        x = RPN(layer_nums=c.model.rpn.layer_nums,
                ds_strides=c.model.rpn.ds_strides,
                ds_filters=c.model.rpn.ds_filters,
                us_strides=c.model.rpn.us_strides,
                us_filters=c.model.rpn.us_filters,
                compute_dtype=c.model.compute_dtype,
                axis_name=self.axis_name, name="neck")(x, train)
        preds = CenterHead(cfg=c.model.head, axis_name=self.axis_name,
                           compute_dtype=c.model.compute_dtype,
                           name="head")(x, bev_map=bev_map, train=train)
        return (preds, x) if return_bev else preds

    def _dense_path(self, points, points_valid, bev_map, train,
                    return_bev=False):
        c = self.cfg
        B = points.shape[0]
        max_v = c.voxel.max_voxels_train if train else c.voxel.max_voxels_eval
        m = _batched_point_voxel_map(points, points_valid, c, max_v)

        # mean VFE (ref voxel_encoder.py:17-24) over the flat batch
        w = m.valid.astype(points.dtype)[:, None]
        sums = jax.ops.segment_sum(m.points * w, m.slot,
                                   num_segments=B * max_v + 1)[:B * max_v]
        mean_feats = sums / jnp.maximum(m.num_points, 1).astype(points.dtype)[:, None]

        # embed the z-bin by scattering (x,y,z)-voxels into 8 z-groups of a
        # BEV canvas at 1/4 the xy resolution of the raw grid (stride-4 via
        # scatter), then a conv tower applies the remaining stride 2.
        gx, gy, gz = c.voxel.grid_size
        zgroups = 8
        ch0 = 32
        emb = nn.Dense(ch0, name="voxel_embed")(mean_feats)
        coords = m.coords.reshape(B, max_v, 3)   # zyx
        emb = emb.reshape(B, max_v, ch0)

        def scat(e, co):
            z, y, x = co[:, 0], co[:, 1], co[:, 2]
            ok = z >= 0
            ys, xs = y // 4, x // 4
            zg = jnp.clip(z * zgroups // gz, 0, zgroups - 1)
            idx = jnp.where(ok, (zg * (gy // 4) + ys) * (gx // 4) + xs,
                            zgroups * (gy // 4) * (gx // 4))
            canvas = jnp.zeros((zgroups * (gy // 4) * (gx // 4) + 1, ch0), e.dtype)
            canvas = canvas.at[idx].add(jnp.where(ok[:, None], e, 0.0))
            return canvas[:-1].reshape(zgroups, gy // 4, gx // 4, ch0)

        vol = jax.vmap(scat)(emb, coords)                     # (B, Z, H, W, C)
        x = vol.transpose(0, 2, 3, 1, 4).reshape(B, gy // 4, gx // 4,
                                                 zgroups * ch0)
        x = ConvBNReLU(128, 3, 1, use_bias=False, axis_name=self.axis_name,
                       name="mid_conv0")(x, train)
        x = ConvBNReLU(256, 3, 2, use_bias=False, axis_name=self.axis_name,
                       name="mid_conv1")(x, train)            # stride 8 total

        x = RPN(layer_nums=c.model.rpn.layer_nums,
                ds_strides=c.model.rpn.ds_strides,
                ds_filters=c.model.rpn.ds_filters,
                us_strides=c.model.rpn.us_strides,
                us_filters=c.model.rpn.us_filters,
                axis_name=self.axis_name, name="neck")(x, train)

        preds = CenterHead(cfg=c.model.head, axis_name=self.axis_name,
                           name="head")(x, bev_map=bev_map, train=train)
        return (preds, x) if return_bev else preds


def extract_dropped_sites(intermediates) -> Optional[jnp.ndarray]:
    """Pull the middle encoder's per-stage clipped-site counters out of a
    `mutable=["intermediates"]` apply result. Returns a (3,) int array
    (downsample stages 1..3, summed over batch) or None when the forward had
    no sparse middle (pillars / dense path). Zero everywhere == the forward
    kept every active site, i.e. reference spconv semantics
    (scn.py:109-146 never drops)."""
    found: list = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "dropped_sites":
                    found.extend(v if isinstance(v, (tuple, list)) else [v])
                else:
                    walk(v)

    walk(intermediates)
    if not found:
        return None
    import numpy as np
    tot = np.zeros(3, np.int64)
    for f in found:
        a = np.asarray(f)
        tot += a.reshape(-1, a.shape[-1]).sum(0)  # sum any batch dims
    return tot


def forward_with_drop_counters(model, variables, points, points_valid,
                               **kwargs):
    """model.apply that also returns the sparse middle encoder's per-stage
    dropped-site counters (None for models without one). Works under
    train=True too (BN stat updates are collected and discarded)."""
    mutable = ["intermediates"]
    if kwargs.get("train"):
        mutable.append("batch_stats")
    preds, mut = model.apply(variables, points, points_valid,
                             mutable=mutable, **kwargs)
    return preds, extract_dropped_sites(mut.get("intermediates", {}))


def build_detector(cfg: ExperimentConfig, axis_name: Optional[str] = None,
                   canvas_sharding=None):
    if cfg.model.two_stage_refine:
        from .two_stage import TwoStageDetector
        return TwoStageDetector(cfg=cfg, axis_name=axis_name,
                                canvas_sharding=canvas_sharding)
    return build_single_stage(cfg, axis_name, canvas_sharding)


def build_single_stage(cfg: ExperimentConfig,
                       axis_name: Optional[str] = None,
                       canvas_sharding=None, name: Optional[str] = None):
    kw = {} if name is None else {"name": name}
    if cfg.model.detector == "pointpillars":
        return PointPillarsDetector(cfg=cfg, axis_name=axis_name,
                                    canvas_sharding=canvas_sharding, **kw)
    return VoxelNetDetector(cfg=cfg, axis_name=axis_name,
                            canvas_sharding=canvas_sharding, **kw)
