"""On-device hard voxelization / pillarization — fixed shapes, one sort.

TPU-native replacement for the reference's numba CPU voxelizer
(`/root/reference/det3d/ops/point_cloud/point_cloud_ops.py:8-62,160-209`),
which runs in DataLoader worker processes. Here the whole computation is a
single fused XLA program on device:

  point -> voxel id (floor-div)  ->  stable sort by id  ->  run boundaries
  -> per-point (voxel slot, rank within voxel)  ->  scatter into fixed buffers

Semantics parity with the reference kernel:
  * a point participates iff all 3 coords are inside the grid
  * at most `max_points` points kept per voxel, first-come-first-serve in the
    incoming point order (stable sort preserves this within a voxel)
  * at most `max_voxels` voxels kept (reference keeps first-appearance order;
    we keep ascending-voxel-id order — the *set* semantics used downstream are
    identical, validated against the numpy oracle in tests)
  * returned coords are zyx ("reverse_index", ref :40)

All outputs are padded to static shapes with a validity count.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class VoxelData(NamedTuple):
    voxels: jax.Array        # (max_voxels, max_points, F) padded with zeros
    coords: jax.Array        # (max_voxels, 3) int32 zyx, -1 padded
    num_points: jax.Array    # (max_voxels,) int32
    num_voxels: jax.Array    # () int32


class PointVoxelMap(NamedTuple):
    """Per-point mapping — the fused path used by pillar/VFE readers.

    Avoids materializing the (V, K, F) buffer: readers run big (P, C) matmuls
    over all points and segment-reduce into voxel slots (MXU-friendly).
    """
    slot: jax.Array        # (P,) int32 voxel slot per point; max_voxels if dropped
    rank: jax.Array        # (P,) int32 FCFS rank of the point within its voxel
    valid: jax.Array       # (P,) bool point kept (in range, slot+rank in budget)
    coords: jax.Array      # (max_voxels, 3) int32 zyx, -1 padded
    num_points: jax.Array  # (max_voxels,) int32 (capped at max_points)
    num_voxels: jax.Array  # () int32
    points: jax.Array      # (P, F) the points, sorted by voxel slot
    is_first: jax.Array    # (P,) bool run head in the sorted order
    run_bounds: jax.Array  # (max_voxels + 1,) int32 run start positions
    #   in the sorted order (P-clamped); entry v+1 - 1 is the inclusive end
    #   of voxel v's run — used by the segmented-scan reductions below


def _compute_coords(points, pc_range, voxel_size, grid_size):
    """Integer xyz cell per point + in-grid mask."""
    rmin = jnp.asarray(pc_range[:3], points.dtype)
    vs = jnp.asarray(voxel_size, points.dtype)
    c = jnp.floor((points[:, :3] - rmin) / vs).astype(jnp.int32)
    gs = jnp.asarray(grid_size, jnp.int32)
    inb = jnp.all((c >= 0) & (c < gs), axis=1)
    return c, inb


def _grid(pc_range, voxel_size):
    return tuple(int(round((pc_range[3 + i] - pc_range[i]) / voxel_size[i]))
                 for i in range(3))


@partial(jax.jit, static_argnames=("grid_size", "max_voxels", "max_points"))
def point_voxel_map(points, point_valid, pc_range, voxel_size, *,
                    grid_size: Tuple[int, int, int],
                    max_voxels: int, max_points: int) -> PointVoxelMap:
    """Core sort-based mapping. points: (P, F); point_valid: (P,) bool."""
    P = points.shape[0]
    gx, gy, gz = grid_size
    cxyz, inb = _compute_coords(points, pc_range, voxel_size, grid_size)
    ok = inb & point_valid

    # linear voxel id (z-major, matching zyx reverse coords); invalid -> sentinel
    vid = (cxyz[:, 2] * gy + cxyz[:, 1]) * gx + cxyz[:, 0]
    sentinel = gx * gy * gz
    vid = jnp.where(ok, vid, sentinel)

    # stable sort by voxel id keeps FCFS order within each voxel.
    # (Carrying the point columns as lax.sort payload operands measures
    # the same as the bare argsort in ISOLATION (~0.47 ms incl. 5
    # payloads) and should delete the 0.9 ms `points[order]` row gather —
    # but the e2e A/B is 3.6 sweeps/s WORSE on both scenes: in-graph the
    # multi-operand sort defeats surrounding fusion. Round-5 ledger.)
    order = jnp.argsort(vid, stable=True)
    svid = vid[order]
    spts = points[order]
    sok = svid < sentinel

    ar = jnp.arange(P, dtype=jnp.int32)
    is_first = sok & jnp.concatenate([jnp.ones((1,), bool), svid[1:] != svid[:-1]])
    slot = jnp.cumsum(is_first.astype(jnp.int32)) - 1          # (P,)
    # start index of each run -> rank within voxel
    start = jax.lax.cummax(jnp.where(is_first, ar, -1))
    rank = ar - start

    keep = sok & (slot < max_voxels) & (rank < max_points)
    slot_c = jnp.where(keep, slot, max_voxels)

    # per-voxel coords (zyx): compact the run-first positions by SORT
    # (TPU scatters are issue-bound at ~12 ns/row — a P-length scatter with
    # mostly-trash indices cost ~1.8 ms; a single-key int32 sort + V-row
    # gather is ~2x cheaper)
    # one extra entry so the last KEPT voxel's run end is the start of the
    # first DROPPED voxel (slots are assigned in sorted order, so kept runs
    # form a prefix and overflow voxels follow)
    pad_n = max(max_voxels + 1 - P, 0) + 1   # static; covers P <= max_voxels
    first_pos1 = jnp.sort(jnp.concatenate(
        [jnp.where(is_first, ar, P),
         jnp.full((pad_n,), P, ar.dtype)]))[:max_voxels + 1]
    first_pos = first_pos1[:max_voxels]
    got = first_pos < P
    fp = jnp.minimum(first_pos, P - 1)
    first_vid = svid[fp]
    cz = first_vid // (gx * gy)
    cy = (first_vid // gx) % gy
    cx = first_vid % gx
    coords = jnp.where(got[:, None],
                       jnp.stack([cz, cy, cx], -1).astype(jnp.int32), -1)

    # per-voxel counts from run boundaries (no per-point segment scatter):
    # count = min(run_length, max_points)
    n_ok = jnp.sum(sok.astype(jnp.int32))
    run_end = jnp.minimum(first_pos1[1:], n_ok)
    num_points = jnp.where(
        got, jnp.minimum(run_end - first_pos, max_points), 0).astype(jnp.int32)
    num_voxels = jnp.minimum(jnp.sum(is_first.astype(jnp.int32)), max_voxels)

    return PointVoxelMap(slot=slot_c, rank=rank, valid=keep, coords=coords,
                         num_points=num_points, num_voxels=num_voxels,
                         points=spts, is_first=is_first,
                         run_bounds=first_pos1)


@partial(jax.jit, static_argnames=("grid_size", "max_voxels", "max_points"))
def voxelize(points, point_valid, pc_range, voxel_size, *,
             grid_size: Tuple[int, int, int],
             max_voxels: int, max_points: int) -> VoxelData:
    """Padded (V, K, F) buffers — parity layout with the reference kernel."""
    m = point_voxel_map(points, point_valid, pc_range, voxel_size,
                        grid_size=grid_size, max_voxels=max_voxels,
                        max_points=max_points)
    F = points.shape[1]
    flat_idx = jnp.where(m.valid, m.slot * max_points + m.rank,
                         max_voxels * max_points)
    voxels = jnp.zeros((max_voxels * max_points + 1, F), points.dtype)
    voxels = voxels.at[flat_idx].set(
        jnp.where(m.valid[:, None], m.points, 0.0))[:-1]
    voxels = voxels.reshape(max_voxels, max_points, F)
    return VoxelData(voxels=voxels, coords=m.coords, num_points=m.num_points,
                     num_voxels=m.num_voxels)


@partial(jax.jit, static_argnames=("grid_size", "max_voxels", "max_points"))
def voxelize_mean(points, point_valid, pc_range, voxel_size, *,
                  grid_size: Tuple[int, int, int],
                  max_voxels: int, max_points: int):
    """Fused mean-VFE: per-voxel mean features without the (V, K, F) buffer.

    Equivalent to reference VoxelFeatureExtractorV3
    (`det3d/models/readers/voxel_encoder.py:17-24`) applied to the hard
    voxelizer's output: mean over the <=max_points kept points of each voxel.
    Returns (features (V, F), coords, num_points, num_voxels).
    """
    m = point_voxel_map(points, point_valid, pc_range, voxel_size,
                        grid_size=grid_size, max_voxels=max_voxels,
                        max_points=max_points)
    feats = segmented_run_sums(
        jnp.where(m.valid[:, None], m.points, 0.0), m.is_first, m.run_bounds,
        max_run=max_points)
    denom = jnp.maximum(m.num_points, 1).astype(points.dtype)[:, None]
    return feats / denom, m.coords, m.num_points, m.num_voxels


def segmented_run_sums(values, is_first, run_bounds, max_run=None):
    """Per-run sums of `values` (P, F) whose runs are CONTIGUOUS in the
    leading axis (run v = positions [run_bounds[v], run_bounds[v+1] - 1]),
    via one inclusive segmented scan + a boundary gather.

    Replaces `segment_sum` on the sorted voxelizer output: a P-row TPU
    scatter-add issues ~12-18 ns per row (1.4 ms at P=150k) while the
    segmented scan streams. Unlike a plain-cumsum difference (whose fp32
    error scales with the GLOBAL prefix magnitude — ~1 absolute at 150k
    points), the segmented scan's partial sums never leave the run, so
    accuracy matches per-voxel pairwise summation. Empty runs return 0.

    max_run: when every run's NONZERO prefix is bounded (the voxelizer
    masks ranks >= max_points to 0, so only the first `max_points`
    positions of a run can be nonzero), pass that bound to run a
    FIXED-DEPTH Hillis-Steele segmented scan (ceil(log2(max_run)) shifted
    masked adds) instead of the full log2(P)-depth associative scan, and
    read each run's sum at min(start + max_run - 1, end) — identical
    result, ~5x cheaper at P=150k/max_run=10 (the scan was ~2.4 ms of
    voxelize_mean's 3.3, scripts/probe_reader.py)."""
    P = values.shape[0]
    V = run_bounds.shape[0] - 1
    got = run_bounds[1:] > run_bounds[:-1]
    ends = jnp.clip(run_bounds[1:] - 1, 0, P - 1)

    if max_run is None:
        def comb(a, b):
            sa, fa = a
            sb, fb = b
            return jnp.where(fb[:, None], sb, sa + sb), fa | fb

        sums, _ = jax.lax.associative_scan(comb, (values, is_first))
        return jnp.where(got[:V, None], sums[ends][:V], 0.0)

    s, f = values, is_first
    d = 1
    while d < max_run:
        # combine window (i-d, i] with the window ending at i-d: a
        # boundary inside the current window (f) truncates the sum
        s = s + jnp.where(
            f[:, None], 0.0,
            jnp.concatenate([jnp.zeros((d, s.shape[1]), s.dtype),
                             s[:-d]], 0))
        f = f | jnp.concatenate([jnp.ones((d,), bool), f[:-d]])
        d *= 2
    # window now covers >= max_run positions; every nonzero contribution
    # of run v sits in [start, start + max_run - 1]
    read_at = jnp.minimum(
        jnp.clip(run_bounds[:-1], 0, P - 1) + max_run - 1, ends)
    return jnp.where(got[:V, None], s[read_at][:V], 0.0)


# ---------------------------------------------------------------------------
# numpy oracle — exact port of the reference numba kernel (tests only)
# ---------------------------------------------------------------------------

def points_to_voxel_np(points, voxel_size, coors_range, max_points=35,
                       max_voxels=20000):
    """Loop port of _points_to_voxel_reverse_kernel (ref :8-55)."""
    voxel_size = np.asarray(voxel_size, points.dtype)
    coors_range = np.asarray(coors_range, points.dtype)
    grid_size = np.round((coors_range[3:] - coors_range[:3]) / voxel_size
                         ).astype(np.int32)
    shape_zyx = tuple(grid_size[::-1].tolist())
    num_points_per_voxel = np.zeros((max_voxels,), np.int32)
    coor_to_voxelidx = -np.ones(shape_zyx, np.int32)
    voxels = np.zeros((max_voxels, max_points, points.shape[-1]), points.dtype)
    coors = np.zeros((max_voxels, 3), np.int32)
    voxel_num = 0
    for i in range(points.shape[0]):
        coor = np.zeros(3, np.int32)
        failed = False
        for j in range(3):
            c = np.floor((points[i, j] - coors_range[j]) / voxel_size[j])
            if c < 0 or c >= grid_size[j]:
                failed = True
                break
            coor[2 - j] = c
        if failed:
            continue
        voxelidx = coor_to_voxelidx[coor[0], coor[1], coor[2]]
        if voxelidx == -1:
            voxelidx = voxel_num
            if voxel_num >= max_voxels:
                continue
            voxel_num += 1
            coor_to_voxelidx[coor[0], coor[1], coor[2]] = voxelidx
            coors[voxelidx] = coor
        num = num_points_per_voxel[voxelidx]
        if num < max_points:
            voxels[voxelidx, num] = points[i]
            num_points_per_voxel[voxelidx] += 1
    return (voxels[:voxel_num], coors[:voxel_num],
            num_points_per_voxel[:voxel_num])
