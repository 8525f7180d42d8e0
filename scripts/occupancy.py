"""Per-stage active-site occupancy of the sparse middle encoder, uniform vs
realistic clustered scenes. Informs the eval stage-capacity (middle_vmax)
choices: capacities above true occupancy are pure gather/table padding.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/occupancy.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from futuredet_tpu.config import get_config
    from futuredet_tpu.data.synthetic import make_scene
    from futuredet_tpu.ops.sparse_conv import downsample_coords, make_grid
    from futuredet_tpu.ops.voxelize import voxelize_mean

    cfg = get_config("forecast_n3dtf")
    cfg = cfg.replace(voxel=dataclasses.replace(
        cfg.voxel, max_points=150000, max_voxels_eval=30000))
    P = cfg.voxel.max_points
    gx, gy, gz = cfg.voxel.grid_size
    max_v = cfg.voxel.max_voxels_eval

    rng = np.random.default_rng(0)
    lo, hi = cfg.voxel.pc_range[0], cfg.voxel.pc_range[3]
    uniform = np.concatenate([
        rng.uniform(lo, hi, (P, 2)), rng.uniform(-4, 2, (P, 1)),
        rng.uniform(0, 1, (P, 2))], -1).astype(np.float32)
    sc_spread = make_scene(cfg, n_objects=48, points_per_object=500,
                           n_clutter=P, seed=7, max_objs=500,
                           clutter_mode="spread")
    sc_lidar = make_scene(cfg, n_objects=48, points_per_object=500,
                          n_clutter=P, seed=7, max_objs=500,
                          clutter_mode="lidar")

    @jax.jit
    def stage_counts(pts, valid):
        feats, coords, num_points, _ = voxelize_mean(
            pts, valid, jnp.asarray(cfg.voxel.pc_range),
            jnp.asarray(cfg.voxel.voxel_size), grid_size=cfg.voxel.grid_size,
            max_voxels=max_v, max_points=cfg.voxel.max_points_per_voxel)
        vvalid = coords[:, 0] >= 0
        dims = (gz + 1, gy, gx)
        grid = make_grid(coords, vvalid, dims)
        counts = [jnp.sum(grid.valid)]
        # generous fixed caps (not the configured budget) so the numbers
        # show true generative occupancy; the printout asserts counts stay
        # well below these, i.e. nothing was dropped. (Literal 8x-prev
        # compounding caps reach 15M sites at stage 3 and take minutes to
        # sort on the tunneled chip.)
        caps = [max_v, 4 * max_v, 4 * max_v, 4 * max_v]
        for s in range(1, 4):
            pads = (0, 1, 1) if s == 3 else (1, 1, 1)
            out_dims = tuple((d + 2 * p - 3) // 2 + 1
                             for d, p in zip(dims, pads))
            grid = downsample_coords(grid, out_dims, caps[s], pads)
            dims = out_dims
            counts.append(jnp.sum(grid.valid))
        return jnp.stack(counts)

    vs = np.asarray(cfg.voxel.voxel_size)
    pr = np.asarray(cfg.voxel.pc_range)
    for name, pts, v in (("uniform", uniform, np.ones((P,), bool)),
                         ("spread", sc_spread.points, sc_spread.points_valid),
                         ("lidar", sc_lidar.points, sc_lidar.points_valid)):
        # true occupied-cell count before the voxelizer cap (host numpy)
        q = pts[v]
        cells = np.floor((q[:, :3] - pr[None, :3]) / vs[None, :]).astype(
            np.int64)
        inb = np.all((cells >= 0) & (cells < np.array(
            [gx, gy, gz + 1])[None]), -1)
        cells = cells[inb]
        ids = (cells[:, 2] * gy + cells[:, 1]) * gx + cells[:, 0]
        true_vox = len(np.unique(ids))
        c = np.asarray(jax.device_get(stage_counts(jnp.asarray(pts),
                                                   jnp.asarray(v))))
        print(f"{name:10s} true voxels {true_vox:7d} (cap {max_v}, "
              f"drop {max(0.0, 1 - max_v / max(true_vox, 1)):.0%}); "
              f"stage sites: {list(map(int, c))}")


if __name__ == "__main__":
    main()
