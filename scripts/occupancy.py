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
    sc = make_scene(cfg, n_objects=48, points_per_object=500, n_clutter=P,
                    seed=7, max_objs=500, radial_clutter=True)

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
        # UNCAPPED (8x prev) so the numbers show true generative occupancy,
        # not the configured budget
        caps, prev = [max_v], max_v
        for _ in range(1, 4):
            caps.append(8 * prev)
            prev = caps[-1]
        for s in range(1, 4):
            pads = (0, 1, 1) if s == 3 else (1, 1, 1)
            out_dims = tuple((d + 2 * p - 3) // 2 + 1
                             for d, p in zip(dims, pads))
            grid = downsample_coords(grid, out_dims, caps[s], pads)
            dims = out_dims
            counts.append(jnp.sum(grid.valid))
        return jnp.stack(counts)

    for name, pts in (("uniform", uniform), ("realistic", sc.points)):
        v = np.ones((P,), bool) if name == "uniform" else sc.points_valid
        c = np.asarray(jax.device_get(stage_counts(jnp.asarray(pts),
                                                   jnp.asarray(v))))
        print(f"{name:10s} stage sites: {list(map(int, c))}")


if __name__ == "__main__":
    main()
