"""Per-stage active-site occupancy of the sparse middle encoder across
scene families. Informs the shipped growth bounds (`middle_growth`,
config.py): capacities above true occupancy are pure gather/table padding,
capacities below it CLIP (counted by the dropped-site counters, but honest
numbers need zero). The sweep prints per-stage growth RELATIVE TO THE
VOXELIZER CAP — the quantity middle_growth bounds — for:

  uniform     isolated uniform-area points (non-physical worst case)
  spread      ~1/r isolated points (pre-round-3 "realistic", non-physical)
  lidar       structured scan-lines/arcs/walls (the realistic bench scene)
  urban       lidar stats, dense: many near objects + heavy wall clutter
  highway     lidar stats, sparse: few distant objects, thin background
  gtaug       lidar stats + heavy paste augmentation (128 objects — the
              GT-AUG worst case, sample_groups sum ~30/scene in configs)

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/occupancy.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scene_family(cfg, name, P, seed=7):
    from futuredet_tpu.data.synthetic import make_family_scene, make_scene
    if name == "uniform":
        rng = np.random.default_rng(seed)
        lo, hi = cfg.voxel.pc_range[0], cfg.voxel.pc_range[3]
        pts = np.concatenate([
            rng.uniform(lo, hi, (P, 2)), rng.uniform(-4, 2, (P, 1)),
            rng.uniform(0, 1, (P, 2))], -1).astype(np.float32)
        return pts, np.ones((P,), bool)
    if name == "spread":
        sc = make_scene(cfg, n_objects=48, points_per_object=500,
                        n_clutter=P, seed=seed, max_objs=500,
                        clutter_mode="spread")
    else:
        sc = make_family_scene(cfg, name, P, seed)
    return sc.points, sc.points_valid


def main():
    import jax
    import jax.numpy as jnp
    from futuredet_tpu.config import get_config
    from futuredet_tpu.ops.sparse_conv import downsample_coords, make_grid
    from futuredet_tpu.ops.voxelize import voxelize_mean

    cfg = get_config("forecast_n3dtf")
    cfg = cfg.replace(voxel=dataclasses.replace(
        cfg.voxel, max_points=150000, max_voxels_eval=30000))
    P = cfg.voxel.max_points
    gx, gy, gz = cfg.voxel.grid_size
    max_v = cfg.voxel.max_voxels_eval

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
        # show true generative occupancy with zero drops
        caps = [max_v, 4 * max_v, 4 * max_v, 4 * max_v]
        for s in range(1, 4):
            pads = (0, 1, 1) if s == 3 else (1, 1, 1)
            out_dims = tuple((d + 2 * p - 3) // 2 + 1
                             for d, p in zip(dims, pads))
            grid, dropped = downsample_coords(grid, out_dims, caps[s], pads,
                                              with_dropped=True)
            dims = out_dims
            counts.append(jnp.sum(grid.valid) + dropped)
        return jnp.stack(counts)

    vs = np.asarray(cfg.voxel.voxel_size)
    pr = np.asarray(cfg.voxel.pc_range)
    names = ("uniform", "spread", "lidar", "urban", "highway", "gtaug")
    seeds = tuple(int(s) for s in os.environ.get(
        "OCC_SEEDS", "7,19,31").split(","))
    gmax = np.zeros(3)
    print(f"voxelizer cap {max_v}; growth = stage sites / cap", flush=True)
    for name in names:
        for seed in seeds:
            pts, v = scene_family(cfg, name, P, seed)
            q = pts[v]
            cells = np.floor((q[:, :3] - pr[None, :3]) / vs[None, :]).astype(
                np.int64)
            inb = np.all((cells >= 0) & (cells < np.array(
                [gx, gy, gz + 1])[None]), -1)
            cells = cells[inb]
            ids = (cells[:, 2] * gy + cells[:, 1]) * gx + cells[:, 0]
            true_vox = len(np.unique(ids))
            c = np.asarray(jax.device_get(stage_counts(
                jnp.asarray(pts), jnp.asarray(v))))
            growth = c[1:] / max_v
            if name not in ("uniform", "spread"):   # physical families only
                gmax = np.maximum(gmax, growth)
            print(f"{name:8s} seed {seed:3d}: true voxels {true_vox:7d} "
                  f"(vox drop {max(0.0, 1 - max_v / max(true_vox, 1)):4.0%}); "
                  f"sites {list(map(int, c))}; "
                  f"growth {np.round(growth, 3)}", flush=True)
    print(f"\nmax PHYSICAL growth over families/seeds: {np.round(gmax, 3)}")
    print("shipped middle_growth must be >= this + margin "
          "(config.py middle_growth)")


if __name__ == "__main__":
    main()
