"""bf16 sparse-conv probe: does halving gather payload bytes pay on v5e?

Times conv_x3 (x-packed) and the stacked gather conv at each middle-encoder
stage geometry in fp32 vs bf16 features (weights cast to match; accumulation
stays fp32 via preferred_element_type). Gathers are the voxelnet middle
encoder's dominant cost (ROADMAP), and they are bandwidth/issue bound with a
WIDTH-dependent rate — fp32 x-packed rows at Cin=32 are 384 B (~120-160 GB/s
class), bf16 drops them to 192 B (~80-120 GB/s class): bytes halve, rate
drops, the net is an empirical question per stage.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bf16_conv.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools

import numpy as np

# per-stage capacities (lidar-honest: see occupancy.py)
CAPS = (30000, 48000, 30000, 20000)
CHANS = (16, 32, 64, 128)


def main():
    import jax
    import jax.numpy as jnp

    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.config import get_config
    from futuredet_tpu.data.synthetic import make_scene
    from futuredet_tpu.ops import sparse_conv as SC
    from futuredet_tpu.ops.voxelize import voxelize_mean

    # REAL lidar-scene stage grids: probe tables must have the true hit
    # density and adjacency — random isolated cells make nearly every
    # neighbor probe miss, so all 27 gathers fetch the hot padding row and
    # the conv times ~2.5x too fast
    cfg = get_config("forecast_n3dtf")
    cfg = cfg.replace(voxel=dataclasses.replace(
        cfg.voxel, max_points=150000, max_voxels_eval=CAPS[0]))
    gx, gy, gz = cfg.voxel.grid_size
    sc = make_scene(cfg, n_objects=48, points_per_object=500,
                    n_clutter=cfg.voxel.max_points, seed=7, max_objs=500,
                    clutter_mode="lidar")

    @jax.jit
    def prep(pts, valid):
        feats, coords, num_points, _ = voxelize_mean(
            pts, valid, jnp.asarray(cfg.voxel.pc_range),
            jnp.asarray(cfg.voxel.voxel_size), grid_size=cfg.voxel.grid_size,
            max_voxels=CAPS[0], max_points=cfg.voxel.max_points_per_voxel)
        return SC.make_grid(coords, coords[:, 0] >= 0, (gz + 1, gy, gx))

    grid = prep(jnp.asarray(sc.points), jnp.asarray(sc.points_valid))
    dims = (gz + 1, gy, gx)
    grids, dims_list = [grid], [dims]
    for s in range(1, 4):
        pads = (0, 1, 1) if s == 3 else (1, 1, 1)
        out_dims = tuple((d + 2 * p - 3) // 2 + 1
                         for d, p in zip(dims, pads))
        grid = jax.jit(functools.partial(
            SC.downsample_coords, out_dims=out_dims, max_out=CAPS[s],
            pads=pads))(grid)
        grids.append(grid)
        dims_list.append(out_dims)
        dims = out_dims

    rng = np.random.default_rng(0)
    for s in range(4):
        g, dims, C = grids[s], dims_list[s], CHANS[s]
        V = g.ids.shape[0]
        valid = g.valid
        dov = jax.jit(lambda gr: SC._dense_rows_ov(gr, dims))(g)
        ptab = jax.jit(lambda gr, d: SC.subm_xpack_tables(gr, dims,
                                                          dense_ov=d))(
            g, dov)
        tab27 = jax.jit(lambda p: SC.unpack_xpack_tables(p, V=V))(ptab)
        feats = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(27, C, C)).astype(np.float32) * 0.1)

        res = {}
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            fd, wd = feats.astype(dt), w.astype(dt)
            res[f"x3_{name}"] = chain_ms(
                lambda a: SC.conv_x3(a, ptab, valid, wd).astype(dt), fd,
                iters=100)
            res[f"st_{name}"] = chain_ms(
                lambda a: SC._gather_conv(a, tab27, wd, None, dt,
                                          "stacked").astype(dt), fd,
                iters=100)
        print(f"V={V:6d} C={C:3d}: "
              f"x3 f32 {res['x3_f32']:5.2f} bf16 {res['x3_bf16']:5.2f} | "
              f"stacked f32 {res['st_f32']:5.2f} bf16 {res['st_bf16']:5.2f}",
              flush=True)


if __name__ == "__main__":
    main()
