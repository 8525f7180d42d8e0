"""Cost decomposition of the sparse middle encoder at HONEST capacities.

The generative strided-conv rule (spconv parity) expands a 30k-voxel
realistic bench scene to ~108k/78k/26k active sites at stages 1/2/3
(scripts/occupancy.py) — far above the round-2 caps (60k/30k/16k), which
were silently dropping ~45% of stage-1 sites. This probe times every
pipeline piece at capacities that cover the true occupancy, on the actual
realistic-scene site sets, to find where the 550-sweeps/s budget
(36.4 ms/sample e2e) breaks.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_honest.py
"""
from __future__ import annotations

import dataclasses
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = tuple(int(x) for x in os.environ.get(
    # default = shipped growth-rule caps (middle_stage_caps at 30k voxels,
    # middle_growth (1.8, 1.05, 0.70))
    "PROBE_CAPS", "30000,54000,31500,21000").split(","))
XPACK_MAX_CIN = int(os.environ.get("PROBE_XPACK_CIN", "64"))
SCENE = os.environ.get("PROBE_SCENE", "lidar")
# iters>=100 keeps the ~40 ms fixed tunnel dispatch below 0.4 ms
# of phantom per measurement (ROADMAP measurement discipline)
ITERS = int(os.environ.get("PROBE_ITERS", "100"))


def main():
    import jax
    import jax.numpy as jnp

    from _timing import chain_ms, chain_ms_args, enable_compilation_cache
    enable_compilation_cache()

    from futuredet_tpu.config import get_config
    from futuredet_tpu.data.synthetic import make_scene
    from futuredet_tpu.ops import sparse_conv as SC
    from futuredet_tpu.ops.voxelize import voxelize_mean

    cfg = get_config("forecast_n3dtf")
    cfg = cfg.replace(voxel=dataclasses.replace(
        cfg.voxel, max_points=150000, max_voxels_eval=30000))
    gx, gy, gz = cfg.voxel.grid_size
    dims0 = (gz + 1, gy, gx)
    P = cfg.voxel.max_points
    sc = make_scene(cfg, n_objects=48, points_per_object=500, n_clutter=P,
                    seed=7, max_objs=500, clutter_mode=SCENE)

    @jax.jit
    def prep(pts, valid):
        feats, coords, num_points, _ = voxelize_mean(
            pts, valid, jnp.asarray(cfg.voxel.pc_range),
            jnp.asarray(cfg.voxel.voxel_size), grid_size=cfg.voxel.grid_size,
            max_voxels=CAPS[0], max_points=cfg.voxel.max_points_per_voxel)
        vvalid = coords[:, 0] >= 0
        return SC.make_grid(coords, vvalid, dims0)

    grid0 = prep(jnp.asarray(sc.points), jnp.asarray(sc.points_valid))

    # build the honest-capacity grid chain once
    grids, dims_list = [grid0], [dims0]
    dims = dims0
    g = grid0
    for s in range(1, 4):
        pads = (0, 1, 1) if s == 3 else (1, 1, 1)
        out_dims = tuple((d + 2 * p - 3) // 2 + 1
                         for d, p in zip(dims, pads))
        g = jax.jit(functools.partial(
            SC.downsample_coords, out_dims=out_dims, max_out=CAPS[s],
            pads=pads))(g)
        grids.append(g)
        dims_list.append(out_dims)
        dims = out_dims
        print(f"stage {s}: sites={int(jnp.sum(g.valid))} cap={CAPS[s]} "
              f"dims={out_dims}", flush=True)

    rng = np.random.default_rng(0)
    chans = (16, 32, 64, 128)

    total = 0.0

    def rec(label, ms, mult=1):
        nonlocal total
        total += ms * mult
        print(f"  {label:34s} {ms:7.2f} ms x{mult} = {ms*mult:7.2f}",
              flush=True)

    for s in range(4):
        g, dims = grids[s], dims_list[s]
        V, C = g.ids.shape[0], chans[s]
        print(f"-- stage {s}: V={V} C={C} dims={dims}", flush=True)
        cf = g.coords.astype(jnp.float32)

        # overlapped dense map build (shared: subm tables + next strided)
        t_map = chain_ms(lambda c: SC._dense_rows_ov(
            SC.SparseGrid(c.astype(jnp.int32), g.ids, g.valid),
            dims).astype(jnp.float32)[:4], cf, iters=ITERS)
        rec("dense_rows_ov", t_map)
        dense_ov = jax.jit(functools.partial(
            SC._dense_rows_ov, dims=dims))(g)

        # subm xpack table build (map passed as an ARG: the stage-0 map is
        # 345 MB and as a closure constant trips the tunnel's compile-
        # request body limit)
        t_tab = chain_ms_args(
            lambda c, dov: SC.subm_xpack_tables(
                SC.SparseGrid(c.astype(jnp.int32), g.ids, g.valid),
                dims, dense_ov=dov).astype(jnp.float32),
            (cf, dense_ov), iters=ITERS)
        rec("subm_xpack_tables", t_tab)
        ptab = jax.jit(lambda g, dov: SC.subm_xpack_tables(
            g, dims, dense_ov=dov))(g, dense_ov)

        # conv: xpack for C<=XPACK_MAX_CIN, stacked otherwise (config policy)
        feats = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(27, C, C)).astype(np.float32) * 0.1)
        if C <= XPACK_MAX_CIN:
            t_conv = chain_ms(lambda x: SC.conv_x3(
                x, ptab, g.valid, w), feats, iters=ITERS)
            rec("conv_x3 (subm)", t_conv, 5)
        else:
            tab27 = jax.jit(functools.partial(
                SC.unpack_xpack_tables, V=V))(ptab)
            t_conv = chain_ms(lambda x: SC._gather_conv(
                x, tab27, w, None, jnp.float32, "stacked"), feats, iters=ITERS)
            rec("stacked conv (subm)", t_conv, 5)

        if s < 3:
            pads = (0, 1, 1) if s + 1 == 3 else (1, 1, 1)
            ndims = dims_list[s + 1]
            ng = grids[s + 1]
            # downsample (the 8V candidate sort at this stage's V)
            t_dn = chain_ms(lambda c: SC.downsample_coords(
                SC.SparseGrid(c.astype(jnp.int32), g.ids, g.valid),
                ndims, CAPS[s + 1], pads).coords.astype(jnp.float32),
                cf, iters=ITERS)
            rec("downsample_coords", t_dn)
            # strided xpack table (probes this stage's dense map)
            t_st = chain_ms_args(
                lambda c, dov: SC.strided_xpack_tables(
                    SC.SparseGrid(c.astype(jnp.int32), g.ids, g.valid), ng,
                    dims, dense_ov=dov, pads=pads).astype(jnp.float32),
                (cf, dense_ov), iters=ITERS)
            rec("strided_xpack_tables", t_st)

    print(f"TOTAL (middle, honest caps): {total:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
