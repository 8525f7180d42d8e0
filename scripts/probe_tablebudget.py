"""Decompose the middle encoder's eval-time table budget at bench geometry:
replicate exactly the table/map/downsample builds the encoder performs
(algo=xpack path, shared per-stage maps) and time them as one chain,
then each stage's pieces separately.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.ops import sparse_conv as SC

    grid_zyx = (42, 1440, 1440)
    vmax = (30000, 30000, 30000, 16000)
    rng = np.random.default_rng(0)
    V0 = 30000
    n = int(V0 * 0.95)
    zz = np.clip(rng.normal(grid_zyx[0] // 4, 3, n).astype(np.int64),
                 0, grid_zyx[0] - 1)
    yy = rng.integers(0, grid_zyx[1], n)
    xx = rng.integers(0, grid_zyx[2], n)
    lin = np.unique((zz * grid_zyx[1] + yy) * grid_zyx[2] + xx)
    n = len(lin)
    coords = np.zeros((V0, 3), np.int32)
    coords[:n, 0] = lin // (grid_zyx[1] * grid_zyx[2])
    coords[:n, 1] = (lin // grid_zyx[2]) % grid_zyx[1]
    coords[:n, 2] = lin % grid_zyx[2]
    valid = np.zeros(V0, bool)
    valid[:n] = True
    coords_j = jnp.asarray(coords)
    valid_j = jnp.asarray(valid)

    def all_tables(coords_zyx, voxel_valid):
        grid = SC.make_grid(coords_zyx, voxel_valid, grid_zyx)
        dims = grid_zyx
        acc = jnp.zeros((), jnp.int32)
        dense_map = SC._dense_rows_ov(grid, dims)
        t = SC.subm_xpack_tables(grid, dims, dense_ov=dense_map)
        acc += t[0, 0]
        for s in range(1, 4):
            out_dims = tuple(max((d + 1) // 2, 1) for d in dims)
            ngrid = SC.downsample_coords(grid, out_dims, vmax[s])
            dt = SC.strided_xpack_tables(grid, ngrid, dims,
                                         dense_ov=dense_map)
            acc += dt[0, 0]
            ndense_map = SC._dense_rows_ov(ngrid, out_dims)
            grid, dims, dense_map = ngrid, out_dims, ndense_map
            t = SC.subm_xpack_tables(grid, dims, dense_ov=dense_map)
            acc += t[0, 0]
        return acc

    t_all = chain_ms(
        lambda c: all_tables(c.astype(jnp.int32), valid_j).astype(
            jnp.float32), coords_j.astype(jnp.float32), iters=50)
    print(f"ALL table/map/downsample builds: {t_all:6.2f} ms", flush=True)

    # per-piece: stage maps+tables
    grid0 = jax.jit(lambda c, v: SC.make_grid(c, v, grid_zyx))(
        coords_j, valid_j)

    def tm(label, fn, x):
        print(f"  {label:34s} {chain_ms(fn, x, iters=50):6.2f} ms",
              flush=True)

    tm("make_grid (s0 sort)",
       lambda c: SC.make_grid(c.astype(jnp.int32), valid_j,
                              grid_zyx).ids.astype(jnp.float32),
       coords_j.astype(jnp.float32))
    dims = grid_zyx
    grid = grid0
    for s in range(4):
        dm = jax.jit(lambda g: SC._dense_rows_ov(g, dims))(grid)
        tm(f"s{s} dense_rows_ov {dims}",
           lambda z, grid=grid, dims=dims: SC._dense_rows_ov(
               grid._replace(ids=grid.ids + z.astype(jnp.int32)),
               dims)[:4, 0].astype(jnp.float32), jnp.zeros(()))
        tm(f"s{s} map+subm_xpack (diff = probes)",
           lambda z, grid=grid, dims=dims: SC.subm_xpack_tables(
               grid._replace(coords=grid.coords + z.astype(jnp.int32)),
               dims, dense_ov=SC._dense_rows_ov(grid, dims))[:, :4]
           .astype(jnp.float32),
           jnp.zeros(()))
        if s < 3:
            out_dims = tuple(max((d + 1) // 2, 1) for d in dims)
            ngrid = jax.jit(lambda g: SC.downsample_coords(
                g, out_dims, vmax[s + 1]))(grid)
            tm(f"s{s} downsample_coords",
               lambda z, grid=grid, od=out_dims, vm=vmax[s + 1]:
               SC.downsample_coords(
                   grid._replace(ids=grid.ids + z.astype(jnp.int32)),
                   od, vm).ids[:4].astype(jnp.float32), jnp.zeros(()))
            tm(f"s{s} map+strided_xpack (diff = probes)",
               lambda z, grid=grid, ng=ngrid, dims=dims:
               SC.strided_xpack_tables(
                   grid, ng._replace(
                       coords=ng.coords + z.astype(jnp.int32)),
                   dims, dense_ov=SC._dense_rows_ov(grid, dims))[:, :4]
               .astype(jnp.float32),
               jnp.zeros(()))
            grid, dims = ngrid, out_dims


if __name__ == "__main__":
    main()
