"""Isolated costs of the non-conv middle-encoder machinery at bench
geometry (lidar-scene site counts): downsample_coords (sort-dedupe), the
per-stage overlapped map builds, subm/strided xpack table probes, and the
voxelizer — the ~17 ms VERDICT r4 says sits above the gather-issue floor.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_ds_tables.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.ops import sparse_conv as SC

    rng = np.random.default_rng(0)

    # stage geometries ~ lidar bench scene (V = configured caps)
    stages = [
        ("s0", (42, 1440, 1440), 30000),
        ("s1", (21, 720, 720), 54000),
        ("s2", (11, 360, 360), 31500),
        ("s3", (5, 180, 180), 21000),
    ]
    grids = {}
    for name, dims, V in stages:
        total = dims[0] * dims[1] * dims[2]
        lin = np.sort(rng.choice(total, V, replace=False))
        coords = np.stack([lin // (dims[1] * dims[2]),
                           (lin // dims[2]) % dims[1],
                           lin % dims[2]], -1).astype(np.int32)
        grids[name] = (SC.make_grid(jnp.asarray(coords), jnp.ones(V, bool),
                                    dims), dims, V)

    # downsample_coords per stage boundary
    for src, dst in (("s0", "s1"), ("s1", "s2"), ("s2", "s3")):
        grid, dims, V = grids[src]
        _, odims, Vo = grids[dst]
        pads = (0, 1, 1) if dst == "s3" else (1, 1, 1)
        odims2 = tuple((d + 2 * p - 3) // 2 + 1 for d, p in zip(dims, pads))
        t = chain_ms(lambda f: SC.downsample_coords(
            SC.SparseGrid(grid.coords + f.astype(jnp.int32) * 0,
                          grid.ids, grid.valid),
            odims2, Vo, pads).ids.astype(jnp.float32),
            jnp.float32(0), iters=100)
        print(f"downsample {src}->{dst} (8V sort-dedupe, V={V}): {t:6.2f} ms",
              flush=True)

    # map build + subm tables per stage. NOTE: the grid must enter the
    # chain as a TRACED input (coords fp32 -> int32 in-graph); a
    # closed-over grid with a `+ f*0` perturbation constant-folds and XLA
    # embeds the 348 MB s0 map as a compiled constant (HTTP 413 on the
    # tunneled remote-compile path).
    def regrid(cf, dims):
        coords = cf.astype(jnp.int32)
        valid = coords[:, 0] >= 0
        sentinel = dims[0] * dims[1] * dims[2]
        ids = jnp.where(valid, SC.linear_ids(coords, dims), sentinel)
        return SC.SparseGrid(coords=coords, ids=ids, valid=valid)

    for name, _, _ in stages:
        grid, dims, V = grids[name]
        cf = grid.coords.astype(jnp.float32)
        t_map = chain_ms(lambda c: SC._dense_rows_ov(
            regrid(c, dims), dims)[:8].astype(jnp.float32), cf, iters=50)
        t_both = chain_ms(lambda c: (
            lambda g: SC.subm_xpack_tables(
                g, dims, dense_ov=SC._dense_rows_ov(g, dims)))(
            regrid(c, dims)).astype(jnp.float32), cf, iters=50)
        print(f"{name}: ov-map build {t_map:6.2f} ms | map+subm tables "
              f"{t_both:6.2f} ms (V={V})", flush=True)

    # strided tables (probe the SOURCE stage's map; map build included,
    # subtract the map column above for the probe-only cost)
    for src, dst in (("s0", "s1"), ("s1", "s2"), ("s2", "s3")):
        grid, dims, V = grids[src]
        ogrid, odims, Vo = grids[dst]
        pads = (0, 1, 1) if dst == "s3" else (1, 1, 1)
        cf = grid.coords.astype(jnp.float32)
        t = chain_ms(lambda c: (
            lambda g: SC.strided_xpack_tables(
                g, ogrid, dims, dense_ov=SC._dense_rows_ov(g, dims),
                pads=pads))(regrid(c, dims)).astype(jnp.float32),
            cf, iters=50)
        print(f"strided tables {src}->{dst} (map+9-probe into {src} map, "
              f"N={Vo}): {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
