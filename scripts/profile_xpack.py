"""xpack primitives vs baseline at encoder stage geometries."""
import functools, os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.ops import sparse_conv as SC

    stages = [
        ("s0a", 30000, 5, 16, (41, 1440, 1440)),
        ("s0b", 30000, 16, 16, (41, 1440, 1440)),
        ("s1", 30000, 32, 32, (21, 720, 720)),
        ("s2", 30000, 64, 64, (11, 360, 360)),
        ("s3", 16000, 128, 128, (6, 180, 180)),
    ]
    rng = np.random.default_rng(0)
    for name, V, Cin, Cout, dims in stages:
        n = int(V * 0.95)
        zz = np.clip(rng.normal(dims[0] // 4, 3, n).astype(np.int64),
                     0, dims[0] - 1)
        yy = rng.integers(0, dims[1], n)
        xx = rng.integers(0, dims[2], n)
        lin = np.unique((zz * dims[1] + yy) * dims[2] + xx)
        n = len(lin)
        coords = np.zeros((V, 3), np.int32)
        coords[:n, 0] = lin // (dims[1] * dims[2])
        coords[:n, 1] = (lin // dims[2]) % dims[1]
        coords[:n, 2] = lin % dims[2]
        valid = np.zeros(V, bool)
        valid[:n] = True
        feats = rng.normal(size=(V, Cin)).astype(np.float32)
        W = rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1

        grid = jax.jit(functools.partial(SC.make_grid, dims=dims))(
            jnp.asarray(coords), jnp.asarray(valid))
        tab = jax.jit(functools.partial(SC.neighbor_table, dims=dims))(grid)
        ptab = jax.jit(functools.partial(SC.subm_xpack_tables, dims=dims))(
            grid)
        f = jnp.asarray(feats)
        w = jnp.asarray(W)
        cf = grid.coords.astype(jnp.float32)

        t_tab27 = chain_ms(lambda c: SC.neighbor_table(
            SC.SparseGrid(c.astype(jnp.int32), grid.ids, grid.valid),
            dims).astype(jnp.float32), cf, iters=50)
        t_tab9 = chain_ms(lambda c: SC.subm_xpack_tables(
            SC.SparseGrid(c.astype(jnp.int32), grid.ids, grid.valid),
            dims).astype(jnp.float32), cf, iters=50)
        t_map_ov = chain_ms(lambda c: SC._dense_rows_ov(
            SC.SparseGrid(c.astype(jnp.int32), grid.ids, grid.valid),
            dims)[:64].astype(jnp.float32), cf, iters=50)
        t_st = chain_ms(lambda x: SC.subm_conv_apply(x, tab, w,
                                                     algo="stacked"), f)
        t_xp = chain_ms(lambda x: SC.subm_conv_apply(
            x, (ptab, grid.valid), w, algo="xpack"), f)
        print(f"{name:4s} V={V:6d} Cin={Cin:3d}: tab27 {t_tab27:6.2f} "
              f"tab9 {t_tab9:6.2f} (map_ov {t_map_ov:5.2f})  "
              f"conv stacked {t_st:5.2f} xpack {t_xp:5.2f}", flush=True)

if __name__ == "__main__":
    main()
