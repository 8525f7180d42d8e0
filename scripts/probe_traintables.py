"""Train-geometry table builds: plain 27-probe (what training runs today)
vs packed 9-probe + unpack (what eval's stacked stages run).

Training coerces algo to "stacked" (custom-VJP gathers) and with it the
TABLE build drops to neighbor_table over _dense_index_rows — 27 probes at
V=120k on the 345 MB stage-0 map. The packed build needs 9 probes and the
stacked conv can consume unpack_xpack_tables() output.
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

    stages = [
        ("s0", 120000, (41, 1440, 1440)),
        ("s1", 60000, (21, 720, 720)),
        ("s2", 30000, (11, 360, 360)),
        ("s3", 16000, (6, 180, 180)),
    ]
    rng = np.random.default_rng(0)
    for name, V, dims in stages:
        Z, Y, X = dims
        total = Z * Y * X
        n = int(V * 0.95)
        zz = np.clip(rng.normal(Z // 4, 3, n).astype(np.int64), 0, Z - 1)
        yy = rng.integers(0, Y, n)
        xx = rng.integers(0, X, n)
        lin = np.unique((zz * Y + yy) * X + xx)
        n = len(lin)
        coords = np.zeros((V, 3), np.int32)
        coords[:n, 0] = lin // (Y * X)
        coords[:n, 1] = (lin // X) % Y
        coords[:n, 2] = lin % X
        valid = np.zeros(V, bool)
        valid[:n] = True
        grid = jax.jit(lambda c, v: SC.make_grid(c, v, dims))(
            jnp.asarray(coords), jnp.asarray(valid))

        # equality of the two 27-table forms
        t27 = jax.jit(lambda g: SC.neighbor_table(g, dims))(grid)
        t9u = jax.jit(lambda g: SC.unpack_xpack_tables(
            SC.subm_xpack_tables(g, dims), g.ids.shape[0]))(grid)
        eq = bool(jnp.all(t27 == t9u))

        t_plain = chain_ms(
            lambda z, grid=grid, dims=dims: SC.neighbor_table(
                grid._replace(coords=grid.coords + z.astype(jnp.int32)),
                dims)[:, :4].astype(jnp.float32), jnp.zeros(()), iters=30)
        t_pack = chain_ms(
            lambda z, grid=grid, dims=dims: SC.unpack_xpack_tables(
                SC.subm_xpack_tables(
                    grid._replace(
                        coords=grid.coords + z.astype(jnp.int32)), dims),
                grid.ids.shape[0])[:, :4].astype(jnp.float32),
            jnp.zeros(()), iters=30)
        print(f"{name} V={V:6d} grid={Z}x{Y}x{X}: equal={eq}  "
              f"plain27 {t_plain:6.2f} ms  packed9+unpack {t_pack:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
