"""Probe: conv_x3 (x-packed) vs stacked at TRAIN geometry, and the packed
table FLIP property for the transpose gather.

flip(ptab): group g -> 8-g (offset negation of (dz,dy)), swap the code_m1
and code_p1 bit fields (x mirror), anchor unchanged — then
conv_x3(gy, flip(ptab), W_rev) with W_rev[k] = W[26-k]^T is the exact
transpose of conv_x3(x, ptab, W) for SUBMANIFOLD tables.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def flip_ptab(ptab):
    import jax.numpy as jnp
    from futuredet_tpu.ops.sparse_conv import _XP_IDX_BITS, _XP_IDX_MASK
    anchor = ptab & _XP_IDX_MASK
    c_m1 = (ptab >> _XP_IDX_BITS) & 3
    c_0 = (ptab >> (_XP_IDX_BITS + 2)) & 3
    c_p1 = (ptab >> (_XP_IDX_BITS + 4)) & 3
    flipped = (anchor | (c_p1 << _XP_IDX_BITS) | (c_0 << (_XP_IDX_BITS + 2))
               | (c_m1 << (_XP_IDX_BITS + 4)))
    return flipped[::-1]          # group g -> 8-g


def main():
    import jax
    import jax.numpy as jnp
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.ops import sparse_conv as SC

    rng = np.random.default_rng(0)

    # --- correctness of the flip property on a small grid ----------------
    dims = (8, 10, 12)
    V = 128
    n = 70
    lin = rng.choice(dims[0] * dims[1] * dims[2], n, replace=False)
    coords = np.zeros((V, 3), np.int32)
    coords[:n] = np.stack([lin // (dims[1] * dims[2]),
                           (lin // dims[2]) % dims[1], lin % dims[2]], -1)
    valid = np.zeros(V, bool)
    valid[:n] = True
    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    ptab = SC.subm_xpack_tables(grid, dims)
    Cin, Cout = 4, 6
    x = jnp.asarray(rng.normal(size=(V, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, Cin, Cout)).astype(np.float32))
    gy = jnp.asarray(rng.normal(size=(V, Cout)).astype(np.float32))
    x = jnp.where(jnp.asarray(valid)[:, None], x, 0.0)
    gy = jnp.where(jnp.asarray(valid)[:, None], gy, 0.0)

    # autodiff dx of the stacked conv == conv_x3 with flipped tables
    tab27 = SC.unpack_xpack_tables(ptab, V)
    dx_ref = jax.grad(lambda xx: jnp.sum(SC._gather_conv(
        xx, tab27, w, None, None, "stacked") * gy))(x)
    # flip_ptab already aligns k <-> 26-k, so W needs only the per-k
    # transpose (no reversal)
    dx_new = SC.conv_x3(gy, flip_ptab(ptab), grid.valid,
                        w.transpose(0, 2, 1))
    dx_new = jnp.where(grid.valid[:, None], dx_new, 0.0)
    err = float(jnp.max(jnp.abs(dx_ref - dx_new)))
    print(f"flip-transpose max err: {err:.2e}", flush=True)

    # --- speed at train geometries ---------------------------------------
    for name, V, Cin, Cout, dims in [
        ("s0b", 120000, 16, 16, (41, 1440, 1440)),
        ("s1", 60000, 32, 32, (21, 720, 720)),
    ]:
        Z, Y, X = dims
        n = int(V * 0.95)
        zz = np.clip(rng.normal(Z // 4, 3, n).astype(np.int64), 0, Z - 1)
        lin = np.unique((zz * Y + rng.integers(0, Y, n)) * X
                        + rng.integers(0, X, n))
        n = len(lin)
        coords = np.zeros((V, 3), np.int32)
        coords[:n] = np.stack([lin // (Y * X), (lin // X) % Y, lin % X], -1)
        valid = np.zeros(V, bool)
        valid[:n] = True
        grid = jax.jit(lambda c, v: SC.make_grid(c, v, dims))(
            jnp.asarray(coords), jnp.asarray(valid))
        ptab = jax.jit(lambda g: SC.subm_xpack_tables(g, dims))(grid)
        tab27 = jax.jit(lambda p: SC.unpack_xpack_tables(p, V))(ptab)
        f = jnp.asarray(rng.normal(size=(V, Cin)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1)

        t_stk = chain_ms(lambda x: SC._gather_conv(x, tab27, w, None, None,
                                                   "stacked"), f, iters=30)
        t_xp = chain_ms(lambda x: SC.conv_x3(x, ptab, grid.valid, w),
                        f, iters=30)
        print(f"{name} V={V} Cin={Cin}: stacked {t_stk:6.2f} ms  "
              f"conv_x3 {t_xp:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
