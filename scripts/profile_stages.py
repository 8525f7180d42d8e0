"""Per-stage microbenchmarks of the sparse middle encoder's primitives.

Usage (real TPU, from repo root):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stages.py

For each stage geometry (V, Cin, grid dims) of the forecast_n3dtf encoder:
  * neighbor_table build time
  * one submanifold conv under each algo: loop, stacked, window fp32 /
    bf16 at W in {512, 1024, 2048}
This locates the 119 ms (see profile_e2e.py) and tells whether the Pallas
windowed select can replace the row gathers at the wide stages.
"""
from __future__ import annotations

import functools
import time

import numpy as np


def _chain(fn, x, iters=10):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        def body(i, carry):
            tok, acc = carry
            out = fn(x + tok)
            return (jnp.sum(out) * 1e-12, acc + jnp.sum(out))
        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0), jnp.float32(0)))[1]

    _ = jax.device_get(chain(x))
    t0 = time.perf_counter()
    _ = jax.device_get(chain(x))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from futuredet_tpu.ops import sparse_conv as SC
    from futuredet_tpu.ops.pallas_gather import subm_conv_window

    # stage geometries of forecast_n3dtf at bench sizes (30k input voxels;
    # buffer capacities from middle_vmax) and at real capacity (120k)
    stages = [
        ("s0@30k", 30000, 5, 16, (41, 1440, 1440)),
        ("s1", 60000, 32, 32, (21, 720, 720)),
        ("s2", 30000, 64, 64, (11, 360, 360)),
        ("s3", 16000, 128, 128, (6, 180, 180)),
    ]
    rng = np.random.default_rng(0)

    for name, V, Cin, Cout, dims in stages:
        # clustered active sites: z near ground, xy uniform
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
        t_tab = _chain(
            lambda c: SC.neighbor_table(
                SC.SparseGrid(c, grid.ids, grid.valid), dims).astype(
                    jnp.float32),
            grid.coords.astype(jnp.float32)) if False else None
        # table build: time via int perturbation-free chain (table depends
        # only on coords; chain on a dummy that forces recompute)
        tab = jax.jit(functools.partial(SC.neighbor_table, dims=dims))(grid)
        f = jnp.asarray(feats)
        w = jnp.asarray(W)

        def t_algo(algo):
            return _chain(lambda x: SC.subm_conv_apply(x, tab, w, algo=algo),
                          f)

        line = f"{name:7s} V={V:6d} Cin={Cin:3d}: "
        line += f"loop {t_algo('loop'):6.1f}  stacked {t_algo('stacked'):6.1f}"
        for dt_name, dt in [("w_fp32", jnp.float32), ("w_bf16", jnp.bfloat16)]:
            for Wsz, Bsz in [(1024, 512), (2048, 1024)]:
                try:
                    t = _chain(lambda x: subm_conv_window(
                        x, tab, w, W=Wsz, B=Bsz, compute_dtype=dt), f)
                    line += f"  {dt_name}/W{Wsz} {t:6.1f}"
                except Exception as e:
                    line += f"  {dt_name}/W{Wsz} FAIL({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
