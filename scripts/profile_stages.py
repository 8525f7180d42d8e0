"""Per-stage microbenchmarks of the sparse middle encoder's primitives.

Usage (real TPU, from repo root):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stages.py

For each stage geometry (V, Cin, grid dims) of the forecast_n3dtf encoder
at bench capacity (30k input voxels, detector vmax clamp applied):
  * neighbor-table build
  * one submanifold conv under each algo: loop / stacked / hybrid /
    Pallas window fp32 at two block sizes

Timings amortize the tunnel's ~40 ms fixed per-call cost over 100 chained
iterations (scripts/_timing.py) — at iters<=10 that overhead swamps
per-conv costs and produced wrong hotspot conclusions earlier.
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from _timing import chain_ms

    from _timing import enable_compilation_cache
    enable_compilation_cache()

    from futuredet_tpu.ops import sparse_conv as SC
    from futuredet_tpu.ops.pallas_gather import subm_conv_window

    # geometries at bench capacity (vmax clamped by max_voxels_eval=30000)
    stages = [
        ("s0a", 30000, 5, 16, (41, 1440, 1440)),
        ("s0b", 30000, 16, 16, (41, 1440, 1440)),
        ("s1", 30000, 32, 32, (21, 720, 720)),
        ("s2", 30000, 64, 64, (11, 360, 360)),
        ("s3", 16000, 128, 128, (6, 180, 180)),
    ]
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"

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
        f = jnp.asarray(feats)
        w = jnp.asarray(W)

        cf = grid.coords.astype(jnp.float32)
        t_tab = chain_ms(
            lambda c: SC.neighbor_table(
                SC.SparseGrid(c.astype(jnp.int32), grid.ids, grid.valid),
                dims).astype(jnp.float32), cf, iters=50)

        def t_algo(algo):
            return chain_ms(
                lambda x: SC.subm_conv_apply(x, tab, w, algo=algo), f)

        line = (f"{name:4s} V={V:6d} Cin={Cin:3d}: table {t_tab:6.2f}  "
                f"loop {t_algo('loop'):6.2f}  stacked {t_algo('stacked'):6.2f}"
                f"  hybrid {t_algo('hybrid'):6.2f}")
        if on_tpu:
            for Wsz, Bsz in [(1024, 512), (2048, 1024)]:
                t = chain_ms(lambda x: subm_conv_window(
                    x, tab, w, W=Wsz, B=Bsz,
                    compute_dtype=jnp.float32), f)
                line += f"  win/W{Wsz} {t:6.2f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
