"""Sweep the sparse-middle-encoder execution strategies on real hardware.

Usage (real TPU, from repo root):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_middle.py

Variants: fully sparse {loop, stacked} gathers x dense tail from stage
{None, 1, 2, 3} x dense dtype {fp32, bf16}. Timing uses on-device chaining
(fori_loop with data dependence) + one device_get, because
block_until_ready does not synchronize on the tunneled axon backend.
"""
from __future__ import annotations

import dataclasses
import itertools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from futuredet_tpu.config import get_config
    from futuredet_tpu.models.middle import SparseMiddleEncoder

    cfg = get_config("forecast_n3dtf")
    gx, gy, gz = cfg.voxel.grid_size
    grid_zyx = (gz + 1, gy, gx)
    channels = cfg.model.middle_channels
    vmax = cfg.model.middle_vmax

    # realistic active-site set: ~120k voxels clustered on a ground plane
    rng = np.random.default_rng(0)
    V = vmax[0]
    n = int(V * 0.95)
    coords = np.zeros((V, 3), np.int32)
    zz = np.clip(rng.normal(8, 4, n).astype(np.int32), 0, grid_zyx[0] - 1)
    yy = rng.integers(0, grid_zyx[1], n)
    xx = rng.integers(0, grid_zyx[2], n)
    lin = np.unique((zz * grid_zyx[1] + yy) * grid_zyx[2] + xx)
    n = len(lin)
    coords[:n, 0] = lin // (grid_zyx[1] * grid_zyx[2])
    coords[:n, 1] = (lin // grid_zyx[2]) % grid_zyx[1]
    coords[:n, 2] = lin % grid_zyx[2]
    valid = np.zeros(V, bool)
    valid[:n] = True
    feats = rng.normal(size=(V, 5)).astype(np.float32)
    feats_j = jnp.asarray(feats)
    coords_j = jnp.asarray(coords)
    valid_j = jnp.asarray(valid)
    print(f"{n} active sites on {grid_zyx}")

    iters = 8
    results = {}
    for dense_from, algo, dt in itertools.product(
            [None, 1, 2, 3], ["loop", "stacked", "hybrid", "window", "window_bf16"],
            [None, "bf16"]):
        if dense_from is None and dt == "bf16":
            continue  # dtype knob only affects dense stages
        if (algo.startswith("window") or algo == "hybrid") \
                and dense_from not in (None, 1):
            continue  # window targets the sparse stages; 2 points suffice
        enc = SparseMiddleEncoder(
            channels=channels, vmax=vmax, grid_zyx=grid_zyx,
            dense_from_stage=dense_from, gather_algo=algo,
            dense_dtype=jnp.bfloat16 if dt == "bf16" else None)
        try:
            variables = jax.jit(enc.init)(jax.random.PRNGKey(0), feats_j,
                                          coords_j, valid_j)

            @jax.jit
            def chain(variables, f):
                def body(i, carry):
                    tok, acc = carry
                    out = enc.apply(variables, f + tok, coords_j, valid_j)
                    return (jnp.sum(out) * 1e-12, acc + jnp.sum(out))
                return jax.lax.fori_loop(0, iters, body,
                                         (jnp.float32(0), jnp.float32(0)))[1]

            _ = jax.device_get(chain(variables, feats_j))  # compile
            t0 = time.perf_counter()
            _ = jax.device_get(chain(variables, feats_j))
            dt_ms = (time.perf_counter() - t0) / iters * 1e3
            key = f"dense_from={dense_from} algo={algo} dtype={dt or 'fp32'}"
            results[key] = dt_ms
            print(f"{key:48s} {dt_ms:8.1f} ms")
        except Exception as e:  # OOM etc. — record and continue
            print(f"dense_from={dense_from} algo={algo} dtype={dt}: "
                  f"FAILED {type(e).__name__}: {str(e)[:120]}")

    if results:
        best = min(results, key=results.get)
        print(f"\nbest: {best} @ {results[best]:.1f} ms")


if __name__ == "__main__":
    main()
