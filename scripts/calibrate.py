"""Chip calibration: matmul peaks, streaming bandwidth, gather bandwidth,
fixed per-call overhead. Run on the real TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/calibrate.py

All timings amortize the tunnel's ~30 ms fixed per-call cost over 100
chained iterations (see scripts/_timing.py) — at low iteration counts that
overhead silently dominates and produces wildly wrong conclusions.
"""
from __future__ import annotations

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

    key = jax.random.PRNGKey(0)
    x8 = jnp.ones((8, 128), jnp.float32)
    for iters in (10, 100, 400):
        t = chain_ms(lambda v: v * 1.0000001, x8, iters)
        print(f"noop @iters={iters:4d}: {t:8.4f} ms/iter "
              f"(fixed-call cost ~ {t * iters:.1f} ms)", flush=True)

    N = 4096
    a32 = jax.jit(lambda k: jax.random.normal(k, (N, N), jnp.float32))(key)
    a16 = jax.jit(lambda v: v.astype(jnp.bfloat16))(a32)
    t = chain_ms(lambda v: jnp.dot(v, v, preferred_element_type=jnp.float32),
                 a32)
    print(f"fp32 matmul {N}^3: {t:7.3f} ms = {2 * N ** 3 / t / 1e9:.0f} "
          f"TFLOP/s", flush=True)
    t = chain_ms(lambda v: jnp.dot(v, v, preferred_element_type=jnp.float32),
                 a16)
    print(f"bf16 matmul {N}^3: {t:7.3f} ms = {2 * N ** 3 / t / 1e9:.0f} "
          f"TFLOP/s", flush=True)

    big = jax.jit(lambda k: jax.random.normal(k, (64 * 1024 * 1024,),
                                              jnp.float32))(key)
    t = chain_ms(lambda v: jnp.sum(v, keepdims=True), big)
    print(f"stream read 256MB: {t:7.3f} ms = {0.256 / (t / 1e3):.0f} GB/s",
          flush=True)
    t = chain_ms(lambda v: v * 1.0000001, big)
    print(f"copy 256MB (r+w):  {t:7.3f} ms = {2 * 0.256 / (t / 1e3):.0f} "
          f"GB/s", flush=True)

    rng = np.random.default_rng(0)
    n_bytes = 27 * 30000 * 256
    for C in [32, 128, 512]:
        V = 60000
        rows = n_bytes // (4 * C)
        idx = jnp.asarray(np.sort(rng.integers(0, V, rows)).astype(np.int32))
        xa = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
        t = chain_ms(lambda v: v[idx], xa)
        gb = rows * C * 4 / 1e9
        print(f"row gather C={C:4d} ({C * 4:5d}B rows, {rows} rows): "
              f"{t:7.3f} ms = {gb / (t / 1e3):6.1f} GB/s", flush=True)

    print(jax.devices(), flush=True)


if __name__ == "__main__":
    main()
