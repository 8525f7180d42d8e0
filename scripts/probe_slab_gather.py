"""Microbenchmark: overlapping 3-row slab gather (flat operand, 3*Cin
contiguous floats per fetch) vs the standard per-tap row gather.

If the slab fetch runs at ~width-3Cin row bandwidth, the x-packed sparse
conv (9 slab gathers replacing 27 row gathers) is a ~2x conv-gather win.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_slab_gather.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    V, N = 30000, 30000
    for Cin in (16, 32, 64, 128):
        f = jnp.asarray(rng.normal(size=(V + 3, Cin)).astype(np.float32))
        flat = f.reshape(-1)
        idx = jnp.asarray(rng.integers(0, V, (N,)).astype(np.int32))

        def row_gather(x):
            # 27 per-tap row gathers (the stacked baseline's traffic)
            out = 0.0
            for k in range(27):
                out = out + f[(idx + k) % V]
            return out * (1 + x * 1e-12)

        def slab_gather(x):
            # 9 slab gathers of 3*Cin contiguous floats at row offsets
            out = 0.0
            for k in range(9):
                starts = ((idx + k) % V * Cin)[:, None]
                g = lax.gather(
                    flat, starts,
                    lax.GatherDimensionNumbers(
                        offset_dims=(1,), collapsed_slice_dims=(),
                        start_index_map=(0,)),
                    slice_sizes=(3 * Cin,))
                out = out + g.reshape(N, 3, Cin).sum(1)
            return out * (1 + x * 1e-12)

        t_row = chain_ms(row_gather, jnp.float32(0.0))
        t_slab = chain_ms(slab_gather, jnp.float32(0.0))
        print(f"Cin={Cin:4d}: 27 row-gathers {t_row:6.2f} ms   "
              f"9 slab-gathers {t_slab:6.2f} ms   ratio {t_row/t_slab:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
