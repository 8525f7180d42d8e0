"""Does XLA TPU exploit gather `indices_are_sorted`?

Measures (a) conv-style slab row gathers from a small feature operand and
(b) map-row probes from large operands, each with random vs sorted indices,
with and without the indices_are_sorted hint (via .at[].get()).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_sorted_gather.py
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
    rng = np.random.default_rng(0)

    def t_gather(src_shape, n_idx, sorted_idx, hint, label):
        src = jnp.asarray(rng.normal(0, 1, src_shape).astype(np.float32))
        idx = rng.integers(0, src_shape[0], n_idx).astype(np.int32)
        if sorted_idx:
            idx = np.sort(idx)
        idx_j = jnp.asarray(idx)

        def fn(z):
            i = idx_j + z.astype(jnp.int32)
            g = src.at[i].get(indices_are_sorted=hint, mode="clip")
            return jnp.sum(g, 0)
        t = chain_ms(lambda z: fn(z), jnp.zeros(()), iters=100)
        ns = t * 1e6 / n_idx
        print(f"  {label:44s} {t:6.2f} ms  ({ns:5.2f} ns/row)", flush=True)

    # (a) conv slab regime: 54k x 96-lane rows from a (54k+2, 96) operand
    print("conv slab gathers (V=54k, 96 lanes, 20 MB operand):", flush=True)
    for sorted_idx in (False, True):
        for hint in (False, True):
            t_gather((54002, 96), 9 * 54000, sorted_idx, hint,
                     f"idx_sorted={sorted_idx} hint={hint}")

    # (b) map probe regime: 128-lane rows from a 345 MB operand
    print("map-row probes (rows=690k, 128 lanes, 345 MB operand):",
          flush=True)
    for sorted_idx in (False, True):
        for hint in (False, True):
            t_gather((690000, 128), 9 * 30000, sorted_idx, hint,
                     f"idx_sorted={sorted_idx} hint={hint}")


if __name__ == "__main__":
    main()
