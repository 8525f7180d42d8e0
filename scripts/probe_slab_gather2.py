"""Variant: loop-VARYING features (realistic producer/consumer chain) and
table-loaded indices, to separate VMEM-residency artifacts from real wins."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax import lax
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    V, N, K = 30000, 30000, 27
    for Cin in (16, 32, 64, 128):
        tab = jnp.asarray(rng.integers(0, V, (K, N)).astype(np.int32))
        f0 = jnp.asarray(rng.normal(size=(V + 3, Cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K * Cin, Cin)).astype(np.float32) * 0.05)

        def stacked(x):            # x (V+3, Cin) loop-varying
            g = x[tab]             # (K, N, Cin)
            g = jnp.moveaxis(g, 0, 1).reshape(N, K * Cin)
            out = jnp.dot(g, w, preferred_element_type=jnp.float32)
            return jnp.concatenate([out, jnp.zeros((3, Cin))], 0)

        def slab(x):
            flat = x.reshape(-1)
            outs = []
            for j in range(9):
                starts = (tab[3 * j + 1] * Cin)[:, None]
                g = lax.gather(
                    flat, starts,
                    lax.GatherDimensionNumbers(
                        offset_dims=(1,), collapsed_slice_dims=(),
                        start_index_map=(0,)),
                    slice_sizes=(3 * Cin,))
                outs.append(g)
            g = jnp.concatenate(outs, 1)       # (N, 27*Cin)
            out = jnp.dot(g, w, preferred_element_type=jnp.float32)
            return jnp.concatenate([out, jnp.zeros((3, Cin))], 0)

        t_st = chain_ms(stacked, f0)
        t_sl = chain_ms(slab, f0)
        print(f"Cin={Cin:4d}: stacked {t_st:6.2f} ms   slab9 {t_sl:6.2f} ms  "
              f"ratio {t_st/t_sl:.2f}x", flush=True)

if __name__ == "__main__":
    main()
