"""Variant 3: pre-widened operand (V, 3*Cin) built from streaming shifts,
then 9 ALIGNED row gathers — vs the 27-row stacked baseline."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    V, N, K = 30000, 30000, 27
    for Cin in (16, 32, 64, 128):
        tab = jnp.asarray(rng.integers(0, V, (K, N)).astype(np.int32))
        f0 = jnp.asarray(rng.normal(size=(V + 1, Cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K * Cin, Cin)).astype(np.float32) * 0.05)

        def stacked(x):
            g = x[tab]
            g = jnp.moveaxis(g, 0, 1).reshape(N, K * Cin)
            out = jnp.dot(g, w, preferred_element_type=jnp.float32)
            return jnp.concatenate([out, jnp.zeros((1, Cin))], 0)

        def prewide(x):
            fv = x[:V]
            pre = jnp.concatenate([jnp.zeros((1, Cin)), fv[:-1]], 0)
            nxt = jnp.concatenate([fv[1:], jnp.zeros((1, Cin))], 0)
            wide = jnp.concatenate([pre, fv, nxt], 1)     # (V, 3Cin)
            widep = jnp.concatenate([wide, jnp.zeros((1, 3 * Cin))], 0)
            outs = [widep[tab[3 * j + 1]] for j in range(9)]  # (N,3Cin) x9
            g = jnp.concatenate(outs, 1)                  # (N, 27Cin)
            out = jnp.dot(g, w, preferred_element_type=jnp.float32)
            return jnp.concatenate([out, jnp.zeros((1, Cin))], 0)

        t_st = chain_ms(stacked, f0)
        t_pw = chain_ms(prewide, f0)
        print(f"Cin={Cin:4d}: stacked {t_st:6.2f} ms   prewide9 {t_pw:6.2f} "
              f"ms  ratio {t_st/t_pw:.2f}x", flush=True)

if __name__ == "__main__":
    main()
