"""Routing-formulation probe: per-tap vs single-read one-hot routing in
conv_x3. OUTCOME (v5e, 2026-08-20): the per-tap "nl,nlc->nc" einsums (27
small ones) are the FAST form — XLA fuses a group's three taps into one
slab traversal. The batched "ntl,nlc->ntc" single-read form is 2-3x
slower (s1: 1.61 vs 4.52 ms; s2: 1.72 vs 3.05; s0: 0.83 vs 2.35), and
conv_x3_packed at s2 measured 4.56 ms with it. The shipped conv keeps the
per-tap form; this probe is the record. ("one-read" below re-implements
the losing form locally.)

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_route3.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.ops import sparse_conv as SC

    def one_read_gcat(features, ptab, valid):
        """The LOSING single-read routing (one ntl,nlc->ntc per group)."""
        V, Cin = features.shape
        N = ptab.shape[1]
        fv = jnp.where(valid[:, None], features, 0.0)
        ext = jnp.concatenate([fv, jnp.zeros((3, Cin), fv.dtype)], 0)
        wide = jnp.concatenate([ext[0:V + 1], ext[1:V + 2], ext[2:V + 3]], 1)
        ar3 = jnp.arange(3, dtype=jnp.int32)
        blocks = []
        for g in range(9):
            t = ptab[g]
            a = t & SC._XP_IDX_MASK
            slab = wide[a].reshape(N, 3, Cin)
            codes = jnp.stack(
                [(t >> sh) & 3 for sh in (SC._XP_IDX_BITS,
                                          SC._XP_IDX_BITS + 2,
                                          SC._XP_IDX_BITS + 4)], 1)
            sel = (codes[..., None] == ar3).astype(fv.dtype)   # (N, 3, 3)
            blocks.append(jnp.einsum("ntl,nlc->ntc", sel, slab
                                     ).reshape(N, 3 * Cin))
        return jnp.concatenate(blocks, 1)

    def conv_with(gcat_fn, features, ptab, valid, weights):
        K = weights.shape[0]
        Cin = features.shape[1]
        g = gcat_fn(features, ptab, valid)
        return jnp.dot(g, weights.reshape(K * Cin, -1),
                       preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    # (stage label, dims, V sites, Cin, Cout)
    cases = [
        ("s1 subm", (21, 720, 720), 54000, 32, 32),
        ("s2 subm", (11, 360, 360), 31500, 64, 64),
        ("s0 subm", (41, 1440, 1440), 30000, 16, 16),
    ]
    for label, dims, V, Cin, Cout in cases:
        total = dims[0] * dims[1] * dims[2]
        lin = rng.choice(total, V, replace=False)
        z = lin // (dims[1] * dims[2])
        y = (lin // dims[2]) % dims[1]
        x = lin % dims[2]
        coords = np.stack([z, y, x], -1).astype(np.int32)
        grid = SC.make_grid(jnp.asarray(coords), jnp.ones(V, bool), dims)
        ptab = SC.subm_xpack_tables(grid, dims)
        feats = jnp.asarray(rng.normal(size=(V, Cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(27, Cin, Cout)).astype(np.float32)
                        * 0.05)

        for name, fn in (("per-tap", lambda f: conv_with(
                              SC._xpack_gcat, f, ptab, grid.valid, w)),
                         ("one-read", lambda f: conv_with(
                              one_read_gcat, f, ptab, grid.valid, w))):
            ms = chain_ms(fn, feats, iters=100)
            print(f"{label} Cin={Cin} V={V}: {name:9s} {ms:6.2f} ms",
                  flush=True)
        if Cin == 64:
            ms = chain_ms(
                lambda f: SC.conv_x3_packed(f, ptab, grid.valid, w),
                feats, iters=100)
            print(f"{label} Cin={Cin} V={V}: packed-1r {ms:6.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
