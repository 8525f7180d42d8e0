"""Conv contraction formulations: one big (N, 27*Cin) matmul (current
conv_x3 / stacked) vs per-group ACCUMULATED matmuls that never
materialize the full gathered block (the (N,27C) concat is 190-290 MB at
s1/s2/s3 — written once and read once more by the matmul, ~1.2-1.9 ms of
pure HBM traffic per conv). Also: plain "loop" (27 matmuls) at Cin=128
where contraction depth 128 already fills the MXU.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_accmatmul.py
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

    def conv_x3_acc(features, ptab, valid, weights):
        """conv_x3 with per-group accumulated matmuls (no 27C concat)."""
        K, Cin, Cout = weights.shape
        V = features.shape[0]
        N = ptab.shape[1]
        fv = jnp.where(valid[:, None], features, 0.0)
        ext = jnp.concatenate([fv, jnp.zeros((3, Cin), fv.dtype)], 0)
        wide = jnp.concatenate([ext[0:V + 1], ext[1:V + 2], ext[2:V + 3]], 1)
        out = None
        for g in range(9):
            t = ptab[g]
            a = t & SC._XP_IDX_MASK
            slab = wide[a].reshape(N, 3, Cin)
            blocks = []
            for shift in (SC._XP_IDX_BITS, SC._XP_IDX_BITS + 2,
                          SC._XP_IDX_BITS + 4):
                code = (t >> shift) & 3
                sel = (code[:, None] == jnp.arange(3, dtype=jnp.int32)
                       ).astype(fv.dtype)
                blocks.append(jnp.einsum("nl,nlc->nc", sel, slab))
            bg = jnp.concatenate(blocks, 1)                 # (N, 3*Cin)
            acc = jnp.dot(bg, weights[3 * g:3 * g + 3].reshape(3 * Cin, Cout),
                          preferred_element_type=jnp.float32)
            out = acc if out is None else out + acc
        return out

    def conv_x3_accslab(features, ptab, valid, weights):
        """Accumulate straight from the slab: out += einsum over (l, c)
        of slab with per-(tap,lane) routed weights — routing folded into
        a (N,3,3) one-hot contracted jointly. FLOPs x3 of exact conv but
        zero routing passes; MXU eats it."""
        K, Cin, Cout = weights.shape
        V = features.shape[0]
        N = ptab.shape[1]
        fv = jnp.where(valid[:, None], features, 0.0)
        ext = jnp.concatenate([fv, jnp.zeros((3, Cin), fv.dtype)], 0)
        wide = jnp.concatenate([ext[0:V + 1], ext[1:V + 2], ext[2:V + 3]], 1)
        out = None
        for g in range(9):
            t = ptab[g]
            a = t & SC._XP_IDX_MASK
            slab = wide[a].reshape(N, 3 * Cin)
            # routed weight per site: W_eff[n, l, c, o] = sum_t sel[n,t,l]
            # W[3g+t, c, o] -> too big; instead contract sel with W first
            # per tap then sum taps: out += sum_t (sel_t * slab_l) @ W_t
            # == (slab * selmask) @ W  with selmask (N, 3) broadcast per c
            for ti, shift in enumerate((SC._XP_IDX_BITS,
                                        SC._XP_IDX_BITS + 2,
                                        SC._XP_IDX_BITS + 4)):
                code = (t >> shift) & 3
                sel = (code[:, None] == jnp.arange(3, dtype=jnp.int32)
                       ).astype(fv.dtype)                   # (N, 3)
                masked = (slab.reshape(N, 3, Cin)
                          * sel[:, :, None]).reshape(N, 3 * Cin)
                acc = jnp.dot(
                    masked,
                    jnp.tile(weights[3 * g + ti], (3, 1)),
                    preferred_element_type=jnp.float32)
                out = acc if out is None else out + acc
        return out

    rng = np.random.default_rng(0)
    cases = [
        ("s1", (21, 720, 720), 54000, 32, 32),
        ("s2", (11, 360, 360), 31500, 64, 64),
        ("s3", (5, 180, 180), 21000, 128, 128),
    ]
    for label, dims, V, Cin, Cout in cases:
        total = dims[0] * dims[1] * dims[2]
        lin = np.sort(rng.choice(total, V, replace=False))
        coords = np.stack([lin // (dims[1] * dims[2]),
                           (lin // dims[2]) % dims[1],
                           lin % dims[2]], -1).astype(np.int32)
        grid = SC.make_grid(jnp.asarray(coords), jnp.ones(V, bool), dims)
        ptab = SC.subm_xpack_tables(grid, dims)
        feats = jnp.asarray(rng.normal(size=(V, Cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(27, Cin, Cout)).astype(np.float32)
                        * 0.05)
        arms = [
            ("x3-big", lambda f: SC.conv_x3(f, ptab, grid.valid, w)),
            ("x3-acc", lambda f: conv_x3_acc(f, ptab, grid.valid, w)),
        ]
        if Cin >= 64:
            tab27 = SC.unpack_xpack_tables(ptab, V)
            arms.append(("stacked", lambda f: SC._gather_conv(
                f, tab27, w, None, None, "stacked")))
            arms.append(("loop27", lambda f: SC._gather_conv(
                f, tab27, w, None, None, "loop")))
        if Cin == 32:
            arms.append(("x3-accslab", lambda f: conv_x3_accslab(
                f, ptab, grid.valid, w)))
        for name, fn in arms:
            ms = chain_ms(fn, feats, iters=100)
            print(f"{label} Cin={Cin} V={V}: {name:10s} {ms:6.2f} ms",
                  flush=True)
        # exactness sanity (allow fp reassociation)
        ref = np.asarray(SC.conv_x3(feats, ptab, grid.valid, w))
        acc = np.asarray(conv_x3_acc(feats, ptab, grid.valid, w))
        err = np.abs(ref - acc).max() / (np.abs(ref).max() + 1e-9)
        print(f"    acc-vs-big rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
